package graft

import org.apache.spark.sql.functions._

/** Scratch: inline-vs-persisted ANN index timing (test scope). */
object IndexProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter($"vec_id" < 50)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    emb.count() // warm
    time("lsh inline (batch 1)") {
      graft.operators.Similarity.lshTopK(emb, queries, k = 3, dim = 64).count()
    }
    time("lsh inline (batch 2)") {
      graft.operators.Similarity.lshTopK(emb, queries, k = 3, dim = 64).count()
    }
    time("lsh index build (once)") {
      graft.operators.Similarity.buildLshIndex(emb, "probe_lsh_idx", dim = 64); 0L
    }
    time("lsh indexed (batch 1)") {
      graft.operators.Similarity.lshTopKIndexed(spark, "probe_lsh_idx",
        queries, k = 3, dim = 64).count()
    }
    time("lsh indexed (batch 2)") {
      graft.operators.Similarity.lshTopKIndexed(spark, "probe_lsh_idx",
        queries, k = 3, dim = 64).count()
    }
    spark.sql("DROP TABLE IF EXISTS probe_lsh_idx")
  }
}
