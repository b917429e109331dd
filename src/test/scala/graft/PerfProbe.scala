package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main (test scope; not shipped). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    // warm the session
    Tables.part(spark, dir).count()

    time("part distinct clone_path") {
      Tables.part(spark, dir).select(
        graft.functions.Normalize.clonePath(col("p_type"), col("p_brand"), col("p_name"))
          .as("clone_path")).dropDuplicates().count()
    }
    time("q_surrogate_ids full") {
      SparkEntry.queries("q_surrogate_ids")(spark, dir).count()
    }
    time("q_surrogate_ids again") {
      SparkEntry.queries("q_surrogate_ids")(spark, dir).count()
    }
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    time("signatures only") {
      graft.operators.NearDup.signatures(docs, "doc_id", "text", 3, 32).count()
    }
    time("q_minhash_pairs full") {
      SparkEntry.queries("q_minhash_pairs")(spark, dir).count()
    }
    time("q_minhash_pairs again") {
      SparkEntry.queries("q_minhash_pairs")(spark, dir).count()
    }
    time("q_ann_lsh full") {
      SparkEntry.queries("q_ann_lsh")(spark, dir).count()
    }
    time("q_ann_lsh again") {
      SparkEntry.queries("q_ann_lsh")(spark, dir).count()
    }
    time("q_top_revenue full") {
      SparkEntry.queries("q_top_revenue")(spark, dir).count()
    }
  }
}
