package graft

import org.apache.spark.sql.functions._

/** Scratch: where does the IVF family's sf3 wall go — skew or flops?
  * Prints the auto-quantizer cell-size distribution and stage
  * timings for the kNN-graph shape at SPARK_GRAFT_SF_DIR. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import graft.operators.Similarity
    import graft.plans.VecExpressions.{nearestCell, nearestCells}
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf3")
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist()
    val n = emb.count()
    val targetCell = 64
    val nlist = math.max(1, ((n + targetCell - 1) / targetCell).toInt)
    println(s"n=$n nlist=$nlist")
    var t0 = System.nanoTime()
    val cents = Similarity.trainQuantizer(emb, nlist, iters = 1,
      idCol = "vec_id", vecCol = "v")
    println(f"train: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val assigned = emb.withColumn("cell", nearestCell(col("v"), cents))
      .groupBy("cell").agg(count(lit(1)).as("c"))
    val stats = assigned.agg(max(col("c")), avg(col("c")),
      expr("percentile(c, 0.99)"), count(lit(1))).head()
    println(f"assign+count: ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
      s"maxCell=${stats.get(0)} avg=${stats.get(1)} p99=${stats.get(2)} nonEmpty=${stats.get(3)}")
    // candidate volume: sum over cells of members * probes-into-cell
    t0 = System.nanoTime()
    val members = emb.withColumn("cell", nearestCell(col("v"), cents))
      .groupBy("cell").agg(count(lit(1)).as("m"))
    val probes = emb.select(explode(nearestCells(col("v"), cents, 4)).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("p"))
    val cand = members.join(probes, "cell")
      .agg(sum(col("m") * col("p")), max(col("m") * col("p"))).head()
    println(f"candidates: ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
      s"total=${cand.get(0)} maxPerCell=${cand.get(1)}")
    emb.unpersist()
  }
}
