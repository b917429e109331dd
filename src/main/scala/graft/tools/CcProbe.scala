package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase decomposition of the CC-trio labeling cost
  * (`runMain graft.tools.CcProbe [sfDir] [reps]`): times the pair
  * generation alone (noop sink), then connectedComponents end to end,
  * printing the round count — the evidence base for the prime-phase
  * (`cc_labels_sec`) optimization work. Same session config as Bench. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val jumps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val mutated = docs.select((col("doc_id") + 100000L).as("doc_id"),
      regexp_replace(col("text"), "\\s+\\S+$", "").as("text"))
    val corpus = docs.unionByName(mutated)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val pairs = graft.operators.NearDup.simhashPairs(
        corpus, "doc_id", "text", maxHamming = 3)
      pairs.write.mode("overwrite").format("noop").save()
      val t1 = System.nanoTime()
      val (labels, rounds) = graft.operators.Dedup.connectedComponentsWithRounds(
        corpus.select(col("doc_id")), pairs, "doc_id", "id_a", "id_b",
        jumps = jumps)
      labels.write.mode("overwrite").format("noop").save()
      val t2 = System.nanoTime()
      println(f"[ccprobe] rep$i pairs=${(t1 - t0) / 1e9}%.2f s " +
        f"cc=${(t2 - t1) / 1e9}%.2f s rounds=$rounds")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
