package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc q_scd2_versions plan prober: times the shipped shape (agg
  * shuffles on (key, date), window re-shuffles on key) against the
  * subset-partitioned shape (one explicit repartition on the key that
  * BOTH the aggregation and the window reuse — HashPartitioning on a
  * subset of the grouping keys satisfies ClusteredDistribution, so the
  * agg plans no second exchange). Prints both executed plans and
  * min/median timings. `runMain graft.tools.Scd2Probe [n]` */
object Scd2Probe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Scd2

    def orders = spark.read.parquet(s"$sfDir/orders.parquet")

    def current() = {
      val changes = orders
        .groupBy(col("o_custkey"), col("o_orderdate").cast("date").as("d"))
        .agg(max(col("o_totalprice")).as("price"))
      Scd2.versionize(changes, Seq("o_custkey"), "d")
        .select(col("o_custkey"), col("valid_from"), col("valid_to"), col("price"))
    }
    def subsetPart() = {
      val changes = orders
        .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
        .repartition(col("o_custkey"))
        .groupBy(col("o_custkey"), col("o_orderdate").cast("date").as("d"))
        .agg(max(col("o_totalprice")).as("price"))
      Scd2.versionize(changes, Seq("o_custkey"), "d")
        .select(col("o_custkey"), col("valid_from"), col("valid_to"), col("price"))
    }

    def time(mk: () => org.apache.spark.sql.DataFrame): Seq[Double] = {
      mk().write.mode("overwrite").format("noop").save() // cold
      (1 to n).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
    }
    println("=== current plan ===")
    println(current().queryExecution.executedPlan.toString.take(4000))
    println("=== subset-partitioned plan ===")
    println(subsetPart().queryExecution.executedPlan.toString.take(4000))
    val a = time(() => current())
    val b = time(() => subsetPart())
    println(f"[scd2probe] sf=$sfDir current   min=${a.head}%.3f median=${a(n / 2)}%.3f")
    println(f"[scd2probe] sf=$sfDir subsetPt  min=${b.head}%.3f median=${b(n / 2)}%.3f")
    // sanity: identical results
    val ca = current().orderBy("o_custkey", "valid_from").collect()
    val cb = subsetPart().orderBy("o_custkey", "valid_from").collect()
    println(s"[scd2probe] rows=${ca.length} equal=${ca.sameElements(cb)}")
    spark.stop()
  }
}
