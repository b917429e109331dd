package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: `runMain graft.tools.TimeOne <query> [n]`
  * — n warm repetitions after one untimed cold run, min/median printed.
  * Same session config as Bench. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
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
    val fn = graft.SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // cold
    spark.catalog.clearCache()
    val times = (1 to n).map { _ =>
      val t = once(); spark.catalog.clearCache(); t
    }.sorted
    println(f"[timeone] $name min=${times.head}%.3f median=${times(n / 2)}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
