package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: session/codegen infra + file-index init, so the
    // alphabetically-first query doesn't absorb one-time session cost
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val cold = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // the noop sink materializes EVERY output column (count() would
      // let the optimizer prune unreferenced projections, under-timing
      // expression-heavy queries); two runs, min reported — steady-state
      // plan execution, mirroring the DuckDB baseline's warm second run
      // and amortizing one-time janino codegen compile out of the number
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        val t1 = once()
        val t2 = once()
        cold(name) = t1
        timings(name) = math.min(t1, t2)
      } catch {
        case e: Throwable =>
          // a failed query is reported as failed (-1), never as a timing
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          timings(name) = -1.0
          failed += name
      }
      // queries are independent: drop anything an operator persisted so
      // cached blocks don't build heap pressure that taxes later queries
      spark.catalog.clearCache()
    }
    val qs = timings.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = timings.values.filter(_ >= 0).sum
    val coldTotal = cold.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"cold_total":$coldTotal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
