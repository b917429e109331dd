package graft.tools
import org.apache.spark.sql.SparkSession
object CodegenDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(0))(spark, sfDir)
    val qe = df.queryExecution
    qe.executedPlan.execute().foreach(_ => ())
    val code = org.apache.spark.sql.execution.debug.codegenString(qe.executedPlan)
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/codegen_" + args(0) + ".txt"),
      code.getBytes("UTF-8"))
    println("wrote /tmp/codegen_" + args(0) + ".txt")
    spark.stop()
  }
}
