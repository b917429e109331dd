package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Wall/taskCpu of the q_quality_score projection as a function of the
  * spread width — quantifies the concurrency-induced CPU inflation on
  * this host (spread-CPU investigation, OPTIMIZATION_r17). */
object SpreadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var taskCpu = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        taskCpu += sc.stageInfo.taskMetrics.executorCpuTime
    })
    def q(w: Int) = {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
      val d = if (w == 0) base else base.repartition(w)
      d.select(col("doc_id"),
        length(col("text")).cast("bigint").as("n_chars_calc"),
        TextFunctions.alphaRatio(col("text")).as("alpha_ratio"),
        TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"),
        TextFunctions.meanWordLen(col("text")).as("mean_word_len"),
        TextFunctions.qualityScore(col("text")).as("quality"))
    }
    // warm-up
    q(0).write.mode("overwrite").format("noop").save()
    Seq(0, 2, 4, 8, 16, 32, 0, 8).foreach { w =>
      Thread.sleep(200)
      taskCpu = 0L
      val t0 = System.nanoTime()
      q(w).write.mode("overwrite").format("noop").save()
      // listener events are async; give them a beat
      Thread.sleep(300)
      println(f"width=$w%3d wall=${(System.nanoTime() - t0) / 1e9 - 0.3}%6.3f taskCpu=${taskCpu / 1e9}%7.3f")
    }
    spark.stop()
  }
}
