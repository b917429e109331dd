package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Where does the CPU go? For each named query: run it twice (noop
  * sink, warm second run), and attribute the second run's process-CPU
  * delta across (a) Σ task executorCpuTime, (b) Σ per-task jvmGCTime
  * (wall of GC observed during tasks), (c) the unattributed rest
  * (scheduler, codegen, GC threads beyond task overlap, AQE). Also
  * prints the FINAL adaptive physical plan (after execution) so
  * whole-stage-codegen fusion can be checked — `explain` before
  * execution only shows the AQE initial plan.
  *
  * Diagnostic instrument only (OPTIMIZATION_r17 spread-CPU
  * investigation); never part of a query path. */
object CpuProbe {
  private def processCpuNs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.range(1000000L).selectExpr("sum(id)").collect()

    @volatile var record = false
    val stages = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val m = sc.stageInfo.taskMetrics
          stages += ((sc.stageInfo.stageId, sc.stageInfo.numTasks,
            m.executorCpuTime, m.jvmGCTime, m.executorRunTime,
            m.executorDeserializeCpuTime))
        }
    })

    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // cold run: codegen compile etc.
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      Thread.sleep(300)
      stages.clear()
      val gc0 = {
        val it = gcBeans.iterator(); var s = 0L
        while (it.hasNext) s += it.next().getCollectionTime; s
      }
      record = true
      val c0 = processCpuNs(); val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (processCpuNs() - c0) / 1e9
      record = false
      val gc1 = {
        val it = gcBeans.iterator(); var s = 0L
        while (it.hasNext) s += it.next().getCollectionTime; s
      }
      val taskCpu = stages.map(_._3).sum / 1e9
      val taskGc = stages.map(_._4).sum / 1e3
      val taskRun = stages.map(_._5).sum / 1e3
      val deserCpu = stages.map(_._6).sum / 1e9
      println(f"== $name wall=$wall%.3f processCpu=$cpu%.3f " +
        f"taskCpu=$taskCpu%.3f taskDeserCpu=$deserCpu%.3f " +
        f"taskGcWall=$taskGc%.3f taskRunWall=$taskRun%.3f " +
        f"jvmGcWall=${(gc1 - gc0) / 1e3}%.3f unattributedCpu=${cpu - taskCpu - deserCpu}%.3f")
      stages.sortBy(-_._3).take(8).foreach { case (id, n, c, g, r, d) =>
        println(f"   stage $id%5d tasks=$n%4d cpu=${c / 1e9}%8.3f " +
          f"gc=${g / 1e3}%6.3f run=${r / 1e3}%8.3f deser=${d / 1e9}%6.3f")
      }
      println("---- final plan (post-execution) ----")
      // the noop write above ran a SEPARATE QueryExecution (the write
      // command wraps the query), so execute this frame's own plan to
      // force AQE to final and show codegen fusion
      val qe = fn(spark, sfDir).queryExecution
      qe.executedPlan.execute().foreach(_ => ())
      println(qe.executedPlan.toString.linesIterator.take(40).mkString("\n"))
      println("---- codegen subtrees ----")
      println(org.apache.spark.sql.execution.debug.codegenString(qe.executedPlan)
        .linesIterator.filter(l => l.contains("WholeStageCodegen") ||
          l.contains("Found") || l.startsWith("==")).take(30).mkString("\n"))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
