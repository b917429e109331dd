package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc grouped-makespan prober:
  * `runMain graft.tools.GroupedProbe [exclude:a,b,c | only:a,b,c]` —
  * times `SparkEntry.runAll` (12-way, LPT not applied: name order)
  * over the full query set minus `exclude:` (or just `only:`), after
  * one warm-up sequential pass of nothing. Used to bisect grouped-pass
  * regressions to a query subset. */
object GroupedProbe {
  /** Janino codegen churn + JVM compile/memory evidence, read from the
    * in-process metric registries: distinguishes "the work got slower"
    * from "the session re-compiles the same generated classes". */
  private def jvmEvidence(label: String): Unit = {
    import scala.jdk.CollectionConverters._
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getName.contains("CodeHeap") || p.getName.contains("Metaspace"))
      .map(p => f"${p.getName}=${p.getUsage.getUsed / 1024 / 1024}MB")
      .mkString(" ")
    println(s"[groupedprobe:$label] janino_compiles=${cg.METRIC_COMPILATION_TIME.getCount} " +
      f"janino_ms_mean=${cg.METRIC_COMPILATION_TIME.getSnapshot.getMean}%.1f " +
      s"jit_ms=${jit.getTotalCompilationTime} $pools")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("GROUPED_CODEGEN_CACHE", "4000"))
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val all = graft.SparkEntry.queries.keys.toSeq.sorted
    val names = args.headOption match {
      case Some(s) if s.startsWith("exclude:") =>
        val ex = s.stripPrefix("exclude:").split(",").toSet
        all.filterNot(ex)
      case Some(s) if s.startsWith("only:") =>
        val names = s.stripPrefix("only:").split(",").toSeq
        val unknown = names.filterNot(graft.SparkEntry.queries.keySet)
        require(unknown.isEmpty,
          s"unknown query names in only: ${unknown.mkString(", ")} " +
            "(see graft.SparkEntry.queries.keySet)")
        names
      case _ => all
    }
    if (sys.env.get("GROUPED_WARM").contains("seq")) {
      names.foreach { n =>
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
      }
      val rddInfo = spark.sparkContext.getRDDStorageInfo
      println(s"[groupedprobe] sequential warm pass done; persisted RDDs: ${rddInfo.length}, " +
        s"mem: ${rddInfo.map(_.memSize).sum / 1024 / 1024} MB, " +
        s"disk: ${rddInfo.map(_.diskSize).sum / 1024 / 1024} MB")
    }
    jvmEvidence("pre")
    val t0 = System.nanoTime()
    val par = sys.env.getOrElse("GROUPED_PAR", "12").toInt
    graft.SparkEntry.runAll(spark, sfDir, par, names)((_, df) =>
      df.write.mode("overwrite").format("noop").save())
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[groupedprobe] n=${names.size} makespan=$sec%.1f s")
    jvmEvidence("post")
    spark.stop()
  }
}
