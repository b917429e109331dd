package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Artifact robustness contract (round-11 lesson): one query failing —
  * or one oracle entry whose SQL STRING cannot even be constructed
  * (e.g. the PSL classpath resource missing from a raw `java -cp
  * classes` launch) — must never zero the round's artifacts. Every
  * query that runs is written; oracle_sql.json is rendered per-entry
  * from SparkEntry.oracleSqlSafe with failures recorded by name in a
  * sibling oracle_failures.json; the process exits non-zero iff
  * anything failed, AFTER writing everything that succeeded. */
object Verify {
  def main(args: Array[String]): Unit = {
    val rc = run(args(0), args(1), args.drop(2).toSet)
    if (rc != 0) sys.exit(rc)
  }

  /** Exit-code-returning body (specs call this directly so a failure
    * cannot kill the test JVM). Returns the number of failed queries
    * plus failed oracle entries. */
  def run(sfDir: String, outDir: String, only: Set[String]): Int = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // getOrCreate reuses a live session (the spec path); only stop a
    // session this run actually created
    val preExisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).exists(!_.sparkContext.isStopped)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // 114 queries x ~10 codegen units thrash the default 100-entry
      // generated-class cache: measured 1708 janino compiles (vs 1225
      // distinct units) and ~260 s extra aggregate JIT work across one
      // grouped pass. Size the cache to hold the whole workload.
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var failedQueries = List.empty[(String, String)]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failedQueries ::= (name -> s"${e.getClass.getName}: ${e.getMessage}")
      }
      // queries are independent: drop anything an operator persisted so
      // cached blocks don't accumulate heap pressure across the run
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + String.valueOf(s).flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Per-entry rendering: even the oracle-map ACCESS is guarded so a
    // failure in base-map construction still yields an artifact with
    // whatever is salvageable plus a named failure record.
    val entries: Seq[(String, Either[String, String])] =
      try SparkEntry.oracleSqlSafe
      catch { case e: Throwable =>
        Seq("__oracle_map__" ->
          Left(s"${e.getClass.getName}: ${e.getMessage}"))
      }
    val ok = entries.collect { case (k, Right(v)) => k -> v }
    val bad = entries.collect { case (k, Left(err)) => k -> err }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      ok.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // failure markers: queries that threw + oracle entries that could
    // not be constructed, by name, in one sibling artifact
    val failJson =
      s"""{"queries": ${failedQueries.reverse
           .map { case (k, e) => s"${q(k)}: ${q(e)}" }.mkString("{", ",", "}")},
         | "oracle_entries": ${bad
           .map { case (k, e) => s"${q(k)}: ${q(e)}" }.mkString("{", ",", "}")}}
         |""".stripMargin
    Files.writeString(Paths.get(s"$outDir/oracle_failures.json"), failJson)
    bad.foreach { case (k, e) =>
      System.err.println(s"[verify] oracle entry $k failed: $e") }
    if (!preExisting) spark.stop()
    failedQueries.size + bad.size
  }
}
