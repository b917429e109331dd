package graft

import org.scalatest.funsuite.AnyFunSuite

/** `SparkEntry.runAll` — grouped shared-session execution must be a
  * pure scheduling change: every query's RESULT is identical to
  * running it alone, across the whole registered set.
  */
class RunAllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Order-insensitive, binary-safe canonical form (toJSON renders
    * binary as base64, arrays as JSON arrays — value-stable across
    * runs, unlike Row.toString on Array[Byte]). */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.toJSON.collect().sorted.toSeq

  test("runAll grouped results are identical to sequential, across " +
    "every registered query") {
    val dir = TestSpark.sf0001
    val sequential = SparkEntry.queries.keys.toSeq.sorted.map { n =>
      n -> canon(SparkEntry.queries(n)(spark, dir))
    }.toMap
    val grouped = new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
    SparkEntry.runAll(spark, dir, parallelism = 8) { (name, df) =>
      grouped.put(name, canon(df))
    }
    assert(grouped.size == sequential.size)
    sequential.foreach { case (name, rows) =>
      assert(grouped.get(name) == rows, s"$name diverged under runAll")
    }
  }

  test("withClusterLabelSharing leaves every CC-trio result identical " +
    "to standalone execution, and cleans up its cache") {
    val dir = TestSpark.sf0001
    val trio = Seq("q_dedup_clusters", "q_neardup_prune", "q_cluster_best")
    val standalone = trio.map(n => n -> canon(SparkEntry.queries(n)(spark, dir))).toMap
    SparkEntry.withClusterLabelSharing(spark, dir) {
      SparkEntry.primeClusterLabels(spark, dir)
      trio.foreach { n =>
        assert(canon(SparkEntry.queries(n)(spark, dir)) == standalone(n),
          s"$n diverged under sequential label sharing")
        spark.catalog.clearCache() // the bench isolates queries this way
      }
    }
    // after the scope ends, queries are standalone again (no stale frame)
    trio.foreach { n =>
      assert(canon(SparkEntry.queries(n)(spark, dir)) == standalone(n))
    }
  }

  test("runAll rejects unknown query names and propagates a sink " +
    "failure with the query's name") {
    val dir = TestSpark.sf0001
    intercept[IllegalArgumentException] {
      SparkEntry.runAll(spark, dir, names = Seq("q_no_such"))((_, _) => ())
    }
    val e = intercept[RuntimeException] {
      SparkEntry.runAll(spark, dir,
        names = Seq("q_exact_dedup"))((_, _) => sys.error("sink boom"))
    }
    assert(e.getMessage.contains("q_exact_dedup"), e.getMessage)
  }
}
