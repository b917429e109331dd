package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB swap-ins documented next to the exact profiling
  * operators (`q_value_quantiles`, `Profile.profile`) are
  * `approx_percentile` / `approx_count_distinct`. These specs pin the
  * error actually incurred on the test data, so the documented swap is
  * a measured trade, not a hope.
  */
class ApproxSwapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_percentile tracks exact percentile within the accuracy " +
    "bound on the events table") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val both = ev.groupBy($"event_type")
      .agg(
        percentile($"value", lit(0.5)).as("exact"),
        percentile_approx($"value", lit(0.5), lit(10000)).as("approx"),
        count(lit(1)).as("n"),
        (max($"value") - min($"value")).as("range"))
      .as[(String, Double, Double, Long, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (et, exact, approx, n, range) =>
      // percentile_approx(accuracy=1e4) bounds RANK error by n/accuracy;
      // translate to a value tolerance via the group's value range
      // (generous: assumes worst-case density). On this data the
      // observed error is far smaller.
      val tol = math.max(range * 0.05, 1e-9)
      assert(math.abs(exact - approx) <= tol,
        s"$et: exact=$exact approx=$approx n=$n tol=$tol")
    }
  }

  test("Profile.profile approxDistinct=true swaps in the HLL sketch " +
    "and tracks the exact profile within the rsd bound") {
    val o = Tables.orders(spark, TestSpark.sf0001)
    val cols = Seq("o_custkey", "o_orderstatus")
    val exact = graft.operators.Profile.profile(o, cols, cols).head()
    val approx = graft.operators.Profile.profile(o, cols, cols,
      approxDistinct = true, rsd = 0.02).head()
    // schemas agree column-for-column; non-null counts are exact in
    // BOTH variants (the swap touches only the distinct aggregates)
    assert(exact.schema.fieldNames.toSeq == approx.schema.fieldNames.toSeq)
    assert(approx.getAs[Long]("n_rows") === exact.getAs[Long]("n_rows"))
    cols.foreach { c =>
      assert(approx.getAs[Long](s"nn_$c") === exact.getAs[Long](s"nn_$c"))
      val (e, a) = (exact.getAs[Long](s"nd_$c").toDouble,
        approx.getAs[Long](s"nd_$c").toDouble)
      assert(math.abs(a - e) / e <= 0.06, s"$c: exact=$e approx=$a")
    }
    // and the plan really is the sketch, not the expand-shuffle
    val plan = graft.operators.Profile.profile(o, cols, cols,
      approxDistinct = true).queryExecution.executedPlan.toString
    assert(plan.contains("approx_count_distinct"), plan)
    assert(!plan.contains("Expand"), s"approx variant still expands:\n$plan")
  }

  test("approx_count_distinct tracks exact distinct within its " +
    "standard-error bound on the orders table") {
    val o = Tables.orders(spark, TestSpark.sf0001)
    val (exact, approx) = o.agg(
        countDistinct($"o_custkey").cast("double"),
        approx_count_distinct($"o_custkey", 0.02).cast("double"))
      .as[(Double, Double)].head()
    // rsd=0.02 → 3-sigma relative error 6%
    assert(math.abs(approx - exact) / exact <= 0.06,
      s"exact=$exact approx=$approx")
  }
}
