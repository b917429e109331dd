package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hll
import graft.plans.{HashExpressions, HllExpressions}

/** The mergeable HLL sketch (plans.HllExpressions): estimator accuracy
  * in both regimes, the union/merge algebra that makes per-release
  * sketch columns composable, null handling, and the SQL surface. The
  * estimate ARITHMETIC is oracle-gated via q_hll_card; these specs pin
  * the properties the oracle can't see at one scale factor. */
class HllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = 9
  private val M = 1 << P

  test("estimate tracks the true distinct count within the theoretical " +
    "error bound (raw-estimator regime, 20k distinct)") {
    val n = 20000L
    // fnv64 of distinct strings = distinct hashed values
    val est = spark.range(n).select(concat(lit("item-"), col("id")).as("s"))
      .agg(HllExpressions.hllCountDistinct(
        HashExpressions.fnv64(col("s")), P).as("e"))
      .as[Double].head()
    // standard error 1.04/sqrt(512) ~ 4.6%; allow 3 sigma
    assert(math.abs(est - n) / n < 0.14, s"est=$est for n=$n")
    // 20k >> 2.5*512: this exercised the raw alpha*m^2/sum branch
    assert(est > 2.5 * M)
  }

  test("linear-counting regime is near-exact at tiny cardinalities") {
    val est = Seq("a", "b", "c", "a", "b").toDF("s")
      .agg(HllExpressions.hllCountDistinct(
        HashExpressions.fnv64(col("s")), P).as("e"))
      .as[Double].head()
    assert(math.round(est) === 3L, s"est=$est for 3 distinct")
  }

  test("union of partial sketches is byte-identical to the one-shot " +
    "sketch, and estimates agree (the cross-release merge contract)") {
    val df = spark.range(5000)
      .select((col("id") % 4).as("part"),
        concat(lit("v"), col("id") % 1700).as("s"))
    val whole = df.agg(HllExpressions.hllSketch64(
        HashExpressions.fnv64(col("s")), P).as("sk"))
      .as[Array[Byte]].head()
    val merged = df.groupBy("part")
      .agg(HllExpressions.hllSketch64(
        HashExpressions.fnv64(col("s")), P).as("sk"))
      .agg(HllExpressions.hllUnion(col("sk"), P).as("sk"))
      .as[Array[Byte]].head()
    assert(java.util.Arrays.equals(whole, merged),
      "register arrays must be identical: sketch(A∪B) == union(sketches)")
    assert(Hll.estimate(whole) === Hll.estimate(merged))
  }

  test("precisions below 7 are rejected: the asymptotic alpha constant " +
    "is biased for m < 128 and small sketches buy nothing") {
    import graft.functions.Hll
    intercept[IllegalArgumentException](Hll.requireP(6))
    intercept[IllegalArgumentException](Hll.requireP(4))
    Hll.requireP(7) // boundary accepted
  }

  test("null inputs are skipped, not registered") {
    val withNulls = Seq(Some("x"), None, Some("y"), None).toDF("s")
    val noNulls = Seq("x", "y").toDF("s")
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.agg(HllExpressions.hllSketch64(
        HashExpressions.fnv64(col("s")), P).as("sk")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(sk(withNulls), sk(noNulls)))
  }

  test("SQL surface: hll_sketch64 / hll_union / hll_estimate work " +
    "through the extensions registry") {
    Seq((1, "a"), (1, "b"), (2, "a"), (2, "c")).toDF("g", "s")
      .createOrReplaceTempView("hll_in")
    val est = spark.sql(
      """SELECT hll_estimate(hll_union(sk, 9)) AS e FROM (
        |  SELECT g, hll_sketch64(fnv64(s), 9) AS sk
        |  FROM hll_in GROUP BY g)""".stripMargin)
      .as[Double].head()
    // a, b, c distinct across groups
    assert(math.round(est) === 3L, s"est=$est")
  }

  test("kernel estimate agrees with a direct register-walk reference") {
    val regs = new Array[Byte](M)
    val rnd = new scala.util.Random(7)
    (0 until 100000).foreach(_ => Hll.update(regs, rnd.nextLong(), P))
    // reference: the published formula computed independently
    val sum = regs.map(r => math.pow(2.0, -r)).sum
    val zeros = regs.count(_ == 0)
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    val raw = alpha * (M.toDouble * M.toDouble) / sum
    val expected =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else raw
    assert(Hll.estimate(regs) === expected)
  }
}
