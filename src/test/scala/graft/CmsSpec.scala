package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Cms
import graft.plans.{CmsExpressions, HashExpressions}

/** Count-min sketch (plans.CmsExpressions): the one-sided guarantee,
  * the union algebra, geometry self-description, and the SQL surface.
  * Estimate arithmetic is oracle-gated via q_cms_counts. */
class CmsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("estimates are NEVER below the exact count (one-sided error), " +
    "and heavy hitters estimate near-exactly on a skewed stream") {
    // zipf-ish: key k appears ceil(2000/k) times, k = 1..200
    val rows = (1 to 200).flatMap(k => Seq.fill(2000 / k)(s"key-$k"))
    val df = rows.toDF("k")
    val sk = df.agg(CmsExpressions.cmsSketch64(
        HashExpressions.fnv64($"k"), 4, 2048).as("sk"))
      .as[Array[Byte]].head()
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, cnt) =>
      val est = Cms.estimate(sk, fnvOf(k))
      assert(est >= cnt, s"$k: est $est < exact $cnt")
    }
    // the top key dominates its buckets: estimate should be exact or
    // within the eps*N bound (N = 14000-ish, w = 2048 -> slack is tiny)
    val n = rows.size
    exact.foreach { case (k, cnt) =>
      val est = Cms.estimate(sk, fnvOf(k))
      assert(est - cnt <= (math.E / 2048 * n).ceil.toLong * 4,
        s"$k: est $est vs exact $cnt beyond bound")
    }
  }

  private def fnvOf(s: String): Long =
    graft.functions.TextHash.fnv64(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))

  test("union of partial sketches is byte-identical to the one-shot " +
    "sketch (the cross-release merge contract)") {
    val df = spark.range(3000)
      .select((col("id") % 5).as("part"), concat(lit("t"), col("id") % 700).as("k"))
    val whole = df.agg(CmsExpressions.cmsSketch64(
        HashExpressions.fnv64($"k"), 4, 2048).as("sk"))
      .as[Array[Byte]].head()
    val merged = df.groupBy("part")
      .agg(CmsExpressions.cmsSketch64(
        HashExpressions.fnv64($"k"), 4, 2048).as("sk"))
      .agg(CmsExpressions.cmsUnion($"sk").as("sk"))
      .as[Array[Byte]].head()
    assert(java.util.Arrays.equals(whole, merged))
  }

  test("geometry rides in the sketch header; mismatched unions fail " +
    "loudly rather than summing misaligned counters") {
    val a = Seq("x").toDF("k").agg(CmsExpressions.cmsSketch64(
      HashExpressions.fnv64($"k"), 4, 2048).as("sk"))
    val b = Seq("x").toDF("k").agg(CmsExpressions.cmsSketch64(
      HashExpressions.fnv64($"k"), 2, 1024).as("sk"))
    val e = intercept[Exception] {
      a.union(b).agg(CmsExpressions.cmsUnion($"sk")).collect()
    }
    assert(e.getMessage != null)
    val (d, w, _) = Cms.fromBytes(a.as[Array[Byte]].head())
    assert(d === 4 && w === 2048)
  }

  test("SQL surface: cms_sketch64 / cms_union / cms_estimate through " +
    "the extensions registry") {
    Seq("a", "a", "a", "b").toDF("k").createOrReplaceTempView("cms_in")
    val got = spark.sql(
      """SELECT k, cms_estimate(sk, fnv64(k)) AS est FROM (
        |  SELECT cms_union(sk) AS sk FROM (
        |    SELECT k AS g, cms_sketch64(fnv64(k), 4, 64) AS sk
        |    FROM cms_in GROUP BY k)),
        |  (SELECT DISTINCT k FROM cms_in)""".stripMargin)
      .as[(String, Long)].collect().toMap
    assert(got("a") >= 3L && got("b") >= 1L)
  }

  test("null hashes are skipped; empty cms_union evaluates to null") {
    val withNull = Seq(Some("x"), None).toDF("k")
      .agg(CmsExpressions.cmsSketch64(HashExpressions.fnv64($"k"), 4, 64)
        .as("sk")).as[Array[Byte]].head()
    val justX = Seq("x").toDF("k")
      .agg(CmsExpressions.cmsSketch64(HashExpressions.fnv64($"k"), 4, 64)
        .as("sk")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(withNull, justX))
    val empty = Seq.empty[Array[Byte]].toDF("sk")
      .agg(CmsExpressions.cmsUnion($"sk").as("sk")).collect()(0)
    assert(empty.isNullAt(0))
  }

  test("corrupt sketch headers fail loudly instead of returning " +
    "plausible counts: d=0 passes the length check, non-power-of-two " +
    "w mis-masks buckets") {
    import graft.functions.Cms
    // d=0, w=0: 8 bytes total, length check alone would accept it and
    // estimate would return Long.MaxValue as a "count"
    val d0 = java.nio.ByteBuffer.allocate(8).putInt(0).putInt(0).array()
    intercept[IllegalArgumentException](Cms.estimate(d0, 123L))
    intercept[IllegalArgumentException](Cms.fromBytes(d0))
    // w=48 (not a power of two) with a length-consistent body
    val w48 = java.nio.ByteBuffer.allocate(8 + 2 * 48 * 8)
      .putInt(2).putInt(48).array()
    intercept[IllegalArgumentException](Cms.estimate(w48, 123L))
    intercept[IllegalArgumentException](Cms.fromBytes(w48))
  }
}
