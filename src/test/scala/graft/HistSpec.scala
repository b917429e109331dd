package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hist
import graft.plans.HistExpressions

/** Log-bucketed histogram quantile sketch (plans.HistExpressions):
  * bucket-map algebra, the exact rank contract, the union algebra,
  * and the SQL surface. Quantile arithmetic is oracle-gated via
  * q_hist_quantiles. */
class HistSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucket map: monotone, contiguous over all 1888 buckets, and " +
    "within the 1/32 one-sided relative error everywhere") {
    // every bucket's lower bound maps back to that bucket
    (0 until Hist.NBuckets).foreach { b =>
      assert(Hist.bucket(Hist.lowerBound(b)) == b, s"bucket $b roundtrip")
    }
    // sweep: small range exhaustively, then power-of-two edges
    val values = (0L to 4096L) ++
      (5 to 62).flatMap(e => Seq((1L << e) - 1, 1L << e, (1L << e) + 1)) ++
      Seq(Long.MaxValue)
    var prev = -1
    values.sorted.foreach { v =>
      val b = Hist.bucket(v)
      assert(b >= prev, s"bucket not monotone at $v")
      prev = b
      val lb = Hist.lowerBound(b)
      assert(lb <= v, s"$v: lower bound $lb above value")
      // one-sided relative error: v - lb < bucket width <= v/32
      if (v >= 32) assert(v - lb <= v / 32, s"$v: lb $lb beyond 1/32 error")
      else assert(lb == v, s"$v: low range must be exact")
    }
    intercept[IllegalArgumentException](Hist.bucket(-1L))
  }

  test("quantile equals lowerBound(bucket(sorted(v)(rank))) exactly — " +
    "the bucket map is monotone so bucket order IS value order") {
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(500)(math.abs(rnd.nextLong()) % 2000000L) ++
      Seq(0L, 1L, 31L, 32L, 1L << 40)
    val counters = Hist.emptyCounters()
    vs.foreach(Hist.update(counters, _))
    val sk = Hist.toBytes(counters)
    assert(Hist.count(sk) == vs.size)
    val sorted = vs.sorted
    for (bp <- Seq(0, 1, 2500, 5000, 9000, 9900, 9999, 10000)) {
      val rank = ((vs.size - 1).toLong * bp / 10000L).toInt
      val want = Hist.lowerBound(Hist.bucket(sorted(rank)))
      assert(Hist.quantile(sk, bp) == want, s"bp=$bp")
    }
    intercept[IllegalArgumentException](Hist.quantile(sk, 10001))
    // empty sketch: quantile signals -1 (NULL through the SQL wrapper)
    assert(Hist.quantile(Hist.toBytes(Hist.emptyCounters()), 5000) == -1L)
  }

  test("union of partial sketches is byte-identical to the one-shot " +
    "sketch (the cross-release merge contract)") {
    val df = spark.range(3000)
      .select((col("id") % 5).as("part"), (col("id") * col("id") % 9999L).as("v"))
    val whole = df.agg(HistExpressions.histSketch($"v").as("sk"))
      .as[Array[Byte]].head()
    val merged = df.groupBy("part")
      .agg(HistExpressions.histSketch($"v").as("sk"))
      .agg(HistExpressions.histUnion($"sk").as("sk"))
      .as[Array[Byte]].head()
    assert(java.util.Arrays.equals(whole, merged))
  }

  test("SQL surface: hist_sketch / hist_union / hist_quantile / " +
    "hist_count through the extensions registry") {
    graft.plans.GraftExtensions.register(spark)
    spark.range(100).select(col("id").as("v"), (col("id") % 4).as("g"))
      .createOrReplaceTempView("hist_in")
    val got = spark.sql(
      """SELECT hist_count(sk) AS n, hist_quantile(sk, 5000) AS p50
        |FROM (SELECT hist_union(sk) AS sk FROM (
        |  SELECT g, hist_sketch(v) AS sk FROM hist_in GROUP BY g))""".stripMargin)
      .as[(Long, Long)].head()
    assert(got._1 == 100L)
    // ids 0..99: rank 49 -> value 49, bucket-exact up to 1/32
    assert(got._2 == Hist.lowerBound(Hist.bucket(49L)))
  }

  test("null values are skipped; empty hist_union is null; quantile of " +
    "an empty sketch is null through SQL") {
    val withNull = Seq(Some(7L), None).toDF("v")
      .agg(HistExpressions.histSketch($"v").as("sk")).as[Array[Byte]].head()
    val just7 = Seq(7L).toDF("v")
      .agg(HistExpressions.histSketch($"v").as("sk")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(withNull, just7))
    val empty = Seq.empty[Array[Byte]].toDF("sk")
      .agg(HistExpressions.histUnion($"sk").as("sk")).collect()(0)
    assert(empty.isNullAt(0))
    val emptyQ = Seq(Hist.toBytes(Hist.emptyCounters())).toDF("sk")
      .select(HistExpressions.histQuantile($"sk", lit(5000))).collect()(0)
    assert(emptyQ.isNullAt(0))
  }

  test("corrupt or foreign-geometry sketch headers fail loudly") {
    val bad = java.nio.ByteBuffer.allocate(8).putInt(0).putInt(0).array()
    intercept[IllegalArgumentException](Hist.fromBytes(bad))
    intercept[IllegalArgumentException](Hist.quantile(bad, 5000))
    intercept[IllegalArgumentException](Hist.count(bad))
    // right shift marker, wrong counter count
    val short = java.nio.ByteBuffer.allocate(8 + 8)
      .putInt(Hist.Shift).putInt(Hist.NBuckets).array()
    intercept[IllegalArgumentException](Hist.fromBytes(short))
  }
}
