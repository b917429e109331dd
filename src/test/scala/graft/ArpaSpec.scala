package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LmScore

/** Order-n ARPA back-off: parser shape, the hand-computed Katz
  * recursion on the bundled order-3 sample, and order-2 parity with
  * the bigram-shaped scorer. */
class ArpaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("loadArpaTextN parses any order: per-order rows, optional " +
    "trailing back-off disambiguated by field count, bad lines loud") {
    val m = LmScore.loadArpaResourceN("/graft/sample_trigram.arpa")
    assert(m.order == 3)
    assert(m.grams(0).length == 14 && m.grams(1).length == 10 &&
      m.grams(2).length == 8)
    assert(m.unkLp == -1.0)
    // a 2-gram WITH back-off vs the one without
    assert(m.grams(1).find(_._1 == Vector("big", "order"))
      .contains((Vector("big", "order"), -0.4, -0.12)))
    assert(m.grams(1).find(_._1 == Vector("the", "order"))
      .contains((Vector("the", "order"), -0.85, 0.0)))
    // highest order carries no back-off field
    assert(m.grams(2).forall(_._3 == 0.0))
    // the order-2 bundled sample parses to order 2 through the same path
    val m2 = LmScore.loadArpaResourceN("/graft/sample_bigram.arpa")
    assert(m2.order == 2 && m2.grams(0).length == 18 &&
      m2.grams(1).length == 12)
    // malformed: wrong field count is rejected, not silently dropped
    val bad = "\\1-grams:\n-1.0 <unk>\n\\2-grams:\n-0.5 only".linesIterator
    assertThrows[IllegalArgumentException](LmScore.loadArpaTextN(bad))
    // duplicate n-gram is rejected (joins would multiply rows)
    val dup = ("\\1-grams:\n-1.0 <unk>\n-0.5 a\n-0.6 a").linesIterator
    assertThrows[IllegalArgumentException](LmScore.loadArpaTextN(dup))
  }

  test("the bigram-shaped compat loader delegates: same rows as " +
    "loadArpaTextN on order<=2, and will not silently hold order 3") {
    val legacy = LmScore.loadArpaResource("/graft/sample_bigram.arpa")
    val n = LmScore.loadArpaResourceN("/graft/sample_bigram.arpa")
    assert(legacy.uni == n.grams(0).map { case (ws, lp, bo) => (ws.head, lp, bo) })
    assert(legacy.bi == n.grams(1).map { case (ws, lp, _) => (ws(0), ws(1), lp) })
    assertThrows[IllegalArgumentException](
      LmScore.loadArpaResource("/graft/sample_trigram.arpa"))
  }

  test("arpaScoreDocsN matches the hand-computed Katz recursion on " +
    "every branch: trigram hit, bigram+bo2, unigram+bo1+bo2, OOV floor, " +
    "missing-context bo=0") {
    val m = LmScore.loadArpaResourceN("/graft/sample_trigram.arpa")
    val docs = Seq(
      // pos4 backs off twice: bo2(order scan)+bo1(scan)+lp1(slow)
      (1L, "big order scan slow"),
      // OOV at pos3: bo2(order scan)+bo1(scan)+lp(<unk>)
      (2L, "order scan zebra"),
      // all three orders hit, incl. the no-backoff bigram "the order"
      (3L, "the order scan"),
      // bigram-match branch: lp2(line column) + bo2(group line)
      (4L, "group line column"),
      // pos2 bigram miss with PRESENT bo1: bo1(scan)+lp1(big); pos3
      // bigram hit under an ABSENT context bigram (bo2=0)
      (5L, "scan big order")
    ).toDF("doc_id", "text")
    val got = LmScore.arpaScoreDocsN(docs, "doc_id", "text", m)
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    def nll(parts: Double*): Double =
      BigDecimal(-parts.sum / parts.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      (1L, nll(-1.4, -0.4, -0.2, -0.3 - 0.1 - 1.65), 4L),
      (2L, nll(-1.1, -0.45, -0.3 - 0.1 - 1.0), 3L),
      (3L, nll(-1.7, -0.85, -0.5), 3L),
      (4L, nll(-1.55, -0.65, -0.06 - 0.75), 3L),
      (5L, nll(-1.15, -0.3 - 1.4, 0.0 - 0.4), 3L)))
  }

  test("order-2 parity: arpaScoreDocsN on the bigram sample equals the " +
    "bigram-shaped arpaScoreDocs on real corpus rows") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(120)
    val legacy = LmScore.arpaScoreDocs(docs, "doc_id", "text",
      LmScore.loadArpaResource("/graft/sample_bigram.arpa"))
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    val general = LmScore.arpaScoreDocsN(docs, "doc_id", "text",
      LmScore.loadArpaResourceN("/graft/sample_bigram.arpa"))
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(general == legacy)
    assert(legacy.nonEmpty)
  }
}
