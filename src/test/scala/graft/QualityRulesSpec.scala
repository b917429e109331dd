package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LmScore, QualityRules}
import graft.operators.QualityRules.GopherParams

class QualityRulesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val good =
    "the quick brown fox jumps with energy and grace that we have " +
      "admired for many long years of steady running through fields"

  test("each Gopher rule independently flips keep") {
    val docs = Seq(
      (1L, good),                                          // passes all
      (2L, "the and of"),                                  // too few words
      (3L, good.replaceAll("\\S+", "ab")),                 // mwl < 3
      (4L, good + " " + Seq.fill(4)("####").mkString(" ")),// symbol ratio
      (5L, good.split(" ").map("- " + _).mkString("\n")),  // bullet lines
      (6L, good.split(" ").map(_ + "...").mkString("\n")), // ellipsis lines
      (7L, good + " " + (1 to 40).map(_.toString).mkString(" ")), // alpha frac
      (8L, (1 to 20).map(i => s"zz$i").mkString(" "))      // no stopwords
    ).toDF("doc_id", "text")
    val p = GopherParams(minWords = 10)
    val kept = QualityRules.gopherSignals(docs, "doc_id", "text", p)
      .filter($"keep").select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
    // and the signals say WHY each failed
    val sig = QualityRules.gopherSignals(docs, "doc_id", "text", p)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(sig(2L).getLong(1) < 10)                        // n_words
    assert(sig(3L).getDouble(2) < 3.0)                     // mean_word_len
    assert(sig(4L).getDouble(3) > 0.1)                     // symbol ratio
    assert(sig(5L).getDouble(4) > 0.9)                     // bullet frac
    assert(sig(6L).getDouble(5) > 0.3)                     // ellipsis frac
    assert(sig(7L).getDouble(6) < 0.8)                     // alpha frac
    assert(sig(8L).getLong(7) < 2)                         // stop hits
  }

  test("gopherFilter keeps exactly the keep=true ids of gopherSignals") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val p = GopherParams(minWords = 10)
    val viaSignals = QualityRules.gopherSignals(docs, "doc_id", "text", p)
      .filter($"keep").select($"doc_id").as[Long].collect().toSet
    val viaFilter = QualityRules.gopherFilter(docs, "text", p)
      .select($"doc_id").as[Long].collect().toSet
    assert(viaFilter == viaSignals)
    assert(viaFilter.nonEmpty && viaFilter.size < 1000)
  }

  test("perplexityBuckets terciles are value-ordered and balanced per language") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val b = LmScore.perplexityBuckets(docs, "doc_id", "text", "lang")
      .select($"lang", $"nll", $"bucket").as[(String, Double, String)]
      .collect()
    assert(b.nonEmpty)
    b.groupBy(_._1).foreach { case (lang, rows) =>
      val byB = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      for (hd <- byB.get("head"); md <- byB.get("middle"))
        assert(hd.max <= md.min, s"$lang head..middle overlap")
      for (md <- byB.get("middle"); tl <- byB.get("tail"))
        assert(md.max <= tl.min, s"$lang middle..tail overlap")
      // terciles over distinct-ish doubles: no bucket dominates
      val n = rows.length
      if (n >= 9) byB.values.foreach(v =>
        assert(v.length <= n * 2 / 3, s"$lang bucket imbalance"))
    }
  }

  test("gopherRepetition matches hand-computed fractions on a crafted doc") {
    import org.apache.spark.unsafe.types.UTF8String
    // "a b a b a b": 11 chars; 2-grams "a b"x3 "b a"x2; 3-grams tie at
    // count 2 / len 5 -> lexicographic min "a b a"; 4-grams "a b a b"x2
    // "b a b a"x1; 5-grams unique -> dup5..10 = 0
    val sig = graft.functions.TextHash
      .gopherRepetition(UTF8String.fromString("a b a b a b"))
      .toDoubleArray()
    assert(sig(0) == 3.0 * 3.0 / 11.0, s"top2 ${sig(0)}")
    assert(sig(1) == 2.0 * 5.0 / 11.0, s"top3 ${sig(1)}")
    assert(sig(2) == 2.0 * 7.0 / 11.0, s"top4 ${sig(2)}")
    assert((3 until 9).forall(sig(_) == 0.0), sig.mkString(","))
    // degenerate repetition fails the battery; a LONG varied doc
    // passes (on short docs even a unique top-4-gram exceeds 16% of
    // the chars — the thresholds presuppose the minWords gate of the
    // A1.1 rules, which is why the batteries compose)
    val varied = (1 to 100).map(i => s"word$i").mkString(" ")
    val docs = Seq((1L, Seq.fill(30)("spam").mkString(" ")), (2L, varied))
      .toDF("doc_id", "text")
    val keep = QualityRules.repetitionSignals(docs, "doc_id", "text")
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    assert(!keep(1L) && keep(2L), keep.toString)
    // a doc with <2 tokens yields all-zero signals and keeps
    val one = QualityRules.repetitionSignals(
      Seq((9L, "solo")).toDF("doc_id", "text"), "doc_id", "text").head()
    assert((1 to 9).forall(one.getDouble(_) == 0.0) && one.getBoolean(10))
  }

  test("gopherRepetition codegen and interpreted eval agree on real docs") {
    import org.apache.spark.unsafe.types.UTF8String
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(40)
    val viaExpr = docs.select($"doc_id",
        graft.plans.HashExpressions.gopherRepetition($"text").as("s"))
      .as[(Long, Seq[Double])].collect()
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(viaExpr.nonEmpty)
    viaExpr.foreach { case (id, s) =>
      val direct = graft.functions.TextHash
        .gopherRepetition(UTF8String.fromString(texts(id))).toDoubleArray().toSeq
      assert(s == direct, s"doc $id")
    }
  }

  test("approxCutoffs=true assigns the same buckets off-boundary (>=90% agreement)") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val exact = LmScore.perplexityBuckets(docs, "doc_id", "text", "lang")
      .select($"doc_id", $"bucket").as[(Long, String)].collect().toMap
    val approx = LmScore.perplexityBuckets(docs, "doc_id", "text", "lang",
        approxCutoffs = true)
      .select($"doc_id", $"bucket").as[(Long, String)].collect().toMap
    assert(approx.keySet == exact.keySet)
    val agree = exact.count { case (id, bk) => approx(id) == bk }
    assert(agree >= exact.size * 9 / 10,
      s"approx/exact bucket agreement $agree/${exact.size}")
  }
}
