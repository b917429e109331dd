package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Decontaminate
import graft.plans.HashExpressions

/** Bloom-prefiltered decontamination: exactness (vs the plain
  * broadcast-semi-join policy), fpp-independence, and plan shape. */
class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus() = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "one two three nine four five six"),            // clean: no 5-shingle shared
    (3L, "x alpha beta gamma delta epsilon tail words"), // shares 1-shingle
    (4L, "totally unrelated content with many words here"),
    (5L, "one two three four five of a kind"),           // shares 1-shingle
    (6L, "short doc")                                    // <k tokens: whole-span shingle
  ).toDF("doc_id", "text")

  private def eval_() = Seq(
    "alpha beta gamma delta epsilon",
    "one two three four five",
    "short doc"
  ).toDF("text")

  private def plainPolicy(c: org.apache.spark.sql.DataFrame,
                          e: org.apache.spark.sql.DataFrame) = {
    val evalSh = e.select(
      explode(HashExpressions.shingles64(col("text"), 5)).as("sh")).distinct()
    val docSh = c.select(col("doc_id"),
      explode(HashExpressions.shingles64(col("text"), 5)).as("sh"))
    val bad = docSh.join(broadcast(evalSh), Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
    c.join(bad, Seq("doc_id"), "left_anti")
  }

  test("decontaminateBloom equals the plain policy exactly, across fpp " +
    "extremes (false positives must die in the verify join)") {
    val c = corpus(); val e = eval_()
    val expected = plainPolicy(c, e).select("doc_id").as[Long]
      .collect().sorted
    assert(expected.toSeq == Seq(2L, 4L)) // sanity: 1,3,5,6 contaminated
    for (fpp <- Seq(0.5, 0.01, 1e-6)) {
      val got = Decontaminate
        .decontaminateBloom(c, "doc_id", "text", e, "text", 5, fpp)
        .select("doc_id").as[Long].collect().sorted
      assert(got.toSeq == expected.toSeq, s"fpp=$fpp")
    }
  }

  test("expectedItems undersizing degrades fpp, never correctness") {
    val c = corpus(); val e = eval_()
    val got = Decontaminate.decontaminateBloom(c, "doc_id", "text",
        e, "text", 5, fpp = 0.01, expectedItems = Some(1L))
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 4L))
  }

  test("clean eval set drops nothing; fully-contaminating eval drops all") {
    val c = corpus()
    val clean = Seq("words never appearing in the corpus at all ok")
      .toDF("text")
    assert(Decontaminate.decontaminateBloom(c, "doc_id", "text",
      clean, "text", 5, 0.01).count() == c.count())
    val all = c.select(col("text"))
    assert(Decontaminate.decontaminateBloom(c, "doc_id", "text",
      all, "text", 5, 0.01).count() == 0)
  }

  test("decontaminateSpans removes exactly the covered token spans and " +
    "keeps the rest (doc survives where the binary policy drops it)") {
    val c = Seq(
      // eval 5-gram planted mid-doc: tokens 2..6 (0-based) covered
      (1L, "keep1 keep2 alpha beta gamma delta epsilon keep3 keep4"),
      (2L, "one two three nine four five six"), // clean
      (3L, "alpha beta gamma delta epsilon"),   // fully covered -> ""
      (4L, "tiny doc")                          // <5 tokens: untouched
    ).toDF("doc_id", "text")
    val e = Seq("alpha beta gamma delta epsilon").toDF("text")
    val got = Decontaminate
      .decontaminateSpans(c, "doc_id", "text", e, "text", 5)
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "keep1 keep2 keep3 keep4")
    assert(got(2L) === "one two three nine four five six")
    assert(got(3L) === "")
    assert(got(4L) === "tiny doc")
    // contrast: the binary policy would have dropped docs 1 and 3
    val binary = plainPolicy(c, e).select("doc_id").as[Long].collect().sorted
    assert(binary.toSeq === Seq(2L, 4L))
  }

  test("decontaminateSpans: overlapping matches merge their covered " +
    "ranges; every corpus row comes back exactly once") {
    // eval shares a 6-token run -> two overlapping 5-windows in doc 1,
    // covering tokens 1..6 as ONE range
    val c = Seq(
      (1L, "k1 alpha beta gamma delta epsilon zeta k2"),
      (2L, "nothing shared here at all five tokens")).toDF("doc_id", "text")
    val e = Seq("alpha beta gamma delta epsilon zeta").toDF("text")
    val out = Decontaminate
      .decontaminateSpans(c, "doc_id", "text", e, "text", 5)
    assert(out.count() === 2)
    val got = out.as[(Long, String)].collect().toMap
    assert(got(1L) === "k1 k2")
  }

  test("plan: the bloom probe is a codegen filter on the corpus scan " +
    "side, below the verify join") {
    val df = Decontaminate.decontaminateBloom(corpus(), "doc_id", "text",
      eval_(), "text", 5, 0.01)
    df.collect() // finalize the adaptive plan so codegen stages are applied
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"bloom probe missing from plan:\n$plan")
    // the probing Filter must sit in a WholeStageCodegen span (the
    // `*(n)` simple-string prefix), not an interpreted fallback
    val probeLines = plan.linesIterator
      .filter(l => l.contains("bloom_might_contain") && l.contains("Filter"))
      .toSeq
    // (the adaptive plan string echoes the initial plan below the
    // final one, so assert the FINAL copies carry the `*(n)` marker)
    assert(probeLines.exists(l =>
      l.trim.matches("""^[+:\-\s]*\*\(\d+\).*""")),
      s"bloom probe Filter not codegen'd:\n${probeLines.mkString("\n")}")
  }
}
