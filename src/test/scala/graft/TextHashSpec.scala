package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextHash
import graft.plans.HashExpressions
import org.apache.spark.unsafe.types.UTF8String

class TextHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sim(s: String): Long = TextHash.simhash64(UTF8String.fromString(s))

  test("simhash64 is deterministic and token-order-invariant") {
    assert(sim("a b c") == sim("a b c"))
    assert(sim("a b c") == sim("c b a")) // bag-of-tokens semantics
  }

  test("near-identical docs have small Hamming distance; unrelated docs large") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = base + " extra"
    val far = (100 to 160).map(i => s"tok$i").mkString(" ")
    val hNear = TextHash.hamming64(sim(base), sim(near))
    val hFar = TextHash.hamming64(sim(base), sim(far))
    assert(hNear <= 8, s"near docs hamming=$hNear")
    assert(hFar > 16, s"far docs hamming=$hFar")
  }

  test("winnow64 fingerprint survives edits far from the minimizing gram") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    // same text with a tail edit: min-gram usually unchanged
    val b = a + " tail"
    assert(TextHash.winnow64(UTF8String.fromString(a), 8) ==
      TextHash.winnow64(UTF8String.fromString(b), 8))
  }

  test("codegen and interpreted eval agree (the doGenCode contract)") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(50)
    val viaExpr = docs.select($"doc_id",
        HashExpressions.simhash64($"text").as("h"),
        HashExpressions.winnow64($"text", 8).as("w"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val texts = docs.select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val direct = texts.map { case (id, t) =>
      (id, TextHash.simhash64(UTF8String.fromString(t)),
        TextHash.winnow64(UTF8String.fromString(t), 8))
    }
    assert(viaExpr == direct)
  }

  test("hashGramLogit matches the plain-Scala interleaved replay and " +
    "canonicalizes separators in bigrams") {
    val weights = graft.operators.Classify.seededWeights(1024, seed = 7L)
    def naive(s: String): Double = {
      val toks = "\\S+".r.findAllIn(s).toVector
      def bucket(f: String): Int = java.lang.Math.floorMod(
        TextHash.fnv64(UTF8String.fromString(f)), 1024).toInt
      // EXACT kernel order: uni0, then (bi(i-1,i), uni(i)) per token
      val feats = toks.zipWithIndex.flatMap { case (t, i) =>
        if (i == 0) Seq(bucket(t))
        else Seq(bucket(toks(i - 1) + " " + t), bucket(t))
      }
      feats.foldLeft(0.0)((a, b) => a + weights(b))
    }
    def kernel(s: String): Double =
      TextHash.hashGramLogit(UTF8String.fromString(s), weights)
    assert(kernel("") == 0.0)
    assert(kernel(" \t\n ") == 0.0)
    assert(kernel("one") == naive("one"))
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val doc = (0 until rnd.nextInt(60))
        .map(_ => s"w${rnd.nextInt(40)}").mkString(" ")
      assert(kernel(doc) == naive(doc), s"doc=$doc") // bitwise ==
    }
    // a bigram hashes its tokens joined by ONE space regardless of the
    // original separator run
    assert(kernel("alpha\t\tbeta") == kernel("alpha beta"))
    assert(kernel("alpha \n beta") == kernel("alpha beta"))
  }

  test("seededWeights is deterministic, in (-1, 1), and the expression " +
    "codegen path equals direct kernel calls") {
    val w = graft.operators.Classify.seededWeights(256, seed = 3L)
    assert(w.toSeq == graft.operators.Classify.seededWeights(256, 3L).toSeq)
    assert(w.forall(x => x > -1.0 && x < 1.0))
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(50)
    val viaExpr = docs.select($"doc_id",
        HashExpressions.hashGramLogit($"text", w).as("l"))
      .as[(Long, Double)].collect().toSeq.sortBy(_._1)
    val direct = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
      .map { case (id, t) =>
        (id, TextHash.hashGramLogit(UTF8String.fromString(t), w)) }
    assert(viaExpr == direct)
  }

  test("cleanLines matches the plain-Scala C4 line rules on handcrafted " +
    "edges and random structured docs") {
    def naiveKeep(l: String, minWords: Int): Boolean = {
      val trimmed = l.replaceAll("[ \t\r\f]+$", "")
      trimmed.nonEmpty &&
        "[.!?\"]$".r.findFirstIn(trimmed).isDefined &&
        "[^ \t\r\f]+".r.findAllIn(l).size >= minWords &&
        !l.toLowerCase.contains("javascript") &&
        !l.contains("{") && !l.contains("}")
    }
    def naive(s: String, minWords: Int): String =
      s.split("\n", -1).filter(naiveKeep(_, minWords)).mkString("\n")
    def kernel(s: String, minWords: Int): String =
      TextHash.cleanLines(UTF8String.fromString(s), minWords).toString
    val edges = Seq(
      "",                                        // empty -> ""
      "just two.",                               // < minWords
      "this line survives fine.",                // kept
      "this one ends well!",                     // '!' terminal
      "does it end well?",                       // '?' terminal
      "he said \"quoted.\"",                     // '"' terminal
      "ends with punct but { brace }.",          // brace -> dropped
      "enable JavaScript to continue.",          // mixed case -> dropped
      "jjavascript restart still matches here.", // KMP restart
      "javajavascript double prefix drops too.", // KMP restart mid-word
      "trailing blanks survive the rtrim.   \t", // rtrim then '.'
      "no terminal punctuation here",            // dropped
      "   \t  ",                                 // blank-only line
      "one.\nsecond line is retained too.\nbad\nfourth line stays in order.")
    edges.foreach { s =>
      assert(kernel(s, 3) == naive(s, 3), s"text=${s.replace("\n", "\\n")}")
    }
    val rnd = new scala.util.Random(11)
    (1 to 100).foreach { _ =>
      val doc = (0 until rnd.nextInt(12)).map { _ =>
        val words = (0 until rnd.nextInt(6))
          .map(_ => s"w${rnd.nextInt(30)}").mkString(" ")
        words + (rnd.nextInt(5) match {
          case 0 => ""
          case 1 => " javascript."
          case 2 => " { x }."
          case 3 => "!"
          case _ => "."
        })
      }.mkString("\n")
      assert(kernel(doc, 3) == naive(doc, 3), s"doc=${doc.replace("\n", "\\n")}")
    }
  }

  test("cleanLines codegen and interpreted eval agree") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(50)
      .select($"doc_id",
        regexp_replace($"text", " (\\w+ \\w+ \\w+)", ".\n$1").as("text"))
    val viaExpr = docs.select($"doc_id",
        HashExpressions.cleanLines($"text", 3).as("c"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val direct = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
      .map { case (id, t) =>
        (id, TextHash.cleanLines(UTF8String.fromString(t), 3).toString) }
    assert(viaExpr == direct)
  }

  test("fnv64 matches the published FNV-1a test vector") {
    // FNV-1a 64 of empty input is the offset basis
    assert(TextHash.fnv64(Array.emptyByteArray, 0, 0) == 0xcbf29ce484222325L)
    // published vector: fnv1a64("a") = 0xaf63dc4c8601ec8c
    assert(TextHash.fnv64("a".getBytes("UTF-8"), 0, 1) == 0xaf63dc4c8601ec8cL)
  }

  test("repRatio64 matches the naive count-bigram-strings reference " +
    "(100 random docs + edge cases)") {
    def naive(s: String): Double = {
      val toks = "\\S+".r.findAllIn(s).toVector
      if (toks.length < 2) -1.0
      else {
        val grams = toks.sliding(2).map(_.mkString(" ")).toVector
        grams.groupBy(identity).values.map(_.size).max.toDouble / grams.size
      }
    }
    def kernel(s: String): Double =
      TextHash.repRatio64(UTF8String.fromString(s))
    assert(kernel("") == -1.0)
    assert(kernel("one") == -1.0)
    assert(kernel("a b") == 1.0)
    assert(kernel("a b a b a b") == naive("a b a b a b")) // 3× "a b", 2× "b a"
    assert(kernel("  spaced\t\tout \n tokens  ") == naive("  spaced\t\tout \n tokens  "))
    // vertical tab (0x0B) is \s in Java regex — the kernel must split on
    // it too (round-4 advice: it previously joined the two tokens)
    assert(kernel("ab a b") == naive("ab a b"))
    assert(kernel("xy") == naive("xy"))
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      // small vocab forces real bigram repetition
      val s = List.fill(2 + rnd.nextInt(200))(s"w${rnd.nextInt(8)}").mkString(" ")
      assert(kernel(s) == naive(s), s"doc: $s")
    }
  }

  test("repRatio64 codegen and interpreted eval agree") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(50)
    val viaExpr = docs.select($"doc_id",
        HashExpressions.repRatio64($"text").as("r"))
      .as[(Long, Double)].collect().toSeq.sortBy(_._1)
    val direct = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
      .map { case (id, t) => (id, TextHash.repRatio64(UTF8String.fromString(t))) }
    assert(viaExpr == direct)
  }

  test("property: simhash of any token permutation is identical (100 seeds)") {
    val rnd = new scala.util.Random(42)
    (1 to 100).foreach { _ =>
      val ts = List.fill(2 + rnd.nextInt(10))(
        rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
      val s1 = ts.mkString(" ")
      val s2 = rnd.shuffle(ts).mkString(" ")
      assert(sim(s1) == sim(s2), s"'$s1' vs '$s2'")
    }
  }
}
