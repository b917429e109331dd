package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{UnigramOps, UnigramVocab}
import graft.operators.{Bpe, Unigram}
import graft.operators.Unigram.Piece
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer (SentencePiece family): Viterbi kernel,
  * seed-vocabulary derivation, published-format import, and the
  * word-cache encode path. */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seg(word: String, pieces: Seq[Piece], unk: Long): Seq[String] = {
    val v = Unigram.vocabOf(pieces, unk)
    val arr = UnigramOps.viterbi(UTF8String.fromString(word), v)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("viterbi picks the max-score segmentation (hand-computed)") {
    val vocab = Seq(Piece("ab", -10L), Piece("bc", -4L),
      Piece("a", -3L), Piece("c", -5L))
    // a+bc = -7 beats ab+c = -15 and a+unk(b)+c = -15
    assert(seg("abc", vocab, unk = -7L) == Seq("a", "bc"))
  }

  test("viterbi tie-break prefers the smaller split point (longer piece)") {
    // "ab" as one piece scores -5; a(-3)+b(-2) also -5 -> j=0 wins
    val vocab = Seq(Piece("ab", -5L), Piece("a", -3L), Piece("b", -2L))
    assert(seg("ab", vocab, unk = -99L) == Seq("ab"))
  }

  test("viterbi unknown-character fallback covers any input; in-vocab " +
    "single chars use their own score") {
    // x,y OOV -> unk each; 'a' in vocab at -1 (better than unk -6)
    val vocab = Seq(Piece("a", -1L))
    assert(seg("xay", vocab, unk = -6L) == Seq("x", "a", "y"))
    // unk so expensive that a multi-char piece spanning them wins
    val v2 = Seq(Piece("xay", -100L))
    assert(seg("xay", v2, unk = -60L) == Seq("xay"))
    assert(seg("", vocab, unk = -6L) == Seq())
  }

  test("parseSpVocabText: exact scaled-decimal import, comments skipped, " +
    ">6 decimals loud") {
    val got = Unigram.parseSpVocabText(
      "# comment\nwindow\t-2.718281\nab\t-3\ncd\t-0.5\n")
    assert(got == Seq(Piece("window", -2718281L), Piece("ab", -3000000L),
      Piece("cd", -500000L)))
    val e = intercept[IllegalArgumentException] {
      Unigram.parseSpVocabText("x\t-1.2345678\n")
    }
    assert(e.getMessage.contains("6 decimals"))
    intercept[IllegalArgumentException] {
      Unigram.parseSpVocabText("noseparator\n")
    }
  }

  test("bundled sample vocab loads and segments corpus words as expected") {
    val pieces = Unigram.loadSpVocabResource("/graft/unigram_vocab_sample.tsv")
    assert(pieces.exists(p => p.piece == "window" && p.lpMicro == -2718281L))
    // window as ONE piece (-2.718281) beats win+dow (-7.75)
    assert(seg("window", pieces, unk = -12000000L) == Seq("window"))
    assert(seg("spark", pieces, unk = -12000000L) == Seq("spark"))
  }

  test("seedVocab: weights, scores, and lexicographic tie-break") {
    val words = Seq(("abcd", 10L), ("bcd", 5L)).toDF("w", "cnt")
    val got = Unigram.seedVocab(words, minLen = 2, maxLen = 4, topK = 100)
      .orderBy(col("weight").desc, col("piece"))
      .as[(String, Long, Long)].collect().toSeq
    // bc, cd appear in both words (15); ab only in abcd (10); bcd in both
    val m = got.map(r => r._1 -> (r._2, r._3)).toMap
    assert(m("bc") == (15L, 15L - (1000000L + 800000L)))
    assert(m("cd")._1 == 15L)
    assert(m("ab")._1 == 10L)
    assert(m("bcd") == (15L, 15L - (1000000L + 1200000L)))
    assert(m("abcd")._1 == 10L)
    // ties at weight 15: bc < bcd < cd lexicographically
    val at15 = got.filter(_._2 == 15L).map(_._1)
    assert(at15 == Seq("bc", "bcd", "cd"))
  }

  test("encodeDocs: word-cache Viterbi reassembles documents in order " +
    "and the vocab is the broadcast build side") {
    val docs = Seq((1L, "spark window spark"), (2L, "slow table"))
      .toDF("doc_id", "text")
    val pieces = Unigram.loadSpVocabResource("/graft/unigram_vocab_sample.tsv")
    val enc = Unigram.encodeDocs(docs, "doc_id", "text", pieces,
      unkMicro = -12000000L)
    val got = enc.orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "spark window spark", 3L),
      (2L, "slow table", 2L)))
    val plan = enc.queryExecution.optimizedPlan.toString
    assert(plan.contains("ResolvedHint") || enc.queryExecution.sparkPlan
      .toString.contains("BroadcastHashJoin"),
      s"vocab should broadcast:\n$plan")
  }

  // ---- emRounds (hard-EM / Viterbi-EM) -----------------------------------

  /** Optimal Viterbi log-likelihood of a word table under a vocab, in
    * nats (Σ cnt · score/1e6) — the kernel's own segmentation scored
    * by the same vocab, so this IS the hard-EM objective. */
  private def trainLL(words: Seq[(String, Long)], pieces: Seq[Piece],
                      unk: Long): Double = {
    val v = Unigram.vocabOf(pieces, unk)
    val lp = pieces.map(p => p.piece -> p.lpMicro).toMap
    words.map { case (w, cnt) =>
      val s = seg(w, pieces, unk)
        .map(p => lp.getOrElse(p, unk)).sum
      cnt.toDouble * s / 1e6
    }.sum
  }

  test("emRounds: hand-computed mass redistribution — an unused seed " +
    "piece drops out and the survivor re-estimates to ln(1)=0") {
    val words = Seq(("abab", 4L), ("ab", 2L)).toDF("w", "cnt")
    // seed: "ab" cheap, "abab" expensive -> round-1 Viterbi uses only
    // "ab" (ab+ab = -0.2 beats abab = -3.0); "abab" gets zero count
    // and drops; "ab" holds ALL the mass -> lp = floor(1e6·ln(1)) = 0
    val seed = Seq(Piece("ab", -100000L), Piece("abab", -3000000L))
    val got = Unigram.emRounds(words, seed, unkMicro = -2500000L, rounds = 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("ab", 10L, 0L)))
  }

  test("emRounds: hard-EM training likelihood is non-decreasing round " +
    "over round, and the trained vocab beats the round-1 estimate on " +
    "HELD-OUT words") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val train = docs.where($"doc_id" % 2 === 0)
    val heldout = docs.where($"doc_id" % 2 =!= 0)
    val trainWords = Bpe.wordCounts(train, "text")
    val heldWords = Bpe.wordCounts(heldout, "text")
      .as[(String, Long)].collect().toSeq
    val unk = -2500000L
    val seed = Unigram.collectVocab(Unigram.seedVocab(trainWords, topK = 200))
    val em1 = Unigram.collectVocab(
      Unigram.emRounds(trainWords, seed, unk, rounds = 1))
    val em2 = Unigram.collectVocab(
      Unigram.emRounds(trainWords, seed, unk, rounds = 2))
    val trainSeq = trainWords.as[(String, Long)].collect().toSeq
    // monotonicity on the training objective (EM guarantee; em1/em2
    // are both PROPER ln(cnt/total) probability vocabs — the seed's
    // surrogate scores are not a likelihood and are not compared)
    val ll1 = trainLL(trainSeq, em1, unk)
    val ll2 = trainLL(trainSeq, em2, unk)
    assert(ll2 >= ll1 - 1e-9, s"training LL decreased: $ll1 -> $ll2")
    // the trained vocab generalizes: held-out NLL does not get worse,
    // and the round moved the estimates (not a fixed point of the seed)
    val h1 = -trainLL(heldWords, em1, unk)
    val h2 = -trainLL(heldWords, em2, unk)
    assert(h2 <= h1 + 1e-9, s"held-out NLL got worse: $h1 -> $h2")
    assert(em1.toSet != seed.toSet, "EM round left the seed unchanged")
  }

  test("seeded-vocab encode improves compression over all-unknown " +
    "(sanity of the surrogate scores)") {
    val docs = Seq((1L, "window window stream customer")).toDF("doc_id", "text")
    val words = Bpe.wordCounts(docs, "text")
    val vocab = Unigram.collectVocab(
      Unigram.seedVocab(words, topK = 50))
    val enc = Unigram.encodeDocs(docs, "doc_id", "text", vocab,
      unkMicro = -2500000L)
    val n = enc.head().getAs[Long]("n_subwords")
    // 4 words, 26 chars: multi-char pieces must beat char-per-char
    assert(n < 26, s"expected sub-character-count segmentation, got $n")
  }
}
