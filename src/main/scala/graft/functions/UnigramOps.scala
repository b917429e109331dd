package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer vocabulary (SentencePiece's model class —
  * Kudo 2018): pieces with log-probabilities in integer MICRO-NATS.
  * Integer scores are the repo's cross-engine discipline — the
  * Viterbi DP below is then pure Long arithmetic, so Spark and the
  * DuckDB oracle segment identically with no float-comparison
  * subtleties (a published float vocab imports exactly via scaled
  * decimal parsing, see [[graft.operators.Unigram.parseSpVocabText]]).
  *
  * Ships to executors once per task binary as an expression reference
  * object (the [[TextHash.hashGramLogit]] weights pattern); the
  * lookup map is built lazily per JVM. */
final class UnigramVocab(val pieces: Array[String], val lpMicro: Array[Long],
                         val unkMicro: Long) extends Serializable {
  require(pieces.length == lpMicro.length,
    s"pieces/scores length mismatch: ${pieces.length} vs ${lpMicro.length}")

  /** Longest piece bounds the DP's inner loop (and the oracle's
    * lookback); ≥1 so the unknown-character fallback always applies. */
  val maxPiece: Int =
    if (pieces.isEmpty) 1 else math.max(1, pieces.iterator.map(_.length).max)

  @transient private lazy val map: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), lpMicro(i)); i += 1 }
    m
  }

  /** lp of `s`, or null when out-of-vocabulary. */
  def lookup(s: String): java.lang.Long = map.get(s)
}

/** Viterbi segmentation kernel for the unigram-LM tokenizer. */
object UnigramOps {

  private val Neg = Long.MinValue / 4

  /** Segment `word` into the max-score piece sequence under `vocab`:
    * dp(i) = max over j of dp(j) + lp(word[j..i)), pieces no longer
    * than `vocab.maxPiece`; an out-of-vocabulary SINGLE character
    * falls back to `vocab.unkMicro` (full coverage — the DP can never
    * dead-end), a longer absent piece is simply not a candidate.
    *
    * Ties break to the SMALLEST split point j — the longest final
    * piece — deterministically: j ascends and only a strictly greater
    * score replaces the incumbent. The oracle's
    * `row_number() OVER (ORDER BY cand DESC, j)` is the same rule.
    *
    * All Long arithmetic: scores are micro-nats, |dp| is bounded by
    * word length × |unkMicro| — no overflow for any real token. */
  def viterbi(word: UTF8String, vocab: UnigramVocab): ArrayData = {
    val w = word.toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val dp = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = Neg
      var bestJ = -1
      var j = math.max(0, i - vocab.maxPiece)
      while (j < i) {
        val lp = vocab.lookup(w.substring(j, i))
        val sc: Long =
          if (lp != null) lp.longValue()
          else if (i - j == 1) vocab.unkMicro
          else Neg
        if (sc != Neg) {
          val cand = dp(j) + sc
          if (cand > best) { best = cand; bestJ = j }
        }
        j += 1
      }
      dp(i) = best
      bp(i) = bestJ
      i += 1
    }
    var count = 0
    var p = n
    while (p > 0) { count += 1; p = bp(p) }
    val out = new Array[Any](count)
    p = n
    var k = count - 1
    while (p > 0) {
      val j = bp(p)
      out(k) = UTF8String.fromString(w.substring(j, p))
      k -= 1
      p = j
    }
    new GenericArrayData(out)
  }
}
