package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** SUBWORD fastText inference — the kernel that makes the published
  * lid.176-class language-ID models importable (reference surface:
  * fastText's public model format and scoring, Joulin et al. 2016 /
  * Bojanowski et al. 2017): word-level import (`Classify
  * .parseFastTextDump`) linearizes onto the hashed-gram kernel, but
  * subword models derive features from fastText's OWN char-n-gram
  * hash, so they need this second kernel.
  *
  * Scoring is fastText's bilinear form kept FACTORED — hidden =
  * Σ input rows over the token's feature ids, logit_l = output_l ·
  * hidden — NOT per-label linearization: linearizing a subword model
  * materializes (nwords+bucket)·L weights (gigabytes for lid.176's
  * 2M-bucket × 176 labels), while the factored form is the model's
  * own footprint, broadcast once per executor as an expression
  * reference object, with per-row cost O(feats·dim + L·dim).
  *
  * Feature ids per token, exactly fastText's `Dictionary`:
  *  - an in-vocab word contributes its word id AND (when maxn > 0)
  *    its char-n-gram bucket ids; out-of-vocab words contribute the
  *    n-grams only; with maxn == 0 OOV words contribute nothing;
  *  - n-grams are computed over `<word>` (BOW/EOW markers), stepping
  *    by UTF-8 CHARS but hashing the raw BYTES of each char-aligned
  *    slice, n in [minn, maxn], excluding the single-char `<` / `>`
  *    boundary grams (the `n==1 && (i==0 || j==size)` rule);
  *  - the hash is fastText's FNV-1a-32 with SIGN-EXTENDED byte XOR
  *    (`h ^ uint32_t(int8_t(b))` — bytes ≥ 0x80 flip the high bits;
  *    [[hash32]] reproduces it bit-exactly), bucket id = nwords +
  *    (h mod bucket) on the UNSIGNED value.
  *
  * EOS semantics follow `Dictionary::getLine` exactly: when `</s>`
  * is in the dict, its word id is appended to every line's feature
  * ids (fastText's readWord emits EOS at end-of-line, and its
  * precomputed subwords are the word id ALONE — initNgrams skips
  * char n-grams for EOS), so each line gains the EOS input row in
  * the hidden sum — dropping it would shift every logit by the
  * label-DEPENDENT constant output_l · input_EOS and can flip
  * argmax, especially on short texts. A literal `</s>` token inside
  * the text TERMINATES the line (getLine breaks at EOS after adding
  * its word id), so trailing tokens are ignored; a dict without
  * `</s>` contributes nothing (computeSubwords is skipped for EOS).
  *
  * Documented deviations, neither affecting argmax: the 1/nIds mean
  * scaling is dropped (common to all labels — the same contract as
  * the word-level import), and each ROW is scored as ONE line
  * (embedded newlines are plain whitespace; fastText's per-line
  * prediction would score only the first line of a multi-line row).
  * Ties break to the LOWEST label index (deterministic, matching the
  * argmax fold of `Classify.langIdArgmax`). A row with zero feature
  * ids (no tokens and no in-dict EOS) yields null. */
object FastText {

  /** The imported model as one serializable reference object.
    * `input` has `nwords + bucket` rows (word rows first, then the
    * n-gram bucket rows — the fastText input-matrix layout); `output`
    * has one row per label; all rows `dim` wide. */
  case class FastTextModel(labels: Array[String],
                           words: Array[String],
                           input: Array[Array[Double]],
                           output: Array[Array[Double]],
                           dim: Int, minn: Int, maxn: Int,
                           bucket: Int) extends Serializable {
    require(labels.nonEmpty, "model has no labels")
    require(minn >= 1 && maxn >= minn,
      s"subword model needs 1 <= minn <= maxn, got ($minn, $maxn)")
    require(bucket > 0, "bucket must be positive")
    val nwords: Int = words.length
    require(input.length == nwords + bucket,
      s"input matrix has ${input.length} rows, need nwords+bucket = " +
        s"${nwords + bucket}")
    require(output.length == labels.length,
      s"output matrix has ${output.length} rows for ${labels.length} labels")
    (input.iterator ++ output.iterator).foreach(r =>
      require(r.length == dim, s"matrix row has ${r.length} values, dim $dim"))
    @transient lazy val wordIds: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](words.length * 2)
      var i = 0
      while (i < words.length) { m.put(words(i), i); i += 1 }
      m
    }
    /** Word id of the EOS token `</s>` when the dict carries it
      * (published models do — fastText adds EOS at dict init), else
      * -1. Appended to every line's features per Dictionary::getLine. */
    @transient lazy val eosId: Int = {
      val v = wordIds.get(Eos)
      if (v == null) -1 else v.intValue()
    }
  }

  /** fastText's EOS token (Dictionary::EOS). */
  val Eos = "</s>"

  /** fastText's `Dictionary::hash`: FNV-1a-32 where each byte is
    * sign-extended before the XOR (`uint32_t(int8_t(str[i]))`) —
    * bytes ≥ 0x80 XOR with 0xFFFFFF80-style values, so multi-byte
    * UTF-8 hashes differ from plain-FNV; returned as the UNSIGNED
    * 32-bit value in a Long. */
  def hash32(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = -2128831035 // 2166136261 as signed Int
    var i = from
    while (i < until) {
      h = h ^ bytes(i) // Int promotion sign-extends, as int8_t -> uint32_t
      h = h * 16777619
      i += 1
    }
    java.lang.Integer.toUnsignedLong(h)
  }

  /** Char-aligned byte n-grams of `<word>` as bucket ids
    * (nwords + hash mod bucket), exactly `Dictionary::computeSubwords`
    * — see the object doc for the stepping and exclusion rules. */
  def subwordIds(word: String, m: FastTextModel,
                 out: java.util.ArrayList[Integer]): Unit = {
    val b = ("<" + word + ">").getBytes(UTF_8)
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0xC0) != 0x80) { // char start
        var j = i
        var n = 1
        while (j < b.length && n <= m.maxn) {
          j += 1
          while (j < b.length && (b(j) & 0xC0) == 0x80) j += 1
          if (n >= m.minn && !(n == 1 && (i == 0 || j == b.length))) {
            val id = m.nwords + (hash32(b, i, j) % m.bucket).toInt
            out.add(id)
          }
          n += 1
        }
      }
      i += 1
    }
  }

  private val TokenWs = java.util.regex.Pattern.compile("[ \\t\\n\\x0B\\f\\r]+")

  /** The kernel: argmax label over the factored bilinear score.
    * Returns null when the text yields zero feature ids; otherwise
    * struct(idx INT, logit DOUBLE) with idx the winning label's index
    * in model order (ties -> lowest index). */
  def argmax(text: UTF8String, m: FastTextModel): InternalRow = {
    val ids = new java.util.ArrayList[Integer](64)
    val toks = TokenWs.split(text.toString)
    var ti = 0
    var sawEos = false
    while (ti < toks.length && !sawEos) {
      val tok = toks(ti)
      if (tok.nonEmpty) {
        if (tok == Eos) {
          // getLine: EOS adds its word id alone (no char n-grams —
          // initNgrams skips them for EOS) and TERMINATES the line
          if (m.eosId >= 0) ids.add(m.eosId)
          sawEos = true
        } else {
          val wid = m.wordIds.get(tok)
          if (wid != null) {
            ids.add(wid)
            if (m.maxn > 0) subwordIds(tok, m, ids)
          } else if (m.maxn > 0) {
            subwordIds(tok, m, ids)
          }
        }
      }
      ti += 1
    }
    // end-of-line EOS, exactly once per line (readWord emits it at
    // the newline unless a literal </s> token already closed the line)
    if (!sawEos && m.eosId >= 0) ids.add(m.eosId)
    if (ids.isEmpty) return null
    val hidden = new Array[Double](m.dim)
    var k = 0
    while (k < ids.size()) {
      val row = m.input(ids.get(k))
      var d = 0
      while (d < m.dim) { hidden(d) += row(d); d += 1 }
      k += 1
    }
    var bestIdx = 0
    var bestLogit = Double.NegativeInfinity
    var l = 0
    while (l < m.output.length) {
      val o = m.output(l)
      var z = 0.0
      var d = 0
      while (d < m.dim) { z += o(d) * hidden(d); d += 1 }
      if (z > bestLogit) { bestLogit = z; bestIdx = l }
      l += 1
    }
    new GenericInternalRow(Array[Any](bestIdx, bestLogit))
  }
}
