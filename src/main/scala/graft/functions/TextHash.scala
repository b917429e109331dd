package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Deterministic text-hash kernels shared by the custom Catalyst
  * expressions ([[SimHash64]], [[Winnow64]]) between interpreted eval and
  * generated code. Pure JVM static methods so `doGenCode` can emit a
  * single call — the same pattern Spark's own expressions use for
  * non-trivial kernels.
  *
  * FNV-1a is used as the token hash: public-domain, trivially stable
  * across JVM versions (unlike String.hashCode contracts for
  * supplementary chars).
  */
object TextHash {

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** FNV-1a over a byte slice. */
  def fnv64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }


  /** FNV-1a of a whole string's UTF-8 bytes — the stable row hash used
    * for deterministic dataset splits (train/val/test must not move
    * when the corpus is re-sharded, so the hash is of CONTENT, not of
    * position or id). */
  def fnv64(s: UTF8String): Long = {
    val b = s.getBytes
    fnv64(b, 0, b.length)
  }

  /** Hashing-trick linear text-classifier logit (fastText-style
    * INFERENCE): whitespace unigrams plus adjacent bigrams, each
    * hashed with FNV-1a into `weights.length` buckets, and the hit
    * weights summed IN TOKEN ORDER — unigram of token 0, then for
    * each later token the bigram closing at it followed by its own
    * unigram — so an independent SQL replay can fold the identical
    * IEEE addition sequence. A bigram hashes its two token spans
    * joined by ONE 0x20 byte (tokenizer canonicalization: separator
    * runs and tab/newline separators don't perturb the feature).
    * Bucket = floorMod(hash, buckets), which for power-of-two bucket
    * counts equals the unsigned low bits — keep `weights.length` a
    * power of two if an unsigned-modulus replay must match. Empty and
    * whitespace-only text scores 0.0. */
  def hashGramLogit(s: UTF8String, weights: Array[Double]): Double = {
    val bytes = s.getBytes
    val n = bytes.length
    val m = weights.length
    var acc = 0.0
    var prevStart = -1
    var prevEnd = -1
    var i = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        if (prevStart >= 0) {
          var h = fnv64(bytes, prevStart, prevEnd)
          h ^= 0x20L
          h *= FnvPrime
          var j = start
          while (j < i) { h ^= (bytes(j) & 0xffL); h *= FnvPrime; j += 1 }
          acc += weights(java.lang.Math.floorMod(h, m))
        }
        acc += weights(java.lang.Math.floorMod(fnv64(bytes, start, i), m))
        prevStart = start
        prevEnd = i
      }
    }
    acc
  }

  /** The hashed-gram FEATURE IDS behind [[hashGramLogit]]: the same
    * whitespace unigram + adjacent-bigram walk, same FNV-1a fold and
    * floorMod bucketing, but returning the bucket sequence itself (in
    * the kernel's interleaved emission order — unigram 0, then bigram
    * closing at each later token followed by its unigram) instead of
    * summing weights. This is the feature-extraction half of
    * importance-resampling data selection (DSIR, Xie et al. 2023):
    * corpus-level bucket-count distributions are one
    * explode-and-count away, and a per-document log-likelihood-ratio
    * weight under those distributions is exactly
    * `hashGramLogit(text, lambda)` — the two kernels are guaranteed
    * to walk identical features because they share this loop shape.
    * Keep `numBuckets` a power of two (see [[hashGramLogit]]'s
    * bucket-modulus note). */
  def hashGramBuckets(s: UTF8String, numBuckets: Int):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var prevStart = -1
    var prevEnd = -1
    var i = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        if (prevStart >= 0) {
          var h = fnv64(bytes, prevStart, prevEnd)
          h ^= 0x20L
          h *= FnvPrime
          var j = start
          while (j < i) { h ^= (bytes(j) & 0xffL); h *= FnvPrime; j += 1 }
          buf += java.lang.Math.floorMod(h, numBuckets).toLong
        }
        buf += java.lang.Math.floorMod(fnv64(bytes, start, i), numBuckets).toLong
        prevStart = start
        prevEnd = i
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray)
  }

  /** Gopher repetition battery (Rae et al. 2021, appendix A1 — the
    * "repetitious documents" rules next to the A1.1 quality rules):
    * nine char-fraction signals in one pass over the text, returned
    * as array<double> in fixed order
    * [top2, top3, top4, dup5, dup6, dup7, dup8, dup9, dup10].
    *
    *  - top-n (n = 2,3,4): fraction of characters covered by
    *    occurrences of the MOST COMMON n-gram —
    *    count·len(gram) / len(text), with the most-common choice made
    *    total by the (count, gram length, lexicographic) tie-break so
    *    a SQL replay picks the identical gram.
    *  - dup-n (n = 5..10): fraction of characters in n-grams
    *    occurring more than once — Σ_{count≥2} count·len(gram) /
    *    len(text). All occurrences count and overlaps double-count
    *    (the common published implementation shape); the value can
    *    exceed 1 on degenerate text, thresholds treat it as "remove".
    *
    * N-grams are whitespace tokens joined by ONE space (the
    * [[hashGramLogit]] canonicalization), so separator runs don't
    * perturb the signal. Every signal is an exact integer ratio in
    * one IEEE division — a SQL replay reproduces the doubles (and any
    * threshold verdicts on them) bitwise. Fewer than n tokens or
    * empty text → 0.0 for that signal. */
  /** Lexicographic comparison by Unicode code point — identical to
    * comparing the strings' UTF-8 bytes unsigned, i.e. DuckDB's
    * default binary collation. */
  private[graft] def codePointCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  def gopherRepetition(s: UTF8String):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // tokenize once (the hashGramLogit walk), decoding each token
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start)
        toks += new String(bytes, start, i - start,
          java.nio.charset.StandardCharsets.UTF_8)
    }
    val total = s.numChars.toDouble
    val out = new Array[Any](9)
    var oi = 0
    var gn = 2
    while (gn <= 10) {
      val sig =
        if (total == 0.0 || toks.length < gn) 0.0
        else {
          val counts = new java.util.HashMap[String, Array[Int]]()
          var j = 0
          while (j + gn <= toks.length) {
            val gram = toks.slice(j, j + gn).mkString(" ")
            val c = counts.get(gram)
            if (c == null) counts.put(gram, Array(1)) else c(0) += 1
            j += 1
          }
          if (gn <= 4) {
            // most common gram; ties → longer gram, then lexicographic
            // min in CODE-POINT order (== UTF-8 byte order, the
            // oracle's collation). Java String.compareTo is UTF-16
            // code-unit order, which disagrees when one side has a
            // supplementary-plane char and the other a BMP char in
            // U+E000..U+FFFF.
            var bc = 0; var bl = -1; var bg: String = null
            counts.forEach { (g, c) =>
              val l = g.codePointCount(0, g.length)
              if (c(0) > bc || (c(0) == bc && (l > bl ||
                  (l == bl && (bg == null || codePointCompare(g, bg) < 0))))) {
                bc = c(0); bl = l; bg = g
              }
            }
            bc.toDouble * bl / total
          } else {
            var acc = 0L
            counts.forEach { (g, c) =>
              if (c(0) >= 2) acc += c(0).toLong * g.codePointCount(0, g.length)
            }
            acc.toDouble / total
          }
        }
      out(oi) = sig
      oi += 1
      gn += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** C4-style boilerplate line filter (Raffel et al. 2020 §2.2, the
    * line-level rules): keep a line iff it has at least `minWords`
    * whitespace words, its last non-blank character is terminal
    * punctuation (. ! ? "), and it contains neither a curly brace nor
    * the word "javascript" (ASCII-case-insensitive). Kept lines are
    * re-joined with '\n'; a doc with no kept lines returns "" (the
    * caller drops it — C4 discards emptied pages). One pass over the
    * bytes, no line explode, no shuffle; all checks are on ASCII
    * bytes, which never occur inside multi-byte UTF-8 sequences. */
  def cleanLines(s: UTF8String, minWords: Int): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.io.ByteArrayOutputStream(n)
    var first = true
    var lineStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == '\n') {
        if (keepLine(bytes, lineStart, i, minWords)) {
          if (!first) out.write('\n')
          out.write(bytes, lineStart, i - lineStart)
          first = false
        }
        lineStart = i + 1
      }
      i += 1
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  // in-line blank set: the Java \s class minus the line separator
  private def isLineSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\r' || b == '\f' || b == 0x0B

  private final val JsPattern = "javascript".getBytes
  private def keepLine(bytes: Array[Byte], from: Int, until: Int,
                       minWords: Int): Boolean = {
    var e = until
    while (e > from && isLineSpace(bytes(e - 1))) e -= 1
    if (e == from) return false
    val last = bytes(e - 1)
    if (last != '.' && last != '!' && last != '?' && last != '"') return false
    var words = 0
    var inWord = false
    // "javascript" matcher: the only border of the pattern is 'j'
    // itself, so on mismatch falling back to (c=='j' ? 1 : 0) is a
    // correct KMP restart
    var js = 0
    var i = from
    while (i < until) {
      val b = bytes(i)
      if (b == '{' || b == '}') return false
      if (isLineSpace(b)) inWord = false
      else if (!inWord) { words += 1; inWord = true }
      val c = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      if (c == JsPattern(js)) {
        js += 1
        if (js == JsPattern.length) return false
      } else js = if (c == 'j') 1 else 0
      i += 1
    }
    words >= minWords
  }

  /** Charikar SimHash over whitespace tokens: each token votes its hash
    * bits; the sign of each bit-counter forms the 64-bit signature.
    * Near-identical token multisets give near-identical signatures
    * (small Hamming distance). */
  def simhash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val counts = new Array[Int](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        val h = fnv64(bytes, start, i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Winnowing-style document fingerprint (Schleimer et al., SIGMOD'03):
    * Karp-Rabin-ish rolling hashes of all `k`-byte grams, then the
    * minimum gram hash — a deterministic 64-bit fingerprint robust to
    * local edits elsewhere in the document. Returns fnv of the whole
    * string for texts shorter than `k`. */
  def winnow64(s: UTF8String, k: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return fnv64(bytes, 0, n)
    var min = Long.MaxValue
    var i = 0
    while (i + k <= n) {
      val h = fnv64(bytes, i, i + k)
      // unsigned comparison so the min is over the full 64-bit space
      if (java.lang.Long.compareUnsigned(h, min) < 0) min = h
      i += 1
    }
    min
  }

  /** Content-defined chunk CUT positions (Rabin/FastCDC-family
    * boundary rule, gear-free deterministic form): a cut falls AFTER
    * 1-based position p (p >= w) iff the fnv64 of the w bytes ENDING
    * at p has its low `maskBits` bits all zero — expected chunk length
    * 2^maskBits. The text length is always the final cut, so the cuts
    * partition [1, n] into chunks `(prevCut, cut]`. Boundaries depend
    * only on a w-byte local context, so an insertion near the front
    * shifts positions but re-synchronizes the remaining boundaries —
    * the property that makes block-level dedup robust to prefix/infix
    * edits where fixed-size blocks mis-align forever.
    *
    * Pure content rule, no min/max chunk bound: every boundary is a
    * position-independent predicate, which is what lets the DuckDB
    * oracle replay the cut set declaratively (a min-length rule makes
    * cut k depend on cut k-1 — recursive, and the FastCDC extension
    * documented for pathological inputs, not the default). Byte-level
    * FNV like every other kernel (oracle replays per-character; ASCII
    * corpus — see the q_fingerprint note). Empty text → empty array. */
  def cdcCuts(s: UTF8String, w: Int, maskBits: Int): Array[Int] = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return Array.emptyIntArray
    val mask = (1L << maskBits) - 1L
    val cuts = new java.util.ArrayList[Integer]()
    var p = w
    while (p < n) { // p == n handled by the forced final cut
      if ((fnv64(bytes, p - w, p) & mask) == 0L) cuts.add(p)
      p += 1
    }
    cuts.add(n)
    val out = new Array[Int](cuts.size())
    var j = 0
    while (j < out.length) { out(j) = cuts.get(j); j += 1 }
    out
  }

  // exactly Java regex \s = [ \t\n\x0B\f\r], so every kernel tokenizes
  // identically to the \S+ forms the DuckDB oracles replay
  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r' || b == '\f' || b == 0x0B

  /** splitmix64 finisher (Steele et al., public domain) — cheap
    * high-quality mixer used to derive the per-seed MinHash families
    * from one base shingle hash. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature over word `k`-shingles in ONE pass: for each
    * shingle, base = FNV over its byte span (token-boundary aware), and
    * the j-th family hash is mix64(base + j·golden). Texts shorter than
    * k tokens hash their whole token span as the single shingle —
    * matching [[graft.operators.NearDup.wordShingles]] semantics.
    * Returns n signature longs (Long.MaxValue for empty text). */
  def minhash64(s: UTF8String, k: Int, n: Int): Array[Long] = {
    val bytes = s.getBytes
    val len = bytes.length
    // token spans
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      val st = i
      while (i < len && !isSpace(bytes(i))) i += 1
      if (i > st) { starts.add(st); ends.add(i) }
    }
    val nTok = starts.size()
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, Long.MaxValue)
    def update(base: Long): Unit = {
      var j = 0
      while (j < n) {
        val h = mix64(base + j * 0x9e3779b97f4a7c15L)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
    }
    // hash of tokens [from, until) joined by a single space — identical
    // to fnv64 over the normalized shingle string
    def shingleHash(from: Int, until: Int): Long = {
      var h = 0xcbf29ce484222325L
      var t = from
      while (t < until) {
        if (t > from) { h ^= ' '.toLong; h *= 0x100000001b3L }
        var b = starts.get(t)
        val e = ends.get(t)
        while (b < e) {
          h ^= (bytes(b) & 0xffL)
          h *= 0x100000001b3L
          b += 1
        }
        t += 1
      }
      h
    }
    if (nTok == 0) sig
    else if (nTok < k) { update(shingleHash(0, nTok)); sig }
    else {
      var t = 0
      while (t + k <= nTok) { update(shingleHash(t, t + k)); t += 1 }
      sig
    }
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Gopher-style repetition signal in ONE pass over the string: the
    * fraction of all word-bigram occurrences taken by the single most
    * frequent bigram. Equals max(count per bigram)/(nTokens-1) — the
    * same value as the explode→count→max/sum SQL pipeline, but computed
    * in-row: the explode form multiplies the corpus by ~doc-length and
    * shuffles it twice, this shuffles nothing. Bigrams are identified
    * by their FNV hash of "tokA tokB" (64-bit collisions negligible at
    * doc scale); counting is sort-and-scan over the per-doc hash array,
    * allocation-light and O(n log n) in tokens. Returns -1.0 for texts
    * with fewer than 2 tokens (no bigrams — the SQL form drops the
    * row). */
  def repRatio64(s: UTF8String): Double = {
    val bytes = s.getBytes
    val len = bytes.length
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      val st = i
      while (i < len && !isSpace(bytes(i))) i += 1
      if (i > st) { starts.add(st); ends.add(i) }
    }
    val nTok = starts.size()
    if (nTok < 2) return -1.0
    def tokHash(h0: Long, t: Int): Long = {
      var h = h0
      var b = starts.get(t)
      val e = ends.get(t)
      while (b < e) {
        h ^= (bytes(b) & 0xffL)
        h *= 0x100000001b3L
        b += 1
      }
      h
    }
    val grams = new Array[Long](nTok - 1)
    var t = 0
    while (t < nTok - 1) {
      var h = tokHash(0xcbf29ce484222325L, t)
      h ^= ' '.toLong; h *= 0x100000001b3L
      grams(t) = tokHash(h, t + 1)
      t += 1
    }
    java.util.Arrays.sort(grams)
    var maxRun = 1
    var run = 1
    var j = 1
    while (j < grams.length) {
      if (grams(j) == grams(j - 1)) { run += 1; if (run > maxRun) maxRun = run }
      else run = 1
      j += 1
    }
    maxRun.toDouble / (nTok - 1).toDouble
  }

  /** Distinct word-k-shingle hashes, sorted — the set representation
    * used for exact Jaccard on candidate pairs. 64-bit FNV collisions
    * are negligible at corpus scale, and an 8-byte element shuffles an
    * order of magnitude lighter than the shingle string it replaces. */
  def shingles64(s: UTF8String, k: Int): Array[Long] = {
    val bytes = s.getBytes
    val len = bytes.length
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      val st = i
      while (i < len && !isSpace(bytes(i))) i += 1
      if (i > st) { starts.add(st); ends.add(i) }
    }
    val nTok = starts.size()
    def shingleHash(from: Int, until: Int): Long = {
      var h = 0xcbf29ce484222325L
      var t = from
      while (t < until) {
        if (t > from) { h ^= ' '.toLong; h *= 0x100000001b3L }
        var b = starts.get(t)
        val e = ends.get(t)
        while (b < e) {
          h ^= (bytes(b) & 0xffL)
          h *= 0x100000001b3L
          b += 1
        }
        t += 1
      }
      h
    }
    val set = new java.util.TreeSet[java.lang.Long]()
    if (nTok == 0) set.add(shingleHash(0, 0))
    else if (nTok < k) set.add(shingleHash(0, nTok))
    else {
      var t = 0
      while (t + k <= nTok) { set.add(shingleHash(t, t + k)); t += 1 }
    }
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }
}
