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

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r' || b == '\f'

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
