package graft.functions

/** Bit-interleave kernels for space-filling-curve data layout.
  *
  * Z-ordering (Morton encoding) interleaves the bits of two sort
  * dimensions so that rows close in EITHER dimension land close in the
  * single sort order. Writing a table sorted by z-value keeps parquet
  * row-group min/max statistics tight on BOTH source columns at once,
  * so range predicates on either (or both) dimensions prune row
  * groups — the standard lakehouse layout optimization for multi-
  * dimensional scan pruning at 100 TB.
  */
object BitOps {

  /** Spread the low 32 bits of x to the even bit positions of a long
    * (classic magic-number Morton spreading, O(log w) shifts). */
  def spread(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Inverse of [[spread]]: collect the even bit positions. */
  def unspread(z0: Long): Long = {
    var x = z0 & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >>> 4)) & 0x00ff00ff00ff00ffL
    x = (x | (x >>> 8)) & 0x0000ffff0000ffffL
    x = (x | (x >>> 16)) & 0x00000000ffffffffL
    x
  }

  /** 64-bit z-value: a's low 32 bits on even positions, b's on odd. */
  def interleave64(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)

  def deinterleaveA(z: Long): Long = unspread(z)
  def deinterleaveB(z: Long): Long = unspread(z >>> 1)
}
