package graft.functions

/** Log-bucketed histogram sketch — the QUANTILE member of the
  * mergeable sketch-column family ([[Hll]] = distinct, [[Cms]] =
  * frequency, this = distribution). An HdrHistogram-style fixed
  * geometry: exact unit buckets below 32, then 32 sub-buckets per
  * power-of-two octave, so every recorded value lands in a bucket
  * whose width is at most 1/32 of its magnitude — quantile answers
  * carry a guaranteed ≤ 3.125% one-sided relative error, independent
  * of the data distribution and of merge order.
  *
  * Why this over KLL/t-digest: those compact ADAPTIVELY (random or
  * data-order-dependent compaction), which makes the result depend on
  * partition layout and breaks the bitwise DuckDB-oracle replay this
  * repo treats as the correctness gate. The fixed log-bucket geometry
  * is deterministic, merge is elementwise counter addition
  * (associative + commutative → any shuffle tree gives the same
  * sketch), and the bucket function is pure integer arithmetic that
  * replays exactly in SQL. The price is a fixed 1888-counter buffer
  * (~15 KiB) per group per map task — the [[Cms]] trade, and small
  * next to a shuffle of raw values.
  *
  * Bucket map for v ≥ 0 (s = 5, sub = 32):
  *   v < 32          → bucket v                      (exact)
  *   v ≥ 32, e=⌊log₂v⌋ → bucket (e−5)·32 + (v >> (e−5))  (m ∈ [32,64))
  * Buckets are contiguous: [2^e, 2^{e+1}) maps onto 32 equal slices.
  * Max e = 62 → 1888 buckets total. The inverse (bucket lower bound)
  * is `m << (e−5)` with e = b/32 + 4, m = b − (e−5)·32.
  *
  * Quantile rank is EXACT INTEGER arithmetic: for basis points bp in
  * [0, 10000], rank r = ((N−1)·bp) / 10000 (integer division), answer
  * = lower bound of the first bucket whose cumulative count exceeds r.
  * No doubles anywhere, so the oracle replay cannot drift.
  *
  * Serialized layout: `[s:int32][nBuckets:int32][counters:int64…]`
  * big-endian — self-describing like [[Cms]], geometry re-validated on
  * every read.
  */
object Hist {

  /** Sub-bucket shift: 32 sub-buckets per octave. */
  final val Shift = 5
  final val Sub = 1 << Shift // 32
  /** (63 − Shift) octaves × Sub + the exact low range. */
  final val NBuckets = (63 - Shift) * Sub + Sub // 1888

  def emptyCounters(): Array[Long] = new Array[Long](NBuckets)

  /** Bucket index of a nonnegative value. */
  def bucket(v: Long): Int = {
    require(v >= 0, s"hist_sketch records nonnegative values, got $v")
    if (v < Sub) v.toInt
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      ((e - Shift) << Shift) + (v >>> (e - Shift)).toInt
    }
  }

  /** Lower bound (representative value) of bucket `b` — the smallest
    * value that maps into it; quantiles answer with this, giving the
    * one-sided `answer ≤ true < answer·(1 + 2^-5)` contract. */
  def lowerBound(b: Int): Long = {
    require(b >= 0 && b < NBuckets, s"hist bucket out of range: $b")
    if (b < Sub) b.toLong
    else {
      val e = (b >> Shift) + Shift - 1
      val m = b - ((e - Shift) << Shift)
      m.toLong << (e - Shift)
    }
  }

  /** Fold one value into the counters (mutates). */
  def update(counters: Array[Long], v: Long): Unit =
    counters(bucket(v)) += 1L

  /** Elementwise sum of `other` into `into` (mutates `into`). */
  def merge(into: Array[Long], other: Array[Long]): Unit = {
    require(into.length == other.length,
      s"hist merge: geometries differ (${into.length} vs ${other.length})")
    var i = 0
    while (i < into.length) { into(i) += other(i); i += 1 }
  }

  def toBytes(counters: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + counters.length * 8)
    bb.putInt(Shift).putInt(counters.length)
    counters.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = bb.getInt(); val n = bb.getInt()
    // validate the header itself (the Cms.fromBytes lesson): sketches
    // arrive as arbitrary SQL binary
    require(s == Shift && n == NBuckets,
      s"hist sketch: unsupported geometry s=$s n=$n " +
        s"(this build reads s=$Shift n=$NBuckets)")
    require(bytes.length == 8 + n * 8,
      s"hist sketch: ${bytes.length} bytes does not match header n=$n")
    val counters = new Array[Long](n)
    var i = 0
    while (i < n) { counters(i) = bb.getLong(); i += 1 }
    counters
  }

  /** Total recorded count — header-only walk over the byte array (the
    * [[Cms.estimate]] no-deserialize discipline does not apply: count
    * needs every counter anyway, but we still avoid the array copy). */
  def count(sketch: Array[Byte]): Long = {
    val bb = java.nio.ByteBuffer.wrap(sketch)
    val s = bb.getInt(0); val n = bb.getInt(4)
    require(s == Shift && n == NBuckets && sketch.length == 8 + n * 8,
      s"hist sketch: bad header s=$s n=$n len=${sketch.length}")
    var total = 0L
    var i = 0
    while (i < n) { total += bb.getLong(8 + i * 8); i += 1 }
    total
  }

  /** Quantile at integer basis points bp ∈ [0, 10000]: the lower bound
    * of the bucket holding rank ((N−1)·bp)/10000 (integer division,
    * 0-indexed). Returns -1 for an empty sketch (the SQL wrapper turns
    * that into NULL via a nullable eval). */
  def quantile(sketch: Array[Byte], bp: Int): Long = {
    require(bp >= 0 && bp <= 10000,
      s"hist_quantile basis points must be in [0, 10000], got $bp")
    val bb = java.nio.ByteBuffer.wrap(sketch)
    val s = bb.getInt(0); val n = bb.getInt(4)
    require(s == Shift && n == NBuckets && sketch.length == 8 + n * 8,
      s"hist sketch: bad header s=$s n=$n len=${sketch.length}")
    var total = 0L
    var i = 0
    while (i < n) { total += bb.getLong(8 + i * 8); i += 1 }
    if (total == 0L) return -1L
    val rank = (total - 1L) * bp / 10000L
    var cum = 0L
    i = 0
    while (i < n) {
      cum += bb.getLong(8 + i * 8)
      if (cum > rank) return lowerBound(i)
      i += 1
    }
    -1L // unreachable: cum reaches total > rank
  }
}
