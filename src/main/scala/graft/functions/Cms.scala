package graft.functions

/** Count-min sketch kernel (Cormode & Muthukrishnan 2005) — the
  * frequency companion to the [[Hll]] distinct sketch: mergeable
  * approximate COUNTS per key (how often did this token / URL / key
  * occur), with the classic one-sided guarantee
  * `exact <= estimate <= exact + eps·N` (eps = e/w) at confidence
  * `1 - delta` (delta = e^-d).
  *
  * Layout: `d` rows × `w` counters (w REQUIRED to be a power of two),
  * serialized as `[d:int32][w:int32][d·w counters:int64]` big-endian —
  * self-describing, so estimate/union read the geometry from the
  * sketch instead of trusting caller parameters to match.
  *
  * Row hashing reuses the MinHash family construction (TextHash.mix64
  * of `h + i·golden` for row i), so every bucket index is replayable
  * in the DuckDB oracle through the same splitmix chain the MinHash /
  * classifier oracles already use; `w` a power of two makes the
  * bucket reduction `g & (w-1)`, which equals the oracle's unsigned
  * HUGEINT `% w` exactly (2^64 ≡ 0 mod w). Plain CMS update — NOT the
  * conservative-update variant, which is deliberately rejected
  * because it breaks mergeability (the whole point of a sketch
  * column).
  *
  * Sizing: error eps·N with eps = e/w → w = 2048 gives ~0.13% of
  * total stream count per row; d = 4 → wrong with prob e^-4 ≈ 1.8%.
  * One sketch is d·w·8 bytes (64 KiB at the defaults) per group per
  * map task.
  */
object Cms {

  final val Golden = 0x9e3779b97f4a7c15L

  def requireGeometry(d: Int, w: Int): Unit = {
    require(d >= 1 && d <= 16, s"cms depth d must be in [1, 16], got $d")
    require(w >= 16 && (w & (w - 1)) == 0,
      s"cms width w must be a power of two >= 16, got $w")
  }

  def emptyCounters(d: Int, w: Int): Array[Long] = new Array[Long](d * w)

  /** Fold one pre-hashed key occurrence into the counters (mutates). */
  def update(counters: Array[Long], h: Long, d: Int, w: Int): Unit = {
    var i = 0
    while (i < d) {
      val g = TextHash.mix64(h + i * Golden)
      counters(i * w + (g & (w - 1)).toInt) += 1L
      i += 1
    }
  }

  /** Elementwise sum of `other` into `into` (mutates `into`). */
  def merge(into: Array[Long], other: Array[Long]): Unit = {
    require(into.length == other.length,
      s"cms merge: geometries differ (${into.length} vs ${other.length})")
    var i = 0
    while (i < into.length) { into(i) += other(i); i += 1 }
  }

  /** Serialize counters with the geometry header. */
  def toBytes(counters: Array[Long], d: Int, w: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + counters.length * 8)
    bb.putInt(d).putInt(w)
    counters.foreach(bb.putLong)
    bb.array()
  }

  /** (d, w, counters) from a serialized sketch. */
  def fromBytes(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt(); val w = bb.getInt()
    // validate the header itself, not just the length: a corrupt d=0
    // header passes `8 + 0 == 8`, and a non-power-of-two w mis-masks
    // every bucket via `g & (w-1)` — sketches arrive as arbitrary SQL
    // binary, so fail loudly instead of returning plausible garbage
    requireGeometry(d, w)
    require(bytes.length == 8 + d * w * 8,
      s"cms sketch: ${bytes.length} bytes does not match header d=$d w=$w")
    val counters = new Array[Long](d * w)
    var i = 0
    while (i < counters.length) { counters(i) = bb.getLong(); i += 1 }
    (d, w, counters)
  }

  /** Point estimate for a pre-hashed key: min over rows. Reads ONLY
    * the header and the `d` addressed counters straight from the byte
    * array — `cms_estimate` is a per-row scalar, and deserializing
    * all d·w counters (64 KiB at defaults) per probed row would
    * dominate the 4 actual reads. */
  def estimate(sketch: Array[Byte], h: Long): Long = {
    val bb = java.nio.ByteBuffer.wrap(sketch)
    val d = bb.getInt(0)
    val w = bb.getInt(4)
    // same header validation as fromBytes: d=0 would "pass" the length
    // check and return Long.MaxValue as a count
    requireGeometry(d, w)
    require(sketch.length == 8 + d * w * 8,
      s"cms sketch: ${sketch.length} bytes does not match header d=$d w=$w")
    var best = Long.MaxValue
    var i = 0
    while (i < d) {
      val g = TextHash.mix64(h + i * Golden)
      val c = bb.getLong(8 + (i * w + (g & (w - 1)).toInt) * 8)
      if (c < best) best = c
      i += 1
    }
    best
  }
}
