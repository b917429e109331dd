package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.plans.HashExpressions

/** Near-duplicate detection for the LLM pipeline.
  *
  * Scale design: candidate pairs are always generated per
  * (band, band-signature) bucket — a hash-shuffle groupBy/self-join on
  * the band hash — never an all-pairs crossJoin. Output volume is
  * O(colliding pairs); at 100 TB the band hash is a high-cardinality
  * shuffle key, and pathological buckets (boilerplate documents) are
  * capped by `maxBucket` with the overflow measured in-plan and logged
  * ([[BucketCap]]) rather than silently exploding a join.
  */
object NearDup {

  /** Word k-shingles of a text column, distinct, as an array column.
    * Documents shorter than k words contribute their full token join as
    * the single shingle. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = TextFunctions.tokens(text)
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** (doc_id, shingles, minhash-array) signature frame. Both columns
    * come from one-pass kernel expressions: `shingles` is the distinct
    * shingle-HASH set (array<long> — shuffles ~10× lighter than the
    * shingle strings and compares with long equality), `minhashes` the
    * MinHash signature. A per-hash transform-lambda formulation of the
    * same logic generated pathological janino compile times. */
  def signatures(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 3, numHashes: Int = 32): DataFrame =
    df.select(col(idCol), HashExpressions.shingles64(col(textCol), k).as("shingles"),
      HashExpressions.minhash64(col(textCol), k, numHashes).as("minhashes"))

  /** LSH banding: explode the signature into (band_id, band_hash) rows;
    * docs sharing any band bucket are candidates. The bucket key is the
    * band's raw minhash slice (array<long>) rather than a hash of it:
    * the shuffle key is a few longs wider but collision-free AND
    * engine-portable, so an independent SQL engine can replay the exact
    * bucketing for the correctness oracle. */
  def banded(sig: DataFrame, idCol: String,
             numBands: Int, rowsPerBand: Int): DataFrame =
    sig.select(col(idCol), posexplode(
      array((0 until numBands).map { b =>
        array((0 until rowsPerBand).map(r =>
          col("minhashes").getItem(b * rowsPerBand + r)): _*)
      }: _*)).as(Seq("band_id", "band_hash")))

  /** MinHash-LSH near-dup candidate pairs with exact-Jaccard
    * verification on the candidates only.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >=
    * `threshold`, where jaccard is the exact shingle-set Jaccard —
    * MinHash/LSH only prunes the pair space; it never decides.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, numBands: Int = 8, rowsPerBand: Int = 4,
                   threshold: Double = 0.5, maxBucket: Int = 1000,
                   capMetrics: Option[BucketCap.CapCounters] = None): DataFrame = {
    val sig = signatures(df, idCol, textCol, k, numBands * rowsPerBand)
      .persist()
    val bands = banded(sig, idCol, numBands, rowsPerBand)
    // one hash-shuffle on the band bucket; buckets above `maxBucket`
    // (boilerplate collisions) are dropped explicitly instead of
    // quadratically exploding — the drop is counted and logged
    // ([[BucketCap.applyCap]]) so the recall loss is visible — and
    // pair expansion happens in-row, bounded by maxBucket^2 per bucket
    val buckets = BucketCap.applyCap(
      bands.groupBy(col("band_id"), col("band_hash"))
        .agg(collect_list(col(idCol)).as("ids")),
      "minhash", size(col("ids")), 2, maxBucket, capMetrics)
    val pairs = buckets
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates()
    val sa = sig.select(col(idCol).as("id_a"), col("shingles").as("sh_a"))
    val sb = sig.select(col(idCol).as("id_b"), col("shingles").as("sh_b"))
    pairs.join(sa, "id_a").join(sb, "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash signatures via the custom codegen expression; near-dup
    * candidates = docs whose signatures share a 16-bit block (the
    * standard Hamming-LSH trick: signatures within Hamming distance 3
    * of each other share at least one of 4 blocks). */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), HashExpressions.simhash64(col(textCol)).as("simhash"))

  /** SimHash near-dup pairs: (id_a, id_b, hamming) with id_a < id_b
    * and Hamming distance <= `maxHamming` (<= 3 is exact-recall under
    * the 4-block LSH above).
    *
    * PRECONDITION: `idCol` must be unique in `df`. Pair uniqueness
    * relies on it — the first-shared-block predicate dedups each
    * SIGNATURE pair exactly once, so a duplicated id emits its pair
    * rows once per id occurrence (there is deliberately NO distinct
    * here: a candidate-set shuffle is the term that would dominate at
    * corpus scale). [[Dedup.connectedComponents]] tolerates duplicate
    * edges; a consumer counting pairs does not — dedupe ids upstream. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame =
    hammingPairs(simhashSignatures(df, idCol, textCol), idCol, "simhash",
      maxHamming)

  /** Hamming near-dup pairs over ANY 64-bit signature column — the
    * [[simhashPairs]] block-LSH join factored out so every 64-bit
    * perceptual signature reuses it (text SimHash here; image dHash in
    * [[graft.operators.Multimodal.imageDhashes]]). Pigeonhole recall:
    * two signatures within Hamming distance d <= 3 agree on at least
    * one of the four 16-bit blocks, so the per-(block, value) bucket
    * join is EXACT at maxHamming <= 3 — never all-pairs, candidate
    * volume is the bucket collision volume. Same id-uniqueness
    * precondition as [[simhashPairs]]. */
  def hammingPairs(sig0: DataFrame, idCol: String, hashCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sig = sig0.select(col(idCol), col(hashCol).as("simhash"))
    val blocked = sig.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("simhash"), i * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("block_id", "block_val")))
    val a = blocked.select(col("block_id"), col("block_val"),
      col(idCol).as("id_a"), col("simhash").as("sim_a"))
    val b = blocked.select(col("block_id"), col("block_val"),
      col(idCol).as("id_b"), col("simhash").as("sim_b"))
    // A pair sharing k>1 blocks appears k times out of the join — but
    // both signatures ride along, so "is this the pair's FIRST shared
    // block" is a scalar predicate (codegen, no state), and the
    // per-pair dedup costs NOTHING instead of a full extra shuffle of
    // the candidate set — the term that would dominate at corpus scale.
    val firstShared = (0 until 4).foldRight(lit(3): Column) { (i, rest) =>
      if (i == 3) rest
      else when(shiftrightunsigned(col("sim_a"), i * 16).bitwiseAND(lit(0xffffL)) ===
        shiftrightunsigned(col("sim_b"), i * 16).bitwiseAND(lit(0xffffL)), lit(i))
        .otherwise(rest)
    }
    a.join(b, Seq("block_id", "block_val"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("block_id") === firstShared)
      .withColumn("hamming", HashExpressions.hamming(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Persist a MinHash near-dup index for a FROZEN corpus: the banded
    * signature table bucketed on (band_id, band_val) plus the shingle
    * sets bucketed on id. Built once per corpus release; every later
    * batch (or micro-batch — [[graft.streaming.EventsStreaming
    * .nearDupFilterStream]]) probes it WITHOUT re-reading or
    * re-clustering the corpus: the bucketed layout satisfies the probe
    * join's distribution, so the corpus side of every probe plans zero
    * exchanges. `band_val` is xxhash64 of the band's minhash slice —
    * a hash collision only ADDS a candidate pair, which the exact
    * Jaccard verify then rejects (candidates prune, Jaccard decides —
    * the [[minhashPairs]] contract). */
  def buildNearDupIndex(corpus: DataFrame, tablePrefix: String,
                        k: Int = 3, numHashes: Int = 32,
                        numBands: Int = 8, rowsPerBand: Int = 4,
                        numBuckets: Int = 16,
                        idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val sig = signatures(corpus, idCol, textCol, k, numHashes)
    banded(sig, idCol, numBands, rowsPerBand)
      .select(col(idCol), col("band_id"),
        xxhash64(col("band_id"), col("band_hash")).as("band_val"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, "band_id", "band_val")
      .sortBy("band_id", "band_val")
      .saveAsTable(s"${tablePrefix}_bands")
    sig.select(col(idCol), col("shingles"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, idCol).sortBy(idCol)
      .saveAsTable(s"${tablePrefix}_shingles")
  }

  /** Drop every batch row that is a near-duplicate (exact shingle
    * Jaccard >= `threshold`) of ANY document in the persisted index
    * ([[buildNearDupIndex]] — same k/numHashes/numBands/rowsPerBand or
    * the band spaces don't line up). The incremental-ingest dedup
    * policy: new data dedupes against yesterday's frozen corpus
    * without touching it.
    *
    * Plan shape per batch: batch signatures are one kernel pass;
    * candidates come from the (band_id, band_val) equi-join against
    * the bucketed bands table (no corpus-side exchange), collapse to
    * distinct narrow id pairs BEFORE any shingle array moves, verify
    * joins fetch exactly the candidate docs' shingle sets (bucketed on
    * id — again no corpus-side exchange), and matched batch ids
    * left-anti back. Batch text never shuffles. */
  def dedupAgainstIndex(spark: org.apache.spark.sql.SparkSession,
                        tablePrefix: String, batch: DataFrame,
                        threshold: Double = 0.7,
                        k: Int = 3, numHashes: Int = 32,
                        numBands: Int = 8, rowsPerBand: Int = 4,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sig = signatures(batch, idCol, textCol, k, numHashes)
    val bands = banded(sig, idCol, numBands, rowsPerBand)
      .select(col(idCol), col("band_id"),
        xxhash64(col("band_id"), col("band_hash")).as("band_val"))
    val corpusBands = spark.table(s"${tablePrefix}_bands")
      .withColumnRenamed(idCol, "__corpus_id")
    val cand = bands.join(corpusBands, Seq("band_id", "band_val"))
      .select(col(idCol), col("__corpus_id")).distinct()
    val dupIds = cand
      .join(sig.select(col(idCol), col("shingles").as("__sa")), idCol)
      .join(spark.table(s"${tablePrefix}_shingles")
        .select(col(idCol).as("__corpus_id"), col("shingles").as("__sb")),
        "__corpus_id")
      .filter(size(array_intersect(col("__sa"), col("__sb"))).cast("double") /
        size(array_union(col("__sa"), col("__sb"))).cast("double") >= threshold)
      .select(col(idCol)).distinct()
    batch.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Edit-distance verification of candidate pairs: normalized
    * Levenshtein similarity 1 − dist/max(len_a, len_b), kept at
    * `minSim`+. The precision pass AFTER a recall-oriented candidate
    * generator (MinHash/SimHash buckets, key-equality groups) —
    * n-gram Jaccard ([[q_ngram_jaccard]]'s kernel) is order-insensitive
    * and misses transpositions/rewrites that edit distance prices
    * exactly; code-dedup pipelines verify on edit similarity for that
    * reason.
    *
    * Scale shape: `pairs` carries narrow ids only; the two text joins
    * shuffle on the SAME id keys the dedup family already uses, and
    * the Levenshtein kernel (Spark's codegen built-in) runs once per
    * surviving pair. Cost is O(len_a · len_b) PER PAIR — quadratic in
    * document length — so this is for bounded-length fields or
    * LSH-thinned candidate sets, never an all-pairs or long-document
    * pass; cap lengths upstream (e.g. verify on the first N chars)
    * when docs are unbounded.
    *
    * CPU-bound stages partition by CPU, not bytes: candidate pairs are
    * tiny in BYTES but huge in CPU (len² per row), so every
    * byte-oriented placement decision — AQE coalescing the join
    * shuffle to one partition, a broadcast join preserving a small
    * scan's 1-2 input partitions — serializes the quadratic kernel
    * onto a couple of cores. Two moves restore CPU balance (measured
    * at sf0.1 local[32]: 5.5 s → ~1 s):
    *
    *  - the joined frame is explicitly repartitioned on the pair key
    *    to the session's shuffle parallelism (explicit numPartitions
    *    is exempt from AQE coalescing);
    *  - the similarity is computed as a WINDOW aggregate over the pair
    *    key. The window's distribution requirement is satisfied by
    *    that repartition (no extra exchange), the kernel evaluates
    *    exactly once per row AFTER the exchange, and — the load-
    *    bearing part — a Filter on a window output cannot be pushed
    *    below the window, so the threshold predicate can't migrate
    *    below the repartition and drag the Levenshtein back onto the
    *    join's single post-AQE partition (which is exactly what a
    *    plain projection + filter does: the optimizer inlines the
    *    alias into the filter and pushes it through the exchange). */
  def editVerify(pairs: DataFrame, docs: DataFrame, minSim: Double,
                 idCol: String = "doc_id", textCol: String = "text",
                 idACol: String = "id_a", idBCol: String = "id_b"): DataFrame = {
    val shufflePartitions =
      pairs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val ta = docs.select(col(idCol).as(idACol), col(textCol).as("__ta"))
    val tb = docs.select(col(idCol).as(idBCol), col(textCol).as("__tb"))
    val byPair = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idACol), col(idBCol))
    // candidate generators can emit the same pair through several
    // bands/tables; dedup the NARROW id frame before any text joins so
    // (a) no pair is scored twice and (b) a duplicated input row can't
    // ride the window max into a duplicated output row. Precondition:
    // `docs` carries one row per id — with conflicting texts for one id
    // the window max would silently pick the most-similar variant.
    pairs.dropDuplicates(idACol, idBCol)
      .join(ta, idACol).join(tb, idBCol)
      .repartition(shufflePartitions, col(idACol), col(idBCol))
      .withColumn("edit_sim", max(
        lit(1.0) - levenshtein(col("__ta"), col("__tb")).cast("double") /
          greatest(length(col("__ta")), length(col("__tb"))).cast("double"))
        .over(byPair))
      .filter(col("edit_sim") >= minSim)
      .select(col(idACol), col(idBCol), round(col("edit_sim"), 6).as("edit_sim"))
  }
}
