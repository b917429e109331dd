package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.{BloomExpression, HashExpressions}

/** Benchmark decontamination at eval-set sizes a broadcast can't hold.
  *
  * The plain policy (`q_decontaminate`, the GPT-3/PaLM appendix rule:
  * drop every training doc sharing any word k-shingle with the eval
  * set) is a semi-join of corpus shingle hashes against eval shingle
  * hashes. With a KB–MB eval set the eval side broadcasts and the
  * corpus never shuffles. When the "eval set" is itself corpus-sized —
  * decontaminating against an entire benchmark SUITE, or against a
  * held-out split measured in TB — the broadcast fails, and the fallback
  * shuffle join must move EVERY corpus shingle hash (8 bytes × ~tokens),
  * the single largest exchange in the pipeline.
  *
  * This variant restores the narrow shape with a Bloom prefilter — the
  * same move Spark's AQE runtime filters make for selective joins, but
  * applied where the planner can't see the selectivity:
  *
  *   1. build ONE Bloom filter over the distinct eval shingle hashes
  *      (driver-side via `stat.bloomFilter`, an rdd aggregate: each
  *      executor folds its partitions into local bits, the driver ORs
  *      them — the only full pass over the eval side);
  *   2. probe it in the corpus scan projection (codegen
  *      [[graft.plans.BloomMightContainLong]]) — no false negatives, so
  *      every truly contaminated shingle survives;
  *   3. exact semi-join ONLY the surviving candidates against the eval
  *      hashes — false positives die here, so the composed result is
  *      EXACTLY the plain policy's (oracle-checkable against the same
  *      SQL).
  *
  * Shuffle volume drops from O(corpus shingles) to O(true matches +
  * fpp × corpus shingles): at fpp=0.01, a 100 TB corpus's exchange
  * shrinks ~100×. Memory: the filter costs ~1.2 bytes/item at fpp=0.01
  * (~1.2 GB per 10^9 eval shingles) on the driver and once per executor;
  * beyond that, raise fpp — correctness is unaffected, only the
  * prefilter's selectivity degrades.
  */
object Decontaminate {

  /** Drop every row of `corpus` whose text shares a word `shingleK`-
    * shingle with `eval`'s text. Exact — identical output to the plain
    * broadcast-semi-join policy for any `fpp`.
    *
    * `expectedItems` sizes the Bloom filter; when absent, one count job
    * over the (deduped) eval shingles sizes it exactly — fine when eval
    * is the smaller side, which is the regime this operator exists for.
    */
  def decontaminateBloom(corpus: DataFrame, idCol: String, textCol: String,
                         eval: DataFrame, evalTextCol: String,
                         shingleK: Int = 5, fpp: Double = 0.01,
                         expectedItems: Option[Long] = None): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val evalSh = eval
      .select(explode(HashExpressions.shingles64(col(evalTextCol), shingleK))
        .as("__sh"))
      .distinct()
    val n = expectedItems.getOrElse(math.max(evalSh.count(), 1L))
    val bloom = evalSh.stat.bloomFilter("__sh", n, fpp)

    val corpusSh = corpus.select(col(idCol),
      explode(HashExpressions.shingles64(col(textCol), shingleK)).as("__sh"))
    val candidates =
      corpusSh.filter(BloomExpression.mightContainLong(col("__sh"), bloom))
    // Exact verify: no broadcast hint — at real scale both sides are
    // shuffled on the 8-byte hash, but the candidate side is already
    // fpp-thinned; at test scale AQE broadcasts the smaller side.
    val contaminated = candidates.join(evalSh, Seq("__sh"), "left_semi")
      .select(col(idCol)).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Span-level decontamination: instead of DROPPING a training doc
    * that shares a word `shingleK`-shingle with the eval set (the
    * binary q_decontaminate policy — wasteful when one quoted sentence
    * condemns a long document), remove exactly the tokens covered by
    * ANY matching shingle and keep the rest (the surgical variant of
    * the GPT-3 appendix-C policy, as applied in later decontamination
    * pipelines).
    *
    * Same machinery as [[graft.operators.Dedup.substringDedup]]'s
    * covered-token removal, with "duplicated window" replaced by
    * "eval-matching window":
    *
    *  1. tokenize once (persisted — feeds window generation AND
    *     reassembly);
    *  2. k-token windows with positions; only their fnv64 hashes move;
    *  3. semi-join window hashes against the (broadcast) distinct eval
    *     shingle hashes — corpus text never shuffles;
    *  4. matched windows explode to covered token positions
    *     [pos, pos+k-1]; covered tokens anti-join out; the remainder
    *     reassembles in token order.
    *
    * Output: (idCol, textCol) for EVERY corpus row —
    * whitespace-normalized (the substringDedup rebuild convention),
    * empty string when fully covered. Docs with fewer than `shingleK`
    * tokens cannot contain a full shingle and pass through unchanged
    * (both sides window at exactly k — the short-doc fallback shingle
    * of `shingles64` is deliberately NOT applied here).
    *
    * Scale: shuffle volume is O(corpus tokens) 8-byte keys for the
    * window pass + O(matches) for coverage; the eval side is
    * broadcast-sized (use [[decontaminateBloom]]'s prefilter pattern
    * upstream when it is not). */
  def decontaminateSpans(corpus: DataFrame, idCol: String, textCol: String,
                         eval: DataFrame, evalTextCol: String,
                         shingleK: Int = 5): DataFrame = {
    require(shingleK >= 2, s"shingleK must be >= 2, got $shingleK")
    val k = shingleK
    val toks = corpus.select(col(idCol),
        graft.functions.TextFunctions.tokens(col(textCol)).as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wins = toks.filter(size(col("t")) >= k)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), size(col("t")) - k),
          i => concat_ws(" ", slice(col("t"), i + 1, lit(k)))))
        .as(Seq("pos", "s")))
      .select(col(idCol), col("pos"),
        graft.plans.HashExpressions.fnv64(col("s")).as("h"))
    val evalSh = eval
      .select(graft.functions.TextFunctions.tokens(col(evalTextCol)).as("t"))
      .filter(size(col("t")) >= k)
      .select(explode(
        transform(sequence(lit(0), size(col("t")) - k),
          i => concat_ws(" ", slice(col("t"), i + 1, lit(k))))).as("s"))
      .select(graft.plans.HashExpressions.fnv64(col("s")).as("h"))
      .distinct()
    val hits = wins.join(broadcast(evalSh), Seq("h"), "left_semi")
    val covered = hits.select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tp"))
      .dropDuplicates(idCol, "tp")
    val tokPos = toks.select(col(idCol),
      posexplode(col("t")).as(Seq("tp", "tok")))
    val rebuilt = tokPos.join(covered, Seq(idCol, "tp"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("tp"), col("tok")))),
          p => p.getField("tok")), " ").as(textCol))
    toks.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }
}
