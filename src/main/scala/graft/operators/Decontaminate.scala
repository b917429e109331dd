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
}
