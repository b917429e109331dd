package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.plans.HashExpressions

/** Hashing-trick linear text classifier — fastText-style INFERENCE for
  * model-based quality filtering (the "quality classifier" stage of a
  * pretraining corpus pipeline, next to the heuristic
  * [[graft.functions.TextFunctions.qualityScore]]).
  *
  * Training is out of scope: the weight vector comes from any upstream
  * trainer (a logistic regression over hashed n-gram features has this
  * exact inference form). [[seededWeights]] supplies a deterministic
  * synthetic vector so the full pipeline — and its SQL oracle — is
  * replayable end to end without shipping a model artifact.
  *
  * Plan shape: ONE codegen kernel call per row inside the scan
  * projection ([[graft.plans.HashGramLogit]]), no explode, no shuffle,
  * no UDF — at 100 TB classification is embarrassingly parallel and
  * rides the same scan as the other per-document text signals. The
  * weight vector broadcasts with the task binary as an expression
  * reference object (exactly like the ANN hyperplane matrices), so
  * even a multi-million-bucket model costs its serialized size once
  * per executor, not per row. */
object Classify {

  /** Deterministic synthetic weight vector: w(b) = 2u-1 with u the
    * top-53-bit uniform of mix64(seed + b) — an exact dyadic rational
    * on both the JVM and any IEEE SQL engine, so oracles can rebuild
    * the identical model. `numBuckets` should be a power of two (see
    * [[TextHash.hashGramLogit]]'s bucket-modulus note). */
  def seededWeights(numBuckets: Int, seed: Long): Array[Double] = {
    require(numBuckets > 0, "numBuckets must be positive")
    Array.tabulate(numBuckets) { b =>
      val u = ((TextHash.mix64(seed + b) >>> 11) + 0.5) / 9007199254740992.0
      2.0 * u - 1.0
    }
  }

  /** Score documents with a hashed unigram+bigram linear model:
    * (id, logit rounded to 6, keep = raw logit > `threshold`). The
    * keep decision compares the UNROUNDED logit, which is
    * bit-reproducible across engines (same IEEE additions in the same
    * order), so the boolean is as replayable as the score. */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                weights: Array[Double], threshold: Double = 0.0): DataFrame =
    docs
      .select(col(idCol),
        HashExpressions.hashGramLogit(col(textCol), weights).as("__logit"))
      .select(col(idCol), round(col("__logit"), 6).as("logit"),
        (col("__logit") > threshold).as("keep"))
}
