package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextHash

/** Custom Catalyst expressions for the near-dup signatures the built-in
  * function library lacks. Both participate in whole-stage codegen via
  * `doGenCode` emitting a single static-kernel call (the codegen shape
  * Spark's own hash expressions use), so they stay inside the
  * WholeStageCodegen span of the enclosing projection instead of
  * breaking it the way a Scala UDF would.
  */



/** 64-bit z-value (Morton interleave) of two long columns' low 32
  * bits — the sort key for multi-dimensional layout (see
  * [[graft.functions.BitOps]]). */
case class ZOrder64(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (left.dataType == org.apache.spark.sql.types.LongType &&
        right.dataType == org.apache.spark.sql.types.LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder64 requires (bigint, bigint), got (${left.dataType}, ${right.dataType})")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.BitOps.interleave64(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BitOps.interleave64($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "zorder64"
}

/** FNV-1a-64 of the whole string (content hash for deterministic
  * splits; oracle-replayable in SQL, unlike xxhash64). */
case class Fnv64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fnv64 requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    TextHash.fnv64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.fnv64($c)")
  override protected def withNewChildInternal(newChild: Expression): Fnv64 =
    copy(child = newChild)
  override def prettyName: String = "fnv64"
}

/** 64-bit Charikar SimHash of a string's whitespace-token multiset. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    TextHash.simhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Winnowing min-gram fingerprint (Schleimer et al., SIGMOD'03) over
  * k-byte grams. */
case class Winnow64(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow64 requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    TextHash.winnow64(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.winnow64($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Winnow64 =
    copy(child = newChild)
  override def prettyName: String = "winnow64"
}

/** Whole MinHash signature in one kernel pass — replaces numHashes
  * separate string-transform lambdas whose generated code took longer
  * to janino-compile than the query took to run. */
case class MinHash64(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash64 requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextHash.minhash64(v.asInstanceOf[UTF8String], k, numHashes))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextHash.minhash64($c, $k, $numHashes))")
  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
  override def prettyName: String = "minhash64"
}

/** Distinct sorted word-k-shingle hash set (array<long>) — the set
  * representation for exact Jaccard verification. */
case class Shingles64(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingles64 requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextHash.shingles64(v.asInstanceOf[UTF8String], k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextHash.shingles64($c, $k))")
  override protected def withNewChildInternal(newChild: Expression): Shingles64 =
    copy(child = newChild)
  override def prettyName: String = "shingles64"
}

/** splitmix64 finisher of a long column ([[TextHash.mix64]]) — the
  * oracle-replayable ordering hash for deterministic sampling (the
  * `q_ann_ivf` quantizer init), where built-in xxhash64 cannot be
  * reproduced by an independent SQL engine. */
case class Mix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"mix64 requires bigint input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    TextHash.mix64(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.mix64($c)")
  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
  override def prettyName: String = "mix64"
}

/** One-pass max-bigram-share (Gopher repetition signal) — replaces an
  * explode→count→max/sum pipeline that multiplied the corpus by
  * ~doc-length and shuffled it twice. -1.0 marks "fewer than 2 tokens"
  * (callers filter it, matching the SQL form's dropped rows). */
case class RepRatio64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"repratio64 requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    TextHash.repRatio64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.repRatio64($c)")
  override protected def withNewChildInternal(newChild: Expression): RepRatio64 =
    copy(child = newChild)
  override def prettyName: String = "repratio64"
}

/** C4-style boilerplate line filter ([[TextHash.cleanLines]]) as a
  * single codegen kernel call: per-row line filtering with no line
  * explode (the explode→filter→re-agg formulation shuffles the corpus
  * by ~line count; this is a narrow projection). */
case class CleanLines(child: Expression, minWords: Int)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"clean_lines requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    TextHash.cleanLines(v.asInstanceOf[UTF8String], minWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.cleanLines($c, $minWords)")
  override protected def withNewChildInternal(newChild: Expression): CleanLines =
    copy(child = newChild)
  override def prettyName: String = "clean_lines"
}

/** Unicode NFC normalization ([[graft.functions.Normalize.nfc]]):
  * canonical composition so byte-variant spellings of the same text
  * (é vs e+U+0301) share dedup keys — compose with sha2/fnv64 ahead
  * of any hash-keyed operator. Stays inside whole-stage codegen; the
  * already-normalized (incl. all-ASCII) path is identity. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    graft.functions.Normalize.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Normalize.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

/** Hashing-trick linear classifier logit ([[TextHash.hashGramLogit]]):
  * one pass over the text, unigram + adjacent-bigram FNV features into
  * the weight vector's buckets — the weights ride along as a
  * referenced object exactly like [[HyperplaneSig]]'s planes, and the
  * whole inference stays inside whole-stage codegen (the
  * transform/aggregate higher-order-function formulation would be
  * CodegenFallback and evaluate interpreted per row). */
case class HashGramLogit(child: Expression, weights: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hashgram_logit requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    TextHash.hashGramLogit(v.asInstanceOf[UTF8String], weights)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weights", weights, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.hashGramLogit($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): HashGramLogit =
    copy(child = newChild)
  override def prettyName: String = "hashgram_logit"
}

/** The feature-id half of [[HashGramLogit]]
  * ([[TextHash.hashGramBuckets]]): the identical unigram+bigram walk
  * emitting the bucket sequence (array<long>) instead of a weighted
  * sum — corpus-level feature distributions (DSIR) are then one
  * explode + count away, with the per-doc weighting left to
  * [[HashGramLogit]] so both sides provably share one feature space. */
case class HashGramBuckets(child: Expression, numBuckets: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hashgram_buckets requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    TextHash.hashGramBuckets(v.asInstanceOf[UTF8String], numBuckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.hashGramBuckets($c, $numBuckets)")
  override protected def withNewChildInternal(newChild: Expression): HashGramBuckets =
    copy(child = newChild)
  override def prettyName: String = "hashgram_buckets"
}

/** Gopher repetition battery ([[TextHash.gopherRepetition]]): nine
  * char-fraction repetition signals (top 2/3/4-gram, duplicate
  * 5..10-gram) in ONE pass with per-doc local counting — no explode,
  * no (doc, gram) shuffle, no UDF; the whole battery stays a narrow
  * codegen projection over the scan. */
case class GopherRepetition(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gopher_repetition requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    TextHash.gopherRepetition(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.gopherRepetition($c)")
  override protected def withNewChildInternal(newChild: Expression): GopherRepetition =
    copy(child = newChild)
  override def prettyName: String = "gopher_repetition"
}

/** Content-defined chunk cut positions (array<int>, ascending, last =
  * text length) — see [[graft.functions.TextHash.cdcCuts]] for the
  * boundary rule and its replay contract. */
case class CdcCuts(child: Expression, w: Int, maskBits: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cdc_cuts requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextHash.cdcCuts(v.asInstanceOf[UTF8String], w, maskBits))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextHash.cdcCuts($c, $w, $maskBits))")
  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
  override def prettyName: String = "cdc_cuts"
}

object HashExpressions {
  /** One-pass MinHash signature (array<long>) as a Column function. */
  def minhash64(c: Column, k: Int, numHashes: Int): Column =
    GraftSqlShim.column(MinHash64(GraftSqlShim.expression(c), k, numHashes))

  /** Content-defined chunk cut positions as a Column function. */
  def cdcCuts(c: Column, w: Int = 8, maskBits: Int = 6): Column =
    GraftSqlShim.column(CdcCuts(GraftSqlShim.expression(c), w, maskBits))

  /** Distinct sorted shingle-hash set as a Column function. */
  def shingles64(c: Column, k: Int): Column =
    GraftSqlShim.column(Shingles64(GraftSqlShim.expression(c), k))

  /** SimHash64 as a Column function. */
  def zorder64(a: Column, b: Column): Column =
    GraftSqlShim.column(ZOrder64(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  def fnv64(c: Column): Column =
    GraftSqlShim.column(Fnv64(GraftSqlShim.expression(c)))

  /** splitmix64 of a bigint column (oracle-replayable ordering hash). */
  def mix64(c: Column): Column =
    GraftSqlShim.column(Mix64(GraftSqlShim.expression(c)))

  def simhash64(c: Column): Column =
    GraftSqlShim.column(SimHash64(GraftSqlShim.expression(c)))

  /** One-pass max-bigram-share (-1.0 when the text has <2 tokens). */
  def repRatio64(c: Column): Column =
    GraftSqlShim.column(RepRatio64(GraftSqlShim.expression(c)))

  /** Hashing-trick classifier logit over a string column. */
  def hashGramLogit(c: Column, weights: Array[Double]): Column =
    GraftSqlShim.column(HashGramLogit(GraftSqlShim.expression(c), weights))

  /** Hashed-gram feature-bucket sequence over a string column. */
  def hashGramBuckets(c: Column, numBuckets: Int): Column =
    GraftSqlShim.column(HashGramBuckets(GraftSqlShim.expression(c), numBuckets))

  /** Gopher repetition-signal battery over a string column. */
  def gopherRepetition(c: Column): Column =
    GraftSqlShim.column(GopherRepetition(GraftSqlShim.expression(c)))

  /** C4-style boilerplate line filter over a string column. */
  def cleanLines(c: Column, minWords: Int): Column =
    GraftSqlShim.column(CleanLines(GraftSqlShim.expression(c), minWords))

  /** Winnowing fingerprint as a Column function. */
  def winnow64(c: Column, k: Int = 8): Column =
    GraftSqlShim.column(Winnow64(GraftSqlShim.expression(c), k))

  /** Hamming distance between two int64 signatures (built-in compose:
    * bit_count(a XOR b) — codegen'd, no custom expression needed). */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b)).cast("int")

  /** Unicode NFC normalization ([[NfcNormalize]]). */
  def nfcNormalize(c: Column): Column =
    GraftSqlShim.column(NfcNormalize(GraftSqlShim.expression(c)))
}
