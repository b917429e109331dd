package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Unigram language-model scoring — the standard cheap LM-quality
  * signal for training-data filtering (a CCNet-style perplexity proxy):
  * score(doc) = mean over token occurrences of -ln p(token), with
  * p estimated from the corpus itself.
  *
  * Plan shape: one explode + hash aggregation builds the vocabulary
  * (map-side partial combine shrinks it before the shuffle), the
  * 1-row total and the vocab broadcast back onto the exploded tokens,
  * and one final hash aggregation per doc. Two shuffles total, both on
  * natural keys. At 100 TB: cap the broadcast vocabulary with a
  * minimum-count floor (rare tokens → an UNK probability) — the
  * aggregation/broadcast shape is unchanged. */
object LmScore {

  /** Per-doc mean negative log-likelihood under the corpus unigram
    * model. `carry` columns (constant within a doc, e.g. the language)
    * ride through the explode and the per-doc aggregation via min(),
    * so downstream consumers need no extra join back to `docs`.
    * Docs with zero tokens have no NLL and drop out. */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String,
                 carry: Seq[String] = Nil): DataFrame = {
    val toks = docs.select(col(idCol) +: carry.map(col) :+
      explode(TextFunctions.tokens(col(textCol))).as("tok"): _*)
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).as("n"))
    toks
      .join(broadcast(vocab), "tok")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(round(avg(-log(col("c").cast("double") / col("n").cast("double"))), 4)
          .as("nll"),
        carry.map(c => min(col(c)).as(c)): _*)
  }

  /** Per-doc mean negative log-likelihood under an INTERPOLATED BIGRAM
    * model — one order up from [[unigramNll]] on the road to the
    * 5-gram KenLM CCNet actually ships: for each adjacent token pair,
    * p(w2|w1) = lambda·c(w1,w2)/c(w1) + (1−lambda)·c(w2)/N, averaged as
    * −ln p over the doc's bigram positions. The unigram interpolation
    * floor means unseen continuations never hit −ln 0.
    *
    * Plan shape: bigrams come from the tokens array via slice +
    * arrays_zip + explode — a NARROW per-row expansion, not a
    * (doc, pos) self-join — so the corpus is scanned once for counts
    * and once for scoring. Three count aggregations (unigram, bigram,
    * 1-row total) broadcast back onto the exploded pairs; the final
    * per-doc mean is one map-combined aggregation. The count joins
    * DECORATE the vocab-sized bigram table first (bi ⋈ uni ⋈ uni —
    * joins among count tables, bounded by |bigram vocab|), and the
    * corpus-sized pair stream then joins ONCE on (w1, w2) — not three
    * times as a naive formulation would. None of the joins carries a
    * broadcast hint (a hint is honored regardless of size, so on an
    * unbounded bigram table it would OOM the driver rather than
    * degrade): AQE broadcasts them while they fit and falls back to
    * shuffle joins on the token keys past that. At 100 TB the bigram
    * table additionally gets the same minimum-count UNK floor as the
    * unigram vocab (rare pairs → backoff-only). Only the 1-row corpus
    * total keeps an explicit broadcast.
    *
    * lambda defaults to 0.75 — an exact dyadic rational, so the
    * interpolation arithmetic replays bitwise in the SQL oracle.
    * Docs with fewer than 2 tokens have no bigram and drop out. */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
                lambda: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__ts"))
    val uni = toks.select(explode(col("__ts")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).as("n"))
    val pairs = toks.filter(size(col("__ts")) >= 2)
      .withColumn("a", slice(col("__ts"), lit(1), size(col("__ts")) - 1))
      .withColumn("b", slice(col("__ts"), lit(2), size(col("__ts")) - 1))
      .select(col(idCol), explode(arrays_zip(col("a"), col("b"))).as("p"))
      .select(col(idCol), col("p.a").as("w1"), col("p.b").as("w2"))
    val bi = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val decorated = bi
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(total))
    val p = lit(lambda) * (col("c12").cast("double") / col("c1").cast("double")) +
      lit(1.0 - lambda) * (col("c2").cast("double") / col("n").cast("double"))
    // the count tables (distinct bigrams, Heaps-sublinear — the
    // min-count UNK floor is the cap past broadcast scale) are the
    // build side BY CONTRACT: without the hint Spark sizes the
    // corpus-wide pair explode off the compressed parquet footprint
    // and broadcast it at 10x data (measured 4.7x regression)
    pairs
      .join(broadcast(decorated), Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(round(avg(-log(p)), 4).as("nll2"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §3.3): rank
    * every document by its LM score within its language and cut the
    * corpus into head / middle / tail terciles — head (lowest
    * perplexity) is the usual pretraining keep, tail the discard.
    *
    * Plan shape: [[unigramNll]] carries the language through its
    * per-doc aggregation (no join back to the corpus); the tercile
    * cutoffs are ONE tiny per-language aggregate broadcast back onto
    * the scored docs, and bucket assignment is a codegen comparison —
    * there is deliberately NO per-language ntile window, which would
    * funnel each language (at 100 TB, possibly most of the corpus)
    * through a single sort partition. Exact `percentile` holds one
    * language's score list in memory on the agg side; pass
    * `approxCutoffs = true` at corpus scale to swap in
    * `percentile_approx` (same plan, bounded state — the
    * [[Profile]] approxDistinct pattern). */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String,
                        approxCutoffs: Boolean = false): DataFrame = {
    val scored = unigramNll(docs, idCol, textCol, carry = Seq(langCol))
    val fracs = array(lit(1.0 / 3), lit(2.0 / 3))
    val cut =
      if (approxCutoffs) percentile_approx(col("nll"), fracs, lit(10000))
      else percentile(col("nll"), fracs)
    val cuts = scored.groupBy(col(langCol)).agg(cut.as("__qs"))
    scored.join(broadcast(cuts), langCol)
      .select(col(idCol), col(langCol), col("nll"),
        when(col("nll") <= element_at(col("__qs"), 1), lit("head"))
          .when(col("nll") <= element_at(col("__qs"), 2), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Per-group vocabulary top-k (corpus composition stats): the `k`
    * most frequent tokens per group, count-desc with token tie-break.
    * Two hash aggregations (map-side combine shrinks the exploded
    * tokens to per-partition vocab counts before either shuffle) and a
    * rank window that Spark plans as WindowGroupLimit — at most k rows
    * per group per partition reach the rank shuffle, so the result
    * stage is O(groups·k) regardless of corpus size. */
  def topTokens(docs: DataFrame, groupCol: String, textCol: String,
                k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.select(col(groupCol),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col(groupCol), col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("c").desc, col("tok"))))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("tok"), col("c"), col("rank"))
  }

  /** BM25 lexical retrieval: the top-`k` documents per query term,
    * scored with the standard Okapi formula
    * `idf(t) * tf / (tf + k1 * (1 - b + b * dl/avgdl))`,
    * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))` — the sparse half of a
    * hybrid (BM25 + embedding) retrieval stack, next to the dense
    * [[Similarity]] paths.
    *
    * Plan shape: one tokenize scan carries the doc length through the
    * explode so a single (doc, term) hash aggregation (map-combined)
    * yields tf AND dl; the term filter sits directly on the exploded
    * tokens, so only query-term occurrences — a vanishing fraction of
    * the corpus — reach that one shuffle. Document frequencies and
    * the corpus stats (N, avgdl: two scalars, collected driver-side)
    * aggregate from the already-tiny tf table and broadcast back.
    * Top-k per term plans WindowGroupLimit: at most k rows per term
    * per partition reach the rank shuffle. Scores are rounded to 6
    * decimals; ties rank by doc id, so the output is deterministic. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    rankCut(bm25Scores(docs, idCol, textCol, terms, k1, b), k)

  /** Per-(term, doc) BM25 scores over EVERY matching document — the
    * rank-free form [[bm25TopK]] cuts from, and the correct input
    * when a downstream consumer aggregates or re-ranks (the RRF
    * fusion query): cutting per-term at an arbitrary k before a
    * per-doc sum silently truncates contributions once a term
    * matches more than k docs. */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val base = tokenizedBase(docs, idCol, textCol)
    val stats = base
      .agg(count(lit(1)).as("n"), sum(size(col("__ts"))).as("sum_dl"))
      .head()
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n
    val tf = base
      .select(col("doc_id"), size(col("__ts")).cast("long").as("dl"),
        explode(col("__ts")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
    scoreBm25(tf, n, avgdl, k1, b)
  }

  /** The ONE tokenizer every BM25 path shares (inline, index build,
    * index append, AND any ranker fused with BM25 — the RRF query's
    * Jaccard side uses this too) — change it here or the persisted
    * postings and the query-time scorer silently diverge on term
    * boundaries. */
  def bm25Tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  private def tokenizedBase(docs: DataFrame, idCol: String,
                            textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), bm25Tokens(col(textCol)).as("__ts"))

  /** Per-document keyword extraction by the rarity-weighted tf/df
    * score, in integer micro-units: `tf·1e6 div df` — the log-free
    * cousin of tf-idf (idf without the log changes the weights, not
    * the "frequent here, rare elsewhere" shape), chosen because the
    * integer ranking replays EXACTLY in SQL where `ln` parity would
    * hang on libm. Top-`k` terms per doc, ties by term.
    *
    * Shuffle budget: one (doc, term) tf aggregation; the document-
    * frequency table is vocabulary-sized (Heaps-sublinear) and rides
    * a BROADCAST join by contract (the q_bpe_docs2 lesson: without
    * the hint Spark can size the exploded side off its compressed
    * footprint and broadcast the corpus); the per-doc rank lowers to
    * WindowGroupLimit. Returns (doc_id, term, tf, df, score_micro,
    * rank). */
  def keywordsTfIdf(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    val tf = tokenizedBase(docs, idCol, textCol)
      .select(col("doc_id"), explode(col("__ts")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("term"))
    tf.join(broadcast(df), Seq("term"))
      .withColumn("score_micro", expr("(tf * 1000000L) div df"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score_micro"), col("rank"))
  }

  /** Exact phrase occurrence counts: documents where `phrase` appears
    * as CONSECUTIVE tokens (the retrieval feature BM25's bag-of-words
    * scoring cannot express), with the occurrence count. The token
    * stream is filtered to the phrase's words BEFORE any join —
    * per-word selectivity makes the position joins near-free at any
    * corpus size — then each occurrence is the word-0 position whose
    * i-th successor holds word i for all i. Tokenization is
    * [[bm25Tokens]], shared with the whole retrieval family. */
  def phraseCount(docs: DataFrame, idCol: String, textCol: String,
                  phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val toks = tokenizedBase(docs, idCol, textCol)
      .select(col("doc_id"), posexplode(col("__ts")).as(Seq("pos", "term")))
      .filter(col("term").isin(phrase: _*))
      .persist()
    val first = toks.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matched = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (word, i)) =>
        val next = toks.filter(col("term") === word)
          .select(col("doc_id").as("__d"), (col("pos") - i).as("__p"))
        acc.join(next,
          acc("doc_id") === col("__d") && acc("pos") === col("__p"))
          .select(acc("doc_id"), acc("pos"))
    }
    // matching-doc-sized result; materialize it so the (corpus-sized)
    // filtered-token cache can be released instead of accumulating
    // across calls in a long-lived session (the returned frame reads
    // its own checkpoint blocks — the retained-cache contract of the
    // iterative/materialized results)
    val out = matched.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
      .localCheckpoint(true)
    toks.unpersist(false)
    out
  }

  /** Scoring tail shared by [[bm25TopK]] and [[bm25TopKIndexed]]:
    * takes the (doc_id, term, tf, dl) rows already restricted to the
    * query terms, derives per-term document frequencies, and ranks.
    * The expression trees mirror the oracle SQL token for token: every
    * intermediate is IEEE-deterministic (ln parity with libm is
    * pinned by the Box-Muller golden vectors in SimilaritySpec). */
  private def scoreBm25(tf: DataFrame, n: Long, avgdl: Double,
                        k1: Double, b: Double): DataFrame = {
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val score = (idf * col("tf")) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))
    tf.join(broadcast(dfreq), "term")
      .withColumn("score", round(score, 6))
      .select(col("term"), col("doc_id"), col("score"),
        col("tf"), col("dl"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of two top-k
    * rankings — the standard hybrid-retrieval combiner (lexical +
    * semantic, or any ranker pair): each list contributes
    * `1/(kRrf + rank)` for the documents it ranked, absent documents
    * contribute nothing (the deployed top-k-lists variant — full-
    * corpus ranks are never materialized, so there is no global sort
    * over the corpus, only over the two k-sized lists).
    *
    * Inputs are (idCol, rank) frames (rank 1-based). Output: top `k`
    * by fused score with both source ranks (null where a list missed
    * the doc). The fused double is replayable: integer+int division
    * and one fixed-order sum. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String = "doc_id",
              kRrf: Int = 60, k: Int = 10): DataFrame = {
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    val ra = a.select(col(idCol), col("rank").as("rank_a"))
    val rb = b.select(col(idCol), col("rank").as("rank_b"))
    ra.join(rb, Seq(idCol), "full_outer")
      .select(col(idCol), col("rank_a"), col("rank_b"),
        (coalesce(lit(1.0) / (lit(kRrf) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("rank_b")), lit(0.0)))
          .as("__rrf"))
      .orderBy(col("__rrf").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("rank_a"), col("rank_b"),
        round(col("__rrf"), 6).as("rrf_score"))
  }

  /** Bucketed catalog write shared by [[buildBm25Index]] (overwrite)
    * and [[appendToBm25Index]] (append; the catalog validates the
    * bucket spec against the existing table). */
  private def writeBm25(postings: DataFrame, table: String,
                        numBuckets: Int, mode: String): Unit =
    postings.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, "term")
      .sortBy("term")
      .saveAsTable(table)

  /** Rewrite the 1-row `<table>_stats` side table from driver-side
    * scalars (doc count, total token count — the BM25 analog of the
    * IVF quantizer header: the only non-postings state the scorer
    * needs). Values are collected before the overwrite so the write
    * never reads the table it replaces. */
  private def writeBm25Stats(spark: org.apache.spark.sql.SparkSession,
                             table: String, n: Long, sumDl: Long): Unit = {
    import spark.implicits._
    Seq((n, sumDl)).toDF("n", "sum_dl")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_stats")
  }

  /** Persist the BM25 inverted index: the FULL (term, doc_id, tf, dl)
    * postings table hash-bucketed on `term` via the session catalog,
    * plus the two corpus scalars (doc count, total token count) in a
    * 1-row `<table>_stats` side table. Built ONCE per corpus — the
    * tokenize scan and the one (doc, term) aggregation shuffle are
    * paid here; every subsequent [[bm25TopKIndexed]] batch reads ONLY
    * the buckets holding its query terms (bucket pruning) and plans
    * zero postings-side exchanges (the bucket layout satisfies both
    * the df aggregation and the per-term rank window). This is the
    * 100 TB shape: per-batch cost is O(postings of the query terms),
    * independent of corpus size. */
  def buildBm25Index(docs: DataFrame, table: String,
                     idCol: String = "doc_id", textCol: String = "text",
                     numBuckets: Int = 16): Unit = {
    val base = tokenizedBase(docs, idCol, textCol)
    writeBm25(postingsOf(base), table, numBuckets, "overwrite")
    val stats = base
      .agg(count(lit(1)).as("n"),
        coalesce(sum(size(col("__ts"))), lit(0L)).as("sum_dl"))
      .head()
    writeBm25Stats(docs.sparkSession, table, stats.getLong(0), stats.getLong(1))
  }

  /** Append a corpus DELTA (documents NOT already in the index — the
    * same new-rows contract as the ANN index appends) to a persisted
    * BM25 index: postings from the shared tokenizer appended through
    * the catalog (which validates the bucket spec, preserving the
    * pruned-probe layout), and the stats row advanced by the delta's
    * counts. Scores naturally shift as N/avgdl/df absorb the new
    * documents — exactly as a full rebuild would move them. */
  def appendToBm25Index(delta: DataFrame, table: String,
                        idCol: String = "doc_id", textCol: String = "text",
                        numBuckets: Int = 16): Unit = {
    val spark = delta.sparkSession
    val base = tokenizedBase(delta, idCol, textCol)
    writeBm25(postingsOf(base), table, numBuckets, "append")
    val old = spark.table(s"${table}_stats").head()
    val d = base
      .agg(count(lit(1)).as("n"),
        coalesce(sum(size(col("__ts"))), lit(0L)).as("sum_dl"))
      .head()
    writeBm25Stats(spark, table,
      old.getLong(0) + d.getLong(0), old.getLong(1) + d.getLong(1))
  }

  private def postingsOf(base: DataFrame): DataFrame =
    base
      .select(col("doc_id"), size(col("__ts")).cast("long").as("dl"),
        explode(col("__ts")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))

  /** Query a persisted BM25 index (see [[buildBm25Index]]); identical
    * semantics to [[bm25TopK]] with the tokenize scan and the
    * (doc, term) aggregation already paid at build time. The term
    * IN-filter prunes the bucketed postings scan to the query terms'
    * buckets. */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession, table: String,
                      terms: Seq[String], k: Int = 10,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val stats = spark.table(s"${table}_stats").head()
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n
    val tf = spark.table(table)
      .filter(col("term").isin(terms: _*))
      .select(col("doc_id"), col("term"), col("tf"), col("dl"))
    rankCut(scoreBm25(tf, n, avgdl, k1, b), k)
  }

  /** The top-k cut shared by the inline and indexed scorers. */
  private def rankCut(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("term"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("term"), col("doc_id"), col("rank"), col("score"))
  }

  // ---- published ARPA back-off LM interchange ------------------------
  // CCNet-style pipelines score documents with a SHIPPED KenLM model,
  // not one re-estimated from the corpus; the artifact format is ARPA
  // (Stolcke, SRILM; KenLM writes the same): log10 probabilities and
  // back-off weights in \1-grams:/\2-grams: sections. This block loads
  // the text format (orders 1-2) and scores documents with the standard
  // back-off rule — all as broadcast joins, no UDF in the hot path.

  /** A loaded bigram back-off model: unigram (word, log10 p, log10
    * back-off) and bigram (w1, w2, log10 p) rows. Must contain `<unk>`
    * (the OOV floor every real KenLM artifact carries). */
  case class ArpaModel(uni: Seq[(String, Double, Double)],
                       bi: Seq[(String, String, Double)]) {
    require(uni.exists(_._1 == "<unk>"), "ARPA model must define <unk>")
    def unkLp: Double = uni.find(_._1 == "<unk>").get._2
  }

  /** An order-n back-off model: `grams(k-1)` holds the k-gram rows
    * (words, log10 p, log10 back-off weight; 0.0 when the line carries
    * none — the highest order never does). Must contain `<unk>`. */
  case class ArpaModelN(order: Int,
                        grams: IndexedSeq[Seq[(Vector[String], Double, Double)]]) {
    require(order >= 1 && grams.length == order,
      s"grams must hold orders 1..$order")
    require(grams.head.exists(_._1 == Vector("<unk>")),
      "ARPA model must define <unk>")
    grams.zipWithIndex.foreach { case (rows, i) =>
      require(rows.forall(_._1.length == i + 1),
        s"order-${i + 1} section holds a wrong-length n-gram")
      require(rows.iterator.map(_._1).toSet.size == rows.size,
        s"duplicate ${i + 1}-gram in model (joins would multiply rows)")
    }
    def unkLp: Double = grams.head.find(_._1 == Vector("<unk>")).get._2
  }

  /** Parse the ARPA text format at ANY order (the 5-gram KenLM shape
    * CCNet ships): `\\data\\` header skipped, each `\\k-grams:` row is
    * `lp w1..wk [backoff]` (whitespace-separated; the optional trailing
    * field is the back-off weight of that k-gram as a CONTEXT —
    * `f.length == k+2` disambiguates it from the words, which cannot
    * contain whitespace in this format). */
  def loadArpaTextN(lines: Iterator[String]): ArpaModelN = {
    val bySection = scala.collection.mutable.Map
      .empty[Int, scala.collection.mutable.ArrayBuffer[(Vector[String], Double, Double)]]
    val sectionRe = "\\\\(\\d+)-grams:".r
    var section = 0
    lines.map(_.trim).filter(_.nonEmpty).foreach { l =>
      if (l.startsWith("\\")) {
        section = l match {
          case sectionRe(k) => k.toInt
          case _ => 0 // \data\, \end\: informational
        }
      } else if (section >= 1) {
        val k = section
        val f = l.split("\\s+")
        require(f.length == k + 1 || f.length == k + 2,
          s"bad $k-gram line (${f.length} fields): '$l'")
        val bo = if (f.length == k + 2) f(k + 1).toDouble else 0.0
        bySection.getOrElseUpdate(k,
          scala.collection.mutable.ArrayBuffer.empty) +=
          ((f.slice(1, k + 1).toVector, f(0).toDouble, bo))
      } // section 0: \data\ counts — informational only
    }
    require(bySection.nonEmpty, "no n-gram sections found")
    val order = bySection.keys.max
    require((1 to order).forall(bySection.contains),
      s"missing order sections below $order: have ${bySection.keys.toSeq.sorted}")
    ArpaModelN(order, (1 to order).map(k => bySection(k).toSeq).toIndexedSeq)
  }

  /** Parse an order-≤2 ARPA text into the bigram-shaped [[ArpaModel]]
    * (compat surface for [[arpaScoreDocs]]). Higher orders don't FIT
    * this shape — load them with [[loadArpaTextN]] and score with
    * [[arpaScoreDocsN]], which handles any order. */
  def loadArpaText(lines: Iterator[String]): ArpaModel = {
    val m = loadArpaTextN(lines)
    require(m.order <= 2,
      s"order-${m.order} model: use loadArpaTextN/arpaScoreDocsN " +
        "(this bigram-shaped API cannot hold it)")
    ArpaModel(
      m.grams(0).map { case (ws, lp, bo) => (ws.head, lp, bo) },
      if (m.order >= 2)
        m.grams(1).map { case (ws, lp, _) => (ws(0), ws(1), lp) }
      else Seq.empty)
  }

  /** [[loadArpaText]] from a classpath resource (the bundled sample
    * ships at /graft/sample_bigram.arpa). */
  def loadArpaResource(resource: String): ArpaModel = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"ARPA resource missing: $resource")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try loadArpaText(src.getLines()) finally src.close()
  }

  /** Score documents under an EXTERNAL bigram back-off model: the
    * first token scores as a unigram, every transition (w1, w2) as
    * `lp2(w1,w2)` when the bigram exists, else `bo(w1) + lp1(w2)`
    * (the published back-off rule); OOV words take `lp1(<unk>)` and
    * contribute no back-off weight. Output: per-doc mean negative
    * log10 probability per scored token (`nll10`) + the token count —
    * the CCNet filtering signal, comparable across documents.
    *
    * Plan shape: the model rides as two BROADCAST frames (a real
    * KenLM vocab is MBs — broadcast-sized by construction); tokens
    * explode once; three broadcast hash joins and one per-doc hash
    * aggregation. No sentence segmentation (`<s>`/`</s>` rows in the
    * model are simply never matched) — the whole-doc token stream is
    * the scoring unit, as in per-doc perplexity filtering. */
  def arpaScoreDocs(docs: DataFrame, idCol: String, textCol: String,
                    model: ArpaModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val uniDf = broadcast(model.uni.toDF("w", "lp1", "bo1"))
    val biDf = broadcast(model.bi.toDF("w1", "w2", "lp2"))
    val unk = lit(model.unkLp)
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__ts"))
      .filter(size(col("__ts")) >= 1)
    // first token: unigram (OOV -> <unk>)
    val firsts = toks.select(col(idCol), element_at(col("__ts"), 1).as("w"))
      .join(uniDf, Seq("w"), "left")
      .select(col(idCol), coalesce(col("lp1"), unk).as("lp"))
    // transitions: bigram, else backoff(w1) + unigram(w2)
    val pairs = toks.filter(size(col("__ts")) >= 2)
      .withColumn("a", slice(col("__ts"), lit(1), size(col("__ts")) - 1))
      .withColumn("b", slice(col("__ts"), lit(2), size(col("__ts")) - 1))
      .select(col(idCol), explode(arrays_zip(col("a"), col("b"))).as("p"))
      .select(col(idCol), col("p.a").as("w1"), col("p.b").as("w2"))
    val trans = pairs
      .join(biDf, Seq("w1", "w2"), "left")
      .join(uniDf.select(col("w").as("w1"), col("bo1")), Seq("w1"), "left")
      .join(uniDf.select(col("w").as("w2"), col("lp1").as("lp1w2")),
        Seq("w2"), "left")
      .select(col(idCol), coalesce(col("lp2"),
        coalesce(col("bo1"), lit(0.0)) + coalesce(col("lp1w2"), unk)).as("lp"))
    // the per-doc mean goes through an EXACT decimal sum (the
    // q_rrf_fusion pattern): double partial sums are merge-order-
    // sensitive and land exactly on round-at-6 ties for grid-valued
    // ARPA probabilities; decimal(28,10) sums are associative, so the
    // score is deterministic across partitionings and engines
    firsts.unionByName(trans)
      .groupBy(col(idCol))
      .agg(round(-(sum(col("lp").cast("decimal(28,10)")).cast("double") /
          count(lit(1)).cast("double")), 6).as("nll10"),
        count(lit(1)).as("n_scored"))
  }

  /** [[loadArpaTextN]] from a classpath resource (the bundled order-3
    * sample ships at /graft/sample_trigram.arpa). */
  def loadArpaResourceN(resource: String): ArpaModelN = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"ARPA resource missing: $resource")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try loadArpaTextN(src.getLines()) finally src.close()
  }

  /** Score documents under an EXTERNAL order-n back-off model — the
    * [[arpaScoreDocs]] rule generalized (Katz back-off as SRILM/KenLM
    * write it): each position takes the LONGEST matching n-gram ending
    * there; every context suffix longer than the match contributes its
    * back-off weight (0 when that context is not in the model, which
    * also covers doc-start positions with short contexts); an OOV word
    * bottoms out at `lp(<unk>)`. Formally, with context suffixes
    * u_1..u_c (c = min(pos-1, n-1)) and K = longest k with the k-gram
    * (u_{k-1}, w) in the model: score = lp_K + Σ_{j=K..c} bo(u_j).
    *
    * Plan shape: n lp-joins + (n-1) back-off joins, all BROADCAST
    * (2n-1 hash joins for a 5-gram model — the model is MBs, join keys
    * are token-array suffixes so no string concat collisions); the
    * corpus explodes once into (position, window) rows of ≤n tokens,
    * then one per-doc decimal-exact aggregation. Text never shuffles;
    * the only shuffle is the final per-doc agg, partial-aggregated
    * map-side. */
  def arpaScoreDocsN(docs: DataFrame, idCol: String, textCol: String,
                     model: ArpaModelN): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = model.order
    val unk = lit(model.unkLp)
    // the up-to-n-token window ending at each position (1-based i):
    // [ts[max(1, i-n+1)] .. ts[i]]
    val windows = expr(
      s"transform(sequence(1, size(__ts)), " +
        s"i -> slice(__ts, greatest(1, i - ${n - 1}), least(i, $n)))")
    var cur = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__ts"))
      .filter(size(col("__ts")) >= 1)
      .select(col(idCol), explode(windows).as("__g"))
    for (k <- 1 to n) { // lp_k: the k-gram ending at the position
      val tbl = broadcast(model.grams(k - 1)
        .map { case (ws, lp, _) => (ws, lp) }.toDF(s"__key$k", s"__lp$k"))
      cur = cur.withColumn(s"__key$k",
          when(size(col("__g")) >= k,
            expr(s"slice(__g, size(__g) - ${k - 1}, $k)")))
        .join(tbl, Seq(s"__key$k"), "left")
    }
    for (j <- 1 until n) { // bo_j: the j-token context suffix
      val tbl = broadcast(model.grams(j - 1)
        .map { case (ws, _, bo) => (ws, bo) }.toDF(s"__ctx$j", s"__bo$j"))
      cur = cur.withColumn(s"__ctx$j",
          when(size(col("__g")) >= j + 1,
            expr(s"slice(__g, size(__g) - $j, $j)")))
        .join(tbl, Seq(s"__ctx$j"), "left")
    }
    def boSum(fromJ: Int): Column =
      (fromJ until n).map(j => coalesce(col(s"__bo$j"), lit(0.0)))
        .foldLeft(lit(0.0))(_ + _)
    val lp = (n to 1 by -1).foldRight(boSum(1) + unk) { (k, fallback) =>
      when(col(s"__lp$k").isNotNull, boSum(k) + col(s"__lp$k"))
        .otherwise(fallback)
    }
    cur.select(col(idCol), lp.as("__lp"))
      .groupBy(col(idCol))
      .agg(round(-(sum(col("__lp").cast("decimal(28,10)")).cast("double") /
          count(lit(1)).cast("double")), 6).as("nll10"),
        count(lit(1)).as("n_scored"))
  }
}
