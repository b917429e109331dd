package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, TextHash}
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

  /** DISTRIBUTED TRAINING for the quality classifier (the WebText/
    * GPT-3 pattern: logistic regression over hashed n-gram features,
    * positive = curated seed corpus, negative = raw crawl), closing
    * the loop that [[scoreDocs]] documents as "out of scope" for the
    * reference — on Spark, full-batch gradient descent IS a small
    * aggregation loop:
    *
    * per iteration (one job over the corpus):
    *  1. forward pass: the INFERENCE kernel itself
    *     ([[graft.plans.HashGramLogit]] with the current weights — the
    *     ordered IEEE fold, so z is bit-reproducible) computes every
    *     doc's logit inside the scan projection;
    *  2. residual `sigmoid(z) − y` rides the same projection;
    *  3. gradient: occurrences explode ([[graft.plans.HashGramFeatures]])
    *     and a map-combined `groupBy(bucket).sum(residual)` produces
    *     the ≤`numBuckets`-row gradient — the ONLY shuffle, 8-byte
    *     keys, metadata-sized result;
    *  4. the driver applies `w −= lr·g` (the IVF-centroid /
    *     BPE-argmax driver-decision pattern: model state is
    *     numBuckets doubles, never corpus-sized).
    *
    * Count features (x = raw occurrence count), zero init, no bias,
    * no regularization — the minimal exactly-replayable form; the
    * returned array feeds [[scoreDocs]] unchanged. At 100 TB each
    * iteration is one scan + one narrow shuffle; iterations are the
    * cost knob, exactly as in the reference pipelines (2-5 epochs). */
  def trainLogReg(docs: DataFrame, textCol: String, labelCol: String,
                  numBuckets: Int = 1024,
                  iters: Int = 3, lr: Double = 0.01): Array[Double] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // spread BEFORE the persist: the per-iteration forward pass is a
    // pure scan-projection kernel, so its parallelism is frozen at
    // persist time — a single-row-group input would run every
    // iteration's tokenize+hash fold on one core (measured wall ≈ cpu)
    val base = Spread.spread(docs.select(col(textCol).as("__text"),
        col(labelCol).cast("double").as("__y")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = Array.fill(numBuckets)(0.0)
    try {
      for (_ <- 1 to iters) {
        val residual =
          (lit(1.0) / (lit(1.0) +
            exp(-HashExpressions.hashGramLogit(col("__text"), w.clone())))) -
            col("__y")
        // residuals sum as fixed-scale DECIMAL: decimal addition is
        // exact and associative, so the gradient is independent of
        // partial-aggregation order — a plain double sum drifts with
        // partition order (and made the oracle flaky under DuckDB's
        // threaded aggregation). One rounding at the 1e-18 grid per
        // row, one double conversion per bucket.
        val grad = base
          .select(residual.as("__r"),
            explode(HashExpressions.hashGramBuckets(col("__text"), numBuckets))
              .as("__b"))
          .groupBy(col("__b"))
          .agg(sum(col("__r").cast("decimal(38,18)")).cast("double").as("__g"))
          .collect()
        grad.foreach { row =>
          val b = row.getLong(0).toInt
          w(b) = w(b) - lr * row.getDouble(1)
        }
      }
      w
    } finally base.unpersist()
  }

  /** Trained weights as a (bucket, weight) frame (rounded for
    * reporting; feed the ARRAY to [[scoreDocs]] for inference). */
  def weightsDf(spark: org.apache.spark.sql.SparkSession,
                w: Array[Double]): DataFrame = {
    import spark.implicits._
    // + 0.0 normalizes IEEE negative zero: a tiny negative weight
    // rounds to -0.0 in engines that keep the sign through round()
    // and to +0.0 in those that don't — the sum maps both to +0.0
    w.toSeq.zipWithIndex.toDF("__w", "bucket")
      .select(col("bucket"), (round(col("__w"), 6) + lit(0.0)).as("weight"))
  }

  /** One-vs-rest LANGUAGE ID over the same hashed n-gram kernel —
    * the classifier upgrade of the stopword-regex heuristic
    * ([[graft.functions.TextFunctions.langId]], which stays useful as
    * the cheap pre-filter): one linear model per language, prediction
    * = argmax logit. All L kernels run inside ONE scan projection (no
    * explode, no shuffle, no UDF — L more codegen folds per row, still
    * embarrassingly parallel at 100 TB), and the argmax is ONE
    * `greatest()` over (logit, -model_index, lang) structs — linear in
    * L (a chained when/otherwise that repeats the accumulator in both
    * branches doubles the expression tree per model: O(2^L) Catalyst
    * nodes, which hangs analysis at a realistic 50-170-language set).
    * Struct ordering is lexicographic, so equal logits fall through to
    * the LARGER -index = the EARLIEST model in `models` order. Each
    * weight vector broadcasts as an expression reference object
    * exactly like [[scoreDocs]]'.
    *
    * `models` come from [[trainLogReg]] one-vs-rest runs (label =
    * "is this language") or any upstream trainer; [[seededWeights]]
    * gives the replayable stand-in the `q_lang_id2` oracle rebuilds.
    * Returns (id, lang_pred, logit rounded to 6). */
  def langIdArgmax(docs: DataFrame, idCol: String, textCol: String,
                   models: Seq[(String, Array[Double])]): DataFrame = {
    require(models.nonEmpty, "langIdArgmax needs at least one model")
    val cands = models.zipWithIndex.map { case ((lang, w), i) =>
      struct(HashExpressions.hashGramLogit(col(textCol), w).as("logit"),
        lit(-i).as("__ord"), lit(lang).as("lang"))
    }
    val best = if (cands.sizeIs == 1) cands.head else greatest(cands: _*)
    docs.select(col(idCol), best.as("__best"))
      .select(col(idCol), col("__best.lang").as("lang_pred"),
        round(col("__best.logit"), 6).as("logit"))
  }

  /** LANGUAGE-ID TRAINING RECIPE: one-vs-rest [[trainLogReg]] runs
    * over a (text, lang) corpus — one logistic model per language,
    * ready for [[langIdArgmax]]. The language set is read from the
    * data (one distinct on the label column — metadata-sized), models
    * train in deterministic sorted-language order, and the labeled
    * corpus is persisted once across all L runs (each run re-scans
    * the cached projection, not the source).
    *
    * At 100 TB this is the realistic fastText-style recipe: training
    * data is a LABELED SLICE (Wikipedia/Tatoeba-style per-language
    * corpora), so L × iters jobs over the slice — not the corpus —
    * then inference over the full corpus is the one [[langIdArgmax]]
    * scan. Weights are DATA, not code: persist them with the release
    * (`weightsDf`) and replay inference bit-identically.
    * ClassifySpec's 24-language case is the accuracy evidence. */
  def trainLangId(docs: DataFrame, textCol: String, langCol: String,
                  numBuckets: Int = 4096, iters: Int = 3,
                  lr: Double = 0.1): Seq[(String, Array[Double])] = {
    // null labels are routine in real labeled slices: they can't name
    // a model, and training against them as "rest" rows would be
    // silent label noise — drop them up front
    val labeled = docs.filter(col(langCol).isNotNull)
    val langs = labeled.select(col(langCol).cast("string").as("__l"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    require(langs.nonEmpty, "trainLangId needs at least one labeled row")
    val base = labeled
      .select(col(textCol), col(langCol).cast("string").as("__l"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try langs.map { lang =>
      lang -> trainLogReg(
        base.select(col(textCol), (col("__l") === lang).cast("double").as("__y")),
        textCol, "__y", numBuckets, iters, lr)
    } finally { base.unpersist(); () }
  }

  /** Import a PUBLISHED fastText supervised model — the `fasttext
    * dump` text format (sections `args` / `dict` / `input` / `output`
    * concatenated, each preceded by its section-name line, exactly as
    * the four dump invocations emit them) — LINEARIZED onto the
    * hashed-gram kernel, the classifier-side analog of the
    * merges.txt / ARPA / SentencePiece-vocab interop family.
    *
    * fastText's supervised score is bilinear: logit_l = output_l ·
    * mean(input_w over tokens). Per LABEL that collapses to a linear
    * model over tokens — weight(l, w) = input_w · output_l — so the
    * import precomputes those dot products and lands each dict word's
    * weight in its [[TextHash.hashGramLogit]] unigram bucket
    * (floorMod(fnv64(word), numBuckets)). Inference is then the
    * existing [[langIdArgmax]] scan, bit-replayable like every other
    * imported model. Two documented deviations from fastText's own
    * scoring, neither affecting argmax: the 1/tokenCount scaling is
    * dropped (common to all labels), and the kernel's bigram features
    * contribute whatever mass hash collisions put in their buckets —
    * the hashing-trick contract of the surface.
    *
    * Supported subset, enforced LOUDLY: word-feature models only
    * (`minn`/`maxn` 0 — subword char-n-gram models like lid.176 use
    * fastText's OWN subword hash, a different kernel; re-dump with
    * `-minn 0 -maxn 0` or retrain word-level) and `wordNgrams` ≤ 1
    * (fastText word-bigrams hash into ITS bucket range). Labels drop
    * the `__label__` prefix. Returns (label, weights) in the model's
    * own label order, ready for [[langIdArgmax]]. */
  /** Parsed `fasttext dump` text: args map, (word, label) dict, and
    * the input/output matrices — the section walk shared by the
    * word-level ([[parseFastTextDump]]) and subword
    * ([[parseFastTextSubwordDump]]) imports. */
  private case class FastTextDump(args: Map[String, String],
                                  words: Vector[String],
                                  labels: Vector[String],
                                  dim: Int,
                                  input: Vector[Array[Double]],
                                  output: Vector[Array[Double]])

  private def parseDumpSections(text: String): FastTextDump = {
    val lines = text.linesIterator.map(_.replaceAll("\r$", "")).toVector
    val sectionNames = Set("args", "dict", "input", "output")
    val starts = lines.zipWithIndex
      .collect { case (l, i) if sectionNames(l.trim) => (l.trim, i) }
    require(starts.map(_._1).toSet == sectionNames,
      s"dump must contain all of $sectionNames; found ${starts.map(_._1)}")
    val sections: Map[String, Vector[String]] =
      starts.zipWithIndex.map { case ((name, from), si) =>
        val until = if (si + 1 < starts.length) starts(si + 1)._2
                    else lines.length
        name -> lines.slice(from + 1, until).filter(_.trim.nonEmpty)
      }.toMap
    val args = sections("args")
      .map(_.trim.split("\\s+")).collect { case Array(k, v) => k -> v }.toMap
    val dim = args.getOrElse("dim",
      sys.error("args section must declare dim")).toInt
    require(args.getOrElse("wordNgrams", "1").toInt <= 1,
      "wordNgrams > 1 uses fastText's own word-bigram bucket hashing; " +
        "import supports unigram-word models")
    val dict = sections("dict").map(_.trim.split("\\s+"))
    dict.foreach(p => require(p.length == 3,
      s"dict line must be '<token> <count> <type>': ${p.mkString(" ")}"))
    val words = dict.filter(_(2) == "word").map(_(0))
    val labels = dict.filter(_(2) == "label")
      .map(_(0).stripPrefix("__label__"))
    require(labels.nonEmpty, "model has no labels")
    def matrix(name: String, atLeast: Int): Vector[Array[Double]] = {
      val rows = sections(name).map(_.trim.split("\\s+").map(_.toDouble))
      require(rows.length >= atLeast,
        s"$name matrix has ${rows.length} rows, need >= $atLeast")
      rows.foreach(r => require(r.length == dim,
        s"$name row has ${r.length} values, dim is $dim"))
      rows
    }
    val input = matrix("input", words.length)
    val output = matrix("output", labels.length)
    require(output.length == labels.length,
      s"output matrix has ${output.length} rows for ${labels.length} labels")
    FastTextDump(args, words, labels, dim, input, output)
  }

  def parseFastTextDump(text: String,
                        numBuckets: Int = 1024): Seq[(String, Array[Double])] = {
    val d = parseDumpSections(text)
    require(d.args.getOrElse("minn", "0").toInt == 0 &&
      d.args.getOrElse("maxn", "0").toInt == 0,
      "subword (char n-gram) fastText models use fastText's own subword " +
        "hash, not the word-hashing kernel — import them with " +
        "parseFastTextSubwordDump / fastTextArgmax instead")
    d.labels.zipWithIndex.map { case (label, li) =>
      val w = new Array[Double](numBuckets)
      d.words.zipWithIndex.foreach { case (word, wi) =>
        val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val b = java.lang.Math.floorMod(
          TextHash.fnv64(bytes, 0, bytes.length), numBuckets.toLong).toInt
        var dd = 0.0
        var k = 0
        while (k < d.dim) { dd += d.input(wi)(k) * d.output(li)(k); k += 1 }
        w(b) += dd
      }
      label -> w
    }.toSeq
  }

  /** Import a SUBWORD (char n-gram) fastText supervised model — the
    * lid.176 class the word-level import loudly rejects — from the
    * same `fasttext dump` text format. The input section must carry
    * the full `nwords + bucket` rows (word rows first, then the
    * n-gram bucket rows — exactly what `fasttext dump model.bin
    * input` emits); inference runs the factored bilinear kernel
    * ([[graft.functions.FastText.argmax]] — see its doc for the
    * feature rules, the sign-extended FNV-1a-32 subword hash, and the
    * two documented score deviations). */
  def parseFastTextSubwordDump(text: String)
      : graft.functions.FastText.FastTextModel = {
    val d = parseDumpSections(text)
    val minn = d.args.getOrElse("minn", "0").toInt
    val maxn = d.args.getOrElse("maxn", "0").toInt
    require(minn > 0 && maxn >= minn,
      s"parseFastTextSubwordDump needs a subword model (minn > 0); " +
        s"got minn=$minn maxn=$maxn — word-level models import with " +
        "parseFastTextDump")
    val bucket = d.args.getOrElse("bucket",
      sys.error("args section must declare bucket for a subword model")).toInt
    graft.functions.FastText.FastTextModel(
      labels = d.labels.toArray, words = d.words.toArray,
      input = d.input.toArray, output = d.output.toArray,
      dim = d.dim, minn = minn, maxn = maxn, bucket = bucket)
  }

  /** [[parseFastTextDump]] over a bundled classpath resource. */
  def loadFastTextResource(path: String,
                           numBuckets: Int = 1024): Seq[(String, Array[Double])] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"resource not found: $path")
    try parseFastTextDump(new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8), numBuckets)
    finally in.close()
  }

  /** [[parseFastTextSubwordDump]] over a bundled classpath resource. */
  def loadFastTextSubwordResource(path: String)
      : graft.functions.FastText.FastTextModel = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"resource not found: $path")
    try parseFastTextSubwordDump(new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  /** Language ID under an imported SUBWORD fastText model: ONE
    * [[graft.plans.FastTextArgmax]] kernel call per row inside the
    * scan projection — no explode, no shuffle, the model broadcast
    * once per executor. Returns (id, lang_pred, logit rounded to 6);
    * both null for rows with no feature ids (empty text). */
  def fastTextArgmax(docs: DataFrame, idCol: String, textCol: String,
                     model: graft.functions.FastText.FastTextModel): DataFrame = {
    val labelArr = array(model.labels.toSeq.map(lit): _*)
    docs
      .select(col(idCol),
        graft.plans.FastTextExpressions
          .fastTextArgmax(col(textCol), model).as("__r"))
      .select(col(idCol),
        get(labelArr, col("__r.idx")).as("lang_pred"),
        round(col("__r.logit"), 6).as("logit"))
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

  /** Per-paragraph language segmentation: split each document on blank
    * lines, language-ID every paragraph with the
    * [[TextFunctions.langId]] heuristic, and roll up the per-document
    * code-switching profile a multilingual curation pipeline routes
    * on — mixed-language pages are a known contamination source that
    * whole-document language ID hides (a page that is 80% English
    * boilerplate around a French article IDs as English).
    *
    * Returns one row per document that has at least one non-blank
    * paragraph: (`id`, `n_paras`, `majority_lang`, `majority_cnt`,
    * `n_runs`, `majority_frac`) where `n_runs` counts maximal runs of
    * consecutive same-language paragraphs (1 = monolingual layout,
    * higher = interleaved) and ties for the majority break to the
    * lexicographically smallest language, deterministically.
    *
    * Plan shape: the paragraph explode is narrow; every downstream
    * stage — the run window, the (id, lang) count, the majority-pick
    * window, the per-doc rollup — is keyed on the document id, so the
    * whole rollup rides ONE hash exchange on `id`. Nothing is
    * corpus-global; safe at any scale. */
  def langSegments(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // spread: the per-paragraph langId kernel rides the scan stage
    // (the explode is pipelined, no exchange before it)
    // two-level projection for the langId kernel: the 5 per-language
    // evidence counts land in a lower select ONCE per paragraph; the
    // flat when-chain re-evaluated each count per branch condition it
    // appears in (up to 4 scans per language per paragraph — CASE
    // branches are invisible to codegen subexpression elimination).
    // Identical counts, identical argmax — bit-equal lp.
    val (en, fr, de, es, zh) = TextFunctions.langIdCounts(col("para"))
    val paras = Spread.spread(df)
      .select(col(idCol),
        posexplode(split(col(textCol), "\n\n")).as(Seq("pos", "para")))
      .where(length(trim(col("para"))) > 0)
      .select(col(idCol), col("pos"), en.as("__en"), fr.as("__fr"),
        de.as("__de"), es.as("__es"), zh.as("__zh"))
      .select(col(idCol), col("pos"),
        TextFunctions.langIdFrom(col("__en"), col("__fr"), col("__de"),
          col("__es"), col("__zh")).as("lp"))
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val sw = paras.withColumn("switch",
      when(lag(col("lp"), 1).over(byPos).isNull ||
           lag(col("lp"), 1).over(byPos) === col("lp"), lit(0L))
        .otherwise(lit(1L)))
    // SINGLE linear aggregation chain: `sw` used to fan out to two
    // aggregations (per-language counts AND per-doc totals) that were
    // then joined and ranked — re-executing the explode + langId
    // kernel + window sort subtree once per consumer (measured cpu ≈
    // 4× wall). Now one (id, lang) agg feeds one (id) agg; the
    // majority pick is min(struct(-cnt, lang)) — identical to the old
    // row_number over (cnt DESC, lang ASC) — so the ranking window
    // AND the join disappear and every operator is referenced once.
    val cnts = sw.groupBy(col(idCol), col("lp"))
      .agg(count(lit(1)).as("cnt"), sum(col("switch")).as("__sw"))
    cnts.groupBy(col(idCol))
      .agg(
        min(struct((-col("cnt")).as("nc"), col("lp").as("lp"))).as("__m"),
        sum(col("cnt")).as("n_paras"),
        (sum(col("__sw")) + lit(1L)).as("n_runs"))
      .select(col(idCol), col("n_paras"),
        col("__m.lp").as("majority_lang"),
        (-col("__m.nc")).as("majority_cnt"), col("n_runs"),
        ((-col("__m.nc")).cast("double") / col("n_paras").cast("double"))
          .as("majority_frac"))
  }
}
