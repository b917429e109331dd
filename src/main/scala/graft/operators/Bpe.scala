package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.plans.BpeExpression

/** Distributed byte-pair-encoding merge learning (Sennrich et al.
  * 2016, alg. 1) — the tokenizer-induction step of a training-data
  * pipeline, run on the cluster instead of a single-node word counter.
  *
  * Shape: the CORPUS is touched exactly once — one explode + groupBy
  * shuffle producing the word-frequency table (`wordCounts`). The
  * learn loop then runs entirely over that VOCABULARY table (|V| rows;
  * Heaps'-law sublinear in corpus size, comfortably cluster-cached at
  * 100 TB corpus scale): per merge, one map-combined pair-count
  * aggregation over ~|V|·avg_word_len narrow (lhs, rhs, cnt) rows, a
  * 1-row `collect()` for the argmax pair (metadata-sized driver
  * decision, like the IVF-centroid pattern), and one codegen
  * projection applying the merge ([[graft.plans.BpeMerge]] — greedy
  * left-to-right, k chained merges stay one WholeStageCodegen span).
  * Generations are persisted and retired once the successor is
  * materialized, so each iteration reads the previous generation, not
  * the whole lineage.
  *
  * Tie-break is fully deterministic and oracle-aligned: max total
  * frequency, then lexicographically smallest (lhs, rhs) in UTF-8
  * BYTE order (Spark UTF8String comparison == DuckDB binary
  * collation; the gopherRepetition code-point lesson). `asciiOnly`
  * (default) restricts the vocabulary to printable-ASCII words so
  * per-character splitting agrees across engines regardless of their
  * grapheme/code-point conventions; non-ASCII corpora work (the
  * kernel is code-point-based) but the oracle contract is ASCII.
  */
object Bpe {

  /** One learned merge: rank (1-based), the pair, its frequency. */
  case class Merge(rank: Int, lhs: String, rhs: String, freq: Long)

  /** Word-frequency table from a corpus: (w, cnt). The single corpus
    * pass; everything after runs on this table. */
  def wordCounts(docs: DataFrame, textCol: String,
                 asciiOnly: Boolean = true): DataFrame = {
    val words = docs.select(
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
    val filtered = if (asciiOnly) words.filter(col("w").rlike("^[!-~]+$"))
                   else words
    filtered.groupBy("w").agg(count(lit(1)).as("cnt"))
  }

  /** Per-character initial symbol array for a word column. The empty
    * string needs its own branch: `sequence(1, 0)` generates the
    * DESCENDING [1, 0] (Spark's sequence walks toward the stop value),
    * which would yield two empty symbols instead of an empty array —
    * unreachable via [[wordCounts]] (tokens are \S+ matches) but wrong
    * for direct callers of the public API. */
  def charSymbols(w: Column): Column =
    when(length(w) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(w)), i => substring(w, i, lit(1))))

  /** BYTE-LEVEL initial symbol array (the GPT-2 contract): one symbol
    * per UTF-8 BYTE, rendered as its 2-hex-digit string — the same
    * move as GPT-2's bytes→printable table, with hex as the printable
    * alphabet because BOTH engines produce it natively (`hex()` is
    * uppercase in Spark and DuckDB) and hex-pair lexicographic order
    * is monotone in byte value, so the tie-break agrees byte-for-byte.
    * Merged symbols concatenate to even-length hex runs; decode with
    * [[graft.functions.BpeOps]]-side unhex when rendering. No ascii
    * filter is needed upstream: every UTF-8 string — CJK, accents,
    * emoji — splits into the same 256-symbol alphabet, which is the
    * point of byte-level BPE. */
  def byteSymbols(w: Column): Column = {
    val h = hex(w)
    when(length(w) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), (length(h) / lit(2)).cast("int")),
        i => h.substr(i * lit(2) - lit(1), lit(2))))
  }

  /** Initial-alphabet selector shared by the learners and encoders:
    * code-point symbols (the ASCII oracle contract) or byte-level hex
    * symbols (the non-ASCII / GPT-2 contract). */
  private def symbols(w: Column, byteLevel: Boolean): Column =
    if (byteLevel) byteSymbols(w) else charSymbols(w)

  /** Apply an ordered merge list to a symbol-array column (the ENCODE
    * step): k chained greedy passes in one codegen projection. */
  def applyMerges(syms: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(syms)((s, m) =>
      BpeExpression.bpeMerge(s, lit(m.lhs), lit(m.rhs)))

  /** Learn `numMerges` merges from a (w, cnt) word-frequency table.
    * Returns the driver-held merge list (vocabulary-derived metadata —
    * the artifact a tokenizer ships with). Stops early if no pair
    * remains (every word reduced to one symbol). */
  def learnFromWords(words: DataFrame, numMerges: Int,
                     byteLevel: Boolean = false): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var cur = words
      .select(col("w"), col("cnt"), symbols(col("w"), byteLevel).as("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var k = 1
    var exhausted = false
    // loop width ∝ word rows (Heaps-sublinear, usually tiny locally):
    // each merge round's pair aggregation otherwise shuffles a
    // vocabulary-sized frame at the session default width, paying the
    // empty-task scheduling floor once per learned merge — the same
    // fix as Graph.loopWidth / the CC loop. Count doubles as warm-up.
    val w = Graph.loopWidth(words.sparkSession, cur.count())
    Graph.withShuffleWidth(words.sparkSession, w) {
    while (k <= numMerges && !exhausted) {
      val best = cur.filter(size(col("s")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(s) - 1), " +
            "i -> struct(s[i-1] AS lhs, s[i] AS rhs))")).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(desc("freq"), asc("lhs"), asc("rhs"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val row = best.head
        val (l, r, f) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += Merge(k, l, r, f)
        // the next generation exists only to feed the NEXT round's
        // pair count — after the final accepted merge it would be
        // materialized and immediately discarded (one full vocab
        // segmentation pass for nothing), so skip it
        if (k < numMerges) {
          // localCheckpoint, not persist: persist caches blocks but keeps
          // the LINEAGE, so generation R's logical plan would carry all R
          // preceding merge projections — plan size (and AQE's plan-string
          // rendering) grows quadratically over a real multi-k-merge learn
          // and OOMs the driver long before the data does. Checkpointing
          // materializes AND truncates; the retired generation's blocks
          // are dropped by the context cleaner once unreferenced.
          val next = cur.withColumn("s",
              BpeExpression.bpeMerge(col("s"), lit(l), lit(r)))
            .localCheckpoint(true)
          cur.unpersist()
          cur = next
        }
        k += 1
      }
    }
    }
    cur.unpersist()
    merges.toSeq
  }

  /** Batched merge learning — the scale path for real (32k-merge)
    * vocabularies, where [[learnFromWords]]' one aggregation job + one
    * 1-row collect PER MERGE makes the driver round-trip the serial
    * axis. Each round computes pair counts once, pulls the top
    * `batchK` pairs to the driver (metadata-sized), and accepts a
    * SPECULATIVE BATCH of merges that is provably identical to running
    * that many sequential greedy rounds:
    *
    *  - walk the (freq DESC, lhs, rhs) order; accept pairs while each
    *    is fully independent of every earlier accepted pair — symbol
    *    sets {lhs, rhs, lhs+rhs} pairwise disjoint. Independence means
    *    no accepted merge can create, destroy, or re-count another
    *    accepted pair's occurrences, so their counts — and their
    *    relative greedy order — are invariant across the batch.
    *  - stop at the FIRST interacting pair, and trim the accepted list
    *    to counts STRICTLY ABOVE everything unaccepted (t = the count
    *    of the first rejected pair, or of the K-th row when the whole
    *    page was accepted, since row K+1 is unseen). Any pair a batch
    *    merge CAN touch — decremented neighbors (x,a)/(b,y), or new
    *    pairs (x,ab)/(ab,y), whose counts are bounded by those old
    *    neighbors — interacts with an accepted pair, therefore sits at
    *    or below t, therefore can never outrank a remaining accepted
    *    merge mid-batch. The strict > also removes tie-break races
    *    (a new pair like (ab,y) can sort lexicographically BEFORE an
    *    equal-count accepted pair).
    *  - if trimming leaves nothing, fall back to the plain greedy step
    *    (accept p1 alone — p1 is the argmax by definition).
    *
    * Result: exactly [[learnFromWords]]' merge sequence (spec-pinned;
    * the q_bpe_merges oracle replays the sequential chain against this
    * learner's output every run), at ~batch-size fewer jobs — the
    * 1k-merge measurement is in PLANS.md. */
  def learnFromWordsBatched(words: DataFrame, numMerges: Int,
                            batchK: Int = 256,
                            byteLevel: Boolean = false): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(batchK >= 1, s"batchK must be >= 1, got $batchK")
    var cur = words
      .select(col("w"), col("cnt"), symbols(col("w"), byteLevel).as("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    // right-sized loop width, as in [[learnFromWords]]
    val w = Graph.loopWidth(words.sparkSession, cur.count())
    Graph.withShuffleWidth(words.sparkSession, w) {
    while (merges.length < numMerges && !exhausted) {
      val top = cur.filter(size(col("s")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(s) - 1), " +
            "i -> struct(s[i-1] AS lhs, s[i] AS rhs))")).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(desc("freq"), asc("lhs"), asc("rhs"))
        .limit(batchK).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        // greedy prefix acceptance with pairwise independence
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val used = scala.collection.mutable.HashSet.empty[String]
        var stopped = false
        var cutoff = Long.MinValue // freq of the first unaccepted pair
        for (p @ (l, r, f) <- top if !stopped) {
          val syms = Seq(l, r, l + r)
          if (syms.exists(used)) {
            stopped = true; cutoff = f
          } else {
            accepted += p; used ++= syms
          }
        }
        if (!stopped) cutoff = top.last._3 // row batchK+1 unseen: bound by row K
        val safe0 = accepted.takeWhile(_._3 > cutoff)
        // empty only via ties at the very top; a single greedy step is
        // always sound (p1 IS the argmax under the full tie-break)
        val safe = if (safe0.nonEmpty) safe0 else accepted.take(1)
        val batch = safe.take(numMerges - merges.length)
        batch.foreach { case (l, r, f) =>
          merges += Merge(merges.length + 1, l, r, f)
        }
        // skip the post-final-round generation (see learnFromWords):
        // it would be one full vocab segmentation pass, discarded
        if (merges.length < numMerges) {
          // localCheckpoint truncates lineage per round (see the note in
          // [[learnFromWords]]): without it the plan accumulates every
          // prior round's chained merge expressions and driver memory —
          // not the cluster — becomes the learn loop's limit
          val next = cur.withColumn("s",
              batch.foldLeft(col("s")) { case (s, (l, r, _)) =>
                BpeExpression.bpeMerge(s, lit(l), lit(r))
              })
            .localCheckpoint(true)
          cur.unpersist()
          cur = next
        }
      }
    }
    }
    cur.unpersist()
    merges.toSeq
  }

  /** Learn merges straight from a corpus. Runs the BATCHED learner —
    * the production path; [[learnFromWords]] stays as the one-merge-
    * per-round reference implementation (BpeSpec pins sequence
    * equality, and each q_bpe_* oracle replays the sequential greedy
    * chain against this learner's output every run). */
  def learn(docs: DataFrame, textCol: String, numMerges: Int,
            asciiOnly: Boolean = true, byteLevel: Boolean = false): Seq[Merge] =
    learnFromWordsBatched(wordCounts(docs, textCol, asciiOnly), numMerges,
      byteLevel = byteLevel)

  /** Corpus-level ENCODE via the word cache: each DISTINCT word
    * segments once (k chained codegen merge passes over the
    * vocabulary — Heaps'-law small), documents then join their tokens
    * against the segmented vocabulary on the word key and reassemble
    * in token order. This is how production BPE encoders amortize the
    * merge walk: the per-word result is memoized, the corpus pass is
    * a join, not a re-segmentation — and on Spark the memo IS a
    * DataFrame, so the cache is cluster-sized, not per-process.
    *
    * Returns (idCol, encoded, n_subwords): subwords space-joined in
    * document order. Non-ASCII tokens are excluded when `asciiOnly`
    * (must match how `merges` was learned). At scale the vocab side
    * broadcasts (a few million words); past that it becomes a
    * shuffle join on the word key — the same key the word-count agg
    * already produced. */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[Merge], asciiOnly: Boolean = true,
                 byteLevel: Boolean = false): DataFrame = {
    val vocab = wordCounts(docs, textCol, asciiOnly)
      .select(col("w"),
        applyMerges(symbols(col("w"), byteLevel), merges).as("__seg"))
    val toks = docs.select(col(idCol),
      posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as(Seq("__pos", "w")))
    // the vocab (distinct words, Heaps-law sublinear) is the broadcast
    // side BY CONTRACT: without the hint Spark sizes the exploded token
    // table off the compressed parquet footprint and can pick IT as the
    // build side — broadcasting the corpus (measured 47x on 10x data
    // before the hint). Past executor-memory vocabularies: drop the
    // hint and let the join shuffle on w.
    toks.join(broadcast(vocab), Seq("w"))
      .groupBy(col(idCol))
      .agg(
        array_join(flatten(
          transform(sort_array(collect_list(struct(col("__pos"), col("__seg")))),
            p => p.getField("__seg"))), " ").as("encoded"),
        sum(size(col("__seg"))).as("n_subwords"))
  }

  /** The merge list as a DataFrame (rank, lhs, rhs, freq). */
  def mergesDf(spark: org.apache.spark.sql.SparkSession,
               merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "lhs", "rhs", "freq")
  }

  /** Persist the learned merge list — THE tokenizer artifact a
    * training run ships with (the merges.txt of a real BPE tokenizer,
    * as parquet so it lives next to the corpus release and any
    * engine can read it). One tiny file; rank order restores the
    * greedy application order exactly. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[Merge], path: String): Unit =
    mergesDf(spark, merges).coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a persisted merge list; [[applyMerges]]/[[encodeDocs]] on
    * the loaded artifact segment exactly as the learning run did
    * (round-trip spec-pinned). */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[Merge] =
    spark.read.parquet(path).select("rank", "lhs", "rhs", "freq")
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.rank).toSeq

  // ---- published GPT-2 merges.txt interchange -----------------------
  // Real pipelines tokenize with a PUBLISHED tokenizer; the artifact
  // format is GPT-2's merges.txt (Radford et al. 2019, encoder.py —
  // public): an optional `#version:` comment, then one "lhs rhs" pair
  // per line in merge-priority order, tokens written in the
  // bytes→unicode alphabet. This block converts that alphabet to/from
  // the engine's byte-level hex symbols so [[applyMerges]]/
  // [[encodeDocs]] consume an external tokenizer unchanged.

  /** GPT-2's bytes→unicode table: printable bytes ('!'..'~',
    * '¡'..'¬', '®'..'ÿ') map to their own code point; the remaining
    * 68 bytes map to 256+n in increasing byte order. Bijective, so
    * merges.txt tokens decode losslessly back to bytes. */
  private lazy val gpt2Unicode: Map[Int, Char] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val base = printable.map(b => b -> b.toChar).toMap
    val extra = (0 to 255).filterNot(printable).zipWithIndex
      .map { case (b, n) => b -> (256 + n).toChar }
    base ++ extra
  }
  private lazy val gpt2Byte: Map[Char, Int] = gpt2Unicode.map(_.swap)

  /** One merges.txt token → this engine's byte-level symbol (the
    * uppercase-hex rendering of [[byteSymbols]]). */
  def gpt2TokenToHex(tok: String): String =
    tok.map(c => f"${gpt2Byte.getOrElse(c,
      throw new IllegalArgumentException(
        s"not a GPT-2 alphabet char: '$c' (U+${c.toInt}%04X) in token '$tok'"))}%02X")
      .mkString

  /** Inverse of [[gpt2TokenToHex]]: an even-length hex symbol → the
    * merges.txt rendering of its bytes. */
  def hexToGpt2Token(hexSym: String): String = {
    require(hexSym.length % 2 == 0, s"odd-length hex symbol: $hexSym")
    hexSym.grouped(2).map(h => gpt2Unicode(Integer.parseInt(h, 16))).mkString
  }

  /** Parse the published merges.txt format into a byte-level merge
    * chain (freq is unknown to the format — recorded as -1; only
    * rank/lhs/rhs drive [[applyMerges]]). `#`-comment and blank lines
    * skip; the pair separator is a single plain space (a SPACE BYTE
    * inside a token is impossible — GPT-2's alphabet renders 0x20 as
    * 'Ġ'). */
  def loadMergesText(lines: Iterator[String]): Seq[Merge] =
    lines.map(_.stripLineEnd)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .zipWithIndex.map { case (l, i) =>
        l.split(" ") match {
          case Array(a, b) =>
            Merge(i + 1, gpt2TokenToHex(a), gpt2TokenToHex(b), -1L)
          case _ => throw new IllegalArgumentException(
            s"merges.txt line ${i + 1} is not 'lhs rhs': '$l'")
        }
      }.toSeq

  /** [[loadMergesText]] from a file path (the published artifact on
    * shared storage). */
  def loadMergesTextFile(path: String): Seq[Merge] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try loadMergesText(src.getLines()) finally src.close()
  }

  /** [[loadMergesText]] from a classpath resource (the bundled
    * sample ships at /graft/gpt2_merges_subset.txt). */
  def loadMergesTextResource(resource: String): Seq[Merge] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"merges.txt resource missing: $resource")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try loadMergesText(src.getLines()) finally src.close()
  }

  /** Render a graft-learned byte-level chain in the published format,
    * so a tokenizer induced here ships to any GPT-2-compatible
    * consumer. Exact inverse of [[loadMergesText]] up to freq. */
  def renderMergesText(merges: Seq[Merge]): String =
    ("#version: 0.2" +: merges.sortBy(_.rank).map(m =>
      s"${hexToGpt2Token(m.lhs)} ${hexToGpt2Token(m.rhs)}")).mkString("\n")

  // ---- GPT-2 pre-tokenization --------------------------------------
  // The published GPT-2 tokenizer (Radford et al. 2019, encoder.py)
  // does NOT split on whitespace: it first applies a pre-tokenization
  // regex — contraction suffixes, optionally-space-prefixed letter /
  // digit / punctuation runs, and whitespace runs that yield their
  // final character to the following token — and only then runs the
  // byte-level merge chain within each pre-token. Word boundaries are
  // half the tokenizer contract: whitespace-split words under the same
  // merges give DIFFERENT token counts than tiktoken/HF on real text.

  /** The GPT-2 `pat` regex in Java syntax. `(?U)` switches `\s` to the
    * Unicode White_Space property, matching the Python `regex` module's
    * semantics the published tokenizer was built on (NBSP, U+2028 etc.
    * are whitespace); `\p{L}`/`\p{N}` are Unicode in both engines
    * already. The trailing `\s+(?!\S)|\s+` pair is what hands a run's
    * last whitespace char to the next pre-token (" world" tokens). */
  val gpt2PreTokenPattern: String =
    "(?U)'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  /** GPT-2 pre-tokens of a text column as `array<string>` — one
    * codegen'd `regexp_extract_all`, no UDF. The pattern partitions
    * the input: concatenating the pre-tokens restores the text
    * byte-for-byte (spec-pinned), so nothing is lost before the merge
    * chain. */
  def gpt2PreTokens(c: Column): Column =
    regexp_extract_all(c, lit(gpt2PreTokenPattern), lit(0))

  /** Pre-token-frequency table under the GPT-2 regex — the
    * [[wordCounts]] of the published-tokenizer path (pre-tokens keep
    * their leading space and any non-ASCII bytes: byte-level symbols
    * cover the full alphabet, so there is no ascii filter here). */
  def wordCountsGpt2(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(gpt2PreTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Corpus-level ENCODE under GPT-2 pre-tokenization: the
    * [[encodeDocs]] word-cache shape (each DISTINCT pre-token segments
    * once, documents join and reassemble in order) with the published
    * regex supplying the word boundaries and byte-level symbols always
    * on — feed it [[loadMergesTextFile]]'s chain and the token stream
    * matches the published tokenizer end-to-end. */
  def encodeDocsGpt2(docs: DataFrame, idCol: String, textCol: String,
                     merges: Seq[Merge]): DataFrame = {
    val vocab = wordCountsGpt2(docs, textCol)
      .select(col("w"), applyMerges(byteSymbols(col("w")), merges).as("__seg"))
    val toks = docs.select(col(idCol),
      posexplode(gpt2PreTokens(col(textCol))).as(Seq("__pos", "w")))
    // explicit build side — see the [[encodeDocs]] hint note
    toks.join(broadcast(vocab), Seq("w"))
      .groupBy(col(idCol))
      .agg(
        array_join(flatten(
          transform(sort_array(collect_list(struct(col("__pos"), col("__seg")))),
            p => p.getField("__seg"))), " ").as("encoded"),
        sum(size(col("__seg"))).as("n_subwords"))
  }
}
