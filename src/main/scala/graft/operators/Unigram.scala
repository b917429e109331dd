package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.UnigramVocab
import graft.plans.UnigramExpression

/** Unigram-LM tokenization (Kudo 2018 — the SentencePiece model
  * family), distributed: the BPE sibling's probabilistic counterpart.
  * Where BPE applies learned merges greedily, the unigram model picks
  * the MAX-LIKELIHOOD segmentation of each word under per-piece
  * log-probabilities via Viterbi.
  *
  * Same shape as [[Bpe]]: the corpus is touched once (token explode →
  * word-frequency table, Heaps'-law sublinear), the Viterbi DP runs
  * once per DISTINCT word as one codegen kernel call
  * ([[graft.plans.UnigramEncode]]), and documents re-assemble through
  * a broadcast join on the word cache. Scores are integer MICRO-NATS
  * throughout ([[UnigramVocab]]), so the segmentation — and the
  * DuckDB oracle's unrolled-DP replay — is exact, not
  * float-tolerance-matched.
  *
  * [[seedVocab]] is the EM INITIALIZATION of unigram training (the
  * frequent-substring seed lattice, scored by a deterministic
  * frequency-rewarding length-penalized surrogate); [[emRounds]] runs
  * the training loop itself (hard-EM with the Viterbi E-step
  * approximation, driver-applied rounds). Production vocabularies can
  * still arrive pre-trained via [[parseSpVocabText]] (the published
  * SentencePiece TSV dump format) exactly as BPE's arrive via
  * merges.txt. */
object Unigram {

  /** One vocabulary entry: piece + log-probability in micro-nats. */
  case class Piece(piece: String, lpMicro: Long)

  /** Build the expression-embeddable vocab object. */
  def vocabOf(pieces: Seq[Piece], unkMicro: Long): UnigramVocab =
    new UnigramVocab(pieces.map(_.piece).toArray,
      pieces.map(_.lpMicro).toArray, unkMicro)

  /** Frequent-substring seed vocabulary from a (w, cnt) word table
    * (the [[Bpe.wordCounts]] output): every substring of length
    * [minLen, maxLen] weighted by its words' counts, top-K by weight
    * with deterministic lexicographic tie-break, scored
    * `min(weight, cntCap) − (base + perLen·len)` — an integer
    * surrogate of log-probability that rewards frequency and
    * penalizes length, chosen (like the classifier's seeded weights)
    * so the WHOLE pipeline replays in SQL; real vocabularies come
    * from [[parseSpVocabText]].
    *
    * Single characters are deliberately absent: the encoder's
    * unknown-character fallback covers them uniformly, keeping the
    * seed lattice about MULTI-character pieces.
    *
    * Plan: one narrow substring explode over the word table (already
    * sublinear in corpus size), one map-combinable weight agg, one
    * TakeOrderedAndProject for the top-K. Returns
    * (piece, weight, lp_micro). */
  def seedVocab(words: DataFrame, minLen: Int = 2, maxLen: Int = 4,
                topK: Int = 200, base: Long = 1000000L,
                perLen: Long = 400000L, cntCap: Long = 500000L): DataFrame = {
    require(1 < minLen && minLen <= maxLen, "need 1 < minLen <= maxLen")
    val subs = words.select(
      explode(flatten(transform(
        sequence(lit(minLen), lit(maxLen)),
        l => filter(
          transform(sequence(lit(1), length(col("w"))),
            s => when(s <= length(col("w")) - l + 1, col("w").substr(s, l))),
          x => x.isNotNull)))).as("piece"),
      col("cnt"))
    subs.groupBy(col("piece")).agg(sum(col("cnt")).as("weight"))
      .orderBy(col("weight").desc, col("piece")).limit(topK)
      .select(col("piece"), col("weight"),
        (least(col("weight"), lit(cntCap)) -
          (lit(base) + lit(perLen) * length(col("piece")))).as("lp_micro"))
  }

  /** Collect a (piece, *, lp_micro) vocab frame to the driver-held
    * piece list (vocabulary metadata — the artifact a tokenizer
    * ships, like BPE's merge list). */
  def collectVocab(vocab: DataFrame): Seq[Piece] =
    vocab.select(col("piece"), col("lp_micro")).collect()
      .map(r => Piece(r.getString(0), r.getLong(1))).toSeq

  /** Viterbi-encode every document: (id, encoded, n_subwords), with
    * `encoded` the space-joined piece stream in document order.
    *
    * The DP runs once per DISTINCT word ([[Bpe.wordCounts]] cache);
    * non-ASCII words drop out via the inner join against the
    * ASCII-contract vocab, mirroring [[Bpe.encodeDocs]]. The word
    * cache is the broadcast side BY CONTRACT — Spark sizes the token
    * explode off its compressed parquet footprint and would otherwise
    * broadcast the corpus (the round-13 47× lesson). */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
                 pieces: Seq[Piece], unkMicro: Long): DataFrame = {
    val vocab = vocabOf(pieces, unkMicro)
    val words = Bpe.wordCounts(docs, textCol)
      .select(col("w"),
        UnigramExpression.unigramEncode(col("w"), vocab).as("__seg"))
    val toks = docs.select(col(idCol),
      posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as(Seq("__pos", "w")))
    toks.join(broadcast(words), Seq("w"))
      .groupBy(col(idCol))
      .agg(
        array_join(flatten(
          transform(sort_array(collect_list(struct(col("__pos"), col("__seg")))),
            p => p.getField("__seg"))), " ").as("encoded"),
        sum(size(col("__seg"))).as("n_subwords"))
  }

  /** Hard-EM (Viterbi-EM) vocabulary training rounds — the Kudo 2018
    * loop with the standard Viterbi E-step approximation (the
    * SentencePiece `--use_all_vocab`-free core, minus the pruning
    * schedule): each round segments every DISTINCT word under the
    * current vocabulary (one codegen DP call per word — the
    * [[encodeDocs]] kernel), counts pieces weighted by word frequency
    * (map-combined agg over the Heaps-sublinear word table — the
    * corpus itself is never re-scanned inside the loop), and
    * re-estimates `lp = floor(1e6 · ln(cnt/total))` micro-nats.
    * Rounds are driver-applied like `Classify.trainLogReg`: the
    * vocabulary (tokenizer-artifact-sized, ≤ topK rows) is collected
    * between rounds; pieces the Viterbi never uses drop out (the
    * likelihood-neutral part of SentencePiece's pruning).
    *
    * Exactness: within a round everything is integer except the
    * single `ln` per piece, computed by the SAME expression in Spark
    * and the oracle (`floor(ln(cnt/total)·1e6)` — the BM25/bigram-NLL
    * ln-parity contract); scores then feed the next round's pure-Long
    * DP, so segmentations replay exactly.
    *
    * Hard-EM monotonicity: the Viterbi segmentation's training
    * log-likelihood is non-decreasing round over round (each E-step
    * picks the argmax segmentation under the current probabilities;
    * each M-step is the ML estimate for the chosen segmentation) —
    * spec-pinned along with a hand-computed redistribution case.
    *
    * Returns the final round's (piece, cnt, lp_micro). */
  def emRounds(words: DataFrame, seed: Seq[Piece], unkMicro: Long,
               rounds: Int = 2): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val w = words.persist()
    var vocab = seed
    var out: DataFrame = null
    // right-sized loop width over the (Heaps-sublinear) word table —
    // the Graph.loopWidth discipline: per-round count/total aggs at
    // the session default width are rounds × an empty-task floor
    val lw = Graph.loopWidth(words.sparkSession, w.count())
    val res = Graph.withShuffleWidth(words.sparkSession, lw) {
    for (r <- 1 to rounds) {
      val v = vocabOf(vocab, unkMicro)
      val inVocab = vocab.map(_.piece)
      val segs = w.select(col("cnt"),
        explode(UnigramExpression.unigramEncode(col("w"), v)).as("piece"))
      // in-vocab pieces only: an unknown-character fallback is not a
      // vocabulary event and carries no probability mass
      val counts = segs.where(col("piece").isInCollection(inVocab))
        .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("n"))
      out = counts.crossJoin(broadcast(total))
        .select(col("piece"), col("cnt"),
          floor(log(col("cnt").cast("double") / col("n").cast("double"))
            * lit(1000000.0)).cast("long").as("lp_micro"))
      if (r < rounds) vocab = collectVocab(out)
    }
    // vocab-sized result; materialize it so the word cache releases
    // (inside the width scope: the eager checkpoint is what plans and
    // runs the final round's exchanges)
    out.localCheckpoint(true)
    }
    w.unpersist(false)
    res
  }

  /** Parse a SentencePiece vocabulary dump (the `spm_export_vocab` /
    * <model>.vocab TSV format: `piece<TAB>logprob` per line, logprob a
    * decimal float). Scores convert to micro-nats EXACTLY via scaled
    * decimal parsing — no float arithmetic — and must carry ≤6
    * decimals (true of shipped vocabs; a violation fails loudly
    * rather than rounding silently). Comment lines (#) and blanks are
    * skipped. */
  def parseSpVocabText(text: String): Seq[Piece] =
    text.linesIterator.map(_.replaceAll("\r$", "")).zipWithIndex
      .filter { case (l, _) => l.nonEmpty && !l.startsWith("#") }
      .map { case (line, i) =>
        val cut = line.indexOf('\t')
        require(cut > 0, s"line ${i + 1}: expected piece<TAB>logprob: $line")
        val piece = line.substring(0, cut)
        val micro = try {
          new java.math.BigDecimal(line.substring(cut + 1).trim)
            .movePointRight(6).longValueExact()
        } catch {
          case e: ArithmeticException => throw new IllegalArgumentException(
            s"line ${i + 1}: logprob has more than 6 decimals " +
              s"(micro-nat contract): $line", e)
        }
        Piece(piece, micro)
      }.toSeq

  /** [[parseSpVocabText]] over a bundled classpath resource. */
  def loadSpVocabResource(path: String): Seq[Piece] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"resource not found: $path")
    try parseSpVocabText(
      new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }
}
