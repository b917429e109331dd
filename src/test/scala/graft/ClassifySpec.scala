package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classify

/** Distributed classifier TRAINING (Classify.trainLogReg): the
  * trained model actually separates crafted classes, feeds the
  * existing inference kernel unchanged, and behaves deterministically.
  * The gradient-descent arithmetic is oracle-gated via
  * q_train_classifier. */
class ClassifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two vocabularies with zero overlap; a held-out doc per class
  private def corpus() = {
    val good = (1 to 40).map(i =>
      (s"excellent prose flows clearly here sample $i", 1.0))
    val bad = (1 to 40).map(i =>
      (s"spam junk garbage noise filler blob $i", 0.0))
    (good ++ bad).toDF("text", "y")
  }

  test("trainLogReg learns to separate disjoint-vocabulary classes; " +
    "the weights feed scoreDocs unchanged") {
    val w = Classify.trainLogReg(corpus(), "text", "y",
      numBuckets = 1024, iters = 5, lr = 0.05)
    val holdout = Seq(
      (1L, "excellent prose flows clearly here sample 999"),
      (2L, "spam junk garbage noise filler blob 999"))
      .toDF("doc_id", "text")
    val byId = Classify.scoreDocs(holdout, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getBoolean(2))).toMap
    assert(byId(1L)._1 > 0.5, s"positive class logit ${byId(1L)._1}")
    assert(byId(2L)._1 < -0.5, s"negative class logit ${byId(2L)._1}")
    assert(byId(1L)._2 && !byId(2L)._2)
  }

  test("one-vs-rest langIdArgmax with TRAINED models identifies " +
    "planted multilingual text; ties keep the earliest model") {
    // three fake "languages" with disjoint vocabularies
    val vocab = Map(
      "aa" -> "alpha apple anchor arrow atlas amber",
      "bb" -> "birch bottle barrel bridge bronze basket",
      "cc" -> "cedar copper circle candle canyon cactus")
    val train = vocab.toSeq.flatMap { case (lang, words) =>
      (1 to 30).map(i => (s"$words token$i", lang))
    }.toDF("text", "lang")
    val models = vocab.keys.toSeq.sorted.map { lang =>
      lang -> Classify.trainLogReg(
        train.select(col("text"), (col("lang") === lang).cast("double").as("y")),
        "text", "y", numBuckets = 1024, iters = 5, lr = 0.05)
    }
    val holdout = Seq(
      (1L, "anchor atlas alpha unseen"),      // aa vocabulary
      (2L, "bronze bridge basket unseen"),    // bb
      (3L, "candle canyon copper unseen")     // cc
    ).toDF("doc_id", "text")
    val got = Classify.langIdArgmax(holdout, "doc_id", "text", models)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "aa", 2L -> "bb", 3L -> "cc"))
    // tie-break: identical models => every logit ties => first wins
    val w0 = Classify.seededWeights(64, seed = 3L)
    val tied = Classify.langIdArgmax(holdout, "doc_id", "text",
      Seq("zz" -> w0, "aa" -> w0)).collect()
    assert(tied.forall(_.getString(1) == "zz"))
  }

  test("trainLangId at 24 languages: one-vs-rest recipe reaches >= 0.9 " +
    "held-out accuracy on realistic common-word text") {
    // ten high-frequency words per language (public common-word
    // knowledge; Latin, Cyrillic, Greek, Arabic, Hebrew, Devanagari,
    // CJK scripts all represented) — the realistic breadth the
    // planted-vocabulary cases above don't cover: neighbors like
    // es/pt, sv/da, pl/cs, ru/uk genuinely share words
    val vocab: Seq[(String, Array[String])] = Seq(
      "en" -> "the and of to in is you that it for",
      "es" -> "el la de que y en un ser se no",
      "fr" -> "le la de et les des en un que pour",
      "de" -> "der die und das ein zu ist nicht von mit",
      "it" -> "il di che la e un a per non sono",
      "pt" -> "o de a que e do da em um para",
      "nl" -> "de het een en van ik te dat die niet",
      "sv" -> "och det att i en jag som har av den",
      "da" -> "og det at en den til er som de ikke",
      "fi" -> "ja on ei se hän oli mutta kuin niin myös",
      "pl" -> "i w nie na się że jest z do to",
      "cs" -> "a je se na to že s z do už",
      "ro" -> "și de la a în cu pe este nu o",
      "hu" -> "a az és hogy nem is egy van de ez",
      "tr" -> "bir ve bu da ne için ile çok ama gibi",
      "el" -> "και να το που δεν από με για είναι τον",
      "ru" -> "и в не на я что он с как это",
      "uk" -> "і в не на я що він з як це",
      "ar" -> "في من على أن إلى عن هذا ما لا هو",
      "he" -> "של את על לא זה עם הוא גם אני כל",
      "hi" -> "के में है की और से को पर यह था",
      "ja" -> "の に は を た が で て と した",
      "zh" -> "的 一 是 不 了 人 我 在 有 他",
      "ko" -> "이 그 저 것 수 있다 하다 되다 보다 같다",
    ).map { case (l, ws) => l -> ws.split(" ") }
    assert(vocab.size == 24)
    // deterministic doc generator: 8 language words + 2 shared noise
    // tokens per doc, so classes are not trivially disjoint
    val noise = Array("2024", "http", "data", "x1", "id42")
    def doc(words: Array[String], rnd: scala.util.Random): String =
      ((1 to 8).map(_ => words(rnd.nextInt(words.length))) ++
        (1 to 2).map(_ => noise(rnd.nextInt(noise.length)))).mkString(" ")
    val train = vocab.flatMap { case (lang, ws) =>
      val rnd = new scala.util.Random(lang.hashCode)
      (1 to 30).map(_ => (doc(ws, rnd), lang))
    }.toDF("text", "lang")
    val holdout = vocab.flatMap { case (lang, ws) =>
      val rnd = new scala.util.Random(lang.hashCode * 7919 + 1)
      (1 to 5).map(i => (s"$lang-$i", doc(ws, rnd), lang))
    }.toDF("doc_id", "text", "lang")
    val models = Classify.trainLangId(train, "text", "lang",
      numBuckets = 4096, iters = 3, lr = 0.1)
    assert(models.map(_._1) == vocab.map(_._1).sorted)
    val pred = Classify.langIdArgmax(holdout, "doc_id", "text", models)
      .join(holdout.select(col("doc_id"), col("lang")), "doc_id")
    val n = pred.count()
    val correct = pred.filter(col("lang_pred") === col("lang")).count()
    val acc = correct.toDouble / n
    assert(n == 24L * 5)
    assert(acc >= 0.9, f"held-out accuracy $acc%.3f below 0.9 " +
      s"(${n - correct} of $n wrong)")
  }

  test("training is deterministic: same data, same weights") {
    val w1 = Classify.trainLogReg(corpus(), "text", "y", 512, 3, 0.05)
    val w2 = Classify.trainLogReg(corpus(), "text", "y", 512, 3, 0.05)
    // z is an ordered bitwise fold; gradient sums can reorder across
    // runs, so compare to tight tolerance rather than bit equality
    w1.zip(w2).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"$a vs $b")
    }
  }

  test("one gradient step from zero weights matches the hand formula " +
    "on a one-doc corpus (residual 0.5 spread over its occurrences)") {
    val docs = Seq(("alpha beta", 0.0)).toDF("text", "y")
    val w = Classify.trainLogReg(docs, "text", "y",
      numBuckets = 64, iters = 1, lr = 0.1)
    // z=0 -> p=0.5 -> r=0.5; features: uni(alpha), bigram, uni(beta)
    // -> three buckets each get w = -0.1 * 0.5 = -0.05 (unless two
    // features collide in 64 buckets, then -0.1)
    val nonZero = w.filter(_ != 0.0)
    assert(nonZero.forall(v => v == -0.05 || v == -0.1))
    assert(nonZero.map(v => math.round(v / -0.05)).sum === 3L)
  }

  // ---- parseFastTextDump (published-model import) ------------------------

  /** A hand-built `fasttext dump` for three fake languages with
    * disjoint vocabularies: input_w is the one-hot of the word's
    * language, output_l the one-hot of the label, so the linearized
    * weight is exactly 1.0 for own-language words and 0.0 otherwise. */
  private def fakeDump(vocab: Map[String, Seq[String]]): String = {
    val langs = vocab.keys.toSeq.sorted
    val dictWords = langs.flatMap(l => vocab(l).map(w => (w, l)))
    val dim = langs.length
    def oneHot(i: Int) =
      (0 until dim).map(k => if (k == i) "1.0" else "0.0").mkString(" ")
    "args\n" + s"dim $dim\nminn 0\nmaxn 0\nwordNgrams 1\nbucket 0\n" +
      "dict\n" +
      dictWords.map { case (w, _) => s"$w 10 word" }.mkString("\n") + "\n" +
      langs.map(l => s"__label__$l 0 label").mkString("\n") + "\n" +
      "input\n" +
      dictWords.map { case (_, l) => oneHot(langs.indexOf(l)) }
        .mkString("\n") + "\n" +
      "output\n" + langs.indices.map(oneHot).mkString("\n") + "\n"
  }

  test("parseFastTextDump: sections parse, labels drop the __label__ " +
    "prefix, weights land in the kernel's unigram buckets, and the " +
    "unsupported-subset guards are loud") {
    val vocab = Map(
      "aa" -> Seq("alpha", "apple", "anchor"),
      "bb" -> Seq("birch", "bottle", "barrel"))
    val models = Classify.parseFastTextDump(fakeDump(vocab), 1024)
    assert(models.map(_._1) == Seq("aa", "bb"))
    // each label's weights: 1.0 at its own words' buckets, 0 elsewhere
    models.foreach { case (lang, w) =>
      assert(w.count(_ != 0.0) == 3, s"$lang nonzero count")
      vocab(lang).foreach { word =>
        val bytes = word.getBytes("UTF-8")
        val b = java.lang.Math.floorMod(
          graft.functions.TextHash.fnv64(bytes, 0, bytes.length), 1024L).toInt
        assert(w(b) == 1.0, s"$lang/$word bucket $b")
      }
    }
    // subword models are rejected loudly, not silently mis-imported
    val sub = fakeDump(vocab).replace("minn 0", "minn 2")
    val e = intercept[IllegalArgumentException] {
      Classify.parseFastTextDump(sub, 1024) }
    assert(e.getMessage.contains("subword"))
    val ng = fakeDump(vocab).replace("wordNgrams 1", "wordNgrams 2")
    assert(intercept[IllegalArgumentException] {
      Classify.parseFastTextDump(ng, 1024) }
      .getMessage.contains("wordNgrams"))
    intercept[IllegalArgumentException] {
      Classify.parseFastTextDump("args\ndim 2\ndict\ninput\n", 1024) }
  }

  test("imported fastText model matches trainLangId predictions on " +
    "planted multilingual holdout (the interop accuracy contract)") {
    val vocab = Map(
      "aa" -> Seq("alpha", "apple", "anchor", "arrow", "atlas"),
      "bb" -> Seq("birch", "bottle", "barrel", "bridge", "bronze"),
      "cc" -> Seq("cedar", "copper", "circle", "candle", "canyon"))
    val imported = Classify.parseFastTextDump(fakeDump(vocab), 1024)
    val train = vocab.toSeq.flatMap { case (lang, words) =>
      (1 to 30).map(i => (s"${words.mkString(" ")} token$i", lang))
    }.toDF("text", "lang")
    val trained = Classify.trainLangId(train, "text", "lang",
      numBuckets = 1024, iters = 5, lr = 0.05)
    val holdout = Seq(
      (1L, "anchor atlas alpha unseen"),
      (2L, "bronze bridge barrel unseen"),
      (3L, "candle canyon copper unseen"),
      (4L, "apple arrow birch alpha")) // majority aa
      .toDF("doc_id", "text")
    def preds(models: Seq[(String, Array[Double])]) =
      Classify.langIdArgmax(holdout, "doc_id", "text", models)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = Map(1L -> "aa", 2L -> "bb", 3L -> "cc", 4L -> "aa")
    assert(preds(imported) == want, "imported model mispredicts")
    assert(preds(trained) == want, "trained baseline mispredicts")
  }

  // ---- subword fastText (FastText.argmax kernel) --------------------------

  /** Independent FNV-1a-32 with int8_t sign extension, in BigInt
    * arithmetic — a different code path than FastText.hash32. */
  private def refHash32(s: String): Long = {
    var h = BigInt(2166136261L)
    s.getBytes("UTF-8").foreach { b =>
      val signed = BigInt(b.toInt) // sign-extended
      val asU32 = if (signed < 0) signed + BigInt(2).pow(32) else signed
      h = (h ^ asU32) * 16777619 % BigInt(2).pow(32)
    }
    h.toLong
  }

  test("FastText.hash32 is fastText's sign-extending FNV-1a-32 — " +
    "BigInt cross-check incl. multi-byte UTF-8 (the int8_t sign " +
    "extension flips high bits for bytes >= 0x80)") {
    for (s <- Seq("a", "ab", "<the>", "héllo", "中文", "naïve", "", "<中>")) {
      val b = s.getBytes("UTF-8")
      assert(graft.functions.FastText.hash32(b, 0, b.length) == refHash32(s),
        s"hash mismatch for '$s'")
    }
    // the sign extension MATTERS: a plain unsigned-byte fold differs
    val e = "é".getBytes("UTF-8")
    var plain = 2166136261L
    e.foreach { b => plain = ((plain ^ (b & 0xff)) * 16777619) % (1L << 32) }
    assert(graft.functions.FastText.hash32(e, 0, e.length) != plain)
  }

  test("FastText.subwordIds walks char-aligned byte n-grams of <word> " +
    "with the n==1 boundary exclusion, exactly computeSubwords") {
    def grams(word: String, minn: Int, maxn: Int): Seq[String] = {
      // independent char-stepping reimplementation over code points
      val w = "<" + word + ">"
      val cps = w.codePoints().toArray
      (for {
        i <- cps.indices
        n <- minn to maxn
        if i + n <= cps.length
        if !(n == 1 && (i == 0 || i + n == cps.length))
      } yield new String(cps, i, n)).toSeq
    }
    def kernelIds(word: String, minn: Int, maxn: Int, bucket: Int): Seq[Int] = {
      val m = graft.functions.FastText.FastTextModel(
        labels = Array("x"), words = Array.empty,
        input = Array.fill(bucket)(Array(0.0)),
        output = Array(Array(0.0)),
        dim = 1, minn = minn, maxn = maxn, bucket = bucket)
      val out = new java.util.ArrayList[Integer]()
      graft.functions.FastText.subwordIds(word, m, out)
      (0 until out.size()).map(out.get(_).toInt)
    }
    for ((word, minn, maxn) <- Seq(("ab", 1, 2), ("the", 2, 3),
        ("é中x", 1, 3), ("a", 1, 2))) {
      val expect = grams(word, minn, maxn).map { g =>
        (refHash32(g) % 64L).toInt }
      assert(kernelIds(word, minn, maxn, 64) == expect,
        s"subwords differ for '$word' [$minn,$maxn]")
    }
    // the hand-pinned boundary case: "<ab>" minn=1 maxn=2
    assert(grams("ab", 1, 2) == Seq("<a", "a", "ab", "b", "b>"))
  }

  test("FastText.argmax matches an independent plain-Scala scorer " +
    "(factored vs linearized association orders, dyadic weights) incl. " +
    "UTF-8 tokens, OOV-only docs, and the empty-text null") {
    val words = Array("alpha", "birch", "中文")
    val labels = Array("aa", "bb")
    val dim = 3
    val bucket = 16
    def dy(i: Int, j: Int): Double = (((i * 31 + j * 7) % 17) - 8) / 8.0
    val input = Array.tabulate(words.length + bucket, dim)(dy)
    val output = Array.tabulate(labels.length, dim)((l, d) => dy(l + 50, d))
    val m = graft.functions.FastText.FastTextModel(
      labels, words, input, output, dim, minn = 2, maxn = 3, bucket = bucket)
    def refPredict(text: String): Option[(String, Double)] = {
      val fids = text.split("[ \t\n\f\r]+").filter(_.nonEmpty)
        .flatMap { tok =>
          val wid = words.indexOf(tok)
          val out = new java.util.ArrayList[Integer]()
          graft.functions.FastText.subwordIds(tok, m, out)
          val sub = (0 until out.size()).map(out.get(_).toInt)
          (if (wid >= 0) Seq(wid) else Seq.empty) ++ sub
        }
      if (fids.isEmpty) None
      else Some(labels.zipWithIndex.map { case (l, li) =>
        // LINEARIZED order: sum over fids of (input · output_l)
        val z = fids.map(f =>
          (0 until dim).map(d => input(f)(d) * output(li)(d)).sum).sum
        (l, z)
        // maxBy keeps the FIRST max -> lowest label index on ties,
        // the kernel's tie-break
      }.maxBy(_._2))
    }
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha birch alpha"),
      (2L, "中文 naïve héllo"),         // OOV multi-byte only
      (3L, "zzz qqq unseen words"),     // OOV ASCII only
      (4L, ""),                          // no tokens -> null
      (5L, "birch 中文")
    ).toDF("doc_id", "text")
    val got = Classify.fastTextArgmax(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getString(1), r.getDouble(2)))).toMap
    for (id <- Seq(1L, 2L, 3L, 5L)) {
      val text = docs.where($"doc_id" === id).select("text").as[String].head()
      val Some((lang, z)) = refPredict(text)
      assert(got(id)._1 == lang, s"doc $id lang")
      assert(got(id)._2 ==
        BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"doc $id logit")
    }
    assert(got(4L) == null, "empty text must yield null prediction")
  }

  test("FastText.argmax EOS semantics follow Dictionary::getLine: " +
    "the in-dict </s> word id joins every line's hidden sum (and can " +
    "flip argmax on short texts), EOS gets NO char n-grams, a literal " +
    "</s> token truncates the line, and a dict without </s> is " +
    "unchanged incl. the empty-text null") {
    val labels = Array("aa", "bb")
    val dim = 2
    val bucket = 8
    // words: one ordinary word + EOS; weights chosen so that WITHOUT
    // the EOS row "alpha..." scores toward aa, but the EOS input row
    // is strongly bb-aligned and flips short texts
    val words = Array("alpha", "</s>")
    val input = Array.tabulate(words.length + bucket, dim) { (i, d) =>
      if (i == 1) { if (d == 0) -4.0 else 4.0 }     // EOS row: bb-aligned
      else (((i * 13 + d * 5) % 9) - 4) / 4.0
    }
    val output = Array(Array(1.0, 0.0), Array(0.0, 1.0)) // aa = dim0, bb = dim1
    val m = graft.functions.FastText.FastTextModel(
      labels, words, input, output, dim, minn = 2, maxn = 3, bucket = bucket)
    assert(m.eosId == 1)
    def hidden(fids: Seq[Int]): Array[Double] = {
      val h = new Array[Double](dim)
      fids.foreach(f => (0 until dim).foreach(d => h(d) += input(f)(d)))
      h
    }
    def score(text: String): (String, Double) = {
      val r = graft.functions.FastText.argmax(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), m)
      (labels(r.getInt(0)), r.getDouble(1))
    }
    def subs(tok: String): Seq[Int] = {
      val out = new java.util.ArrayList[Integer]()
      graft.functions.FastText.subwordIds(tok, m, out)
      (0 until out.size()).map(out.get(_).toInt)
    }
    // empty text: EOS alone (fastText predicts on just the EOS row)
    val hEmpty = hidden(Seq(1))
    assert(score("") == ("bb", hEmpty(1)), "empty line = EOS-only features")
    // ordinary text: word id + subwords + EOS appended once at the end
    val hAlpha = hidden(Seq(0) ++ subs("alpha") ++ Seq(1))
    val expAlpha = if (hAlpha(0) >= hAlpha(1)) ("aa", hAlpha(0))
                   else ("bb", hAlpha(1))
    assert(score("alpha") == expAlpha)
    // the EOS row CAN flip argmax: same text without EOS goes the
    // other way (this is the published-semantics divergence the fix
    // closes — the shift is label-dependent, output_l . input_EOS)
    val hNoEos = hidden(Seq(0) ++ subs("alpha"))
    assert((hNoEos(0) >= hNoEos(1)) != (hAlpha(0) >= hAlpha(1)),
      "fixture must exercise an argmax flip")
    // literal </s> token: word id only (no char n-grams of '</s>'),
    // and the line TRUNCATES — trailing tokens contribute nothing
    assert(score("alpha </s> alpha alpha") == expAlpha,
      "line must truncate at the literal EOS token")
    assert(score("</s> alpha") == ("bb", hEmpty(1)),
      "leading EOS closes the line before any other token")
    // dict WITHOUT </s>: behavior unchanged, empty text stays null
    val m2 = graft.functions.FastText.FastTextModel(
      labels, Array("alpha"), input.take(1 + bucket), output,
      dim, minn = 2, maxn = 3, bucket = bucket)
    assert(m2.eosId == -1)
    assert(graft.functions.FastText.argmax(
      org.apache.spark.unsafe.types.UTF8String.fromString(""), m2) == null)
    assert(graft.functions.FastText.argmax(
      org.apache.spark.unsafe.types.UTF8String.fromString("</s>"), m2) == null,
      "an out-of-dict literal </s> contributes nothing (computeSubwords " +
        "is skipped for EOS)")
  }

  test("parseFastTextSubwordDump: bundled resource imports (labels, " +
    "matrix shapes), predictions are deterministic, and the guards " +
    "route word-level models back") {
    val m = Classify.loadFastTextSubwordResource(
      "/graft/fasttext_subword_sample.txt")
    assert(m.labels.toSeq == Seq("de", "en", "fr"))
    assert(m.nwords == 12 && m.bucket == 32 && m.dim == 4)
    assert(m.minn == 2 && m.maxn == 3)
    assert(m.input.length == 44 && m.output.length == 3)
    import spark.implicits._
    val docs = Seq((1L, "the query table"), (2L, "spark group window"))
      .toDF("doc_id", "text")
    val p1 = Classify.fastTextArgmax(docs, "doc_id", "text", m).collect()
    val p2 = Classify.fastTextArgmax(docs, "doc_id", "text", m).collect()
    assert(p1.map(_.toString).toSeq == p2.map(_.toString).toSeq)
    assert(p1.forall(r => Seq("de", "en", "fr").contains(r.getString(1))))
    // a word-level dump routes back to parseFastTextDump, loudly
    val wordLevel = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/fasttext_lid_sample.txt")).mkString
    val e = intercept[IllegalArgumentException] {
      Classify.parseFastTextSubwordDump(wordLevel) }
    assert(e.getMessage.contains("parseFastTextDump"))
  }
}
