package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextHash
import graft.plans.VecOps

/** Property tests over the pure kernels (no Spark jobs — each case is a
  * JVM call, so hundreds of generated cases run in milliseconds).
  * scalacheck is driven directly; the scalatest-scalacheck bridge
  * artifact is not on the offline classpath. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop, cases: Int = 200): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val tokens: Gen[List[String]] = Gen.listOf(token)
  private val anyString: Gen[String] = Gen.asciiPrintableStr

  private def u(s: String) = UTF8String.fromString(s)

  test("simhash64 is invariant under token permutation (bag semantics)") {
    check("simhash-perm", Prop.forAll(tokens) { ts =>
      val a = ts.mkString(" ")
      val b = scala.util.Random.javaRandomToRandom(
        new java.util.Random(42)).shuffle(ts).mkString(" ")
      TextHash.simhash64(u(a)) == TextHash.simhash64(u(b))
    })
  }

  test("simhash64 ignores whitespace runs and kind") {
    check("simhash-ws", Prop.forAll(tokens) { ts =>
      TextHash.simhash64(u(ts.mkString(" "))) ==
        TextHash.simhash64(u(ts.mkString("\t\t") + "\n"))
    })
  }

  test("shingles64 output is sorted and duplicate-free (set semantics)") {
    check("shingles-sorted", Prop.forAll(tokens, Gen.choose(1, 5)) { (ts, k) =>
      val sh = TextHash.shingles64(u(ts.mkString(" ")), k)
      sh.sliding(2).forall {
        case Array(a, b) => a < b // TreeSet natural (signed) order
        case _ => true
      }
    })
  }

  test("minhash64 signature entry j is the min family-hash over shingles") {
    check("minhash-min", Prop.forAll(tokens.suchThat(_.size >= 3)) { ts =>
      val text = ts.mkString(" ")
      val sig = TextHash.minhash64(u(text), 3, 8)
      // the signature of a doc must dominate the signature of the doc
      // repeated (same shingle set union extra boundary shingles can
      // only LOWER each min)
      val rep = TextHash.minhash64(u(text + " " + text), 3, 8)
      sig.indices.forall(j => rep(j) <= sig(j))
    })
  }

  test("hamming64 is a metric-ish: zero on equal, symmetric, <= 64") {
    check("hamming", Prop.forAll(Gen.long, Gen.long) { (a, b) =>
      TextHash.hamming64(a, a) == 0 &&
        TextHash.hamming64(a, b) == TextHash.hamming64(b, a) &&
        TextHash.hamming64(a, b) <= 64
    })
  }

  test("fnv64 depends on every byte of the slice") {
    check("fnv-slice", Prop.forAll(anyString.suchThat(_.length >= 2)) { s =>
      val bytes = s.getBytes("UTF-8")
      val whole = TextHash.fnv64(bytes, 0, bytes.length)
      val tail = TextHash.fnv64(bytes, 1, bytes.length)
      // dropping the first byte changes the hash (FNV is positional)
      bytes.length < 2 || whole != tail
    })
  }

  private val vec: Gen[Array[Double]] =
    Gen.choose(2, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-10.0, 10.0)).map(_.toArray))

  test("cosine kernel: bounded, symmetric, 1 on self for nonzero vectors") {
    check("cosine", Prop.forAll(vec) { v =>
      val a = new GenericArrayData(v.map(x => x: Any))
      val nonZero = v.exists(_ != 0.0)
      val self = VecOps.cosine(a, a)
      (!nonZero || math.abs(self - 1.0) < 1e-9) &&
        math.abs(self) <= 1.0 + 1e-9
    })
    check("cosine-sym", Prop.forAll(vec, vec) { (x, y) =>
      val n = math.min(x.length, y.length)
      val a = new GenericArrayData(x.take(n).map(v => v: Any))
      val b = new GenericArrayData(y.take(n).map(v => v: Any))
      val ab = VecOps.cosine(a, b); val ba = VecOps.cosine(b, a)
      math.abs(ab - ba) < 1e-12 && math.abs(ab) <= 1.0 + 1e-9
    })
  }

  test("nearestCentroids returns distinct cells ordered by similarity") {
    val cents: Gen[Array[Array[Double]]] =
      Gen.choose(2, 8).flatMap(m => Gen.listOfN(m,
        Gen.listOfN(4, Gen.choose(-1.0, 1.0)).map(_.toArray)).map(_.toArray))
    val v4: Gen[Array[Double]] =
      Gen.listOfN(4, Gen.choose(-1.0, 1.0)).map(_.toArray)
    check("nearest-cells", Prop.forAll(cents, v4, Gen.choose(1, 8)) { (cs, v, np) =>
      val a = new GenericArrayData(v.map(x => x: Any))
      val got = VecOps.nearestCentroids(a, cs, np)
      def dot(c: Array[Double]) = c.zip(v).map { case (x, y) => x * y }.sum
      got.length == math.min(np, cs.length) &&
        got.distinct.length == got.length &&
        got.sliding(2).forall {
          case Array(i, j) => dot(cs(i)) >= dot(cs(j)) - 1e-12
          case _ => true
        }
    })
  }

  test("winnow64 fingerprint is stable under duplication of the text") {
    check("winnow-dup", Prop.forAll(anyString.suchThat(_.length >= 8)) { s =>
      // min gram hash over s+s includes all grams of s, plus boundary
      // grams — the min can only stay or drop
      val k = 8
      val one = TextHash.winnow64(u(s), k)
      val two = TextHash.winnow64(u(s + s), k)
      java.lang.Long.compareUnsigned(two, one) <= 0
    })
  }
  // ---- round-13 kernels ----------------------------------------------------

  test("fixMojibake predicate: latin-1 round-trip repairs any string " +
    "with a multi-byte char and no cp1252-undefined bytes") {
    // chars from ascii + latin-1 letters + a cp1252-representable
    // special; exclude the 5 undefined bytes' code points by
    // construction
    val ch: Gen[Char] = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('\u00E9', '\u00E0', '\u00FC', '\u00D6'),
      1 -> Gen.oneOf('\u2014', '\u20AC', '\u2018'))
    val str: Gen[String] = Gen.nonEmptyListOf(ch).map(_.mkString)
    val spark = TestSpark.spark
    import spark.implicits._
    check("mojibake-roundtrip", Prop.forAll(Gen.listOfN(20, str)) { ss =>
      val clean = ss.filter(s => s.exists(_ > 127))
      if (clean.isEmpty) true
      else {
        val broken = clean.map(s =>
          new String(s.getBytes("UTF-8"), "windows-1252"))
        val fixed = broken.toDF("t")
          .select(graft.functions.Normalize.fixMojibake(col("t")))
          .as[String].collect().toSeq
        fixed == clean
      }
    }, cases = 30)
  }

  test("unigram viterbi: segmentation always reassembles to the word, " +
    "pieces respect maxPiece, and the unk fallback never dead-ends") {
    val word: Gen[String] =
      Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
        .map(_.take(24))
    val pieceGen: Gen[(String, Long)] = for {
      p <- Gen.choose(2, 4).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
      lp <- Gen.choose(-5000000L, -1000000L)
    } yield (p, lp)
    check("viterbi-reassembly", Prop.forAll(
      word, Gen.listOf(pieceGen)) { (w, ps) =>
      val vocab = new graft.functions.UnigramVocab(
        ps.map(_._1).distinct.toArray,
        ps.distinctBy(_._1).map(_._2).toArray, -7000000L)
      val arr = graft.functions.UnigramOps.viterbi(u(w), vocab)
      val segs = (0 until arr.numElements())
        .map(i => arr.getUTF8String(i).toString)
      segs.mkString("") == w && segs.forall(_.length <= vocab.maxPiece)
    })
  }

  test("AcAutomaton agrees with the naive per-position scan") {
    val txt: Gen[String] =
      Gen.listOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val term: Gen[String] =
      Gen.choose(1, 3).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    check("ac-vs-naive", Prop.forAll(txt, Gen.nonEmptyListOf(term)) {
      (t, terms0) =>
      val terms = terms0.distinct
      val got = new graft.functions.AcAutomaton(terms.toArray).scan(t).toSeq
      val want = terms.map(p =>
        (0 to t.length - p.length).count(i => t.startsWith(p, i)).toLong)
      got == want
    })
  }
}
