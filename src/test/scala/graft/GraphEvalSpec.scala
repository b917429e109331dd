package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Normalize
import graft.operators.{Classify, Eval, Graph}

/** Specs for the round-13 additions: integer-micro-unit PageRank,
  * exact tie-aware AUC, per-paragraph language segmentation, and
  * mojibake repair. */
class GraphEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- Graph.pageRank ----------------------------------------------------

  test("pageRank: hand-computed two-iteration ranks on a 3-cycle plus sink") {
    // a -> b -> c -> a, and c -> d (d dangling). All integer micro-units.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // iter 1: contribs: 1->2: 1e6; 2->3: 1e6; 3 has outdeg 2 -> 1,4 get 5e5
    //   r(1)=15e4+85*5e5/100=575000; r(2)=15e4+85e4=1000000; r(3)=1000000;
    //   r(4)=575000
    // iter 2: c(1->2)=575000; c(2->3)=1000000; c(3->{1,4})=500000
    //   r(1)=150000+425000=575000; r(2)=150000+floor(85*575000/100)=638750
    //   r(3)=1000000; r(4)=575000
    assert(got == Seq((1L, 575000L), (2L, 638750L), (3L, 1000000L),
      (4L, 575000L)))
  }

  test("pageRank: total mass never exceeds the injected base mass and " +
    "hub in-degree concentrates rank") {
    // star: everyone links to node 0 plus a ring for connectivity
    val n = 200L
    val edges = spark.range(n).select(col("id").as("src"), lit(0L).as("dst"))
      .union(spark.range(n).select(col("id").as("src"),
        ((col("id") + 1L) % n).as("dst")))
    val ranks = Graph.pageRank(edges, "src", "dst", iters = 5)
    val rows = ranks.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val top = rows.maxBy(_._2)._1
    assert(top == 0L, s"hub should outrank ring nodes, got $rows")
    val total = rows.values.sum
    assert(total <= n * 1000000L, "mass is conserved-or-evaporating")
  }

  test("pageRank: multi-edges do not double-contribute (dedup contract)") {
    val e1 = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val e2 = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r1 = Graph.pageRank(e1, "src", "dst", iters = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val r2 = Graph.pageRank(e2, "src", "dst", iters = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(r1 == r2)
  }

  // ---- Graph.hits ----------------------------------------------------------

  test("hits: hand-computed two-iteration hubs/authorities on a fan-in DAG") {
    // 1 -> 3, 2 -> 3, 3 -> 4
    // iter 1: auth raw (3: 2e6, 4: 1e6) -> denom 2 -> (3: 1e6, 4: 5e5)
    //   hub raw (1: 1e6, 2: 1e6, 3: 5e5) -> denom 1 -> unchanged
    // iter 2: auth raw (3: 2e6, 4: 5e5) -> denom 2 -> (3: 1e6, 4: 25e4)
    //   hub raw (1: 1e6, 2: 1e6, 3: 25e4, 4: 0) -> denom 1
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.hits(edges, "src", "dst", iters = 2)
      .orderBy("node").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 1000000L),
      (2L, 0L, 1000000L),
      (3L, 1000000L, 250000L),
      (4L, 250000L, 0L)))
  }

  test("hits: hub farm scores high hub / low authority; target the reverse") {
    // 10 hub pages all pointing at 2 authorities; authorities link back
    // to one hub so every node is in the node set with nonzero signal
    val hubs = (10L to 19L)
    val edges = (hubs.flatMap(h => Seq((h, 1L), (h, 2L))) ++ Seq((1L, 10L)))
      .toDF("src", "dst")
    val rows = Graph.hits(edges, "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (auth1, hub1) = rows(1L)
    val (authH, hubH) = rows(11L)
    assert(auth1 > authH, "target page should out-authority a farm page")
    assert(hubH > hub1, "farm page should out-hub the target page")
  }

  test("hits: reliable checkpointDir path is bit-identical to the " +
    "executor-local path") {
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val local = Graph.hits(edges, "src", "dst", iters = 3)
      .orderBy("node").as[(Long, Long, Long)].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("hits-ckpt").toString
    try {
      val reliable = Graph.hits(edges, "src", "dst", iters = 3,
          checkpointDir = Some(dir))
        .orderBy("node").as[(Long, Long, Long)].collect().toSeq
      assert(reliable == local)
      // the reliable path actually wrote checkpoint files
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "expected reliable checkpoint files under the dir")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  // ---- Graph.triangles -----------------------------------------------------

  test("triangles: hand-computed counts and clustering on K4 minus an edge") {
    // edges: 1-2,1-3,1-4,2-3,2-4 (3-4 missing)
    // triangles: (1,2,3) and (1,2,4); degrees 3,3,2,2
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("a", "b")
    val got = Graph.triangles(edges, "a", "b").orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 2.0 * 2 / (3 * 2)),
      (2L, 3L, 2L, 2.0 * 2 / (3 * 2)),
      (3L, 2L, 1L, 1.0),
      (4L, 2L, 1L, 1.0)))
  }

  test("triangles: symmetrization/dedup — reversed and duplicate edges " +
    "count once; self-loops dropped; stars have none") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 3L)).toDF("a", "b")
    val got = Graph.triangles(edges, "a", "b").orderBy("node")
      .select("node", "triangles").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
    // star: hub with many leaves, zero triangles, clustering 0 at hub
    val star = (1L to 20L).map(i => (0L, i)).toDF("a", "b")
    val s0 = Graph.triangles(star, "a", "b")
      .where(col("node") === 0L).head()
    assert(s0.getLong(2) == 0L && s0.getDouble(3) == 0.0)
  }

  // ---- Eval.aucExact -----------------------------------------------------

  test("aucExact: perfect separation gives 1.0, inverted gives 0.0") {
    val df = Seq((0.1, false), (0.2, false), (0.8, true), (0.9, true))
      .toDF("s", "y")
    val auc = Eval.aucExact(df, col("s"), col("y")).head()
    assert(auc.getLong(0) == 2 && auc.getLong(1) == 2)
    assert(auc.getDouble(2) == 1.0)
    val inv = Eval.aucExact(df, -col("s"), col("y")).head()
    assert(inv.getDouble(2) == 0.0)
  }

  test("aucExact: ties take average ranks (hand-computed)") {
    // scores: 1,1,2,2 labels: -,+,-,+
    // avg ranks: 1.5,1.5,3.5,3.5; SR_pos = 5
    // U = SR_pos - npos(npos+1)/2 = 5 - 3 = 2; AUC = 2/(2*2) = 0.5
    val df = Seq((1.0, false), (1.0, true), (2.0, false), (2.0, true))
      .toDF("s", "y")
    val auc = Eval.aucExact(df, col("s"), col("y")).head().getDouble(2)
    assert(auc == 0.5)
    // scores: 1,2,2,3 labels: -,-,+,+
    // avg ranks: 1, 2.5, 2.5, 4; SR_pos = 6.5; U = 6.5-3 = 3.5; AUC=0.875
    val df2 = Seq((1.0, false), (2.0, false), (2.0, true), (3.0, true))
      .toDF("s", "y")
    val auc2 = Eval.aucExact(df2, col("s"), col("y")).head().getDouble(2)
    assert(auc2 == 0.875)
  }

  test("aucExact: matches the O(n^2) pair-counting definition on a " +
    "deterministic mixed sample") {
    val rows = (1 to 60).map { i =>
      val score = (i * 37 % 11).toDouble / 11.0
      val label = (i * 13 % 3) == 0
      (score, label)
    }
    val df = rows.toDF("s", "y")
    val got = Eval.aucExact(df, col("s"), col("y")).head().getDouble(2)
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val pairs = for (p <- pos; q <- neg)
      yield (if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
    val want = pairs.sum / (pos.size * neg.size)
    assert(math.abs(got - want) < 1e-12, s"got $got want $want")
  }

  test("aucExact: default rounding bounds the histogram — raw " +
    "full-precision doubles equal their pre-rounded-6dp twin, and " +
    "roundScoreTo=None passes raw values through") {
    val rows = (1 to 50).map { i =>
      // full-precision irrational-ish scores: 1/3, 1/7 multiples
      (i.toDouble / 3.0 + (i % 7).toDouble / 7.0, i % 3 == 0)
    }
    val df = rows.toDF("s", "y")
    // the exact lowering Spark's Round uses on doubles
    val dfPre = rows.map { case (s, y) =>
      (java.math.BigDecimal.valueOf(s)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue(), y)
    }.toDF("s", "y")
    val got = Eval.aucExact(df, col("s"), col("y")).head().getDouble(2)
    val pre = Eval.aucExact(dfPre, col("s"), col("y"),
      roundScoreTo = None).head().getDouble(2)
    assert(got == pre)
    // integral scores are bit-unchanged by the default rounding
    val ints = Seq((1L, false), (1L, true), (2L, false), (2L, true))
      .toDF("s", "y")
    val a = Eval.aucExact(ints, col("s"), col("y")).head().getDouble(2)
    val b = Eval.aucExact(ints, col("s"), col("y"), None).head().getDouble(2)
    assert(a == b && a == 0.5)
  }

  test("aucExact: empty class yields null AUC") {
    val df = Seq((0.3, true), (0.7, true)).toDF("s", "y")
    val row = Eval.aucExact(df, col("s"), col("y")).head()
    assert(row.isNullAt(2))
  }

  // ---- Classify.langSegments ---------------------------------------------

  test("langSegments: majority, runs, and tie-break on planted paragraphs") {
    val en = "the cat and the dog of the house is big"
    val fr = "le chat et la maison les arbres des fleurs"
    val de = "der hund und das haus ein baum die katze"
    val docs = Seq(
      (1L, s"$en\n\n$fr\n\n$en"),          // en,fr,en: majority en 2/3, 3 runs
      (2L, s"$fr\n\n$fr\n\n$de"),          // fr,fr,de: majority fr, 2 runs
      (3L, s"$en\n\n   \n\n$en"),          // blank para dropped: 2 paras 1 run
      (4L, s"$en\n\n$fr")                  // 1-1 tie -> lexicographic 'en'
    ).toDF("doc_id", "text")
    val got = Classify.langSegments(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_paras", "majority_lang", "majority_cnt", "n_runs")
      .as[(Long, Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, "en", 2L, 3L),
      (2L, 3L, "fr", 2L, 2L),
      (3L, 2L, "en", 2L, 1L),
      (4L, 2L, "en", 1L, 2L)))
  }

  test("langSegments: majority_frac is the exact single-division ratio " +
    "and all-blank docs drop out") {
    val docs = Seq((1L, "the cat and the dog\n\nle chat et la maison"),
                   (2L, "\n\n  \n\n")).toDF("doc_id", "text")
    val got = Classify.langSegments(docs, "doc_id", "text").collect()
    assert(got.length == 1)
    assert(got(0).getAs[Double]("majority_frac") == 0.5)
  }

  // ---- Normalize.fixMojibake ----------------------------------------------

  private def fix1(s: String): String = {
    val df = Seq(s).toDF("t")
    df.select(Normalize.fixMojibake(col("t")).as("f")).as[String].head()
  }

  private def asLatin1(s: String): String =
    new String(s.getBytes("UTF-8"), "ISO-8859-1")
  private def asCp1252(s: String): String =
    new String(s.getBytes("UTF-8"), "windows-1252")

  test("fixMojibake repairs utf8-read-as-latin1 exactly") {
    val clean = "Caf\u00E9 d\u00E9j\u00E0 vu"
    assert(fix1(asLatin1(clean)) == clean)
  }

  test("fixMojibake repairs utf8-read-as-cp1252 (C1 specials back-mapped)") {
    // the em dash's 0x80 0x94 bytes show as cp1252 \u20AC and \u201D.
    // (A clean string whose UTF-8 bytes include 0x81/0x8D/0x8F/0x90/
    // 0x9D \u2014 e.g. the right double quote \u201D \u2014 is NOT recoverable:
    // those bytes are undefined in cp1252 and decode to U+FFFD, which
    // destroys the byte value; the repair correctly leaves such text
    // alone. The fixture sticks to recoverable punctuation.)
    val clean = "Caf\u00E9 \u2014 d\u00E9j\u00E0 vu \u2018quoted\u2019"
    val broken = asCp1252(clean)
    assert(broken.contains('\u20AC'), "fixture sanity: cp1252 euro visible")
    assert(fix1(broken) == clean)
    val lossy = asCp1252("end quote \u201D")
    assert(lossy.contains('\uFFFD') && fix1(lossy) == lossy,
      "cp1252-undefined bytes are unrecoverable and must pass through")
  }

  test("fixMojibake leaves clean text, CJK, and ambiguous-invalid input " +
    "unchanged") {
    for (s <- Seq(
      "plain ascii only",
      "Caf\u00E9 \u2014 d\u00E9j\u00E0 vu", // already fixed: a lone \u00E9
                                                // is an invalid lead -> no-op
      "\u4E2D\u6587\u6587\u672C",           // CJK: code points > 0xFF
      "A\u00E9Z",                // \u00E9 lead with ascii after it: invalid
      ""))
      assert(fix1(s) == s, s"should be identity on: $s")
  }

  test("fixMojibake is one-layer: applying twice undoes double encoding") {
    val clean = "\u00E9"
    val once = asLatin1(clean)
    val twice = asLatin1(once)
    assert(fix1(twice) == once)
    assert(fix1(once) == clean)
  }

  test("fixMojibake null-safety") {
    val df = Seq[Option[String]](None).toDF("t")
    assert(df.select(Normalize.fixMojibake(col("t"))).head().isNullAt(0))
  }
}
