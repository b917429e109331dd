package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Normalize

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("removeNullBytes strips all 0x00 bytes (ght2dm.go:573-575)") {
    val df = Seq("a\u0000b\u0000", "clean", "\u0000").toDF("s")
    val got = df.select(Normalize.removeNullBytes($"s").as("c"))
      .as[String].collect().toSeq
    assert(got == Seq("ab", "clean", ""))
  }

  test("emptyToNull maps '' to NULL and keeps everything else") {
    val df = Seq("", "x", " ").toDF("s")
    val got = df.select(Normalize.emptyToNull($"s")).collect().map(_.isNullAt(0))
    assert(got.toSeq == Seq(true, false, false))
  }

  test("clonePath applies the reference's default fills (ght2dm.go:551-567)") {
    val df = Seq(
      ("Go", "DevMine", "ght2dm"),
      ("", "DevMine", "ght2dm"),
      ("Go", "", "ght2dm"),
      ("Go", "DevMine", ""),
      (null, null, null)
    ).toDF("lang", "login", "name")
    val got = df.select(Normalize.clonePath($"lang", $"login", $"name"))
      .as[String].collect().toSeq
    assert(got == Seq(
      "go/devmine/ght2dm",
      "unknown/devmine/ght2dm",
      "go/john_doe/ght2dm",
      "go/devmine/42",
      // NULL segments behave like missing ones
      "unknown/john_doe/42"))
  }

  test("coalesceUpdated falls back to created_at (ght2dm.go:352-354)") {
    val df = Seq((Some("2020-05-05"), "2019-01-01"), (None, "2019-01-01"))
      .toDF("u", "c")
    val got = df.select(Normalize.coalesceUpdated($"u", $"c"))
      .as[String].collect().toSeq
    assert(got == Seq("2020-05-05", "2019-01-01"))
  }

  test("nfc_normalize composes decomposed spellings, is idempotent, an " +
    "identity on ASCII, null-safe, and registered as a SQL function") {
    import graft.plans.HashExpressions.nfcNormalize
    val df = Seq(
      (1L, "caf\u00e9"),            // precomposed
      (2L, "cafe\u0301"),           // decomposed: e + combining acute
      (3L, "plain ascii stays"),
      (4L, null.asInstanceOf[String])
    ).toDF("id", "s")
    val got = df.select($"id", nfcNormalize($"s").as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "caf\u00e9")
    assert(got(2L) == "caf\u00e9")            // composed to U+00E9
    assert(got(2L).length == 4)
    assert(got(3L) == "plain ascii stays")   // quick-check identity
    assert(got(4L) == null)
    // idempotence: normalizing twice is the same column
    val twice = df.filter($"s".isNotNull)
      .select((nfcNormalize(nfcNormalize($"s")) === nfcNormalize($"s")).as("ok"))
      .as[Boolean].collect()
    assert(twice.forall(identity))
    // the dedup composition: both spellings share one sha256 key
    val keys = df.filter($"id" <= 2)
      .select(sha2(nfcNormalize($"s"), 256).as("k")).as[String].collect()
    assert(keys.distinct.length == 1)
    // SQL surface (GraftExtensions registry)
    graft.plans.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT nfc_normalize('cafe\u0301') = 'caf\u00e9'").as[Boolean].head()
    assert(viaSql)
  }
}
