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
}
