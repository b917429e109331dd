package graft

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WarcSource

class WarcSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(Paths.get("/root/repo/target"), "warcspec").toString

  private def readWarc(paths: Seq[String], splitBytes: Long = 0) =
    spark.read.format("graft.sources.WarcDataSource")
      .option("splitBytes", splitBytes)
      .load(paths: _*)

  test("round-trips response records: headers parsed, payload byte-exact, " +
    "record_offset is the absolute file offset") {
    val dir = tmpDir()
    val recs = (0 until 7).map(i => (s"http://x.test/doc/$i", s"payload-$i body".getBytes(UTF_8)))
    WarcSource.writeWarc(s"$dir/a.warc", recs.iterator)
    val got = readWarc(Seq(s"$dir/a.warc"))
      .select($"record_offset", $"warc_type", $"target_uri",
        $"content_length", $"content".cast("string"))
      .as[(Long, String, String, Long, String)].collect().sortBy(_._1)
    assert(got.length == 7)
    assert(got.map(_._3).toSeq == recs.map(_._1))
    assert(got.map(_._5).toSeq == recs.map(r => new String(r._2, UTF_8)))
    assert(got.forall(_._2 == "response"))
    assert(got.forall(r => r._4 == s"payload-X body".length))
    // offsets strictly increase from 0
    assert(got.head._1 == 0L && got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
  }

  test("sub-file splits are index-free and byte-identical to the unsplit " +
    "read: the magic resync finds every record exactly once") {
    val dir = tmpDir()
    // variable-size payloads so record boundaries don't align with splits
    val recs = (0 until 200).map(i =>
      (s"http://x.test/d/$i", ("z" * (i % 97 + 5) + s"|$i").getBytes(UTF_8)))
    WarcSource.writeWarc(s"$dir/b.warc", recs.iterator)
    val whole = readWarc(Seq(s"$dir/b.warc"))
      .select($"record_offset", $"target_uri", $"content".cast("string"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    val split = readWarc(Seq(s"$dir/b.warc"), splitBytes = 1024)
    assert(split.rdd.getNumPartitions > 4) // actually split
    val gotSplit = split
      .select($"record_offset", $"target_uri", $"content".cast("string"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(gotSplit == whole)
    assert(whole.length == 200)
  }

  test("a bare WARC/1.0 magic INSIDE a payload does not fool the resync " +
    "scan: header validation rejects it and splits stay exact") {
    val dir = tmpDir()
    val poison = "xxx WARC/1.0\r\nnot a header block, no colon lines here " +
      "and no content-length either " + ("p" * 300)
    val recs = (0 until 40).map {
      case i if i % 3 == 0 => (s"http://x.test/p/$i", poison.getBytes(UTF_8))
      case i => (s"http://x.test/p/$i", s"clean-$i".getBytes(UTF_8))
    }
    WarcSource.writeWarc(s"$dir/c.warc", recs.iterator)
    val whole = readWarc(Seq(s"$dir/c.warc"))
      .select($"record_offset", $"target_uri").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    val gotSplit = readWarc(Seq(s"$dir/c.warc"), splitBytes = 512)
      .select($"record_offset", $"target_uri").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(gotSplit == whole && whole.length == 40)
  }

  test("record ids are deterministic (FNV of the URI) and empty payloads " +
    "survive") {
    val dir = tmpDir()
    WarcSource.writeWarc(s"$dir/d.warc",
      Iterator(("http://x.test/empty", Array.emptyByteArray)))
    val row = readWarc(Seq(s"$dir/d.warc"))
      .select($"record_id", $"content_length", $"warc_date")
      .as[(String, Long, String)].collect().head
    val uri = "http://x.test/empty"
    val expected = "<urn:graft:" + java.lang.Long.toHexString(
      graft.functions.TextHash.fnv64(uri.getBytes(US_ASCII), 0, uri.length)) + ">"
    assert(row._1 == expected)
    assert(row._2 == 0L && row._3 == "2014-01-01T00:00:00Z")
    // a rewrite yields the identical id — no UUID/clock nondeterminism
    WarcSource.writeWarc(s"$dir/d2.warc",
      Iterator(("http://x.test/empty", Array.emptyByteArray)))
    assert(readWarc(Seq(s"$dir/d2.warc")).select($"record_id")
      .as[String].collect().head == expected)
  }

  test("truncated and garbage files fail loudly, not silently") {
    val dir = tmpDir()
    WarcSource.writeWarc(s"$dir/e.warc",
      Iterator(("http://x.test/1", "abcdef".getBytes(UTF_8))))
    val full = Files.readAllBytes(Paths.get(s"$dir/e.warc"))
    Files.write(Paths.get(s"$dir/trunc.warc"), full.take(full.length - 10))
    val ex = intercept[org.apache.spark.SparkException] {
      readWarc(Seq(s"$dir/trunc.warc")).collect()
    }
    assert(ex.getMessage != null)
    Files.write(Paths.get(s"$dir/junk.warc"), "not a warc at all".getBytes(UTF_8))
    intercept[org.apache.spark.SparkException] {
      readWarc(Seq(s"$dir/junk.warc")).collect()
    }
  }
}
