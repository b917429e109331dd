package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("media table carries payloads as binary with typed metadata") {
    val media = Multimodal.mediaTable(Tables.documents(spark, TestSpark.sf0001))
    val schema = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") == "binary")
    assert(schema("media_type") == "string")
    assert(schema("declared_w") == "int" && schema("declared_h") == "int")
  }

  test("frame sampling yields bounded, evenly-spaced, reconstructable slices") {
    val media = Multimodal.mediaTable(Tables.documents(spark, TestSpark.sf0001))
    val frames = Multimodal.sampleFrames(spark, media,
      maxFrames = 3, frameSize = 64).collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.values.forall(fs => fs.length >= 1 && fs.length <= 3))
    // frame bytes must be the payload slice at the declared offset
    val texts = Tables.documents(spark, TestSpark.sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(frames.forall { f =>
      val payload = texts(f.doc_id).getBytes("UTF-8")
      f.frame_bytes.sameElements(
        payload.slice(f.frame_offset, f.frame_offset + 64))
    })
    // offsets are non-decreasing with frame_idx (even spacing)
    assert(byDoc.values.forall { fs =>
      val sorted = fs.sortBy(_.frame_idx)
      sorted.zip(sorted.tail).forall { case (a, b) =>
        a.frame_offset <= b.frame_offset }
    })
  }

  test("feature extraction is deterministic, batch-wise, and keeps ids") {
    val media = Multimodal.mediaTable(Tables.documents(spark, TestSpark.sf0001))
    val f1 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 500)
    // payload bytes = utf8 text bytes; n_bytes must match n_chars for ASCII
    val chars = Tables.documents(spark, TestSpark.sf0001)
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    assert(f1.forall(f => f.n_bytes.toLong == chars(f.doc_id)))
    // thumbnail fits the 64px box, aspect preserved within rounding
    assert(f1.forall(f => f.thumb_w <= 64 && f.thumb_h <= 64 &&
      f.thumb_w >= 1 && f.thumb_h >= 1))
  }
}
