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

  test("ImageIoDecoder decodes a REAL PNG: thumbnail dims come from the " +
    "decoded pixels (not the lying declared metadata), checksum stays " +
    "the raw-payload FNV; non-image and corrupt payloads fall back to " +
    "the stub") {
    // build a real 200x50 PNG in-process (BufferedImage is headless-safe)
    val img = new java.awt.image.BufferedImage(
      200, 50, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 50).foreach(y => (0 until 200).foreach(x =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", buf))
    val png = buf.toByteArray
    val media = Seq(
      // declared dims LIE (10x10); the decoder must report 200x50's box
      Multimodal.MediaRecord(1L, "image", png, 10, 10),
      // an "image" that isn't decodable: stub fallback on declared dims
      Multimodal.MediaRecord(2L, "image", "not a png".getBytes("UTF-8"), 128, 32),
      // audio stays stubbed (no JDK codec)
      Multimodal.MediaRecord(3L, "audio", png, 640, 480)
    ).toDF()
    val got = Multimodal.extractFeatures(spark, media, Multimodal.ImageIoDecoder)
      .collect().map(f => f.doc_id -> f).toMap
    // 200x50 -> 64px box = 64x16
    assert(got(1L).thumb_w == 64 && got(1L).thumb_h == 16)
    assert(got(1L).checksum ==
      graft.functions.TextHash.fnv64(png, 0, png.length))
    assert(got(1L).n_bytes == png.length)
    // corrupt image: stub features from declared 128x32 -> 64x16
    assert(got(2L).thumb_w == 64 && got(2L).thumb_h == 16)
    // audio: stub path ignores that the payload happens to be a PNG
    assert(got(3L).thumb_w == 64 && got(3L).thumb_h == 48)
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

  test("renderThumbnails emits REAL resized pixels: pixel-exact " +
    "nearest-neighbor on a real PNG, null payload for non-image/" +
    "corrupt/over-budget records") {
    // a real 8x4 PNG with a distinct color per pixel
    val img = new java.awt.image.BufferedImage(
      8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(y => (0 until 8).foreach(x =>
      img.setRGB(x, y, (x * 0x010203 + y * 0x102030) & 0xffffff)))
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", buf))
    val png = buf.toByteArray
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", png, 9, 9),
      Multimodal.MediaRecord(2L, "image", "junk".getBytes("UTF-8"), 80, 20),
      Multimodal.MediaRecord(3L, "video", png, 640, 480)
    ).toDF()
    // box=4: 8x4 -> 4x2
    val got = Multimodal.renderThumbnails(spark, media, box = 4)
      .collect().map(t => t.doc_id -> t).toMap
    assert(got(1L).thumb_w == 4 && got(1L).thumb_h == 2)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(got(1L).thumb_png))
    assert(back.getWidth == 4 && back.getHeight == 2)
    // pixel-exact: nearest-neighbor maps out(x,y) <- in(x*8/4, y*4/2)
    (0 until 2).foreach(y => (0 until 4).foreach { x =>
      val expected = img.getRGB(x * 8 / 4, y * 4 / 2)
      assert(back.getRGB(x, y) == expected, s"pixel ($x,$y)")
    })
    // corrupt image: declared 80x20 -> box 4 = 4x1, payload null
    assert(got(2L).thumb_png == null &&
      got(2L).thumb_w == 4 && got(2L).thumb_h == 1)
    // non-image: null payload (no JDK codec), declared-dims box
    assert(got(3L).thumb_png == null)
    // decompression-bomb guard: a decodable image past maxPixels is
    // skipped to null instead of resampled
    val guarded = Multimodal.renderThumbnails(spark,
        Seq(Multimodal.MediaRecord(4L, "image", png, 8, 4)).toDF(),
        box = 4, maxPixels = 8L)
      .collect().head
    assert(guarded.thumb_png == null)
  }

  test("dhash64 on a REAL 9x8 PNG equals the hand-computed adjacent-" +
    "compare hash, is invariant to a global brightness shift, and flips " +
    "exactly the patch-edit comparisons") {
    // 9x8 = the canonical grid, so resizeNearest is the identity and the
    // luma of a pure-gray pixel (v,v,v) is exactly v (77+151+28 = 256).
    def grayPng(shift: Int, patch: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach(y => (0 until 9).foreach { x =>
        var v = (x * 13 + y * 5) % 200 + shift // +40 shift stays < 256
        if (patch && x == 4 && y == 3) v = 255
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      val buf = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", buf))
      buf.toByteArray
    }
    def hashOf(png: Array[Byte]): Long =
      Multimodal.dhash64(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png)))
    // hand-computed expectation straight from the defining formula
    val grid = Array.tabulate(72)(i => ((i % 9) * 13 + (i / 9) * 5) % 200)
    var expected = 0L
    (0 until 64).foreach { b =>
      val y = b / 8; val x = b % 8
      if (grid(y * 9 + x + 1) > grid(y * 9 + x)) expected |= 1L << b
    }
    val base = hashOf(grayPng(0, patch = false))
    assert(base == expected)
    // global +40 brightness: every comparison sees the same offset
    assert(hashOf(grayPng(40, patch = false)) == base)
    // one patched cell touches only its two adjacent comparisons; here
    // (3,3)->(4,3) keeps its direction and (4,3)->(5,3) flips
    val patched = hashOf(grayPng(0, patch = true))
    assert(java.lang.Long.bitCount(base ^ patched) == 1)
  }

  test("imageDhashes real-decode path: near-identical images meet in " +
    "hammingPairs, unrelated images do not; non-image and over-budget " +
    "records are null") {
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 48).foreach(y => (0 until 64).foreach { x =>
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      val buf = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", buf))
      buf.toByteArray
    }
    val a = png((x, y) => x * 3 + y * 2)
    // a small patch edit: one 4x4 block brightened, placed to COVER the
    // 9x8 grid's sampled pixel (28, 18) so the hash actually sees it
    val aEdit = png((x, y) =>
      if (x >= 26 && x < 30 && y >= 16 && y < 20) 250 else x * 3 + y * 2)
    val b = png((x, y) => (x * x + y * 37) % 251) // unrelated content
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", a, 64, 48),
      Multimodal.MediaRecord(2L, "image", aEdit, 64, 48),
      Multimodal.MediaRecord(3L, "image", b, 64, 48),
      Multimodal.MediaRecord(4L, "image", "not a png".getBytes("UTF-8"), 64, 48),
      Multimodal.MediaRecord(5L, "audio", a, 64, 48)
    ).toDF()
    val hashes = Multimodal.imageDhashes(spark, media)
      .collect().map(h => h.doc_id -> Option(h.dhash).map(_.toLong)).toMap
    assert(hashes(4L).isEmpty && hashes(5L).isEmpty)
    assert(hashes(1L).isDefined && hashes(2L).isDefined && hashes(3L).isDefined)
    assert(java.lang.Long.bitCount(hashes(1L).get ^ hashes(2L).get) <= 3)
    assert(java.lang.Long.bitCount(hashes(1L).get ^ hashes(3L).get) > 10)
    // over-budget header dims -> null (the bomb contract carries over)
    val guarded = Multimodal.imageDhashes(spark,
        Seq(Multimodal.MediaRecord(6L, "image", a, 64, 48)).toDF(),
        maxPixels = 16L)
      .collect().head
    assert(guarded.dhash == null)
    // the factored block-LSH finds exactly the planted near-pair
    val sigs = Multimodal.imageDhashes(spark, media).toDF()
      .filter($"dhash".isNotNull)
    val pairs = graft.operators.NearDup
      .hammingPairs(sigs, "doc_id", "dhash", maxHamming = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("decompression-bomb guard fires BEFORE the decode: header-only " +
    "dims, bounded allocation, no pixel read ever attempted") {
    // A PNG with a VALID header declaring 8000x8000 (64M px -> 256 MB
    // ARGB if decoded) and NO pixel data at all. Header-only parsing
    // succeeds on it; any attempt at a full decode would first allocate
    // the destination raster, then throw on the missing IDAT.
    def bombPng(w: Int, h: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      val chunk = java.nio.ByteBuffer.allocate(17)
      chunk.put("IHDR".getBytes("US-ASCII"))
      chunk.putInt(w); chunk.putInt(h)
      chunk.put(8.toByte)  // bit depth
      chunk.put(2.toByte)  // color type: RGB
      chunk.put(0.toByte); chunk.put(0.toByte); chunk.put(0.toByte)
      val crc = new java.util.zip.CRC32(); crc.update(chunk.array())
      bos.write(java.nio.ByteBuffer.allocate(4).putInt(13).array())
      bos.write(chunk.array())
      bos.write(java.nio.ByteBuffer.allocate(4)
        .putInt(crc.getValue.toInt).array())
      bos.toByteArray // truncated here: no IDAT, no IEND
    }
    val bomb = bombPng(8000, 8000)
    // the header parse is truly header-only: there ARE no pixels
    assert(Multimodal.headerDims(bomb).contains((8000, 8000)))
    // guard: over-budget dims rejected from the header; the call must
    // not allocate anything decode-sized on this thread
    val mx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread.getId
    val before = mx.getThreadAllocatedBytes(tid)
    val out = Multimodal.readImageGuarded(bomb, maxPixels = 1L << 20)
    val allocated = mx.getThreadAllocatedBytes(tid) - before
    assert(out == null)
    assert(allocated < 32L * 1024 * 1024,
      s"allocated $allocated bytes — the decode was attempted")
    // end-to-end: renderThumbnails nulls the bomb (dims fall back to
    // the declared box) and ImageIoDecoder still reports header dims
    val media = Seq(Multimodal.MediaRecord(1L, "image", bomb, 10, 10)).toDF()
    val thumb = Multimodal.renderThumbnails(spark, media, box = 4,
      maxPixels = 1L << 20).collect().head
    assert(thumb.thumb_png == null && thumb.thumb_w == 4 && thumb.thumb_h == 4)
    val feats = Multimodal.extractFeatures(spark, media,
      Multimodal.ImageIoDecoder).collect().head
    assert(feats.thumb_w == 64 && feats.thumb_h == 64) // from 8000x8000
  }

  test("extractAudioFeatures parses a REAL WAV container: sample rate, " +
    "channels, bits, frames, duration from the decoded header; " +
    "non-audio and undecodable fall through with -1s") {
    // build a real 16-bit stereo 8kHz WAV in-process (headless-safe)
    val rate = 8000f
    val nFrames = 4000 // half a second
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 2, true, false)
    val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
    (0 until nFrames).foreach { i =>
      val v = (math.sin(i * 0.05) * 8192).toInt
      val off = i * 4
      pcm(off) = (v & 0xff).toByte; pcm(off + 1) = ((v >> 8) & 0xff).toByte
      pcm(off + 2) = pcm(off); pcm(off + 3) = pcm(off + 1)
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio", wav, 0, 0),
      Multimodal.MediaRecord(2L, "audio", "not audio".getBytes("UTF-8"), 0, 0),
      Multimodal.MediaRecord(3L, "image", wav, 10, 10) // wrong type: skipped
    ).toDF()
    val got = Multimodal.extractAudioFeatures(spark, media)
      .collect().map(a => a.doc_id -> a).toMap
    assert(got(1L).sample_rate == 8000 && got(1L).channels == 2 &&
      got(1L).bits == 16 && got(1L).n_frames == 4000L &&
      got(1L).duration_ms == 500L)
    assert(got(1L).checksum ==
      graft.functions.TextHash.fnv64(wav, 0, wav.length))
    assert(got(2L).sample_rate == -1 && got(2L).n_frames == -1L)
    assert(got(3L).sample_rate == -1)
  }

  test("extractVideoFeatures parses a REAL MP4 header: brand, timescale, " +
    "duration, tracks, 16.16 dims from the moov tree; mdat skipped by " +
    "size (never read); non-BMFF and truncated payloads fall through") {
    import java.nio.ByteBuffer
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", "isomiso2".getBytes("US-ASCII"))
    // mvhd v0: ver/flags, ctime, mtime, timescale=600, duration=3000
    // (-> 5000 ms), then the 80 spec bytes (rate..next_track_id)
    val mvhd = box("mvhd", ByteBuffer.allocate(100)
      .putInt(0).putInt(0).putInt(0).putInt(600).putInt(3000).array())
    // tkhd v0: 20 bytes of times/ids, 52 reserved/matrix bytes, then
    // width=640.0, height=360.0 as 16.16 fixed
    val tkhd = box("tkhd", ByteBuffer.allocate(84)
      .putInt(0).putInt(0).putInt(0).putInt(1).putInt(3000)
      .position(76).asInstanceOf[ByteBuffer]
      .putInt(640 << 16).putInt(360 << 16).array())
    val tkhd2 = box("tkhd", ByteBuffer.allocate(84)
      .putInt(0).putInt(0).putInt(0).putInt(2).putInt(3000)
      .position(76).asInstanceOf[ByteBuffer]
      .putInt(0).putInt(0).array()) // audio track: 0x0 dims
    val moov = box("moov", mvhd ++ box("trak", tkhd) ++ box("trak", tkhd2))
    // mdat payload is GARBAGE that would crash any decoder — the
    // header walk must skip it by its size field without reading it
    val mdat = box("mdat", Array.fill[Byte](512)(0x5a))
    val mp4 = ftyp ++ mdat ++ moov // moov-last layout (non-faststart)
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", mp4, 0, 0),
      Multimodal.MediaRecord(2L, "video", "not a container".getBytes("UTF-8"), 0, 0),
      Multimodal.MediaRecord(3L, "video", mp4.take(20), 0, 0), // truncated
      Multimodal.MediaRecord(4L, "image", mp4, 0, 0) // wrong type: skipped
    ).toDF()
    val got = Multimodal.extractVideoFeatures(spark, media)
      .collect().map(v => v.doc_id -> v).toMap
    assert(got(1L).brand == "isom" && got(1L).timescale == 600 &&
      got(1L).duration_ms == 5000L && got(1L).n_tracks == 2 &&
      got(1L).width == 640 && got(1L).height == 360)
    assert(got(1L).checksum ==
      graft.functions.TextHash.fnv64(mp4, 0, mp4.length))
    assert(got(2L).timescale == -1 && got(2L).brand == "")
    assert(got(3L).timescale == -1) // truncated: permissive fallback
    assert(got(4L).timescale == -1) // non-video media_type
    // mvhd v1 (64-bit times): timescale 1000, duration 90000 -> 90 s
    val mvhd1 = box("mvhd", ByteBuffer.allocate(112)
      .putInt(0x01000000).putLong(0L).putLong(0L).putInt(1000)
      .putLong(90000L).array())
    val mp4v1 = ftyp ++ box("moov", mvhd1 ++ box("trak", tkhd))
    val v1 = Multimodal.extractVideoFeatures(spark,
      Seq(Multimodal.MediaRecord(9L, "video", mp4v1, 0, 0)).toDF())
      .collect().head
    assert(v1.timescale == 1000 && v1.duration_ms == 90000L &&
      v1.n_tracks == 1 && v1.width == 640)
  }

  test("sampleGifFrames decodes REAL codec frames from an animated GIF: " +
    "evenly-spaced indices, per-frame pixels; non-GIF emits nothing") {
    // build a real 6-frame animated GIF in-process via the ImageIO
    // sequence writer; frame k is a solid color encoding k
    import javax.imageio.ImageIO
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    val colors = (0 until 6).map(k => 0x102030 * (k + 1) & 0xffffff)
    colors.foreach { c =>
      val img = new java.awt.image.BufferedImage(
        5, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 3).foreach(y => (0 until 5).foreach(x => img.setRGB(x, y, c)))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val gif = bos.toByteArray
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", gif, 5, 3),
      Multimodal.MediaRecord(2L, "video", "junk".getBytes("UTF-8"), 1, 1)
    ).toDF()
    val got = Multimodal.sampleGifFrames(spark, media, maxFrames = 4)
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    // only the real GIF emits; 4 frames evenly spaced over 6: 0,1,3,5
    assert(got.forall(_.doc_id == 1L))
    assert(got.map(_.frame_idx).toSeq == Seq(0, 1, 3, 5))
    assert(got.forall(f => f.n_frames == 6 && f.w == 5 && f.h == 3))
    // each emitted frame round-trips as PNG with the right solid color
    // (GIF palettizes: compare against the DECODED gif frame, which is
    // what the operator emits)
    got.foreach { f =>
      val png = ImageIO.read(new java.io.ByteArrayInputStream(f.frame_png))
      assert(png.getWidth == 5 && png.getHeight == 3)
      val px = png.getRGB(2, 1) & 0xffffff
      // all pixels of a frame agree (solid frame survived the decode)
      (0 until 3).foreach(y => (0 until 5).foreach(x =>
        assert((png.getRGB(x, y) & 0xffffff) == px)))
    }
    // distinct frames decode to distinct colors (we really seeked)
    assert(got.map(f => ImageIO.read(
      new java.io.ByteArrayInputStream(f.frame_png)).getRGB(0, 0))
      .distinct.length == got.length)
  }
}
