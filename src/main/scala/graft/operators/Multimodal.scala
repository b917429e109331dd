package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the pipeline
  * as opaque `binary` columns with typed metadata, and per-record
  * decode/feature-extraction runs batch-wise in `mapPartitions` so a
  * real decoder would amortize its init (model load, codec context) per
  * partition, not per row.
  *
  * The actual byte decode is STUBBED (this container ships no
  * image/audio codecs): [[StubDecoder]] produces deterministic features
  * from the raw bytes. Everything around it — schema, batching,
  * partitioning, the typed Dataset boundary — is real and tested.
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, media_type: String,
                         payload: Array[Byte], declared_w: Int, declared_h: Int)

  /** Extracted features (what a real decoder would emit). */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                           checksum: Long, thumb_w: Int, thumb_h: Int,
                           frame_samples: Int)

  /** STUB decoder — deterministic stand-in for image/audio decode.
    * A production build replaces `decode` with a codec call; the
    * signature (bytes in, features out, called once per record inside a
    * per-partition batch loop) is the real contract. */
  object StubDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val sum = graft.functions.TextHash.fnv64(r.payload, 0, r.payload.length)
      // "resize": clamp declared dims to a 64px thumbnail box, keeping ratio
      val scale = math.min(1.0, 64.0 / math.max(1, math.max(r.declared_w, r.declared_h)))
      MediaFeatures(r.doc_id, r.media_type, r.payload.length, sum,
        math.max(1, (r.declared_w * scale).toInt),
        math.max(1, (r.declared_h * scale).toInt),
        // "frame-sample": one sample per 4KiB of payload, at least 1
        math.max(1, r.payload.length / 4096))
    }
  }

  /** Build a media table from the documents table: payload = utf-8 bytes
    * of the text (deterministic fake media), metadata derived from the
    * key. */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      (col("doc_id") % 1920 + 16).cast("int").as("declared_w"),
      (col("doc_id") % 1080 + 16).cast("int").as("declared_h"))

  /** Decode/feature-extract via per-partition batches. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition init would live here (codec/model handles)
      it.map(StubDecoder.decode)
    }
  }

  /** One sampled frame: slice metadata + the frame payload. */
  case class Frame(doc_id: Long, media_type: String, frame_idx: Int,
                   frame_offset: Int, frame_bytes: Array[Byte])

  /** Frame sampling: explode each media payload into up to
    * `maxFrames` evenly-spaced frame slices of `frameSize` bytes —
    * the Spark shape of video frame extraction (a real decoder
    * replaces the byte-slice with a codec seek+decode at the same
    * offsets). Output volume is bounded by maxFrames × |input|; the
    * flatMap runs inside the same partition as the scan, no shuffle. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   maxFrames: Int = 4, frameSize: Int = 1024): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      val n = math.max(1, math.min(maxFrames, r.payload.length / frameSize))
      (0 until n).iterator.map { i =>
        val off = ((r.payload.length - frameSize).max(0).toLong * i /
          math.max(1, n - 1).toLong).toInt
        val end = math.min(r.payload.length, off + frameSize)
        Frame(r.doc_id, r.media_type, i, off,
          java.util.Arrays.copyOfRange(r.payload, off, end))
      }
    }
  }
}
