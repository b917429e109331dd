package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, IOException}
import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for WARC (Web ARChive, ISO 28500) files — the format
  * web crawls (Common Crawl and friends) ship in, and the raw input of
  * every web-scale training-data pipeline. A file is a concatenation of
  * records, each a `WARC/1.0\r\n` version line, CRLF header lines
  * (`Name: value`), an empty line, `Content-Length` payload bytes, and
  * a `\r\n\r\n` trailer.
  *
  * Output schema: (path, record_offset, warc_type, record_id,
  * target_uri, warc_date, content_length, content) — `record_offset`
  * is the record's absolute byte offset, a stable identity independent
  * of how the file was split.
  *
  * Parallelism: unlike the length-prefixed dump format (no intra-file
  * resync points — [[DumpSource]] needs a sidecar index), WARC is
  * SELF-RESYNCING: the version magic marks every record start. Files
  * larger than `splitBytes` (default 64 MiB, `.option("splitBytes", n)`,
  * 0 disables) are cut into byte ranges; a task owns exactly the
  * records STARTING inside its range, and a range not beginning at
  * offset 0 seeks to its start and scans forward for the magic,
  * validating each candidate by parsing a full CRLF header block with a
  * sane `Content-Length` (a bare magic string inside a payload is
  * rejected by the validation). The union of splits is therefore
  * byte-identical to the unsplit read. Known limit, documented rather
  * than hidden: a payload embedding a COMPLETE well-formed WARC header
  * block can fool the resync scan — production crawls avoid this by
  * storing one gzip member per record (the resync point becomes the
  * gzip magic); the framing logic here is identical either way.
  *
  * Records are streamed — header block capped at 64 KiB, one payload
  * at a time, never whole-file materialization.
  *
  * Usage: `spark.read.format("graft.sources.WarcDataSource").load(paths*)`.
  */
class WarcDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WarcTable(DumpSource.pathsFromProps(properties))
  override def supportsExternalMetadata(): Boolean = false
}

object WarcSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("record_offset", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  private[sources] val Magic: Array[Byte] =
    "WARC/1.0\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private[sources] val MaxHeaderBytes = 64 << 10

  /** Write `records` as WARC/1.0 response records: (target URI, payload
    * bytes) with a deterministic record id (FNV of the URI — replayable
    * fixtures, no wall-clock/UUID nondeterminism). */
  def writeWarc(path: String, records: Iterator[(String, Array[Byte])],
                date: String = "2014-01-01T00:00:00Z",
                warcType: String = "response"): Unit = {
    val fs = new Path(path).getFileSystem(DumpSource.activeHadoopConf())
    val out = fs.create(new Path(path), true)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    try records.foreach { case (uri, body) =>
      val id = java.lang.Long.toHexString(
        graft.functions.TextHash.fnv64(uri.getBytes(ascii), 0, uri.length))
      val header =
        s"WARC/1.0\r\n" +
          s"WARC-Type: $warcType\r\n" +
          s"WARC-Record-ID: <urn:graft:$id>\r\n" +
          s"WARC-Date: $date\r\n" +
          s"WARC-Target-URI: $uri\r\n" +
          s"Content-Length: ${body.length}\r\n" +
          "\r\n"
      out.write(header.getBytes(ascii))
      out.write(body)
      out.write("\r\n\r\n".getBytes(ascii))
    } finally out.close()
  }

  /** Cut one file into [start, end) ranges of ~`splitBytes`; ranges
    * tile the file exactly and need no index — readers resync on the
    * record magic. */
  def planSplits(path: String, splitBytes: Long,
                 conf: org.apache.hadoop.conf.Configuration): Seq[WarcFilePartition] = {
    val p = new Path(path)
    val fileLen = p.getFileSystem(conf).getFileStatus(p).getLen
    if (splitBytes <= 0 || fileLen <= splitBytes)
      return Seq(WarcFilePartition(path, 0L, Long.MaxValue))
    (0L until fileLen by splitBytes)
      .map(off => WarcFilePartition(path, off, math.min(off + splitBytes, fileLen)))
  }
}

class WarcTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"graft_warc(${paths.mkString(",")})"
  override def schema(): StructType = WarcSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // capture the session's Hadoop conf ON THE DRIVER (executors have
    // no active session; a bare Configuration drops store credentials)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      DumpSource.activeHadoopConf())
    val splitBytes = options.getLong("splitbytes", 64L << 20)
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = WarcSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        paths.flatMap(p =>
          WarcSource.planSplits(p, splitBytes, conf.value)
            .map(sp => sp: InputPartition)).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new WarcReaderFactory(conf)
    }
  }
}

/** One read task: records of `path` STARTING in [start, end). */
case class WarcFilePartition(path: String, start: Long, end: Long)
  extends InputPartition

class WarcReaderFactory(conf: org.apache.spark.util.SerializableConfiguration)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(partition.asInstanceOf[WarcFilePartition], conf)
}

/** Streams one WARC split: resyncs to the first record start at or
  * after `part.start` (offset 0 needs no scan), then parses records
  * until one would START at or past `part.end`. */
class WarcPartitionReader(part: WarcFilePartition,
    conf: org.apache.spark.util.SerializableConfiguration)
  extends PartitionReader[InternalRow] {

  private val fsPath = new Path(part.path)
  private val fs = fsPath.getFileSystem(conf.value)
  private val fileLen = fs.getFileStatus(fsPath).getLen
  private val pathUtf8 = UTF8String.fromString(part.path)

  // probe stream for candidate validation during resync (seekable,
  // reused across candidates; null until resync needs it)
  private var probe: org.apache.hadoop.fs.FSDataInputStream = _

  private var pos: Long = part.start
  private var in: DataInputStream = _
  private var row: InternalRow = _

  { // resync, then open the sequential record stream at a boundary
    val startAt = if (part.start == 0L) 0L else findNextRecord(part.start)
    if (probe != null) { probe.close(); probe = null }
    pos = startAt
    if (startAt >= 0 && startAt < math.min(part.end, fileLen)) {
      val raw = fs.open(fsPath)
      if (startAt > 0) raw.seek(startAt)
      in = new DataInputStream(new BufferedInputStream(raw, 1 << 16))
    }
  }

  /** Scan forward from `from` for the version magic, validating each
    * candidate by parsing its header block; -1 when none before
    * `part.end`. KMP is overkill for a 10-byte pattern with a
    * first-byte filter — a simple match loop over a buffered stream. */
  private def findNextRecord(from: Long): Long = {
    val magic = WarcSource.Magic
    val scan = fs.open(fsPath)
    try {
      scan.seek(from)
      val buf = new BufferedInputStream(scan, 1 << 16)
      var off = from
      var matched = 0
      val limit = math.min(part.end, fileLen)
      while (off < limit + magic.length) {
        val b = buf.read()
        if (b == -1) return -1L
        if (b == magic(matched)) {
          matched += 1
          if (matched == magic.length) {
            val candidate = off + 1 - magic.length
            if (candidate < limit && validHeaderAt(candidate)) return candidate
            matched = 0 // magic text inside a payload: keep scanning
          }
        } else matched = if (b == magic(0)) 1 else 0
        off += 1
      }
      -1L
    } finally scan.close()
  }

  /** True when a full CRLF header block with a parseable, in-file
    * Content-Length follows the magic at `at` — what separates a real
    * record start from stray magic bytes in a payload. */
  private def validHeaderAt(at: Long): Boolean = {
    if (probe == null) probe = fs.open(fsPath)
    probe.seek(at + WarcSource.Magic.length)
    val pin = new DataInputStream(new BufferedInputStream(probe, 8192))
    try {
      val h = readHeaders(pin, at + WarcSource.Magic.length)
      h.exists { case (hdrs, hdrEnd) =>
        hdrs.get("content-length").exists { cl =>
          cl.forall(_.isDigit) && cl.nonEmpty &&
            hdrEnd + cl.toLong <= fileLen
        }
      }
    } catch { case _: IOException => false }
  }

  /** Parse `Name: value` CRLF lines up to the empty line; returns the
    * lowercased header map and the absolute offset just past the blank
    * line, or None on malformed/oversized blocks. Does NOT close the
    * stream. */
  private def readHeaders(s: DataInputStream,
                          startAbs: Long): Option[(Map[String, String], Long)] = {
    val hdrs = scala.collection.mutable.Map.empty[String, String]
    var abs = startAbs
    var guard = 0
    while (guard < 256) {
      guard += 1
      val line = new java.io.ByteArrayOutputStream(128)
      var prev = -1
      var b = s.read()
      var ended = false
      while (!ended) {
        if (b == -1) return None
        if (prev == '\r' && b == '\n') ended = true
        else { line.write(b); prev = b; b = s.read() }
      }
      // `line` holds the bytes before '\n' including the '\r'; the
      // stream consumed line.size() + 1 bytes total
      abs += line.size() + 1
      val bytes = line.toByteArray
      val text = new String(bytes, 0, math.max(0, bytes.length - 1),
        java.nio.charset.StandardCharsets.US_ASCII)
      if (abs - startAbs > WarcSource.MaxHeaderBytes) return None
      if (text.isEmpty) return Some((hdrs.toMap, abs))
      val i = text.indexOf(':')
      if (i <= 0) return None
      hdrs(text.substring(0, i).trim.toLowerCase) = text.substring(i + 1).trim
    }
    None
  }

  override def next(): Boolean = {
    if (in == null || pos >= math.min(part.end, fileLen)) return false
    // expect the version line at pos
    val magic = new Array[Byte](WarcSource.Magic.length)
    try in.readFully(magic)
    catch { case _: EOFException => return false }
    if (!java.util.Arrays.equals(magic, WarcSource.Magic))
      throw new IOException(
        s"malformed WARC: no version magic at offset $pos in ${part.path}")
    val recordStart = pos
    readHeaders(in, pos + magic.length) match {
      case None => throw new IOException(
        s"malformed WARC: bad header block at offset $pos in ${part.path}")
      case Some((hdrs, bodyStart)) =>
        val cl = hdrs.getOrElse("content-length",
          throw new IOException(
            s"malformed WARC: missing Content-Length at $pos in ${part.path}")).toLong
        if (cl < 0 || cl > Int.MaxValue - 16) throw new IOException(
          s"WARC record at $pos in ${part.path} exceeds the 2 GiB row " +
            s"payload cap (Content-Length $cl)")
        val body = new Array[Byte](cl.toInt)
        in.readFully(body)
        val trailer = new Array[Byte](4)
        in.readFully(trailer)
        if (!java.util.Arrays.equals(trailer,
            "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
          throw new IOException(
            s"malformed WARC: missing record trailer at $pos in ${part.path}")
        pos = bodyStart + cl + 4
        row = InternalRow(
          pathUtf8,
          recordStart,
          UTF8String.fromString(hdrs.getOrElse("warc-type", "")),
          UTF8String.fromString(hdrs.getOrElse("warc-record-id", "")),
          hdrs.get("warc-target-uri").map(UTF8String.fromString).orNull,
          hdrs.get("warc-date").map(UTF8String.fromString).orNull,
          cl,
          body)
        true
    }
  }

  override def get(): InternalRow = row

  override def close(): Unit = {
    if (in != null) in.close()
    if (probe != null) probe.close()
  }
}
