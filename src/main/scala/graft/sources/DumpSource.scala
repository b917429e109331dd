package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, IOException}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for GHTorrent-style dump files: a file is a
  * concatenation of length-prefixed documents — 4-byte little-endian
  * total length (including the prefix itself, as in BSON) followed by
  * the document body (reference framing: ght2dm.go:202-236).
  *
  * Output schema: (path string, doc_index long, doc binary) where `doc`
  * is the body without the 4-byte prefix.
  *
  * Parallelism = one input partition per file. Variable-length framing
  * has no intra-file split points, and GHTorrent dumps are daily shards
  * (thousands of files at 100 TB), so file-granular parallelism is the
  * natural scale unit — the same reason the reference iterates files
  * (ght2dm.go:1013-1058). Documents are streamed, never
  * whole-file-materialized.
  *
  * Usage: `spark.read.format("graft.sources.DumpDataSource").load(paths*)`.
  */
class DumpDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DumpSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DumpTable(DumpSource.pathsFromProps(properties))
  override def supportsExternalMetadata(): Boolean = false
}

object DumpSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("doc_index", LongType, nullable = false),
    StructField("doc", BinaryType, nullable = false)))

  /** The active session's Hadoop configuration (carries filesystem
    * settings/credentials for object stores); a bare `new
    * Configuration()` only when no session exists (driver-side test
    * helpers). */
  def activeHadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** `.load(p1, p2, ...)` lands in options as a JSON array under
    * "paths"; a single `.load(p)` as "path". */
  def pathsFromProps(properties: util.Map[String, String]): Seq[String] = {
    val opts = properties.asScala
    opts.get("paths") match {
      case Some(json) =>
        // minimal JSON string-array parse (values are driver-produced)
        json.stripPrefix("[").stripSuffix("]").split(",")
          .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
          .filter(_.nonEmpty)
      case None => opts.get("path").toSeq
    }
  }

  /** Date-ordered visitation (ght2dm.go:985-1058): keep only files named
    * `YYYY-MM-DD<suffix>`, sorted by that date descending — the
    * reference's processing order. */
  def listDateOrdered(dir: String, suffix: String = ".bson"): Seq[String] = {
    val datedName = ("""^\d{4}-\d{2}-\d{2}""" + java.util.regex.Pattern.quote(suffix) + "$").r
    val fs = new Path(dir).getFileSystem(activeHadoopConf())
    val files = fs.listStatus(new Path(dir)).toSeq
      .filter(s => s.isFile && datedName.findFirstIn(s.getPath.getName).isDefined)
    files.sortBy(_.getPath.getName)(Ordering[String].reverse).map(_.getPath.toString)
  }

  /** Frame writer (test fixtures / staging): 4-byte LE length incl.
    * prefix, then the body. */
  def writeDump(path: String, docs: Iterator[Array[Byte]]): Unit = {
    val fs = new Path(path).getFileSystem(activeHadoopConf())
    val out = fs.create(new Path(path), true)
    try docs.foreach { body =>
      val len = body.length + 4
      out.write(Array[Byte](
        (len & 0xff).toByte, ((len >> 8) & 0xff).toByte,
        ((len >> 16) & 0xff).toByte, ((len >> 24) & 0xff).toByte))
      out.write(body)
    } finally out.close()
  }
}

class DumpTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"graft_dump(${paths.mkString(",")})"
  override def schema(): StructType = DumpSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // capture the session's Hadoop conf ON THE DRIVER and ship it with
    // the reader factory — executors have no active SparkSession, and a
    // bare `new Configuration()` would drop object-store credentials
    val conf = new org.apache.spark.util.SerializableConfiguration(
      DumpSource.activeHadoopConf())
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = DumpSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        paths.map(p => DumpFilePartition(p): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new DumpReaderFactory(conf)
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new DumpMicroBatchStream(paths, conf)
    }
  }
}

/** Streaming twin of the dump ingestion: the reference re-runs over a
  * dump folder as new daily `YYYY-MM-DD.bson` shards land
  * (ght2dm.go:985-1058); here the folder IS an unbounded source. The
  * offset is a count into the date-sorted file list (dumps are
  * append-only: new dates sort after processed ones), each micro-batch
  * is the newly-arrived files — one partition per file, exactly-once
  * via the checkpointed offset. Load with a DIRECTORY path:
  * `spark.readStream.format("graft.sources.DumpDataSource").load(dir)`.
  */
class DumpMicroBatchStream(paths: Seq[String],
    conf: org.apache.spark.util.SerializableConfiguration)
  extends MicroBatchStream {

  /** paths = a single directory (the streaming layout) or an explicit
    * file list (then the "stream" is that fixed list, oldest-first). */
  private def currentFiles(): Seq[String] = paths match {
    case Seq(single) =>
      val fs = new Path(single).getFileSystem(conf.value)
      if (fs.getFileStatus(new Path(single)).isDirectory)
        DumpSource.listDateOrdered(single).reverse // oldest -> newest
      else paths
    case _ => paths
  }

  override def initialOffset(): Offset = DumpOffset(0, None)
  override def latestOffset(): Offset = {
    val files = currentFiles()
    DumpOffset(files.length, files.lastOption.map(baseName))
  }
  override def deserializeOffset(json: String): Offset = DumpOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  private def baseName(p: String): String = new Path(p).getName

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val so = start.asInstanceOf[DumpOffset]
    val s = so.fileCount
    val e = end.asInstanceOf[DumpOffset].fileCount
    val files = currentFiles()
    // enforce the append-only assumption the offset encoding relies on:
    // if a shard with an OLDER date lands after files past it were
    // committed, the count-based offset would silently skip it — fail
    // loudly instead of dropping data
    so.lastFile.foreach { committed =>
      if (s > files.length || (s > 0 && baseName(files(s - 1)) != committed))
        throw new IllegalStateException(
          s"dump folder is not append-only: committed offset ($s files, " +
            s"last '$committed') no longer matches the date-sorted listing " +
            s"(${files.length} files" +
            (if (s > 0 && s <= files.length) s", position $s is '${baseName(files(s - 1))}'" else "") +
            "); a shard older than already-processed dates arrived late")
    }
    files.slice(s, e)
      .map(p => DumpFilePartition(p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DumpReaderFactory(conf)
}

/** Offset = how many files of the date-sorted listing are processed,
  * plus the NAME of the last processed file — so a late-arriving shard
  * with an older date (which would shift the count-based index) is
  * detected instead of silently skipping data. */
case class DumpOffset(fileCount: Int, lastFile: Option[String]) extends Offset {
  override def json(): String =
    lastFile.fold(fileCount.toString)(f => s"""{"n":$fileCount,"last":"$f"}""")
}

object DumpOffset {
  private val WithLast = """\{"n":(\d+),"last":"(.*)"\}""".r
  def fromJson(json: String): DumpOffset = json.trim match {
    case WithLast(n, f) => DumpOffset(n.toInt, Some(f))
    case n => DumpOffset(n.toInt, None) // pre-validation checkpoint format
  }
}

case class DumpFilePartition(path: String) extends InputPartition

class DumpReaderFactory(conf: org.apache.spark.util.SerializableConfiguration)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new DumpPartitionReader(partition.asInstanceOf[DumpFilePartition].path, conf)
}

/** Streams one dump file, yielding one row per framed document. */
class DumpPartitionReader(path: String,
    conf: org.apache.spark.util.SerializableConfiguration)
  extends PartitionReader[InternalRow] {
  private val in: DataInputStream = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    new DataInputStream(new BufferedInputStream(fs.open(p), 1 << 16))
  }
  private val pathUtf8 = UTF8String.fromString(path)
  private var index = -1L
  private var current: Array[Byte] = _

  override def next(): Boolean = {
    val lenBuf = new Array[Byte](4)
    val first = in.read(lenBuf)
    if (first == -1) return false
    if (first != 4) {
      var got = first
      while (got < 4) {
        val r = in.read(lenBuf, got, 4 - got)
        if (r == -1) throw new IOException(s"malformed dump (truncated length) in $path")
        got += r
      }
    }
    val len = (lenBuf(0) & 0xff) | ((lenBuf(1) & 0xff) << 8) |
      ((lenBuf(2) & 0xff) << 16) | ((lenBuf(3) & 0xff) << 24)
    if (len < 4) throw new IOException(s"malformed dump (doc length $len) in $path")
    val body = new Array[Byte](len - 4)
    try in.readFully(body)
    catch { case _: EOFException =>
      throw new IOException(s"malformed dump (truncated doc) in $path")
    }
    current = body
    index += 1
    true
  }

  override def get(): InternalRow =
    InternalRow(pathUtf8, index, current)

  override def close(): Unit = in.close()
}
