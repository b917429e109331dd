package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimal BSON codec (bsonspec.org, public domain spec) for the
  * GHTorrent-shaped entity documents the ingest pipeline decodes —
  * the binary twin of the reference's mgo/bson unmarshalling
  * (ght2dm.go:26, struct tags :38-100, parse :277-315).
  *
  * A BSON document is `int32 totalLen (incl. itself) | e_list | 0x00`.
  * [[graft.sources.DumpSource]] strips the 4-byte prefix (it doubles as
  * the dump framing), so [[BsonDecoder.decode]] accepts BOTH shapes:
  * bytes whose leading int32 equals the array length and whose last
  * byte is the terminator are a full document, anything else a
  * prefix-stripped element list. (A stripped body starts with a type
  * byte ≤ 0x13, so a false full-document match would need the body
  * length to collide with those low bytes AND end in 0x00 AND decode
  * cleanly — not a shape real entity docs can take.)
  *
  * Only the types the entity schemas use are DECODED (string,
  * int32/int64/double, bool, null, UTC-datetime, embedded document,
  * and arrays of those — `parents` on a commit document); every BSON
  * type is SKIPPED correctly, so documents may carry any extra
  * fields — the reference's unmarshal-into-struct behavior of
  * ignoring unknown keys.
  */
object Bson {
  // BSON element type bytes (bsonspec.org §specification)
  final val TDouble = 0x01
  final val TString = 0x02
  final val TDoc = 0x03
  final val TArray = 0x04
  final val TBinary = 0x05
  final val TUndefined = 0x06
  final val TObjectId = 0x07
  final val TBool = 0x08
  final val TDatetime = 0x09
  final val TNull = 0x0a
  final val TRegex = 0x0b
  final val TDbPointer = 0x0c
  final val TCode = 0x0d
  final val TSymbol = 0x0e
  final val TCodeScope = 0x0f
  final val TInt32 = 0x10
  final val TTimestamp = 0x11
  final val TInt64 = 0x12
  final val TDecimal128 = 0x13

  def readInt32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  def readInt64(b: Array[Byte], p: Int): Long =
    (readInt32(b, p) & 0xffffffffL) | (readInt32(b, p + 4).toLong << 32)

  /** Byte length of the value at `p` with type byte `t` — enough to
    * skip ANY well-formed BSON element. */
  def valueLength(t: Int, b: Array[Byte], p: Int): Int = t match {
    case TDouble | TDatetime | TTimestamp | TInt64 => 8
    case TString | TCode | TSymbol => 4 + readInt32(b, p)
    case TDoc | TArray | TCodeScope => readInt32(b, p)
    case TBinary => 4 + 1 + readInt32(b, p)
    case TUndefined | TNull | 0x7f | 0xff => 0
    case TObjectId => 12
    case TBool => 1
    case TInt32 => 4
    case TDecimal128 => 16
    case TRegex =>
      var q = p
      while (b(q) != 0) q += 1 // pattern cstring
      q += 1
      while (b(q) != 0) q += 1 // options cstring
      q + 1 - p
    case TDbPointer => 4 + readInt32(b, p) + 12
    case other => throw new IllegalArgumentException(
      f"unknown BSON type byte 0x$other%02x")
  }

  // ---- encoder (dump fixtures / writing dumps) ---------------------------

  /** Array value marker for the encoder (a bare Seq means an embedded
    * document of (name, value) pairs). */
  final case class BArray(items: Seq[Any])

  /** Encode a document from (name, value) pairs. Values: Long/Int →
    * int64/int32, Double, String, Boolean, null → null element,
    * Seq[(String, Any)] → embedded document, [[BArray]] → array,
    * java.time.Instant → UTC datetime. Returns the FULL document
    * (length prefix + elements + terminator) — exactly the bytes
    * mongodump would emit, and what
    * [[graft.sources.DumpSource.writeDump]] expects minus its own
    * prefix (see [[docBody]]). */
  def doc(fields: Seq[(String, Any)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeDoc(out, fields)
    out.toByteArray
  }

  /** The document WITHOUT its own length prefix — the body
    * `writeDump` frames (its 4-byte length-including-prefix framing
    * reproduces the full BSON document byte-for-byte on disk). */
  def docBody(fields: Seq[(String, Any)]): Array[Byte] = {
    val full = doc(fields)
    java.util.Arrays.copyOfRange(full, 4, full.length)
  }

  private def writeDoc(out: java.io.ByteArrayOutputStream,
                       fields: Seq[(String, Any)]): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    fields.foreach { case (name, value) => writeElement(body, name, value) }
    val total = 4 + body.size() + 1
    writeInt32(out, total)
    body.writeTo(out)
    out.write(0)
  }

  private def writeInt32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  private def writeInt64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeInt32(out, v.toInt); writeInt32(out, (v >>> 32).toInt)
  }

  private def writeCString(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(!b.contains(0.toByte), s"cstring with NUL: $s")
    out.write(b, 0, b.length); out.write(0)
  }

  private def writeElement(out: java.io.ByteArrayOutputStream,
                           name: String, value: Any): Unit = value match {
    case null =>
      out.write(TNull); writeCString(out, name)
    case v: Long =>
      out.write(TInt64); writeCString(out, name); writeInt64(out, v)
    case v: Int =>
      out.write(TInt32); writeCString(out, name); writeInt32(out, v)
    case v: Double =>
      out.write(TDouble); writeCString(out, name)
      writeInt64(out, java.lang.Double.doubleToLongBits(v))
    case v: Boolean =>
      out.write(TBool); writeCString(out, name); out.write(if (v) 1 else 0)
    case v: String =>
      out.write(TString); writeCString(out, name)
      val b = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      writeInt32(out, b.length + 1); out.write(b, 0, b.length); out.write(0)
    case v: java.time.Instant =>
      out.write(TDatetime); writeCString(out, name); writeInt64(out, v.toEpochMilli)
    case BArray(items) =>
      out.write(TArray); writeCString(out, name)
      // a BSON array IS a document keyed "0","1",... (bsonspec.org)
      writeDoc(out, items.zipWithIndex.map { case (x, i) => i.toString -> x })
    case v: Seq[_] =>
      out.write(TDoc); writeCString(out, name)
      writeDoc(out, v.asInstanceOf[Seq[(String, Any)]])
    case other => throw new IllegalArgumentException(
      s"unsupported BSON encode value for '$name': ${other.getClass}")
  }
}

/** Schema-compiled BSON → [[InternalRow]] decoder, shared between the
  * [[graft.plans.FromBson]] expression's interpreted eval and its
  * generated code (the same static-kernel pattern as
  * [[graft.functions.TextHash]]). One instance per expression, shipped
  * to executors as a codegen reference object.
  *
  * Type coercions mirror mgo/bson's unmarshal-into-struct: a BIGINT
  * field accepts int32/int64/double, a STRING field accepts
  * string/symbol and renders UTC datetimes as ISO-8601 instants (the
  * GHTorrent dumps carry dates as strings, but a re-mongodump can
  * surface them as native datetimes), BOOLEAN accepts bool. A BSON
  * null, a missing field, or a type mismatch yields SQL NULL — never
  * an error — matching `from_json`'s permissive column semantics.
  * Undecodable bytes yield a NULL row. */
class BsonDecoder(val schema: StructType) extends Serializable {

  // compiled dispatch: field name -> output ordinal (transient: rebuilt
  // lazily on the executor after deserialization)
  @transient private lazy val ordinal: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    schema.fields.zipWithIndex.foreach { case (f, i) => m.put(f.name, i) }
    m
  }
  @transient private lazy val types: Array[DataType] =
    schema.fields.map(_.dataType)
  // the struct decoder at the bottom of any array nesting: decodeArray
  // hands the SAME `sub` down through every ArrayType level, so one
  // decoder for the innermost struct serves array<struct>,
  // array<array<struct>>, ... alike (and null for scalar leaves)
  @transient private lazy val nested: Array[BsonDecoder] =
    schema.fields.map(f => BsonDecoder.structDecoder(f.dataType))

  /** NULL on undecodable input (permissive, like from_json). */
  def decode(bytes: Array[Byte]): InternalRow =
    try decodeStrict(bytes)
    catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => null }

  def decodeStrict(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length
    // full document (prefix + elements + 0x00) vs prefix-stripped body
    val (start, end) =
      if (n >= 5 && Bson.readInt32(bytes, 0) == n && bytes(n - 1) == 0)
        (4, n - 1)
      else (0, n - 1)
    if (n == 0 || bytes(end) != 0)
      throw new IllegalArgumentException("missing BSON terminator")
    decodeElements(bytes, start, end)
  }

  private def decodeElements(bytes: Array[Byte], start: Int, end: Int): InternalRow = {
    val row = new GenericInternalRow(types.length) // all-null initialized
    var p = start
    while (p < end && bytes(p) != 0) {
      val t = bytes(p) & 0xff
      p += 1
      val nameStart = p
      while (bytes(p) != 0) p += 1
      val name = new String(bytes, nameStart, p - nameStart,
        java.nio.charset.StandardCharsets.UTF_8)
      p += 1
      val ord = ordinal.get(name)
      if (ord != null) {
        val i = ord.intValue()
        val v = decodeValue(t, bytes, p, types(i), nested(i))
        if (v != null) row.update(i, v) // null / mismatch -> stays null
      }
      p += Bson.valueLength(t, bytes, p)
    }
    row
  }

  /** One element value coerced to `dt` (mgo-style permissive: a
    * mismatch yields null, never an error). `sub` is the compiled
    * decoder for the INNERMOST struct under `dt` — the same instance
    * serves struct, array-of-struct, and array-of-array-of-struct
    * targets because array nesting only peels ArrayType levels off
    * `dt` while the bottom struct stays fixed; null for scalar
    * leaves (guarded below, honoring the permissive contract). */
  private def decodeValue(t: Int, bytes: Array[Byte], p: Int,
                          dt: DataType, sub: BsonDecoder): Any = dt match {
    case LongType => t match {
      case Bson.TInt64 | Bson.TDatetime | Bson.TTimestamp =>
        Bson.readInt64(bytes, p)
      case Bson.TInt32 => Bson.readInt32(bytes, p).toLong
      case Bson.TDouble =>
        java.lang.Double.longBitsToDouble(Bson.readInt64(bytes, p)).toLong
      case _ => null
    }
    case IntegerType => t match {
      case Bson.TInt32 => Bson.readInt32(bytes, p)
      case Bson.TInt64 => Bson.readInt64(bytes, p).toInt
      case Bson.TDouble =>
        java.lang.Double.longBitsToDouble(Bson.readInt64(bytes, p)).toInt
      case _ => null
    }
    case DoubleType => t match {
      case Bson.TDouble =>
        java.lang.Double.longBitsToDouble(Bson.readInt64(bytes, p))
      case Bson.TInt32 => Bson.readInt32(bytes, p).toDouble
      case Bson.TInt64 => Bson.readInt64(bytes, p).toDouble
      case _ => null
    }
    case StringType => t match {
      case Bson.TString | Bson.TSymbol | Bson.TCode =>
        val len = Bson.readInt32(bytes, p) // includes trailing NUL
        UTF8String.fromBytes(bytes, p + 4, len - 1)
      case Bson.TDatetime =>
        UTF8String.fromString(
          java.time.Instant.ofEpochMilli(Bson.readInt64(bytes, p)).toString)
      case _ => null
    }
    case BooleanType => t match {
      case Bson.TBool => bytes(p) != 0
      case _ => null
    }
    case _: StructType => t match {
      case Bson.TDoc if sub != null =>
        val len = Bson.readInt32(bytes, p)
        sub.decodeElements(bytes, p + 4, p + len - 1)
      case _ => null
    }
    case ArrayType(et, _) => t match {
      case Bson.TArray =>
        val len = Bson.readInt32(bytes, p)
        decodeArray(bytes, p + 4, p + len - 1, et, sub)
      case _ => null
    }
    case other => throw new IllegalArgumentException(
      s"unsupported BSON decode target type $other")
  }

  /** BSON array = document keyed "0","1",...; index names are skipped
    * (document order IS array order on disk) and each value decodes
    * like a field of element type `et`. */
  private def decodeArray(bytes: Array[Byte], start: Int, end: Int,
                          et: DataType, sub: BsonDecoder):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var p = start
    while (p < end && bytes(p) != 0) {
      val t = bytes(p) & 0xff
      p += 1
      while (bytes(p) != 0) p += 1 // index-name cstring
      p += 1
      buf += decodeValue(t, bytes, p, et, sub)
      p += Bson.valueLength(t, bytes, p)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray)
  }
}

object BsonDecoder {
  /** The decoder for the innermost StructType reachable through any
    * depth of ArrayType nesting, or null if `dt` bottoms out in a
    * scalar (scalar array elements decode inline, no sub-decoder). */
  private[functions] def structDecoder(dt: DataType): BsonDecoder = dt match {
    case st: StructType => new BsonDecoder(st)
    case ArrayType(et, _) => structDecoder(et)
    case _ => null
  }
}
