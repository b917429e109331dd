package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bson, BsonDecoder}
import graft.plans.BsonFunctions

/** The BSON decode path: hand-rolled spec-conformant fixtures (the
  * encoder is itself validated against byte layouts derived from
  * bsonspec.org) through [[BsonDecoder]] / [[graft.plans.FromBson]].
  * Reference semantics: mgo/bson unmarshal, ght2dm.go:277-315. */
class BsonSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("encoder emits the bsonspec.org example layout byte-for-byte") {
    // the spec's canonical example: {"hello": "world"}
    // \x16\x00\x00\x00\x02hello\x00\x06\x00\x00\x00world\x00\x00
    val got = Bson.doc(Seq("hello" -> "world"))
    val want = Array[Byte](0x16, 0, 0, 0, 0x02) ++
      "hello".getBytes ++ Array[Byte](0) ++
      Array[Byte](0x06, 0, 0, 0) ++ "world".getBytes ++ Array[Byte](0, 0)
    assert(got.toSeq == want.toSeq)
  }

  test("decoder round-trips every scalar type the entity schemas use, " +
    "both full-document and prefix-stripped") {
    val schema = StructType.fromDDL(
      "id BIGINT, login STRING, hireable BOOLEAN, score DOUBLE, " +
        "followers BIGINT, created_at STRING")
    val dec = new BsonDecoder(schema)
    val fields = Seq(
      "id" -> 42L, "login" -> "octocat", "hireable" -> true,
      "score" -> 2.5, "followers" -> 7, // int32 coerces into BIGINT
      "created_at" -> "2014-01-02T03:04:05Z")
    for (bytes <- Seq(Bson.doc(fields), Bson.docBody(fields))) {
      val row = dec.decode(bytes)
      assert(row.getLong(0) == 42L)
      assert(row.getUTF8String(1).toString == "octocat")
      assert(row.getBoolean(2))
      assert(row.getDouble(3) == 2.5)
      assert(row.getLong(4) == 7L)
      assert(row.getUTF8String(5).toString == "2014-01-02T03:04:05Z")
    }
  }

  test("unknown fields of EVERY unconsumed type are skipped; missing " +
    "and null fields yield SQL NULL; datetimes render as ISO strings") {
    val dec = new BsonDecoder(StructType.fromDDL(
      "id BIGINT, login STRING, stamp STRING"))
    val bytes = Bson.doc(Seq(
      "ignored_str" -> "zzz", "ignored_int" -> 3, "ignored_f" -> 1.5,
      "ignored_null" -> null, "ignored_bool" -> false,
      "ignored_doc" -> Seq("deep" -> "v"),
      "id" -> 9L,
      "stamp" -> java.time.Instant.parse("2015-06-07T08:09:10Z"),
      "login" -> null))
    val row = dec.decode(bytes)
    assert(row.getLong(0) == 9L)
    assert(row.isNullAt(1)) // explicit BSON null
    assert(row.getUTF8String(2).toString == "2015-06-07T08:09:10Z")
    // a field absent from the doc is null too
    val row2 = dec.decode(Bson.doc(Seq("login" -> "x")))
    assert(row2.isNullAt(0) && row2.getUTF8String(1).toString == "x")
  }

  test("nested documents decode into struct fields (owner.login)") {
    val dec = new BsonDecoder(Ingest.repoSchema)
    val row = dec.decode(Bson.doc(Seq(
      "id" -> 1L, "name" -> "spoon-knife",
      "language" -> "Ruby", "fork" -> false,
      "owner" -> Seq("id" -> 583231L, "login" -> "octocat"))))
    val ownerIdx = Ingest.repoSchema.fieldIndex("owner")
    val owner = row.getStruct(ownerIdx, 1)
    assert(owner.getUTF8String(0).toString == "octocat")
  }

  test("arrays decode into ARRAY fields: primitives coerce per element, " +
    "struct elements recurse, mismatched elements go null") {
    val schema = StructType.fromDDL(
      "ids ARRAY<BIGINT>, parents ARRAY<STRUCT<sha: STRING>>, tag STRING")
    val body = Bson.doc(Seq(
      // int32/int64/double mixed + a non-numeric element -> null slot
      "ids" -> Bson.BArray(Seq(1, 2L, 3.0, "nope")),
      "parents" -> Bson.BArray(Seq(Seq("sha" -> "p1"), Seq("sha" -> "p2"))),
      "skipped_array" -> Bson.BArray(Seq("a", "b")), // unknown field
      "tag" -> "t"))
    val row = new BsonDecoder(schema).decode(body)
    val ids = row.getArray(0)
    assert(ids.numElements() == 4)
    assert(Seq(ids.getLong(0), ids.getLong(1), ids.getLong(2)) ==
      Seq(1L, 2L, 3L))
    assert(ids.isNullAt(3))
    val parents = row.getArray(1)
    assert(parents.numElements() == 2)
    assert(parents.getStruct(0, 1).getUTF8String(0).toString == "p1")
    assert(parents.getStruct(1, 1).getUTF8String(0).toString == "p2")
    assert(row.getUTF8String(2).toString == "t")
    // a scalar where the schema wants an array -> null field, no error
    val mismatch = new BsonDecoder(schema).decode(
      Bson.doc(Seq("ids" -> 5L, "tag" -> "u")))
    assert(mismatch.isNullAt(0) && mismatch.getUTF8String(2).toString == "u")
  }

  test("array-of-array targets decode through arbitrary nesting: the " +
    "innermost struct decoder serves every ArrayType level") {
    val schema = StructType.fromDDL(
      "grid ARRAY<ARRAY<STRUCT<x: BIGINT>>>, deep ARRAY<ARRAY<BIGINT>>")
    val body = Bson.doc(Seq(
      "grid" -> Bson.BArray(Seq(
        Bson.BArray(Seq(Seq("x" -> 1L), Seq("x" -> 2L))),
        Bson.BArray(Seq(Seq("x" -> 3L))))),
      "deep" -> Bson.BArray(Seq(Bson.BArray(Seq(7L, 8L))))))
    val row = new BsonDecoder(schema).decode(body)
    assert(row != null, "array<array<struct>> must decode, not NPE")
    val grid = row.getArray(0)
    assert(grid.numElements() == 2)
    val r0 = grid.getArray(0)
    assert(Seq(r0.getStruct(0, 1).getLong(0),
      r0.getStruct(1, 1).getLong(0)) == Seq(1L, 2L))
    assert(grid.getArray(1).getStruct(0, 1).getLong(0) == 3L)
    val deep = row.getArray(1).getArray(0)
    assert(Seq(deep.getLong(0), deep.getLong(1)) == Seq(7L, 8L))
  }

  test("undecodable bytes give a NULL row, not an error (from_json's " +
    "permissive contract)") {
    val dec = new BsonDecoder(StructType.fromDDL("id BIGINT"))
    assert(dec.decode(Array[Byte](0x10, 'i', 'd')) == null) // truncated
    assert(dec.decode(Array[Byte]()) == null)
    assert(dec.decode("{\"id\": 1}".getBytes) == null) // JSON is not BSON
  }

  test("from_bson expression: codegen and interpreted eval agree, and " +
    "the Ingest.decodeDoc dispatch routes JSON and BSON rows correctly") {
    val schema = StructType.fromDDL("id BIGINT, login STRING")
    val bsonRow = Bson.docBody(Seq("id" -> 1L, "login" -> "alice"))
    val jsonRow = """{"id": 2, "login": "bob"}""".getBytes
    val df = Seq(Tuple1(bsonRow), Tuple1(jsonRow)).toDF("doc")
    val got = df.select(Ingest.decodeDoc(col("doc"), schema).as("e"))
      .select($"e.id", $"e.login").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "alice"), (2L, "bob")))
    // direct expression over a round-trip of entity-shaped docs
    val docs = (1 to 50).map(i =>
      Tuple1(Bson.docBody(Seq("id" -> i.toLong, "login" -> s"u$i"))))
    val viaExpr = docs.toDF("doc")
      .select(BsonFunctions.fromBson($"doc", schema).as("e"))
      .select($"e.id", $"e.login").as[(Long, String)].collect().toSet
    assert(viaExpr == (1 to 50).map(i => (i.toLong, s"u$i")).toSet)
  }

  test("decodeDoc routes a FULL document whose length byte is 0x7B " +
    "('{') to the BSON branch, not from_json") {
    val schema = StructType.fromDDL("id BIGINT, login STRING")
    // pad the login until the full doc's total length ≡ 123 mod 256,
    // making byte 0 of the length prefix collide with '{'
    val full = Iterator.from(0).map { pad =>
      Bson.doc(Seq("id" -> 7L, "login" -> ("x" * (1 + pad))))
    }.find(d => (d.length & 0xff) == 0x7B).get
    assert(full(0) == '{'.toByte)
    val got = Seq(Tuple1(full)).toDF("doc")
      .select(Ingest.decodeDoc(col("doc"), schema).as("e"))
      .select($"e.id").as[Option[Long]].head()
    assert(got == Some(7L))
  }
}
