package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.ProtoSchema

/** Mirrors the reference's proto mapping and the taxi.proto fixture
  * (`nisshi-schema/src/proto/arrow.rs`, `etc/schema/taxi.proto`,
  * Delta tests `lake/delta.rs:1111-1400` which use taxi).
  */
class ProtoSchemaSpec extends SparkSpec {

  private val taxi =
    """syntax = 'proto3';
      |enum Flag {
      |  N = 0;
      |  Y = 1;
      |}
      |message Value {
      |  int64 vendor_id = 1 [(generate).script = "rand(1000..=2000)"];
      |  int64 trip_id = 2;
      |  double trip_distance = 3;
      |  double fare_amount = 4;
      |  Flag store_and_fwd = 5;
      |}""".stripMargin

  test("taxi.proto parses to the reference's Arrow-equivalent schema") {
    val p = ProtoSchema.parse(taxi)
    val st = p.toStructType("Value")
    assert(st.fieldNames.toSeq ===
      Seq("vendor_id", "trip_id", "trip_distance", "fare_amount", "store_and_fwd"))
    assert(st("vendor_id").dataType === LongType)
    assert(st("trip_distance").dataType === DoubleType)
    assert(st("store_and_fwd").dataType === StringType) // enum symbol
    // generator field options surfaced
    assert(p.messages("Value").fields.head.options("generate.script")
      === "rand(1000..=2000)")
  }

  test("scalar breadth: ints, floats, bool, string, bytes, repeated, map-less nested") {
    val p = ProtoSchema.parse(
      """message M {
        |  sint32 a = 1; uint64 b = 2; float c = 3; bool d = 4;
        |  string e = 5; bytes f = 6; repeated int32 g = 7;
        |  Inner h = 8;
        |}
        |message Inner { int32 x = 1; }""".stripMargin)
    val st = p.toStructType("M")
    assert(st("a").dataType === IntegerType)
    assert(st("b").dataType === LongType)
    assert(st("c").dataType === FloatType)
    assert(st("d").dataType === BooleanType)
    assert(st("f").dataType === BinaryType)
    assert(st("g").dataType === ArrayType(IntegerType))
    assert(st("h").dataType === StructType(Seq(StructField("x", IntegerType))))
  }

  test("flat wire round-trip incl. enum symbol and zigzag") {
    val p = ProtoSchema.parse(taxi)
    val values = Map[String, Any](
      "vendor_id" -> 1234L, "trip_id" -> 25L,
      "trip_distance" -> 12.5, "fare_amount" -> 33.25,
      "store_and_fwd" -> "Y")
    val wire = ProtoSchema.encodeFlat(p, "Value", values)
    val back = ProtoSchema.decodeFlat(p, "Value", wire)
    assert(back("vendor_id") === 1234L)
    assert(back("trip_distance") === 12.5)
    assert(back("store_and_fwd") === "Y")
    // sint zigzag negative round-trip
    val p2 = ProtoSchema.parse("message N { sint64 v = 1; }")
    val w2 = ProtoSchema.encodeFlat(p2, "N", Map("v" -> -42L))
    assert(ProtoSchema.decodeFlat(p2, "N", w2)("v") === -42L)
  }

  test("unknown fields are skipped per proto semantics") {
    val pFull = ProtoSchema.parse("message M { int64 a = 1; string b = 2; }")
    val pOld = ProtoSchema.parse("message M { int64 a = 1; }")
    val wire = ProtoSchema.encodeFlat(pFull, "M", Map("a" -> 7L, "b" -> "new"))
    val back = ProtoSchema.decodeFlat(pOld, "M", wire)
    assert(back === Map("a" -> 7L))
  }

  test("wire-type/schema mismatch rejects the row instead of mis-typing it") {
    // payload encodes field 1 as length-delimited; schema declares int32:
    // decode must throw (-> null -> INVALID_RECORD), never put bytes in
    // an int slot that crashes the row encoder outside the try
    val pStr = ProtoSchema.parse("message M { string a = 1; }")
    val pInt = ProtoSchema.parse("message M { int32 a = 1; }")
    val wire = ProtoSchema.encodeFlat(pStr, "M", Map("a" -> "oops"))
    assertThrows[IllegalArgumentException] {
      ProtoSchema.decodeFlat(pInt, "M", wire)
    }
    // and through the distributed path: the row lands as null, the job
    // survives
    import spark.implicits._
    val df = Seq((1L, wire)).toDF("id", "bin")
    val out = ProtoSchema.decodeColumn(df, "bin", "message M { int32 a = 1; }",
      "M", "v").select("v").collect()
    assert(out(0).isNullAt(0))
  }

  test("uint32/fixed32 preserve the unsigned range (no negative wrap)") {
    val p = ProtoSchema.parse("message M { uint32 a = 1; fixed32 b = 2; }")
    val big = 4000000000L // > Int.MaxValue
    val wire = ProtoSchema.encodeFlat(p, "M", Map("a" -> big, "b" -> big))
    val back = ProtoSchema.decodeFlat(p, "M", wire)
    assert(back("a") === big)
    assert(back("b") === big)
    // and the Spark carrier is LONG
    assert(p.toStructType("M").fields.map(_.dataType).toSeq ===
      Seq(org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.LongType))
  }

  test("recursive wire round-trip: nested messages, repeated, maps, Timestamp") {
    val text =
      """message Inner { int32 x = 1; repeated string tags = 2; }
        |message Value {
        |  int64 id = 1;
        |  Inner inner = 2;
        |  repeated Inner items = 3;
        |  map<string, int64> counts = 4;
        |  repeated int64 nums = 5;
        |  google.protobuf.Timestamp at = 6;
        |}""".stripMargin
    val p = ProtoSchema.parse(text)
    // Spark type mapping incl. the map field
    val st = p.toStructType("Value")
    assert(st("counts").dataType === MapType(StringType, LongType))
    assert(st("items").dataType ===
      ArrayType(StructType(Seq(StructField("x", IntegerType),
        StructField("tags", ArrayType(StringType))))))
    assert(st("at").dataType === TimestampType)

    val ts = java.sql.Timestamp.valueOf("2024-03-01 10:20:30.123456789")
    val values = Map[String, Any](
      "id" -> 9L,
      "inner" -> Map[String, Any]("x" -> 5, "tags" -> Seq("a", "b")),
      "items" -> Seq(
        Map[String, Any]("x" -> 1, "tags" -> Seq("t1")),
        Map[String, Any]("x" -> 2)),
      "counts" -> Map[Any, Any]("en" -> 10L, "de" -> 3L),
      "nums" -> Seq(7L, 8L, 9L),
      "at" -> ts)
    val back = ProtoSchema.decode(p, "Value", ProtoSchema.encode(p, "Value", values))
    assert(back("id") === 9L)
    assert(back("inner") === Map("x" -> 5, "tags" -> Vector("a", "b")))
    assert(back("items") === Vector(
      Map("x" -> 1, "tags" -> Vector("t1")), Map("x" -> 2)))
    assert(back("counts") === Map("en" -> 10L, "de" -> 3L))
    assert(back("nums") === Vector(7L, 8L, 9L))
    assert(back("at") === ts)

    // packed numeric repeated (proto3 default encoding) also decodes:
    // hand-pack field 5 as one length-delimited varint run
    val packed = {
      val b = java.nio.ByteBuffer.allocate(32)
      b.put(((5 << 3) | 2).toByte) // field 5, wire 2
      b.put(3.toByte)              // 3 payload bytes
      b.put(7.toByte); b.put(8.toByte); b.put(9.toByte)
      val a = new Array[Byte](b.position()); b.flip(); b.get(a); a
    }
    assert(ProtoSchema.decode(p, "Value", packed)("nums") === Vector(7L, 8L, 9L))
  }

  test("proto topic materializes typed to the lake via distributed decode") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-proto-lake").toString
    val rdir = java.nio.file.Files.createTempDirectory("graft-proto-reg")
    val text =
      """message Pickup { double lat = 1; double lon = 2; }
        |message Value {
        |  int64 trip_id = 1;
        |  Pickup pickup = 2;
        |  map<string, int64> extras = 3;
        |  repeated string zones = 4;
        |}""".stripMargin
    java.nio.file.Files.writeString(rdir.resolve("trips.proto"), text)
    val st = new graft.storage.ParquetStorage(spark, root,
      Some(new graft.schema.SchemaRegistry(rdir.toString)))
    st.createTopic("trips", 1)
    val p = ProtoSchema.parse(text)
    def wire(id: Long): Array[Byte] =
      ProtoSchema.encode(p, "Value", Map[String, Any](
        "trip_id" -> id,
        "pickup" -> Map[String, Any]("lat" -> (40.0 + id), "lon" -> -73.9),
        "extras" -> Map[Any, Any]("tolls" -> id),
        "zones" -> Seq(s"z$id", "z-all")))
    val rows = (0L until 4L).map(i =>
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), s"k$i", wire(i)))
    assert(st.produce(graft.model.Model.Topition("trips", 0),
      rows.toDF("timestamp", "key", "value")).isRight)

    val lake = spark.read.parquet(s"$root/lake/trips")
    assert(lake.count() === 4)
    val vs = lake.schema("value_struct").dataType.asInstanceOf[StructType]
    assert(vs("pickup").dataType ===
      StructType(Seq(StructField("lat", DoubleType), StructField("lon", DoubleType))))
    assert(vs("extras").dataType === MapType(StringType, LongType))
    val r = lake.filter(col("value_struct.trip_id") === 2L)
      .select(col("value_struct.pickup.lat"),
        expr("value_struct.extras['tolls']"),
        col("value_struct.zones")).head()
    assert(r.getDouble(0) === 42.0)
    assert(r.getLong(1) === 2L)
    assert(r.getSeq[String](2) === Seq("z2", "z-all"))

    // garbage payloads are rejected as INVALID_RECORD, not materialized
    val bad = st.produce(graft.model.Model.Topition("trips", 0),
      Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "kx",
        Array[Byte](-1, -1, -1))).toDF("timestamp", "key", "value"))
    assert(bad === Left(graft.model.Model.ErrorCode.InvalidRecord))
  }

  test("oversized messages encode: the buffer grows past any fixed cap") {
    val p = ProtoSchema.parse(
      """message Value { string body = 1; repeated int64 nums = 2; }""")
    // 200 KiB body — over the old 64 KiB allocation; plus a long packed
    // run so growth happens across write kinds
    val body = "x" * (200 * 1024)
    val wire = ProtoSchema.encode(p, "Value", Map[String, Any](
      "body" -> body, "nums" -> (0L until 1000L).toSeq))
    assert(wire.length > 200 * 1024)
    val back = ProtoSchema.decode(p, "Value", wire)
    assert(back("body").asInstanceOf[String].length === 200 * 1024)
    assert(back("nums").asInstanceOf[Seq[Long]].size === 1000)
  }
}
