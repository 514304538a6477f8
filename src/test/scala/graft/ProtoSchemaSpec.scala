package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.schema.ProtoSchema

/** Mirrors the reference's proto mapping and the taxi.proto fixture
  * (`nisshi-schema/src/proto/arrow.rs`, `etc/schema/taxi.proto`,
  * Delta tests `lake/delta.rs:1111-1400` which use taxi).
  */
class ProtoSchemaSpec extends AnyFunSuite {

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
}
