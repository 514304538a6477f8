package graft

import org.apache.spark.sql.functions._
import graft.schema.AvroDecoder

/** Mirrors the reference's Avro decode goldens
  * (`nisshi-schema/src/avro.rs:330-363` record decode,
  * `avro/arrow.rs` primitive round-trips).
  */
class AvroDecoderSpec extends SparkSpec {
  import spark.implicits._

  private val avsc =
    """{"type":"record","name":"obs","fields":[
      |{"name":"amount","type":"double"},
      |{"name":"unit","type":{"type":"enum","name":"u","symbols":["CELSIUS","MILLIBAR"]}},
      |{"name":"note","type":["null","string"],"default":null},
      |{"name":"tags","type":{"type":"array","items":"string"}}]}""".stripMargin

  private def payload(amount: Double, unit: String, note: Option[String]) = {
    val schema = new org.apache.avro.Schema.Parser().parse(avsc)
    AvroDecoder.encode(avsc, Map(
      "amount" -> amount,
      "unit" -> new org.apache.avro.generic.GenericData.EnumSymbol(
        schema.getField("unit").schema(), unit),
      "note" -> note.orNull,
      "tags" -> java.util.Arrays.asList("a", "b")))
  }

  test("binary Avro payloads decode into typed struct rows") {
    val df = Seq(
      (1L, payload(21.5, "CELSIUS", Some("warm"))),
      (2L, payload(1013.0, "MILLIBAR", None)))
      .toDF("id", "bin")
    val out = AvroDecoder.decodeColumn(df, "bin", avsc, "v")
      .select(col("id"), col("v.amount"), col("v.unit"), col("v.note"),
        col("v.tags"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) === 21.5)
    assert(out(0).getString(2) === "CELSIUS")
    assert(out(0).getString(3) === "warm")
    assert(out(0).getSeq[String](4) === Seq("a", "b"))
    assert(out(1).isNullAt(3)) // [null,string] union -> null
  }

  test("garbage payloads decode to null (INVALID_RECORD signal), not crash") {
    val df = Seq((1L, Array[Byte](1, 2, 3)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "bin")
    val out = AvroDecoder.decodeColumn(df, "bin", avsc, "v")
    assert(out.filter(col("v").isNull).count() === 2)
  }

  test("decode runs distributed over many rows") {
    val p = payload(1.0, "CELSIUS", None)
    val big = spark.range(5000).select(col("id"), lit(p).as("bin")).repartition(4)
    val out = AvroDecoder.decodeColumn(big, "bin", avsc, "v")
    assert(out.filter(col("v.amount") === 1.0).count() === 5000)
  }
}
