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

  private val logicalAvsc =
    """{"type":"record","name":"pay","fields":[
      |{"name":"price","type":{"type":"bytes","logicalType":"decimal","precision":10,"scale":2}},
      |{"name":"fprice","type":{"type":"fixed","name":"d8","size":8,"logicalType":"decimal","precision":12,"scale":3}},
      |{"name":"day","type":{"type":"int","logicalType":"date"}},
      |{"name":"tmillis","type":{"type":"int","logicalType":"time-millis"}},
      |{"name":"tmicros","type":{"type":"long","logicalType":"time-micros"}},
      |{"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}},
      |{"name":"lts","type":{"type":"long","logicalType":"local-timestamp-millis"}},
      |{"name":"dur","type":{"type":"fixed","name":"duration","size":12,"logicalType":"duration"}}]}""".stripMargin

  test("Avro logical types decode with full fidelity (arrow.rs:205-247 matrix)") {
    val schema = new org.apache.avro.Schema.Parser().parse(logicalAvsc)
    val fixedPad = {
      // fixed decimals are big-endian two's complement padded to the size
      val unscaled = java.math.BigInteger.valueOf(1234567).toByteArray
      val out = new Array[Byte](8)
      System.arraycopy(unscaled, 0, out, 8 - unscaled.length, unscaled.length)
      new org.apache.avro.generic.GenericData.Fixed(
        schema.getField("fprice").schema(), out)
    }
    val dur = {
      val bb = java.nio.ByteBuffer.allocate(12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1); bb.putInt(2); bb.putInt(3000)
      new org.apache.avro.generic.GenericData.Fixed(
        schema.getField("dur").schema(), bb.array())
    }
    val bin = AvroDecoder.encode(logicalAvsc, Map(
      "price" -> java.nio.ByteBuffer.wrap(
        java.math.BigInteger.valueOf(12345).toByteArray),
      "fprice" -> fixedPad,
      "day" -> java.time.LocalDate.of(2024, 1, 1).toEpochDay.toInt,
      "tmillis" -> 3600000,
      "tmicros" -> 7200000000L,
      "ts" -> 1704067200123456L,
      "lts" -> 1704067200123L,
      "dur" -> dur))
    val out = AvroDecoder.decodeColumn(
      Seq((1L, bin)).toDF("id", "bin"), "bin", logicalAvsc, "v")
    val r = out.select("v.price", "v.fprice", "v.day", "v.tmillis",
      "v.tmicros", "v.ts", "v.lts", "v.dur.months", "v.dur.days",
      "v.dur.milliseconds").head()
    assert(r.getDecimal(0).toPlainString === "123.45")
    assert(r.getDecimal(1).toPlainString === "1234.567")
    assert(r.getDate(2).toString === "2024-01-01")
    assert(r.getLong(3) === 3600000L)
    assert(r.getLong(4) === 7200000000L)
    val ts = r.getTimestamp(5)
    assert(ts.getTime === 1704067200123L) // micros kept, not truncated
    assert(ts.getNanos === 123456000)
    assert(r.getAs[java.time.LocalDateTime](6).toString === "2024-01-01T00:00:00.123")
    assert((r.getInt(7), r.getInt(8), r.getInt(9)) === ((1, 2, 3000)))
  }

  test("a plain fixed(12) with no logical type stays binary, not duration") {
    import org.apache.spark.sql.types.BinaryType
    val avsc =
      """{"type":"record","name":"h","fields":[
        |{"name":"hash96","type":{"type":"fixed","name":"hash96","size":12}}]}""".stripMargin
    val schema = new org.apache.avro.Schema.Parser().parse(avsc)
    assert(graft.schema.AvroSchemas.toDataType(schema)
      .asInstanceOf[org.apache.spark.sql.types.StructType]("hash96")
      .dataType === BinaryType)
    val bytes = Array.tabulate[Byte](12)(_.toByte)
    val bin = AvroDecoder.encode(avsc, Map(
      "hash96" -> new org.apache.avro.generic.GenericData.Fixed(
        schema.getField("hash96").schema(), bytes)))
    val out = AvroDecoder.decodeColumn(
      Seq((1L, bin)).toDF("id", "bin"), "bin", avsc, "v")
    assert(out.select("v.hash96").head().getAs[Array[Byte]](0).toSeq === bytes.toSeq)
  }

  test("decimal survives the lake round-trip as a typed DECIMAL column") {
    import org.apache.spark.sql.types.{DecimalType, StructType}
    val root = java.nio.file.Files.createTempDirectory("graft-avro-dec").toString
    val rdir = java.nio.file.Files.createTempDirectory("graft-avro-dec-reg")
    val avsc =
      """{"type":"record","name":"m","fields":[
        |{"name":"price","type":{"type":"bytes","logicalType":"decimal","precision":10,"scale":2}}]}""".stripMargin
    java.nio.file.Files.writeString(rdir.resolve("money.avsc"), avsc)
    val st = new graft.storage.ParquetStorage(spark, root,
      Some(new graft.schema.SchemaRegistry(rdir.toString)))
    st.createTopic("money", 1)
    val bin = AvroDecoder.encode(avsc, Map(
      "price" -> java.nio.ByteBuffer.wrap(
        java.math.BigInteger.valueOf(99995).toByteArray)))
    assert(st.produce(graft.model.Model.Topition("money", 0),
      Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "k", bin))
        .toDF("timestamp", "key", "value")).isRight)
    val lake = spark.read.parquet(s"$root/lake/money")
    val vs = lake.schema("value_struct").dataType.asInstanceOf[StructType]
    assert(vs("price").dataType === DecimalType(10, 2))
    assert(lake.select("value_struct.price").head()
      .getDecimal(0).toPlainString === "999.95")
  }

  test("encodeColumn round-trips logical types distributed (encode half of F8)") {
    import spark.implicits._
    val avsc =
      """{"type":"record","name":"rt","fields":[
        |{"name":"id","type":"long"},
        |{"name":"price","type":{"type":"bytes","logicalType":"decimal","precision":12,"scale":2}},
        |{"name":"fixed_price","type":{"type":"fixed","name":"fp","size":6,
        |  "logicalType":"decimal","precision":12,"scale":3}},
        |{"name":"d","type":{"type":"int","logicalType":"date"}},
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}}]}"""
        .stripMargin
    val df = spark.range(0, 1000, 1, 8).toDF("id")
      .withColumn("price",
        (col("id") * 7 - 350000).cast("decimal(20,0)")
          .cast("decimal(12,2)") / 100)
      .withColumn("price", col("price").cast("decimal(12,2)"))
      .withColumn("fixed_price", col("price").cast("decimal(12,3)"))
      .withColumn("d", date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        col("id").cast("int")))
      .withColumn("ts", timestamp_millis(col("id") * 1000 + 123))
    val enc = AvroDecoder.encodeColumn(df, avsc, "bin")
    val dec = AvroDecoder.decodeColumn(enc.select("id", "bin"), "bin", avsc, "rec")
      .select(col("id"), col("rec.price").as("p2"),
        col("rec.fixed_price").as("fp2"), col("rec.d").as("d2"),
        col("rec.ts").as("ts2"))
    val joined = df.join(dec, "id")
    // every row survives with exact values — incl. negative decimals
    // (sign-extended unscaled bytes) and the fixed-size decimal padding
    assert(joined.count() === 1000)
    assert(joined.filter(col("price") =!= col("p2")).count() === 0)
    assert(joined.filter(col("fixed_price") =!= col("fp2")).count() === 0)
    assert(joined.filter(col("d") =!= col("d2")).count() === 0)
    assert(joined.filter(col("ts") =!= col("ts2")).count() === 0)
  }

  test("decimal encode rounds extra scale digits instead of aborting the task") {
    val avsc =
      """{"type":"record","name":"r","fields":[
        |{"name":"price","type":{"type":"bytes","logicalType":"decimal",
        |  "precision":12,"scale":2}}]}""".stripMargin
    // scale-4 values: 1.2345 must ROUND (HALF_UP -> 1.23), not throw
    // ArithmeticException inside the encode partition
    val df = spark.range(0, 10, 1, 2).toDF("id")
      .withColumn("price",
        (col("id").cast("decimal(12,4)") + lit(new java.math.BigDecimal("1.2345")))
          .cast("decimal(12,4)"))
    val enc = AvroDecoder.encodeColumn(df, avsc, "bin")
    val dec = AvroDecoder.decodeColumn(enc.select("id", "bin"), "bin", avsc, "rec")
      .select(col("id"), col("rec.price").as("p2"))
    val r0 = dec.filter(col("id") === 0).head().getDecimal(1)
    assert(r0.compareTo(new java.math.BigDecimal("1.23")) === 0)
    assert(dec.count() === 10)
  }

  test("decimal too wide for its fixed schema fails with a typed Avro error") {
    // precision 4 is VALID for fixed(2) (so the logical type attaches);
    // the VALUE 10^9 then needs 4 unscaled bytes — the encode must raise
    // AvroTypeException (a diagnosable out-of-range error), never produce
    // a wrong-sized Fixed that corrupts the payload
    val avsc =
      """{"type":"record","name":"r","fields":[
        |{"name":"price","type":{"type":"fixed","name":"d2","size":2,
        |  "logicalType":"decimal","precision":4,"scale":0}}]}""".stripMargin
    val df = spark.range(0, 1).toDF("id")
      .withColumn("price", lit(new java.math.BigDecimal("1000000000")))
    val ex = intercept[Exception] {
      AvroDecoder.encodeColumn(df, avsc, "bin").collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t =>
      t.isInstanceOf[org.apache.avro.AvroTypeException] ||
        Option(t.getMessage).exists(_.contains("fixed(2) too small"))))
  }

  test("nullable nested record decodes (union resolves before record)") {
    val nested =
      """{"type":"record","name":"outer","fields":[
        |{"name":"id","type":"long"},
        |{"name":"loc","type":["null",{"type":"record","name":"pt","fields":[
        |  {"name":"x","type":"double"},{"name":"y","type":"double"}]}],
        | "default":null}]}""".stripMargin
    val schema = new org.apache.avro.Schema.Parser().parse(nested)
    val ptSchema = schema.getField("loc").schema().getTypes.get(1)
    val pt = new org.apache.avro.generic.GenericData.Record(ptSchema)
    pt.put("x", 1.5); pt.put("y", -2.5)
    val withLoc = AvroDecoder.encode(nested, Map("id" -> 7L, "loc" -> pt))
    val without = AvroDecoder.encode(nested, Map("id" -> 8L, "loc" -> null))
    val out = AvroDecoder.decodeColumn(
      Seq((1L, withLoc), (2L, without)).toDF("i", "bin"), "bin", nested, "v")
      .select(col("v.id"), col("v.loc.x"), col("v.loc.y"))
      .orderBy("i").collect()
    assert(out(0).getLong(0) === 7L && out(0).getDouble(1) === 1.5)
    assert(out(1).getLong(0) === 8L && out(1).isNullAt(1))
  }

  test("encodeColumn inverts decodeColumn for nested record/array/map/enum") {
    val rich =
      """{"type":"record","name":"doc","fields":[
        |{"name":"id","type":"long"},
        |{"name":"tags","type":{"type":"array","items":"string"}},
        |{"name":"counts","type":{"type":"map","values":"long"}},
        |{"name":"unit","type":{"type":"enum","name":"u2","symbols":["A","B"]}},
        |{"name":"loc","type":["null",{"type":"record","name":"pt2","fields":[
        |  {"name":"x","type":"double"}]}],"default":null}]}""".stripMargin
    val src = Seq((5L, Seq("p", "q"), Map("n" -> 3L), "B"))
      .toDF("id", "tags", "counts", "unit")
      .withColumn("loc", struct(lit(2.25).as("x")))
    val encoded = AvroDecoder.encodeColumn(src, rich, "bin").select("bin")
    val back = AvroDecoder.decodeColumn(encoded, "bin", rich, "v")
      .select(col("v.id"), col("v.tags"), col("v.counts"), col("v.unit"),
        col("v.loc.x")).collect()
    assert(back.length === 1)
    assert(back(0).getLong(0) === 5L)
    assert(back(0).getSeq[String](1) === Seq("p", "q"))
    assert(back(0).getMap[String, Long](2) === Map("n" -> 3L))
    assert(back(0).getString(3) === "B")
    assert(back(0).getDouble(4) === 2.25)
  }
}
