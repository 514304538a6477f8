package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Generator
import graft.schema.AvroSchemas

class GeneratorSpec extends SparkSpec {

  test("generates n rows matching the schema, deterministic under seed") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("price", DoubleType),
      StructField("name", StringType), StructField("ok", BooleanType),
      StructField("ts", TimestampType),
      StructField("nested", StructType(Seq(StructField("x", IntegerType))))))
    val df1 = Generator.generate(spark, schema, 1000,
      ranges = Map("price" -> (10d, 20d)))
    assert(df1.count() === 1000)
    assert(df1.schema.fieldNames.toSeq === schema.fieldNames.toSeq)
    val pr = df1.agg(min("price"), max("price")).head()
    assert(pr.getDouble(0) >= 10d && pr.getDouble(1) < 20d)
    // deterministic: same seed → same content
    val h1 = df1.agg(sum(hash(col("name"), col("price")))).head().getLong(0)
    val h2 = Generator.generate(spark, schema, 1000,
      ranges = Map("price" -> (10d, 20d)))
      .agg(sum(hash(col("name"), col("price")))).head().getLong(0)
    assert(h1 === h2)
  }

  test("generates from an Avro registry schema end to end") {
    val st = AvroSchemas.toStructType(
      scala.io.Source.fromResource("schema/observation.avsc").mkString)
    val valueType = st("value").dataType.asInstanceOf[StructType]
    val df = Generator.generate(spark, valueType, 50)
    assert(df.count() === 50)
    assert(df.select("amount").head().getDouble(0) >= 0)
  }

  test("proto generator scripts drive the ranges (taxi.proto rand(lo..=hi))") {
    val parsed = graft.schema.ProtoSchema.parse(
      """message Value {
        |  int64 vendor_id = 1 [(generate).script = "rand(1000..=2000)"];
        |  double fare = 2 [(generate).script = "rand(5.0..50.0)"];
        |  int64 free = 3;
        |}""".stripMargin)
    assert(Generator.rangesFromProto(parsed, "Value") ===
      Map("vendor_id" -> ((1000d, 2000d)), "fare" -> ((5.0d, 50.0d))))
    val df = Generator.generateForProto(spark, parsed, "Value", 200).cache()
    import org.apache.spark.sql.functions._
    val r = df.agg(min("vendor_id"), max("vendor_id"), min("fare"), max("fare"))
      .head()
    assert(r.getLong(0) >= 1000L && r.getLong(1) <= 2000L)
    assert(r.getDouble(2) >= 5.0 && r.getDouble(3) <= 50.0)
    df.unpersist()
    ()
  }

  test("txn timeout abort releases pinned LSO (T6)") {
    import spark.implicits._
    var now = 0L
    val root = java.nio.file.Files.createTempDirectory("graft-txn-to").toString
    val st = new graft.storage.ParquetStorage(spark, root,
      txnTimeoutMs = 1000, clock = () => now)
    st.createTopic("t", 1)
    val tp = graft.model.Model.Topition("t", 0)
    val (pid, _) = st.initProducer("x")
    st.txnBegin(pid, tp)
    st.produce(tp, Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "k", "v"))
      .toDF("timestamp", "key", "value"), producerId = pid, producerEpoch = 0,
      baseSequence = 0)
    assert(st.offsetStage(tp).lastStable === 0L) // pinned by open txn
    now = 5000L
    assert(st.maintainTransactions() === Seq(pid))
    // released: data row 0 + abort control marker at offset 1 → LSO 2
    assert(st.offsetStage(tp).lastStable === 2L)
    assert(st.abortedTxns(tp, 0, Long.MaxValue).nonEmpty)
  }
}
