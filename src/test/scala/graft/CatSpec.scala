package graft

import graft.facade.Cat
import graft.storage.ParquetStorage

class CatSpec extends SparkSpec {

  test("produce JSON-lines file -> log -> consume back as JSON (S10/S11)") {
    val root = java.nio.file.Files.createTempDirectory("graft-cat").toString
    val storage = new ParquetStorage(spark, root)
    storage.createTopic("cat", 2)
    val src = java.nio.file.Files.createTempDirectory("graft-cat-src")
      .resolve("docs.jsonl")
    java.nio.file.Files.writeString(src,
      (0 until 10).map(i => s"""{"key":"k$i","amount":$i}""").mkString("\n"))

    val results = Cat.produce(spark, storage, "cat", 2, src.toString)
    assert(results.forall(_._2.isRight))

    val lines = Cat.consumeJson(storage, "cat", 2)
    assert(lines.size === 10)
    // the value column is a JSON string, escaped inside the envelope
    assert(lines.forall(_.contains("\\\"amount\\\"")))
    // round-trip: every original key present exactly once
    val keys = lines.flatMap("\"k(\\d+)\"".r.findFirstMatchIn(_)).map(_.group(1))
    assert(keys.sorted.map(_.toInt).sorted === (0 until 10))
  }

  test("routing by a non-'key' field preserves a document column named 'key'") {
    val root = java.nio.file.Files.createTempDirectory("graft-cat-k").toString
    val storage = new ParquetStorage(spark, root)
    storage.createTopic("kt", 2)
    val src = java.nio.file.Files.createTempDirectory("graft-cat-k-src")
      .resolve("docs.jsonl")
    // docs carry BOTH an 'id' (the routing field) and their own 'key'
    // data column — the payload's key must survive routing untouched
    java.nio.file.Files.writeString(src,
      (0 until 6).map(i => s"""{"id":"r$i","key":"data$i"}""").mkString("\n"))
    val results = Cat.produce(spark, storage, "kt", 2, src.toString,
      keyField = "id")
    assert(results.forall(_._2.isRight))
    val lines = Cat.consumeJson(storage, "kt", 2)
    assert(lines.size === 6)
    // the stored value JSON still holds the ORIGINAL key field values
    val dataKeys = lines.flatMap("data(\\d+)".r.findAllMatchIn(_))
      .map(_.group(1).toInt).sorted
    assert(dataKeys === (0 until 6))
  }

  test("produce encodes per topic schema: Avro and proto topics get binary") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-cat-sch").toString
    val rdir = java.nio.file.Files.createTempDirectory("graft-cat-reg")
    java.nio.file.Files.writeString(rdir.resolve("fares.avsc"),
      """{"type":"record","name":"Value","fields":[
        |{"name":"ride","type":"long"},
        |{"name":"fare","type":{"type":"bytes","logicalType":"decimal",
        |  "precision":10,"scale":2}}]}""".stripMargin)
    java.nio.file.Files.writeString(rdir.resolve("trips.proto"),
      """message Value { int64 ride = 1; double dist = 2; }""")
    val registry = new graft.schema.SchemaRegistry(rdir.toString)
    val storage = new ParquetStorage(spark, root, Some(registry))
    storage.createTopic("fares", 1)
    storage.createTopic("trips", 1)

    val src = java.nio.file.Files.createTempDirectory("graft-cat-src2")
    java.nio.file.Files.writeString(src.resolve("fares.jsonl"),
      """{"key":"a","ride":1,"fare":12.50}
        |{"key":"b","ride":2,"fare":7.25}""".stripMargin)
    java.nio.file.Files.writeString(src.resolve("trips.jsonl"),
      """{"key":"a","ride":1,"dist":3.5}""")

    // Avro topic: JSON docs encode to Avro binary (decimal incl.),
    // pass decode-validation, and the lake materializes typed
    assert(Cat.produce(spark, storage, "fares", 1,
      src.resolve("fares.jsonl").toString, registry = Some(registry))
      .forall(_._2.isRight))
    val fares = spark.read.parquet(s"$root/lake/fares")
      .select(col("value_struct.ride"), col("value_struct.fare"))
      .orderBy("ride").collect()
    assert(fares.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(fares.map(_.getDecimal(1).toPlainString).toSeq ===
      Seq("12.50", "7.25"))

    // proto topic: same, through the proto wire codec
    assert(Cat.produce(spark, storage, "trips", 1,
      src.resolve("trips.jsonl").toString, registry = Some(registry))
      .forall(_._2.isRight))
    val trips = spark.read.parquet(s"$root/lake/trips")
      .select(col("value_struct.ride"), col("value_struct.dist")).head()
    assert(trips.getLong(0) === 1L && trips.getDouble(1) === 3.5)
  }
}
