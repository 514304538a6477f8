package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.{AvroSchemas, JsonSchema, SchemaRegistry}

/** Mirrors the reference's schema golden tests
  * (`nisshi-schema/src/avro.rs:702` key_only_invalid_record,
  * `avro/arrow.rs:1364+` type-mapping assertions, `json.rs:59-128`
  * constraint validation).
  */
class SchemaSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): String =
    scala.io.Source.fromResource(s"schema/$name").mkString

  test("JSON Schema: person value constraints accept/reject (P6)") {
    val compiled = JsonSchema.compile(fixture("person.json"))
    val rows = Seq(
      // valid
      """{"key":"ABC-123","value":{"firstName":"Ada","lastName":"L","age":36}}""",
      // bad key pattern
      """{"key":"nope","value":{"firstName":"Ada","lastName":"L"}}""",
      // negative age (minimum 0)
      """{"key":"ABC-123","value":{"firstName":"Ada","lastName":"L","age":-1}}""",
      // missing required lastName
      """{"key":"ABC-123","value":{"firstName":"Ada"}}""",
      // missing required value entirely
      """{"key":"ABC-123"}"""
    ).toDF("json")
    val out = rows.withColumn("ok", compiled.isValid(col("json")))
      .collect().map(_.getAs[Boolean]("ok"))
    assert(out === Array(true, false, false, false, false))
  }

  test("JSON Schema: required names without a properties entry still enforce presence") {
    val compiled = JsonSchema.compile(
      """{"type":"object","required":["id"],
        |"properties":{"name":{"type":"string"}}}""".stripMargin)
    val out = Seq(
      """{"id":1,"name":"x"}""", // ok
      """{"name":"x"}""",        // required-only 'id' absent -> reject
      """{"id":7}"""             // optional 'name' absent -> ok
    ).toDF("json")
      .withColumn("ok", compiled.isValid(col("json")))
      .collect().map(_.getAs[Boolean]("ok"))
    assert(out === Array(true, false, true))
  }

  test("JSON Schema: required is key presence — explicit null satisfies it") {
    // `required` demands the KEY, not a non-null value: {"id": null}
    // with id required-but-undeclared must pass (json.rs required
    // semantics); a declared TYPE still rejects the null value itself
    val requiredOnly = JsonSchema.compile(
      """{"type":"object","required":["id"],
        |"properties":{"name":{"type":"string"}}}""".stripMargin)
    val out1 = Seq(
      """{"id":null,"name":"x"}""", // key present, null value -> required ok
      """{"name":"x"}"""           // key absent -> reject
    ).toDF("json")
      .withColumn("ok", requiredOnly.isValid(col("json")))
      .collect().map(_.getAs[Boolean]("ok"))
    assert(out1 === Array(true, false))
    val typed = JsonSchema.compile(
      """{"type":"object","required":["id"],
        |"properties":{"id":{"type":"integer"}}}""".stripMargin)
    val out2 = Seq(
      """{"id":3}""",    // ok
      """{"id":null}""", // required satisfied, but integer rejects null
      """{}"""           // key absent -> required fails
    ).toDF("json")
      .withColumn("ok", typed.isValid(col("json")))
      .collect().map(_.getAs[Boolean]("ok"))
    assert(out2 === Array(true, false, false))
  }

  test("JSON Schema: draft-2020 constraint breadth compiles to one predicate") {
    val c = JsonSchema.compile(
      """{"type":"object","properties":{
        |  "cents":{"type":"integer","multipleOf":25,
        |    "exclusiveMinimum":0,"exclusiveMaximum":10000},
        |  "code":{"type":"string","minLength":3,"maxLength":5},
        |  "tags":{"type":"array","minItems":1,"maxItems":3},
        |  "version":{"const":2}},
        |"required":["cents","code"]}""".stripMargin)
    val rows = Seq(
      """{"cents":150,"code":"abc","tags":["x"],"version":2}""",   // valid
      """{"cents":151,"code":"abc"}""",                            // not multipleOf 25
      """{"cents":0,"code":"abc"}""",                              // exclusiveMinimum
      """{"cents":10000,"code":"abc"}""",                          // exclusiveMaximum
      """{"cents":150,"code":"ab"}""",                             // minLength
      """{"cents":150,"code":"toolong"}""",                        // maxLength
      """{"cents":150,"code":"abc","tags":[]}""",                  // minItems
      """{"cents":150,"code":"abc","tags":[1,2,3,4]}""",           // maxItems
      """{"cents":150,"code":"abc","version":3}"""                 // const
    ).toDF("json")
    val out = rows.withColumn("ok", c.isValid(col("json")))
      .collect().map(_.getAs[Boolean]("ok"))
    assert(out === Array(true, false, false, false, false, false, false,
      false, false))
  }

  test("JSON Schema: structural mapping integer->Long, number->Double") {
    val c = JsonSchema.compile(
      """{"type":"object","properties":{"a":{"type":"integer"},
        |"b":{"type":"number"},"c":{"type":"string"},
        |"d":{"type":"array","items":{"type":"integer"}}}}""".stripMargin)
    val f = c.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(f("a") === LongType)
    assert(f("b") === DoubleType)
    assert(f("c") === StringType)
    assert(f("d") === ArrayType(LongType))
  }

  test("Avro: observation.avsc maps per reference avro/arrow.rs tables") {
    val st = AvroSchemas.toStructType(fixture("observation.avsc"))
    val value = st("value").dataType.asInstanceOf[StructType]
    assert(st("key").dataType === StringType)            // uuid -> Utf8
    assert(value("amount").dataType === DoubleType)
    assert(value("unit").dataType === StringType)        // enum -> Utf8
    assert(value("note").dataType === StringType)        // [null,string] -> nullable
    assert(value("note").nullable)
    assert(value("tags").dataType === ArrayType(StringType))
    assert(value("attrs").dataType === MapType(StringType, LongType))
    assert(value("when").dataType === TimestampType)
    assert(value("day").dataType === DateType)
    assert(value("amount_dec").dataType === DecimalType(10, 2))
  }

  test("Avro: general union becomes tagged struct of variants") {
    val st = AvroSchemas.toStructType(
      """{"type":"record","name":"r","fields":[
        |{"name":"u","type":["int","string"]}]}""".stripMargin)
    val u = st("u").dataType.asInstanceOf[StructType]
    assert(u.fieldNames.toSeq === Seq("tag", "member0", "member1"))
    assert(u("member0").dataType === IntegerType)
    assert(u("member1").dataType === StringType)
  }

  test("registry: lookup by extension precedence, TTL cache, proto Value") {
    val dir = Files.createTempDir()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir.getPath, "person.json"), fixture("person.json"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir.getPath, "taxi.proto"),
      """syntax = "proto3";
        |message Value { int64 vendor_id = 1; double fare_amount = 2; }""".stripMargin)
    var now = 0L
    val reg = new SchemaRegistry(dir.getPath, ttlMillis = 100, clock = () => now)
    assert(reg.lookup("person").isDefined)
    assert(reg.lookup("nosuch").isEmpty)
    val taxi = reg.lookup("taxi").get
    assert(taxi.valueType.fieldNames.toSeq === Seq("vendor_id", "fare_amount"))
    // cache: delete file, still served until TTL expiry
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir.getPath, "person.json"))
    assert(reg.lookup("person").isDefined)
    now = 200L
    assert(reg.lookup("person").isEmpty)
  }

  test("inferSchema unifies types across instances (arrow.rs common_data_type)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val docs = Seq(
      """{"k":1,"tag":"a"}""",
      """{"k":2.5,"extra":{"a":3}}""",   // k: long ⊔ double → double
      """{"k":3,"extra":{"b":"x"}}""")   // extra: field union {a} ∪ {b}
      .toDF("doc")
    val schema = graft.schema.JsonSchema.inferSchema(docs, "doc")
    assert(schema.fieldNames.sorted.toSeq === Seq("extra", "k", "tag"))
    assert(schema("k").dataType === DoubleType)
    assert(schema("tag").dataType === StringType)
    val extra = schema("extra").dataType.asInstanceOf[StructType]
    assert(extra.fieldNames.sorted.toSeq === Seq("a", "b"))
    // typed parse: missing fields are null, unified types applied
    val parsed = graft.schema.JsonSchema.parseInferred(docs, "doc", "t")
    assert(parsed.selectExpr("sum(t.k)").head().getDouble(0) === 6.5)
    assert(parsed.selectExpr("count(t.extra.a)").head().getLong(0) === 1L)
  }

  private object Files {
    def createTempDir(): java.io.File = {
      val f = java.nio.file.Files.createTempDirectory("graft-registry").toFile
      f.deleteOnExit(); f
    }
  }
}
