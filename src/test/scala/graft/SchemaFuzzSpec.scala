package graft

import java.nio.ByteBuffer

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.schema.{AvroDecoder, JsonSchema, ProtoSchema}

/** Adversarial decode sweeps over the SCHEMA decoders — the produce
  * path's remaining hostile-byte surface after FuzzSpec (wire frames)
  * and MediaFuzzSpec (media kernels): schema'd topics route client
  * payload bytes into AvroDecoder / ProtoSchema / JsonSchema (the
  * reference analogue feeds `fuzz_request_decode` frames into
  * schema-validated topics). Contracts mirror FuzzSpec:
  *
  *   - typed errors only — a hostile payload may yield null (the
  *     INVALID_RECORD signal) or a typed IllegalArgument/underflow
  *     rejection, never a ClassCastException, MatchError,
  *     StackOverflowError, or codec-library internal escaping the row;
  *   - never over-allocate — a declared 1 GiB avro bytes length fails
  *     via the capped avro limits (AvroDecoder's init), not a 1 GiB
  *     allocation; proto declared lengths check remaining() first;
  *   - never loop / never blow the stack — recursive message nesting
  *     is depth-capped (ProtoSchema.MaxNestingDepth).
  *
  * 10k+ seeded cases per target via [[PropSupport]].
  */
class SchemaFuzzSpec extends SparkSpec with PropSupport {
  import spark.implicits._

  private def typed(e: Throwable): Boolean = e match {
    case _: IllegalArgumentException => true
    case _: java.nio.BufferUnderflowException => true
    case _: UnsupportedOperationException => true
    case _: IllegalStateException => true
    case _ => false
  }

  private def assertTyped(target: String, input: Array[Byte])(body: => Any): Unit =
    try { body; () }
    catch {
      case e: Throwable if typed(e) => // contract holds
      case e: Throwable =>
        throw new AssertionError(
          s"$target leaked untyped ${e.getClass.getName} on " +
            s"${input.length}-byte input " +
            input.take(64).map(b => f"$b%02x").mkString, e)
    }

  private val randomBytes: Gen[Array[Byte]] = for {
    n <- Gen.frequency(4 -> Gen.choose(0, 64), 2 -> Gen.choose(64, 512),
      1 -> Gen.choose(512, 4096))
    bs <- Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield bs

  private def mutatedGen(base: Array[Byte]): Gen[Array[Byte]] = for {
    pos <- Gen.choose(0, base.length - 1)
    b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
    cut <- Gen.frequency(3 -> Gen.const(base.length),
      1 -> Gen.choose(0, base.length))
  } yield {
    val a = java.util.Arrays.copyOf(base, math.min(cut, base.length))
    if (pos < a.length) a(pos) = b
    a
  }

  // ------------------------------------------------------------- proto

  private val protoText =
    """message Node {
      |  Node next = 1;
      |  int32 v = 2;
      |}
      |message Rich {
      |  int32 a = 1;
      |  sint64 b = 2;
      |  bool c = 3;
      |  string s = 4;
      |  bytes bs = 5;
      |  double d = 6;
      |  float f = 7;
      |  fixed32 f32 = 8;
      |  sfixed64 f64 = 9;
      |  repeated int64 xs = 10;
      |  map<string, int32> m = 11;
      |  google.protobuf.Timestamp ts = 12;
      |  Node node = 13;
      |}
      |""".stripMargin
  private val parsed = ProtoSchema.parse(protoText)

  test("fuzz_proto_decode: random bodies — typed errors only") {
    forAllGen(randomBytes, cases = 10000) { bs =>
      assertTyped("ProtoSchema.decode[Rich]", bs)(
        ProtoSchema.decode(parsed, "Rich", bs))
      assertTyped("ProtoSchema.decode[Node]", bs)(
        ProtoSchema.decode(parsed, "Node", bs))
    }
  }

  test("fuzz_proto_decode: mutated valid frames reach the deep field readers") {
    val base = ProtoSchema.encode(parsed, "Rich", Map(
      "a" -> 7, "b" -> -3L, "c" -> true, "s" -> "hello fuzz",
      "bs" -> Array[Byte](1, 2, 3), "d" -> 2.5d, "f" -> 1.5f,
      "f32" -> 9L, "f64" -> -11L, "xs" -> Vector(1L, 2L, 3L),
      "m" -> Map("k" -> 1, "kk" -> 2),
      "node" -> Map("v" -> 42)))
    // sanity: the unmutated base decodes
    assert(ProtoSchema.decode(parsed, "Rich", base).get("a").contains(7))
    forAllGen(mutatedGen(base), cases = 10000) { bs =>
      assertTyped("ProtoSchema.decode[Rich]", bs)(
        ProtoSchema.decode(parsed, "Rich", bs))
    }
  }

  test("fuzz_proto_decode: recursion bomb hits the depth cap, not the stack") {
    // Node nesting one level per 2-4 wire bytes: 50k levels would be a
    // StackOverflowError (an Error — it would escape the produce path's
    // per-row Exception catch and kill the task) without the cap
    var payload = Array.empty[Byte]
    (0 until 50000).foreach { _ =>
      val buf = ByteBuffer.allocate(payload.length + 8)
      buf.put(0x0a.toByte) // field 1 (next), wire type 2
      var len = payload.length.toLong
      while ((len & ~0x7fL) != 0) { buf.put(((len & 0x7f) | 0x80).toByte); len >>>= 7 }
      buf.put(len.toByte)
      buf.put(payload)
      payload = java.util.Arrays.copyOf(buf.array(), buf.position())
    }
    val e = intercept[IllegalArgumentException](
      ProtoSchema.decode(parsed, "Node", payload))
    assert(e.getMessage.contains("nesting"), e.getMessage)
  }

  // ------------------------------------------------------------- avro

  private val avsc =
    """{"type":"record","name":"R","fields":[
      |  {"name":"id","type":"long"},
      |  {"name":"s","type":"string"},
      |  {"name":"b","type":"bytes"},
      |  {"name":"xs","type":{"type":"array","items":"int"}},
      |  {"name":"u","type":["null","string"]}
      |]}""".stripMargin

  test("fuzz_avro_decode: mutated payload batch — nulls, never a failed job") {
    val base = AvroDecoder.encode(avsc, Map(
      "id" -> 42L, "s" -> "hello avro", "b" -> ByteBuffer.wrap(Array[Byte](1, 2, 3)),
      "xs" -> java.util.Arrays.asList(1, 2, 3), "u" -> "opt"))
    val cases = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    forAllGen(mutatedGen(base), cases = 3000)(cases += _)
    forAllGen(randomBytes, cases = 3000)(cases += _)
    // ONE Spark job over the whole corpus: the per-row contract is
    // null-or-decoded; an untyped escape fails the job itself
    val df = cases.toSeq.zipWithIndex.map { case (bs, i) => (i.toLong, bs) }
      .toDF("i", "payload")
    val out = AvroDecoder.decodeColumn(df, "payload", avsc, "rec")
    assert(out.count() === cases.size.toLong,
      "hostile avro payloads must not fail the decode job")
    // the unmutated base must still decode (guards against the decoder
    // nulling everything and the assertion above passing vacuously)
    val ok = AvroDecoder.decodeColumn(
      Seq((0L, base)).toDF("i", "payload"), "payload", avsc, "rec")
      .select("rec.id", "rec.s").head()
    assert(ok.getLong(0) === 42L && ok.getString(1) === "hello avro")
  }

  test("fuzz_avro_decode: hostile declared lengths fail via capped limits, " +
    "not a 1 GiB allocation") {
    // AvroDecoder's init must have bound the avro system limits BEFORE
    // avro's SystemLimitException static init read them — verify the
    // ACTIVE limit via the class's private static, not the property
    val cls = Class.forName("org.apache.avro.SystemLimitException")
    def active(field: String): Int = {
      val f = cls.getDeclaredField(field)
      f.setAccessible(true)
      f.getInt(null)
    }
    assert(active("maxBytesLength") === (64 << 20),
      "avro bytes limit not bound — a declared 2 GiB length would allocate")
    assert(active("maxStringLength") === (64 << 20))
    assert(active("maxCollectionLength") === (1 << 20))

    // payload: zigzag-varint declaring a 1 GiB bytes body, then nothing
    def zigzagVarint(v: Long): Array[Byte] = {
      val z = (v << 1) ^ (v >> 63)
      val buf = ByteBuffer.allocate(10)
      var x = z
      while ((x & ~0x7fL) != 0) { buf.put(((x & 0x7f) | 0x80).toByte); x >>>= 7 }
      buf.put(x.toByte)
      java.util.Arrays.copyOf(buf.array(), buf.position())
    }
    val bytesOnly = """{"type":"record","name":"B","fields":[
      |{"name":"b","type":"bytes"}]}""".stripMargin
    val hostile = zigzagVarint(1L << 30)
    val t0 = System.nanoTime()
    val out = AvroDecoder.decodeColumn(
      (0 until 200).map(i => (i.toLong, hostile)).toDF("i", "payload"),
      "payload", bytesOnly, "rec")
      .filter(col("rec").isNotNull).count()
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(out === 0L, "a 1 GiB declared length must reject, not decode")
    assert(elapsed < 30.0,
      f"200 hostile rows took $elapsed%.1f s — allocation-driven decode")
  }

  // ------------------------------------------------------- json schema

  test("fuzz_json_schema: hostile schema documents — typed rejections only") {
    val person = scala.io.Source.fromResource("schema/person.json").mkString
    def compileTyped(s: String): Unit =
      try { JsonSchema.compile(s); () }
      catch {
        case _: org.json4s.ParserUtil.ParseException => // malformed JSON
        case _: com.fasterxml.jackson.core.JsonProcessingException => // json4s-jackson backend's malformed-JSON signal
        case e: Throwable if typed(e) =>
        case e: Throwable =>
          throw new AssertionError(
            s"JsonSchema.compile leaked ${e.getClass.getName} on " +
              s"${s.take(80)}...", e)
      }
    forAllGen(mutatedGen(person.getBytes("UTF-8")), cases = 5000) { bs =>
      compileTyped(new String(bs, "UTF-8"))
    }
    forAllGen(Gen.asciiPrintableStr, cases = 5000)(compileTyped)
  }

  test("fuzz_json_schema: compiled validator over hostile documents — " +
    "boolean verdicts, never a throw") {
    val person = scala.io.Source.fromResource("schema/person.json").mkString
    val compiled = JsonSchema.compile(person)
    val valid =
      """{"key":"ABC-123","value":{"firstName":"Ada","lastName":"L","age":36}}"""
    val cases = scala.collection.mutable.ArrayBuffer.empty[String]
    forAllGen(mutatedGen(valid.getBytes("UTF-8")), cases = 5000)(bs =>
      cases += new String(bs, "UTF-8"))
    forAllGen(Gen.asciiPrintableStr, cases = 2000)(cases += _)
    val df = cases.toSeq.toDF("json")
      .select(col("json"), compiled.isValid(col("json")).as("ok"))
    // one job; every row must produce a non-null boolean verdict
    assert(df.filter(col("ok").isNull).count() === 0L,
      "validator must give a verdict on every hostile document")
    assert(df.count() === cases.size.toLong)
  }
}
