package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.Arbitrary.arbitrary
import graft.functions.{RecordBatchCodec, Varint}
import graft.functions.RecordBatchCodec.{Batch, Header, Record}

/** Mirrors the reference's property tests
  * (`nisshi-sans-io/tests/proptest.rs:79-190`: varint/zigzag round-trips,
  * batch serde with compression) and the CRC golden behavior
  * (`deflated.rs:155-165`).
  */
class CodecSpec extends AnyFunSuite with PropSupport {

  test("zigzag round-trips and maps small magnitudes to small codes") {
    forAllGen(arbitrary[Long]) { v => assert(Varint.unzigzag(Varint.zigzag(v)) === v) }
    assert(Varint.zigzag(0L) === 0L)
    assert(Varint.zigzag(-1L) === 1L)
    assert(Varint.zigzag(1L) === 2L)
  }

  test("varlong round-trips arbitrary values") {
    forAllGen(arbitrary[Long]) { v =>
      val buf = java.nio.ByteBuffer.allocate(10)
      Varint.writeVarlong(v, buf)
      assert(buf.position() === Varint.sizeOfVarlong(v))
      buf.flip()
      assert(Varint.readVarlong(buf) === v)
    }
  }

  private val genRecord: Gen[Record] = for {
    od <- Gen.choose(0, 100)
    td <- Gen.choose(0L, 1000000L)
    key <- Gen.option(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    value <- Gen.option(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    hs <- Gen.listOfN(2, Gen.alphaStr.map(k => Header(k, Array[Byte](1, 2))))
  } yield Record(od, td, key.orNull, value.orNull, hs)

  private val genBatch: Gen[Batch] = for {
    base <- Gen.choose(0L, 1L << 40)
    n <- Gen.choose(0, 20)
    recs <- Gen.listOfN(n, genRecord)
    codec <- Gen.oneOf(RecordBatchCodec.CodecNone, RecordBatchCodec.CodecGzip,
      RecordBatchCodec.CodecSnappy, RecordBatchCodec.CodecLz4,
      RecordBatchCodec.CodecZstd)
  } yield Batch(base, 0, codec.toShort, 1704067200000L, 1704067300000L,
    -1L, -1, -1, recs.zipWithIndex.map { case (r, i) => r.copy(offsetDelta = i) })

  test("record batch encode/decode round-trips (none/gzip/snappy/lz4/zstd)") {
    forAllGen(genBatch, cases = 60) { b =>
      val decoded = RecordBatchCodec.decode(RecordBatchCodec.encode(b))
      assert(decoded.baseOffset === b.baseOffset)
      assert(decoded.records.size === b.records.size)
      decoded.records.zip(b.records).foreach { case (d, o) =>
        assert(d.offsetDelta === o.offsetDelta)
        assert(d.timestampDelta === o.timestampDelta)
        assert(java.util.Arrays.equals(
          Option(d.key).getOrElse(Array.empty[Byte]),
          Option(o.key).getOrElse(Array.empty[Byte])))
        assert(java.util.Arrays.equals(
          Option(d.value).getOrElse(Array.empty[Byte]),
          Option(o.value).getOrElse(Array.empty[Byte])))
      }
    }
  }

  test("multi-batch record sets decode batch by batch (client retry shape)") {
    def mkBatch(base: Long, codec: Int, vs: Seq[String]) =
      RecordBatchCodec.encode(Batch(base, 0, codec.toShort, 1000L, 1001L,
        -1L, -1, -1, vs.zipWithIndex.map { case (v, i) =>
          Record(i, i.toLong, s"k$i".getBytes, v.getBytes, Nil)
        }))
    // two consecutive batches, DIFFERENT codecs — slicing at the declared
    // batch length is what keeps batch 2's bytes out of batch 1's
    // decompressor
    val wire = mkBatch(0L, RecordBatchCodec.CodecGzip, Seq("a", "b")) ++
      mkBatch(2L, RecordBatchCodec.CodecNone, Seq("c"))
    val all = RecordBatchCodec.decodeAll(wire)
    assert(all.map(_.baseOffset) === Seq(0L, 2L))
    assert(all.flatMap(_.records.map(r => new String(r.value))) ===
      Seq("a", "b", "c"))
    // the single-batch form returns the FIRST batch, unconfused
    assert(RecordBatchCodec.decode(wire).records.size === 2)
    // hostile declared batch length fails cleanly, before any CRC read
    val hostile = wire.clone()
    val bb = java.nio.ByteBuffer.wrap(hostile)
    bb.putInt(8, Int.MaxValue - 5) // batchLength field
    intercept[IllegalArgumentException](RecordBatchCodec.decode(hostile))
  }

  test("corrupted batch fails CRC check (every codec)") {
    Seq(RecordBatchCodec.CodecNone, RecordBatchCodec.CodecGzip,
      RecordBatchCodec.CodecSnappy, RecordBatchCodec.CodecLz4,
      RecordBatchCodec.CodecZstd).foreach { codec =>
      val b = Batch(0L, 0, codec.toShort, 0L, 0L, -1L, -1, -1,
        Seq(Record(0, 0L, "k".getBytes, "v".getBytes, Nil)))
      val wire = RecordBatchCodec.encode(b)
      wire(wire.length - 1) = (wire(wire.length - 1) ^ 0xff).toByte
      val e = intercept[IllegalArgumentException] { RecordBatchCodec.decode(wire) }
      assert(e.getMessage.contains("CRC"))
    }
  }

  test("compressed frames really are the advertised codec framing") {
    val payload = Array.fill[Byte](256)(7)
    // magic bytes: gzip 1f 8b, xerial snappy stream (-126 'S' 'N' 'A'),
    // LZ4 frame 04 22 4d 18, zstd 28 b5 2f fd
    assert(RecordBatchCodec.compress(RecordBatchCodec.CodecGzip, payload)
      .take(2).toSeq === Seq(0x1f.toByte, 0x8b.toByte))
    assert(RecordBatchCodec.compress(RecordBatchCodec.CodecSnappy, payload)
      .slice(1, 4).map(_.toChar).mkString === "SNA")
    assert(RecordBatchCodec.compress(RecordBatchCodec.CodecLz4, payload)
      .take(4).toSeq === Seq(0x04.toByte, 0x22.toByte, 0x4d.toByte, 0x18.toByte))
    assert(RecordBatchCodec.compress(RecordBatchCodec.CodecZstd, payload)
      .take(4).toSeq === Seq(0x28.toByte, 0xb5.toByte, 0x2f.toByte, 0xfd.toByte))
    // and each round-trips through its decompressor
    Seq(RecordBatchCodec.CodecGzip, RecordBatchCodec.CodecSnappy,
      RecordBatchCodec.CodecLz4, RecordBatchCodec.CodecZstd).foreach { c =>
      assert(RecordBatchCodec.decompress(c,
        RecordBatchCodec.compress(c, payload)).toSeq === payload.toSeq)
    }
  }

  test("tombstone (null value) round-trips as null") {
    val b = Batch(5L, 0, 0, 0L, 0L, -1L, -1, -1,
      Seq(Record(0, 0L, "k".getBytes, null, Nil)))
    val d = RecordBatchCodec.decode(RecordBatchCodec.encode(b))
    assert(d.records.head.value === null)
    assert(d.records.head.key !== null)
  }
}

/** CRC-32C Catalyst expression: correctness + codegen survival. */
class Crc32CSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.Crc32C

  test("crc32c matches java.util.zip.CRC32C and differs from IEEE crc32") {
    val df = Seq("hello", "", "graft").toDF("s")
      .withColumn("b", col("s").cast("binary"))
      .withColumn("ours", Crc32C.crc32c(col("b")))
      .withColumn("ieee", crc32(col("b")))
    val rows = df.collect()
    rows.foreach { r =>
      val expected = Crc32C.compute(r.getAs[Array[Byte]]("b"))
      assert(r.getAs[Long]("ours") === expected)
    }
    // Castagnoli poly != IEEE poly on non-empty input
    assert(rows.filter(_.getAs[String]("s").nonEmpty)
      .forall(r => r.getAs[Long]("ours") != r.getAs[Long]("ieee")))
  }

  test("crc32c works over 10k rows through codegen") {
    val out = spark.range(10000)
      .withColumn("b", col("id").cast("string").cast("binary"))
      .withColumn("c", Crc32C.crc32c(col("b")))
      .agg(countDistinct("c")).head().getLong(0)
    assert(out === 10000L)
  }
}

class DecoderFuzzSpec extends AnyFunSuite with PropSupport {

  test("fuzz: random bytes never hang or over-allocate in any decoder") {
    // the reference's fuzz targets (fuzz_deflated_batch,
    // fuzz_request_decode, fuzz_varint) as a property: every decoder
    // either returns or throws an orderly exception — no hangs, and a
    // hostile length field never drives an allocation (checked lengths)
    import graft.facade.WireProtocol
    val proto = graft.schema.ProtoSchema.parse(
      """message Inner { int64 a = 1; }
        |message Value { int64 id = 1; string s = 2; Inner i = 3;
        |  repeated int64 ns = 4; map<string, int64> m = 5; }""".stripMargin)
    val genBytes = Gen.choose(0, 240)
      .flatMap(n => Gen.listOfN(n, arbitrary[Byte]).map(_.toArray))
    def orderly(f: => Any): Unit =
      try { f; () } catch { case _: Exception => () }
    forAllGen(genBytes, cases = 400) { bytes =>
      def buf = java.nio.ByteBuffer.wrap(bytes)
      orderly(RecordBatchCodec.decode(bytes))
      orderly(WireProtocol.readHeader(buf))
      orderly(WireProtocol.readProduce(buf))
      orderly(WireProtocol.readProduceV9(buf))
      orderly(WireProtocol.readFetch(buf, 11))
      orderly(WireProtocol.readListOffsets(buf, 8))
      orderly(WireProtocol.readOffsetCommit(buf, 8))
      orderly(WireProtocol.readJoinGroup(buf, 6))
      orderly(WireProtocol.readCreateTopics(buf, 7))
      orderly(WireProtocol.readIncrementalAlterConfigs(buf, 1))
      orderly(WireProtocol.readDescribeAcls(buf, 2))
      orderly(WireProtocol.readAlterUserScram(buf))
      orderly(graft.schema.ProtoSchema.decode(proto, "Value", bytes))
      orderly(Varint.readVarint(buf))
    }
    // a well-formed prefix with a hostile declared length fails fast and
    // cheaply instead of allocating gigabytes
    val hostile = java.nio.ByteBuffer.allocate(8)
    hostile.putInt(Int.MaxValue) // bytes length = 2 GiB
    hostile.flip()
    intercept[IllegalArgumentException](WireProtocol.readBytes(hostile))
  }
}
