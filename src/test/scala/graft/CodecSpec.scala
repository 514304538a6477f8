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
      orderly(WireProtocol.readFetchV12(buf, 16, _ => null))
      orderly(WireProtocol.readListOffsets(buf, 8))
      orderly(WireProtocol.readOffsetCommit(buf, 8))
      orderly(WireProtocol.readOffsetFetchV8(buf, 9))
      orderly(WireProtocol.readAddPartitionsToTxnV4(buf))
      orderly(WireProtocol.readMetadataV9Full(buf, 12, _ => null))
      orderly(WireProtocol.readJoinGroup(buf, 9))
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

  test("round-10 wire structures round-trip at every served version") {
    import graft.facade.WireProtocol._
    def buf() = java.nio.ByteBuffer.allocate(1 << 16)

    // Fetch v12-v17: topic-id addressing resolves through the
    // name-derived scheme; v15+ drops the leading replica_id
    val topics = Seq("alpha", "beta-2")
    val resolve: java.util.UUID => String =
      u => topics.find(t => topicUuid(t) == u).orNull
    (12 to 17).foreach { v =>
      val req = FetchRequest(500, 1, 1 << 20, 1, Seq(
        FetchTopic("alpha", Seq(FetchPartition(0, 7L, 4096),
          FetchPartition(3, 9L, 8192))),
        FetchTopic("beta-2", Seq(FetchPartition(1, 0L, 1024)))),
        sessionId = 42, sessionEpoch = 5,
        forgotten = Seq("alpha" -> Seq(2)))
      val b = buf()
      writeFetchV12(b, req, v)
      b.flip()
      val got = readFetchV12(b, v, resolve)
      assert(b.remaining() === 0, s"fetch v$v trailing bytes")
      assert(got.topics.map(t => t.topic -> t.partitions) ===
        req.topics.map(t => t.topic -> t.partitions), s"fetch v$v")
      assert(got.forgotten === req.forgotten && got.sessionId === 42 &&
        got.sessionEpoch === 5 && got.isolation === 1, s"fetch v$v")
    }
    // Fetch response v13+: named rows carry their uuid, unknownIds echo
    (13 to 16).foreach { v =>
      val parts = Seq(FetchV12PartResult(0, 0, 10L, 10L, 0L,
        Seq((77L, 3L)), Array[Byte](1, 2, 3)))
      val unk = java.util.UUID.fromString("deadbeef-0000-4000-8000-00000000000f")
      val b = buf()
      writeFetchResponseV12(b, Seq("alpha" -> parts), 0, 42, 0, v,
        unknownIds = Seq(unk -> Seq(FetchV12PartResult(5, 100, -1L, -1L,
          -1L, Nil, Array.empty[Byte]))))
      b.flip()
      val got = readFetchResponseV12(b, v,
        u => Option(resolve(u)).getOrElse(if (u == unk) "UNK" else null))
      assert(b.remaining() === 0, s"fetch resp v$v trailing bytes")
      assert(got.map(_._1) === Seq("alpha", "UNK"), s"fetch resp v$v")
      assert(got.head._2.head.aborted === Seq((77L, 3L)))
      assert(got(1)._2.head.error === 100 && got(1)._2.head.partition === 5)
    }

    // OffsetFetch v8-v9 (KIP-709 batched groups, null topics preserved)
    (8 to 9).foreach { v =>
      val groups = Seq(
        OffsetFetchRequest("g1", Seq("t" -> Seq(0, 1))),
        OffsetFetchRequest("g2", null))
      val b = buf()
      writeOffsetFetchV8(b, groups, v)
      b.flip()
      val got = readOffsetFetchV8(b, v)
      assert(b.remaining() === 0, s"offsetFetch v$v trailing bytes")
      assert(got.map(_.group) === Seq("g1", "g2"))
      assert(got.head.topics === Seq("t" -> Seq(0, 1)) && got(1).topics === null)
      val rb = buf()
      writeOffsetFetchResponseV8(rb, Seq(
        "g1" -> Seq("t" -> Seq((0, 5L), (1, -1L))), "g2" -> Nil))
      rb.flip()
      val rgot = readOffsetFetchResponseV8(rb)
      assert(rb.remaining() === 0)
      assert(rgot === Seq("g1" -> Seq("t" -> Seq((0, 5L), (1, -1L))),
        "g2" -> Nil))
    }

    // AddPartitionsToTxn v4-v5 (KIP-890 batched transactions)
    val txns = Seq(
      TxnPartitions("tx-a", 9L, 2, verifyOnly = false, Seq("t" -> Seq(0, 1))),
      TxnPartitions("tx-b", 10L, 0, verifyOnly = true, Seq("u" -> Seq(3))))
    val tb = buf()
    writeAddPartitionsToTxnV4(tb, txns)
    tb.flip()
    assert(readAddPartitionsToTxnV4(tb) === txns && tb.remaining() === 0)
    val trb = buf()
    writeAddPartitionsToTxnResponseV4(trb, Seq(
      "tx-a" -> Seq("t" -> Seq((0, 0.toShort), (1, 0.toShort))),
      "tx-b" -> Seq("u" -> Seq((3, 48.toShort)))))
    trb.flip()
    assert(readAddPartitionsToTxnResponseV4(trb) === Seq(
      "tx-a" -> Seq("t" -> Seq((0, 0.toShort), (1, 0.toShort))),
      "tx-b" -> Seq("u" -> Seq((3, 48.toShort)))) && trb.remaining() === 0)

    // Metadata response v9-v12: uuid rows from v10, unknown-id echo
    (9 to 12).foreach { v =>
      val b = buf()
      val unk = java.util.UUID.fromString("deadbeef-1111-4000-8000-000000000001")
      writeMetadataResponseV9(b, "h", 9092, Seq(("alpha", 2, 0.toShort)), v,
        unknownIds = Seq(unk))
      b.flip()
      val (host, port, ts) = readMetadataResponseV9(b, v)
      assert(b.remaining() === 0, s"metadata v$v trailing bytes")
      assert(host === "h" && port === 9092)
      assert(ts.head.name === "alpha" && ts.head.partitions === Seq(0, 1))
      if (v >= 10) {
        assert(ts.head.topicId === topicUuid("alpha"), s"metadata v$v")
        // Name is nullable only at v12+ (nullableVersions 12+); v10/v11
        // unknown-id rows carry the empty string a strict client accepts
        val wantName = if (v >= 12) null else ""
        assert(ts(1).name === wantName && ts(1).topicId === unk &&
          ts(1).error === 100, s"metadata v$v unknown row")
      } else assert(ts.size === 1, s"metadata v$v must drop unknown rows")
    }

    // JoinGroup v7-v9 / SyncGroup v5 / LeaveGroup v5: the new fields
    // survive a write→read cycle with no trailing bytes
    (7 to 9).foreach { v =>
      val b = buf()
      writeJoinGroup(b, JoinGroupRequest("g", 30000, "m1", "consumer",
        Seq(JoinProtocol("range", Array[Byte](1)))), v)
      b.flip()
      val r = readJoinGroup(b, v)
      assert(b.remaining() === 0 && r.group === "g" && r.memberId === "m1")
      val rb = buf()
      writeJoinGroupResponse(rb, 0, 3, "range", "m1", "m1",
        Seq("m1" -> Array[Byte](2)), v)
      rb.flip()
      val jr = readJoinGroupResponse(rb, v)
      assert(rb.remaining() === 0 && jr.generation === 3 &&
        jr.protocol === "range" && jr.members.map(_._1) === Seq("m1"),
        s"joinGroup v$v")
    }
    val sb = buf()
    writeSyncGroup(sb, SyncGroupRequest("g", 3, "m1",
      Seq("m1" -> Array[Byte](9))), 5)
    sb.flip()
    val sr = readSyncGroup(sb, 5)
    assert(sb.remaining() === 0 && sr.assignments.map(_._1) === Seq("m1"))
    val lb = buf()
    writeLeaveGroupBatch(lb, "g", Seq("m1", "m2"), 5)
    lb.flip()
    assert(readLeaveGroup(lb, 5) === (("g", Seq("m1", "m2"))) &&
      lb.remaining() === 0)
  }
}
