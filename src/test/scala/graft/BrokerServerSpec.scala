package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import graft.facade.{BrokerServer, WireProtocol => W}
import graft.functions.RecordBatchCodec
import graft.storage.ParquetStorage

/** Wire round-trip through a real TCP socket: frame → route → storage →
  * frame (the S1/S2 path; mirrors the shape of the reference's
  * client-compat suites at much smaller scope).
  */
class BrokerServerSpec extends SparkSpec {

  private def request(sock: Socket, apiKey: Short, version: Short,
                      correlationId: Int)(body: ByteBuffer => Unit): ByteBuffer = {
    val buf = ByteBuffer.allocate(1 << 20)
    buf.putShort(apiKey)
    buf.putShort(version)
    buf.putInt(correlationId)
    W.writeString(buf, "graft-test")
    body(buf)
    buf.flip()
    val out = new DataOutputStream(sock.getOutputStream)
    out.writeInt(buf.remaining())
    val frame = new Array[Byte](buf.remaining())
    buf.get(frame)
    out.write(frame)
    out.flush()
    val in = new DataInputStream(sock.getInputStream)
    val len = in.readInt()
    val resp = new Array[Byte](len)
    in.readFully(resp)
    val rbuf = ByteBuffer.wrap(resp)
    assert(rbuf.getInt === correlationId)
    rbuf
  }

  test("produce/fetch round-trip over the wire (S1/S2/S3 end-to-end)") {
    val root = java.nio.file.Files.createTempDirectory("graft-broker").toString
    val storage = new ParquetStorage(spark, root)
    storage.createTopic("wire", 1)
    val broker = new BrokerServer(storage)
    try {
      val sock = new Socket("127.0.0.1", broker.boundPort)

      // ApiVersions
      val av = request(sock, 18, 0, 1)(_ => ())
      assert(av.getShort === 0)
      assert(av.getInt === 7) // seven supported APIs

      // Produce one batch of 3 records
      val batch = RecordBatchCodec.encode(RecordBatchCodec.Batch(
        0L, 0, 0, 1704067200000L, 1704067200002L, -1L, -1, -1,
        (0 until 3).map(i => RecordBatchCodec.Record(
          i, i.toLong, s"k$i".getBytes, s"v$i".getBytes, Nil))))
      val pr = request(sock, 0, 3, 2) { b =>
        W.writeProduce(b, W.ProduceRequest(1, 30000, Seq(
          W.ProduceTopic("wire", Seq(W.ProducePartition(0, batch))))))
      }
      assert(pr.getInt === 1) // one topic
      assert(W.readString(pr) === "wire")
      assert(pr.getInt === 1) // one partition
      assert(pr.getInt === 0) // partition id
      assert(pr.getShort === 0) // no error
      assert(pr.getLong === 0L) // base offset

      // Fetch them back
      val fr = request(sock, 1, 4, 3) { b =>
        W.writeFetch(b, W.FetchRequest(500, 1, 1 << 20, 0, Seq(
          W.FetchTopic("wire", Seq(W.FetchPartition(0, 0L, 1 << 20))))))
      }
      fr.getInt // throttle
      assert(fr.getInt === 1)
      assert(W.readString(fr) === "wire")
      assert(fr.getInt === 1)
      assert(fr.getInt === 0) // partition
      assert(fr.getShort === 0) // error
      assert(fr.getLong === 3L) // high watermark
      fr.getLong // lso
      fr.getInt // aborted count
      val records = W.readBytes(fr)
      val decoded = RecordBatchCodec.decode(records)
      assert(decoded.records.size === 3)
      assert(new String(decoded.records.head.value) === "v0")

      // ListOffsets: latest (-1), earliest (-2), by-timestamp
      val lo = request(sock, 2, 1, 7) { b =>
        W.writeListOffsets(b, W.ListOffsetsRequest(0, Seq(
          W.ListOffsetsTopic("wire", Seq(
            W.ListOffsetsPartition(0, -1L))))))
      }
      assert(lo.getInt === 1)
      assert(W.readString(lo) === "wire")
      assert(lo.getInt === 1)
      assert(lo.getInt === 0) // partition
      assert(lo.getShort === 0) // error
      lo.getLong // echoed timestamp
      assert(lo.getLong === 3L) // latest offset = high watermark

      // OffsetCommit then OffsetFetch round-trip (consumer progress)
      val oc = request(sock, 8, 2, 10) { b =>
        W.writeOffsetCommit(b, W.OffsetCommitRequest("g1", Seq(
          W.CommitTopic("wire", Seq(W.CommitPartition(0, 2L, ""))))))
      }
      oc.getInt; W.readString(oc); oc.getInt; oc.getInt
      assert(oc.getShort === 0)
      val of = request(sock, 9, 1, 11) { b =>
        W.writeOffsetFetch(b, W.OffsetFetchRequest("g1", Seq("wire" -> Seq(0))))
      }
      of.getInt; W.readString(of); of.getInt; of.getInt
      assert(of.getLong === 2L) // committed offset round-trips

      // Metadata sees the topic
      val md = request(sock, 3, 1, 4)(b => b.putInt(-1))
      md.getInt // broker count
      md.getInt // node id
      assert(W.readString(md) === "127.0.0.1")

      sock.close()
    } finally broker.close()
  }

  test("produce with invalid batch returns INVALID_RECORD, not a hang") {
    val root = java.nio.file.Files.createTempDirectory("graft-broker2").toString
    val storage = new ParquetStorage(spark, root)
    storage.createTopic("wire", 1)
    val broker = new BrokerServer(storage)
    try {
      val sock = new Socket("127.0.0.1", broker.boundPort)
      val pr = request(sock, 0, 3, 9) { b =>
        W.writeProduce(b, W.ProduceRequest(1, 30000, Seq(
          W.ProduceTopic("wire", Seq(W.ProducePartition(0, Array[Byte](1, 2, 3)))))))
      }
      pr.getInt; W.readString(pr); pr.getInt; pr.getInt
      assert(pr.getShort === 87) // INVALID_RECORD
      sock.close()
    } finally broker.close()
  }
}
