package graft.facade

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Minimal Kafka wire-protocol codec for the facade's fixed API versions
  * (non-flexible encodings: INT16/INT32 sizes, nullable strings as
  * INT16 -1). Hand-written subset of the reference's codegen'd ser/de
  * (`nisshi-sans-io/src/ser.rs`, `de.rs`, driven by the 185 protocol
  * JSONs in `nisshi-sans-io/message/`); this slice covers the four APIs
  * the facade serves:
  *
  *  - ApiVersions v0 (api_key 18)
  *  - Metadata    v1 (api_key 3)
  *  - Produce     v3 (api_key 0)  — record batches as magic-v2 bytes
  *  - Fetch       v4 (api_key 1)
  *
  * Frames are INT32 length-prefixed; request header v1
  * (api_key, api_version, correlation_id, client_id).
  */
object WireProtocol {

  final case class RequestHeader(apiKey: Short, apiVersion: Short,
                                 correlationId: Int, clientId: String)

  // ------------------------------------------------------------- primitives

  def readString(buf: ByteBuffer): String = {
    val n = buf.getShort
    if (n < 0) null
    else {
      val a = new Array[Byte](n)
      buf.get(a)
      new String(a, StandardCharsets.UTF_8)
    }
  }

  def writeString(buf: ByteBuffer, s: String): Unit =
    if (s == null) buf.putShort(-1)
    else {
      val a = s.getBytes(StandardCharsets.UTF_8)
      buf.putShort(a.length.toShort)
      buf.put(a)
    }

  def readBytes(buf: ByteBuffer): Array[Byte] = {
    val n = buf.getInt
    if (n < 0) null
    else {
      val a = new Array[Byte](n)
      buf.get(a)
      a
    }
  }

  def writeBytes(buf: ByteBuffer, a: Array[Byte]): Unit =
    if (a == null) buf.putInt(-1)
    else {
      buf.putInt(a.length)
      buf.put(a)
    }

  def readHeader(buf: ByteBuffer): RequestHeader =
    RequestHeader(buf.getShort, buf.getShort, buf.getInt, readString(buf))

  // ------------------------------------------------------------- requests

  final case class ProducePartition(partition: Int, records: Array[Byte])
  final case class ProduceTopic(topic: String, partitions: Seq[ProducePartition])
  final case class ProduceRequest(acks: Short, timeoutMs: Int, topics: Seq[ProduceTopic])

  /** Produce v3: transactional_id acks timeout [topic [partition records]] */
  def readProduce(buf: ByteBuffer): ProduceRequest = {
    readString(buf) // transactional_id (ignored in this slice)
    val acks = buf.getShort
    val timeout = buf.getInt
    val topics = (0 until buf.getInt).map { _ =>
      val t = readString(buf)
      val parts = (0 until buf.getInt).map { _ =>
        ProducePartition(buf.getInt, readBytes(buf))
      }
      ProduceTopic(t, parts)
    }
    ProduceRequest(acks, timeout, topics)
  }

  def writeProduce(buf: ByteBuffer, r: ProduceRequest): Unit = {
    writeString(buf, null)
    buf.putShort(r.acks)
    buf.putInt(r.timeoutMs)
    buf.putInt(r.topics.size)
    r.topics.foreach { t =>
      writeString(buf, t.topic)
      buf.putInt(t.partitions.size)
      t.partitions.foreach { p =>
        buf.putInt(p.partition)
        writeBytes(buf, p.records)
      }
    }
  }

  final case class FetchPartition(partition: Int, fetchOffset: Long, maxBytes: Int)
  final case class FetchTopic(topic: String, partitions: Seq[FetchPartition])
  final case class FetchRequest(maxWaitMs: Int, minBytes: Int, maxBytes: Int,
                                isolation: Byte, topics: Seq[FetchTopic])

  /** Fetch v4: replica_id max_wait min_bytes max_bytes isolation
    * [topic [partition fetch_offset partition_max_bytes]]
    */
  def readFetch(buf: ByteBuffer): FetchRequest = {
    buf.getInt // replica_id
    val maxWait = buf.getInt
    val minBytes = buf.getInt
    val maxBytes = buf.getInt
    val isolation = buf.get()
    val topics = (0 until buf.getInt).map { _ =>
      val t = readString(buf)
      val parts = (0 until buf.getInt).map { _ =>
        FetchPartition(buf.getInt, buf.getLong, buf.getInt)
      }
      FetchTopic(t, parts)
    }
    FetchRequest(maxWait, minBytes, maxBytes, isolation, topics)
  }

  def writeFetch(buf: ByteBuffer, r: FetchRequest): Unit = {
    buf.putInt(-1)
    buf.putInt(r.maxWaitMs)
    buf.putInt(r.minBytes)
    buf.putInt(r.maxBytes)
    buf.put(r.isolation)
    buf.putInt(r.topics.size)
    r.topics.foreach { t =>
      writeString(buf, t.topic)
      buf.putInt(t.partitions.size)
      t.partitions.foreach { p =>
        buf.putInt(p.partition)
        buf.putLong(p.fetchOffset)
        buf.putInt(p.maxBytes)
      }
    }
  }

  // ------------------------------------------------------------- responses

  final case class ListOffsetsPartition(partition: Int, timestamp: Long)
  final case class ListOffsetsTopic(topic: String, partitions: Seq[ListOffsetsPartition])
  final case class ListOffsetsRequest(isolation: Byte, topics: Seq[ListOffsetsTopic])

  /** ListOffsets v1: replica_id [topic [partition timestamp]] —
    * timestamp -1 = latest, -2 = earliest, else first offset with
    * ts >= timestamp (the A5/J4 operators on the wire).
    */
  def readListOffsets(buf: ByteBuffer): ListOffsetsRequest = {
    buf.getInt // replica_id
    val topics = (0 until buf.getInt).map { _ =>
      val t = readString(buf)
      val parts = (0 until buf.getInt).map { _ =>
        ListOffsetsPartition(buf.getInt, buf.getLong)
      }
      ListOffsetsTopic(t, parts)
    }
    ListOffsetsRequest(0, topics)
  }

  def writeListOffsets(buf: ByteBuffer, r: ListOffsetsRequest): Unit = {
    buf.putInt(-1)
    buf.putInt(r.topics.size)
    r.topics.foreach { t =>
      writeString(buf, t.topic)
      buf.putInt(t.partitions.size)
      t.partitions.foreach { p =>
        buf.putInt(p.partition)
        buf.putLong(p.timestamp)
      }
    }
  }

  /** ListOffsets v1 response: [topic [partition error timestamp offset]]. */
  def writeListOffsetsResponse(buf: ByteBuffer,
                               results: Seq[(String, Seq[(Int, Short, Long, Long)])]): Unit = {
    buf.putInt(results.size)
    results.foreach { case (topic, parts) =>
      writeString(buf, topic)
      buf.putInt(parts.size)
      parts.foreach { case (p, err, ts, off) =>
        buf.putInt(p)
        buf.putShort(err)
        buf.putLong(ts)
        buf.putLong(off)
      }
    }
  }

  final case class CommitPartition(partition: Int, offset: Long, metadata: String)
  final case class CommitTopic(topic: String, partitions: Seq[CommitPartition])
  final case class OffsetCommitRequest(group: String, topics: Seq[CommitTopic])

  /** OffsetCommit v2: group generation member retention [topic [partition
    * offset metadata]].
    */
  def readOffsetCommit(buf: ByteBuffer): OffsetCommitRequest = {
    val group = readString(buf)
    buf.getInt // generation
    readString(buf) // member
    buf.getLong // retention_time
    val topics = (0 until buf.getInt).map { _ =>
      val t = readString(buf)
      val parts = (0 until buf.getInt).map { _ =>
        CommitPartition(buf.getInt, buf.getLong, readString(buf))
      }
      CommitTopic(t, parts)
    }
    OffsetCommitRequest(group, topics)
  }

  def writeOffsetCommit(buf: ByteBuffer, r: OffsetCommitRequest): Unit = {
    writeString(buf, r.group)
    buf.putInt(-1)
    writeString(buf, "")
    buf.putLong(-1L)
    buf.putInt(r.topics.size)
    r.topics.foreach { t =>
      writeString(buf, t.topic)
      buf.putInt(t.partitions.size)
      t.partitions.foreach { p =>
        buf.putInt(p.partition)
        buf.putLong(p.offset)
        writeString(buf, p.metadata)
      }
    }
  }

  /** OffsetCommit v2 response: [topic [partition error]]. */
  def writeOffsetCommitResponse(buf: ByteBuffer,
                                results: Seq[(String, Seq[(Int, Short)])]): Unit = {
    buf.putInt(results.size)
    results.foreach { case (t, parts) =>
      writeString(buf, t)
      buf.putInt(parts.size)
      parts.foreach { case (p, err) => buf.putInt(p); buf.putShort(err) }
    }
  }

  final case class OffsetFetchRequest(group: String,
                                      topics: Seq[(String, Seq[Int])])

  /** OffsetFetch v1: group [topic [partition]]. */
  def readOffsetFetch(buf: ByteBuffer): OffsetFetchRequest = {
    val group = readString(buf)
    val topics = (0 until buf.getInt).map { _ =>
      val t = readString(buf)
      val parts = (0 until buf.getInt).map(_ => buf.getInt)
      t -> parts
    }
    OffsetFetchRequest(group, topics)
  }

  def writeOffsetFetch(buf: ByteBuffer, r: OffsetFetchRequest): Unit = {
    writeString(buf, r.group)
    buf.putInt(r.topics.size)
    r.topics.foreach { case (t, parts) =>
      writeString(buf, t)
      buf.putInt(parts.size)
      parts.foreach(buf.putInt)
    }
  }

  /** OffsetFetch v1 response: [topic [partition offset metadata error]]. */
  def writeOffsetFetchResponse(buf: ByteBuffer,
                               results: Seq[(String, Seq[(Int, Long)])]): Unit = {
    buf.putInt(results.size)
    results.foreach { case (t, parts) =>
      writeString(buf, t)
      buf.putInt(parts.size)
      parts.foreach { case (p, off) =>
        buf.putInt(p)
        buf.putLong(off)
        writeString(buf, "")
        buf.putShort(0)
      }
    }
  }

  /** ApiVersions v0 response: error [api_key min max] */
  def writeApiVersionsResponse(buf: ByteBuffer): Unit = {
    buf.putShort(0)
    val supported = Seq((0, 3, 3), (1, 4, 4), (2, 1, 1), (3, 1, 1),
      (8, 2, 2), (9, 1, 1), (18, 0, 0))
    buf.putInt(supported.size)
    supported.foreach { case (k, lo, hi) =>
      buf.putShort(k.toShort)
      buf.putShort(lo.toShort)
      buf.putShort(hi.toShort)
    }
  }

  /** Metadata v1 response: [broker] controller_id [topic]. */
  def writeMetadataResponse(buf: ByteBuffer, host: String, port: Int,
                            topics: Seq[(String, Int)]): Unit = {
    buf.putInt(1) // one broker
    buf.putInt(0) // node_id
    writeString(buf, host)
    buf.putInt(port)
    writeString(buf, null) // rack
    buf.putInt(0) // controller id
    buf.putInt(topics.size)
    topics.foreach { case (t, nParts) =>
      buf.putShort(0) // error
      writeString(buf, t)
      buf.put(0: Byte) // is_internal
      buf.putInt(nParts)
      (0 until nParts).foreach { p =>
        buf.putShort(0) // error
        buf.putInt(p)   // partition
        buf.putInt(0)   // leader
        buf.putInt(1)   // replicas
        buf.putInt(0)
        buf.putInt(1)   // isr
        buf.putInt(0)
      }
    }
  }

  /** Produce v3 response: [topic [partition error base_offset log_append_time]] throttle. */
  def writeProduceResponse(buf: ByteBuffer,
                           results: Seq[(String, Seq[(Int, Short, Long)])]): Unit = {
    buf.putInt(results.size)
    results.foreach { case (topic, parts) =>
      writeString(buf, topic)
      buf.putInt(parts.size)
      parts.foreach { case (p, err, baseOffset) =>
        buf.putInt(p)
        buf.putShort(err)
        buf.putLong(baseOffset)
        buf.putLong(-1L) // log_append_time
      }
    }
    buf.putInt(0) // throttle
  }

  final case class FetchPartResult(partition: Int, error: Short,
                                   highWatermark: Long, lastStable: Long,
                                   records: Array[Byte])

  /** Fetch v4 response: throttle [topic [partition error hw lso
    * [aborted] records]].
    */
  def writeFetchResponse(buf: ByteBuffer,
                         results: Seq[(String, Seq[FetchPartResult])]): Unit = {
    buf.putInt(0) // throttle
    buf.putInt(results.size)
    results.foreach { case (topic, parts) =>
      writeString(buf, topic)
      buf.putInt(parts.size)
      parts.foreach { r =>
        buf.putInt(r.partition)
        buf.putShort(r.error)
        buf.putLong(r.highWatermark)
        buf.putLong(r.lastStable)
        buf.putInt(0) // aborted transactions: none in this slice
        writeBytes(buf, r.records)
      }
    }
  }
}
