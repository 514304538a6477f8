package graft.facade

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Kafka wire-protocol codec for the 26 APIs the facade serves —
  * hand-written counterpart of the reference's codegen'd ser/de
  * (`nisshi-sans-io/src/ser.rs`, `de.rs`, driven by the 185 protocol
  * JSONs in `nisshi-sans-io/message/`). Every version ApiVersions
  * advertises ([[SupportedApis]]) is actually encoded/decoded:
  *
  *  - Produce v3-v9 (api_key 0) — v3-v8 classic, v9 flexible; record
  *    batches as magic-v2 bytes; log_start_offset (v5+) and
  *    record_errors (v8+) response fields
  *  - Fetch v4-v12 (1) — v4-v11 classic (session fields v7+, leader
  *    epochs v9+, rack v11), v12 flexible; aborted-txn lists on all
  *  - Metadata v1-v9 (3) — cluster_id (v2+), throttle (v3+), offline
  *    replicas (v5+), leader epoch (v7+), authorized-ops (v8+), v9
  *    flexible; per-topic error codes
  *  - ApiVersions v0-v3 (18) — v3 flexible, >max downgrade dance
  *  - ListOffsets v1 (2); OffsetCommit v0-v8 (8) and OffsetFetch v0-v7
  *    (9) — flexible at v8/v6+, null topic array = all group offsets
  *  - FindCoordinator v0-v3 (10), JoinGroup v0-v6 (11), Heartbeat v0-v4
  *    (12), LeaveGroup v0-v4 (13, batched v3+), SyncGroup v0-v4 (14) —
  *    flexible endpoints, group_instance_id fields parsed, with
  *    ConsumerProtocol Subscription/Assignment v0 payload codecs
  *  - DescribeGroups v0 (15), ListGroups v0 (16), SaslHandshake v1 (17),
  *    CreateTopics v0 (19), DeleteTopics v0 (20), DeleteRecords v0 (21)
  *  - InitProducerId v0 (22), AddPartitionsToTxn v0 (24), EndTxn v0
  *    (26), TxnOffsetCommit v0 (28), DescribeConfigs v0 (32),
  *    SaslAuthenticate v0 (36), DeleteGroups v0 (42), OffsetDelete v0
  *    (47)
  *
  * Frames are INT32 length-prefixed; request header v1 classic, v2
  * (tagged fields) for flexible versions — see [[isFlexible]].
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

  // ------------------------------------------- flexible-version primitives

  import graft.functions.Varint.{readUnsignedVarint, writeUnsignedVarint}

  /** Compact (nullable) string: uvarint of length+1, 0 = null. */
  def readCompactString(buf: ByteBuffer): String = {
    val n = readUnsignedVarint(buf) - 1
    if (n < 0) null
    else {
      val a = new Array[Byte](n)
      buf.get(a)
      new String(a, StandardCharsets.UTF_8)
    }
  }

  def writeCompactString(buf: ByteBuffer, s: String): Unit =
    if (s == null) writeUnsignedVarint(0, buf)
    else {
      val a = s.getBytes(StandardCharsets.UTF_8)
      writeUnsignedVarint(a.length + 1, buf)
      buf.put(a)
      ()
    }

  /** Compact array length: uvarint of count+1, 0 = null array. */
  def readCompactArrayLen(buf: ByteBuffer): Int = readUnsignedVarint(buf) - 1
  def writeCompactArrayLen(buf: ByteBuffer, n: Int): Unit =
    writeUnsignedVarint(n + 1, buf)

  /** Tagged fields: skip unknown tags (forward compatibility — the whole
    * point of the flexible encoding). Count, then per field tag + size +
    * payload, all uvarints.
    */
  def skipTaggedFields(buf: ByteBuffer): Unit = {
    val n = readUnsignedVarint(buf)
    (0 until n).foreach { _ =>
      readUnsignedVarint(buf) // tag
      val size = readUnsignedVarint(buf)
      buf.position(buf.position() + size)
    }
  }

  def writeEmptyTaggedFields(buf: ByteBuffer): Unit =
    writeUnsignedVarint(0, buf)

  /** Per-version primitive selector: one codec body serves a whole
    * version range — flexible versions use the compact encodings and
    * carry tagged-field blocks, classic versions the fixed-width ones
    * (the same split the reference's codegen derives per version from
    * each protocol JSON, `nisshi-sans-io/build.rs:1336`).
    */
  private[facade] final class Codec(val flexible: Boolean) {
    def str(buf: ByteBuffer): String =
      if (flexible) readCompactString(buf) else readString(buf)
    def putStr(buf: ByteBuffer, s: String): Unit =
      if (flexible) writeCompactString(buf, s) else writeString(buf, s)
    def bytes(buf: ByteBuffer): Array[Byte] =
      if (flexible) readCompactBytes(buf) else readBytes(buf)
    def putBytes(buf: ByteBuffer, a: Array[Byte]): Unit =
      if (flexible) writeCompactBytes(buf, a) else writeBytes(buf, a)
    def len(buf: ByteBuffer): Int =
      if (flexible) readCompactArrayLen(buf) else buf.getInt
    def putLen(buf: ByteBuffer, n: Int): Unit =
      if (flexible) writeCompactArrayLen(buf, n) else { buf.putInt(n); () }
    def tags(buf: ByteBuffer): Unit = if (flexible) skipTaggedFields(buf)
    def putTags(buf: ByteBuffer): Unit =
      if (flexible) writeEmptyTaggedFields(buf)
  }

  /** Which (api, version) pairs this facade serves with the flexible
    * encoding (compact strings/arrays, tagged fields, request header v2).
    */
  def isFlexible(apiKey: Short, apiVersion: Short): Boolean =
    (apiKey.toInt, apiVersion.toInt) match {
      case (18, v) => v >= 3 // ApiVersions
      case (3, v) => v >= 9  // Metadata
      case (0, v) => v >= 9  // Produce
      case (1, v) => v >= 12 // Fetch
      case (8, v) => v >= 8  // OffsetCommit
      case (9, v) => v >= 6  // OffsetFetch
      case (10, v) => v >= 3 // FindCoordinator
      case (11, v) => v >= 6 // JoinGroup
      case (12, v) => v >= 4 // Heartbeat
      case (13, v) => v >= 4 // LeaveGroup
      case (14, v) => v >= 4 // SyncGroup
      case _ => false
    }

  /** Request header: v1 (classic) or v2 (flexible — same fields, then
    * tagged fields; client_id stays a classic nullable string, a protocol
    * quirk). The api key/version decide which one the client sent.
    */
  def readHeader(buf: ByteBuffer): RequestHeader = {
    val h = RequestHeader(buf.getShort, buf.getShort, buf.getInt, readString(buf))
    if (isFlexible(h.apiKey, h.apiVersion)) skipTaggedFields(buf)
    h
  }

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
  /** sessionEpoch -1 = sessionless (the pre-KIP-227 behavior); 0 = full
    * fetch that establishes a session; n+1 = incremental fetch on
    * sessionId where `topics` carries only adds/updates and `forgotten`
    * carries removals.
    */
  final case class FetchRequest(maxWaitMs: Int, minBytes: Int, maxBytes: Int,
                                isolation: Byte, topics: Seq[FetchTopic],
                                sessionId: Int = 0, sessionEpoch: Int = -1,
                                forgotten: Seq[(String, Seq[Int])] = Nil)

  /** Classic Fetch request, v4-v11 (FetchRequest.json layout): replica_id
    * max_wait min_bytes max_bytes isolation session(v7+) [topic
    * [partition current_leader_epoch(v9+) fetch_offset log_start(v5+)
    * partition_max_bytes]] forgotten(v7+) rack_id(v11).
    */
  def readFetch(buf: ByteBuffer, version: Int = 4): FetchRequest = {
    buf.getInt // replica_id
    val maxWait = buf.getInt
    val minBytes = buf.getInt
    val maxBytes = buf.getInt
    val isolation = buf.get()
    val (sid, sep) =
      if (version >= 7) (buf.getInt, buf.getInt) else (0, -1)
    val topics = (0 until buf.getInt).map { _ =>
      val t = readString(buf)
      val parts = (0 until buf.getInt).map { _ =>
        val p = buf.getInt
        if (version >= 9) buf.getInt // current_leader_epoch
        val off = buf.getLong
        if (version >= 5) buf.getLong // log_start_offset (follower-only)
        FetchPartition(p, off, buf.getInt)
      }
      FetchTopic(t, parts)
    }
    val forgotten =
      if (version >= 7)
        (0 until buf.getInt).map { _ =>
          readString(buf) -> (0 until buf.getInt).map(_ => buf.getInt).toSeq
        }
      else Seq.empty
    if (version >= 11) readString(buf) // rack_id
    FetchRequest(maxWait, minBytes, maxBytes, isolation, topics,
      sid, sep, forgotten)
  }

  def writeFetch(buf: ByteBuffer, r: FetchRequest, version: Int = 4): Unit = {
    buf.putInt(-1)
    buf.putInt(r.maxWaitMs)
    buf.putInt(r.minBytes)
    buf.putInt(r.maxBytes)
    buf.put(r.isolation)
    if (version >= 7) { buf.putInt(r.sessionId); buf.putInt(r.sessionEpoch) }
    buf.putInt(r.topics.size)
    r.topics.foreach { t =>
      writeString(buf, t.topic)
      buf.putInt(t.partitions.size)
      t.partitions.foreach { p =>
        buf.putInt(p.partition)
        if (version >= 9) buf.putInt(-1) // current_leader_epoch
        buf.putLong(p.fetchOffset)
        if (version >= 5) buf.putLong(-1L) // log_start_offset
        buf.putInt(p.maxBytes)
      }
    }
    if (version >= 7) {
      buf.putInt(r.forgotten.size)
      r.forgotten.foreach { case (t, ps) =>
        writeString(buf, t)
        buf.putInt(ps.size); ps.foreach(buf.putInt)
      }
    }
    if (version >= 11) writeString(buf, "") // rack_id
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

  /** OffsetCommit v0-v8 (OffsetCommitRequest.json): group
    * generation+member (v1+) group_instance_id (v7+) retention_time
    * (v2-v4 only) [topic [partition offset commit_timestamp (v1 only)
    * leader_epoch (v6+) metadata]]; flexible v8.
    */
  def readOffsetCommit(buf: ByteBuffer, version: Int = 2): OffsetCommitRequest = {
    val c = new Codec(version >= 8)
    val group = c.str(buf)
    if (version >= 1) { buf.getInt; c.str(buf) } // generation, member
    if (version >= 7) c.str(buf) // group_instance_id
    if (version >= 2 && version <= 4) buf.getLong // retention_time
    val topics = (0 until c.len(buf)).map { _ =>
      val t = c.str(buf)
      val parts = (0 until c.len(buf)).map { _ =>
        val p = buf.getInt
        val off = buf.getLong
        if (version == 1) buf.getLong // commit_timestamp
        if (version >= 6) buf.getInt // committed_leader_epoch
        val meta = c.str(buf)
        c.tags(buf)
        CommitPartition(p, off, meta)
      }
      c.tags(buf)
      CommitTopic(t, parts)
    }
    c.tags(buf)
    OffsetCommitRequest(group, topics)
  }

  def writeOffsetCommit(buf: ByteBuffer, r: OffsetCommitRequest,
                        version: Int = 2): Unit = {
    val c = new Codec(version >= 8)
    c.putStr(buf, r.group)
    if (version >= 1) { buf.putInt(-1); c.putStr(buf, "") }
    if (version >= 7) c.putStr(buf, null)
    if (version >= 2 && version <= 4) buf.putLong(-1L)
    c.putLen(buf, r.topics.size)
    r.topics.foreach { t =>
      c.putStr(buf, t.topic)
      c.putLen(buf, t.partitions.size)
      t.partitions.foreach { p =>
        buf.putInt(p.partition)
        buf.putLong(p.offset)
        if (version == 1) buf.putLong(-1L)
        if (version >= 6) buf.putInt(-1)
        c.putStr(buf, p.metadata)
        c.putTags(buf)
      }
      c.putTags(buf)
    }
    c.putTags(buf)
  }

  /** OffsetCommit response: throttle (v3+) [topic [partition error]]. */
  def writeOffsetCommitResponse(buf: ByteBuffer,
                                results: Seq[(String, Seq[(Int, Short)])],
                                version: Int = 2): Unit = {
    val c = new Codec(version >= 8)
    if (version >= 3) buf.putInt(0) // throttle
    c.putLen(buf, results.size)
    results.foreach { case (t, parts) =>
      c.putStr(buf, t)
      c.putLen(buf, parts.size)
      parts.foreach { case (p, err) =>
        buf.putInt(p); buf.putShort(err); c.putTags(buf)
      }
      c.putTags(buf)
    }
    c.putTags(buf)
  }

  def readOffsetCommitResponse(buf: ByteBuffer,
                               version: Int = 2): Seq[(String, Seq[(Int, Short)])] = {
    val c = new Codec(version >= 8)
    if (version >= 3) buf.getInt // throttle
    val r = (0 until c.len(buf)).map { _ =>
      val t = c.str(buf)
      val parts = (0 until c.len(buf)).map { _ =>
        val p = (buf.getInt, buf.getShort); c.tags(buf); p
      }
      c.tags(buf)
      t -> parts
    }
    c.tags(buf)
    r
  }

  /** topics == null means "all topics the group has offsets for" (v2+). */
  final case class OffsetFetchRequest(group: String,
                                      topics: Seq[(String, Seq[Int])])

  /** OffsetFetch v0-v7 (OffsetFetchRequest.json): group [topic
    * [partition]] (array nullable v2+) require_stable (v7); flexible v6+.
    */
  def readOffsetFetch(buf: ByteBuffer, version: Int = 1): OffsetFetchRequest = {
    val c = new Codec(version >= 6)
    val group = c.str(buf)
    val n = c.len(buf)
    val topics =
      if (n < 0) null
      else (0 until n).map { _ =>
        val t = c.str(buf)
        val parts = (0 until c.len(buf)).map(_ => buf.getInt)
        c.tags(buf)
        t -> parts
      }
    if (version >= 7) buf.get // require_stable
    c.tags(buf)
    OffsetFetchRequest(group, topics)
  }

  def writeOffsetFetch(buf: ByteBuffer, r: OffsetFetchRequest,
                       version: Int = 1): Unit = {
    val c = new Codec(version >= 6)
    c.putStr(buf, r.group)
    if (r.topics == null) c.putLen(buf, -1)
    else {
      c.putLen(buf, r.topics.size)
      r.topics.foreach { case (t, parts) =>
        c.putStr(buf, t)
        c.putLen(buf, parts.size)
        parts.foreach(buf.putInt)
        c.putTags(buf)
      }
    }
    if (version >= 7) buf.put(0.toByte)
    c.putTags(buf)
  }

  /** OffsetFetch response: throttle (v3+) [topic [partition offset
    * leader_epoch (v5+) metadata error]] error (v2+).
    */
  def writeOffsetFetchResponse(buf: ByteBuffer,
                               results: Seq[(String, Seq[(Int, Long)])],
                               version: Int = 1): Unit = {
    val c = new Codec(version >= 6)
    if (version >= 3) buf.putInt(0) // throttle
    c.putLen(buf, results.size)
    results.foreach { case (t, parts) =>
      c.putStr(buf, t)
      c.putLen(buf, parts.size)
      parts.foreach { case (p, off) =>
        buf.putInt(p)
        buf.putLong(off)
        if (version >= 5) buf.putInt(-1) // leader_epoch
        c.putStr(buf, "")
        buf.putShort(0)
        c.putTags(buf)
      }
      c.putTags(buf)
    }
    if (version >= 2) buf.putShort(0) // top-level error
    c.putTags(buf)
  }

  def readOffsetFetchResponse(buf: ByteBuffer,
                              version: Int = 1): Seq[(String, Seq[(Int, Long)])] = {
    val c = new Codec(version >= 6)
    if (version >= 3) buf.getInt // throttle
    val r = (0 until c.len(buf)).map { _ =>
      val t = c.str(buf)
      val parts = (0 until c.len(buf)).map { _ =>
        val p = buf.getInt
        val off = buf.getLong
        if (version >= 5) buf.getInt
        c.str(buf) // metadata
        buf.getShort // error
        c.tags(buf)
        (p, off)
      }
      c.tags(buf)
      t -> parts
    }
    if (version >= 2) buf.getShort
    c.tags(buf)
    r
  }

  // ------------------------------------------- consumer protocol payloads

  /** ConsumerProtocol Subscription v0: version [topics] user_data —
    * the opaque `metadata` bytes inside JoinGroup protocols.
    * Sizing uses UTF-8 byte length, not char count (multi-byte topic
    * names would otherwise overflow the buffer).
    */
  def encodeSubscription(topics: Seq[String]): Array[Byte] = {
    val buf = ByteBuffer.allocate(
      64 + topics.map(_.getBytes(StandardCharsets.UTF_8).length + 8).sum)
    buf.putShort(0)
    buf.putInt(topics.size)
    topics.foreach(writeString(buf, _))
    buf.putInt(-1) // user_data
    buf.flip()
    val a = new Array[Byte](buf.remaining()); buf.get(a); a
  }

  def decodeSubscriptionTopics(metadata: Array[Byte]): Seq[String] = {
    val buf = ByteBuffer.wrap(metadata)
    buf.getShort // version
    (0 until buf.getInt).map(_ => readString(buf))
  }

  /** ConsumerProtocol Assignment v0: version [topic [partition]] user_data. */
  def encodeAssignment(parts: Seq[(String, Seq[Int])]): Array[Byte] = {
    val buf = ByteBuffer.allocate(64 + parts.map { case (t, ps) =>
      t.getBytes(StandardCharsets.UTF_8).length + 8 + 4 * ps.size }.sum)
    buf.putShort(0)
    buf.putInt(parts.size)
    parts.foreach { case (t, ps) =>
      writeString(buf, t)
      buf.putInt(ps.size)
      ps.foreach(buf.putInt)
    }
    buf.putInt(-1) // user_data
    buf.flip()
    val a = new Array[Byte](buf.remaining()); buf.get(a); a
  }

  def decodeAssignment(bytes: Array[Byte]): Seq[(String, Seq[Int])] = {
    val buf = ByteBuffer.wrap(bytes)
    buf.getShort
    (0 until buf.getInt).map { _ =>
      val t = readString(buf)
      t -> (0 until buf.getInt).map(_ => buf.getInt)
    }
  }

  // ------------------------------------------------ group membership APIs

  final case class JoinProtocol(name: String, metadata: Array[Byte])
  final case class JoinGroupRequest(group: String, sessionTimeoutMs: Int,
                                    memberId: String, protocolType: String,
                                    protocols: Seq[JoinProtocol])

  /** JoinGroup v0-v6 (JoinGroupRequest.json): group session_timeout
    * rebalance_timeout (v1+) member_id group_instance_id (v5+)
    * protocol_type [protocol_name metadata]; flexible v6.
    */
  def readJoinGroup(buf: ByteBuffer, version: Int = 0): JoinGroupRequest = {
    val c = new Codec(version >= 6)
    val group = c.str(buf)
    val timeout = buf.getInt
    if (version >= 1) buf.getInt // rebalance_timeout
    val member = c.str(buf)
    if (version >= 5) c.str(buf) // group_instance_id
    val ptype = c.str(buf)
    val protocols = (0 until c.len(buf)).map { _ =>
      val p = JoinProtocol(c.str(buf), c.bytes(buf))
      c.tags(buf)
      p
    }
    c.tags(buf)
    JoinGroupRequest(group, timeout, member, ptype, protocols)
  }

  def writeJoinGroup(buf: ByteBuffer, r: JoinGroupRequest,
                     version: Int = 0): Unit = {
    val c = new Codec(version >= 6)
    c.putStr(buf, r.group)
    buf.putInt(r.sessionTimeoutMs)
    if (version >= 1) buf.putInt(r.sessionTimeoutMs * 2)
    c.putStr(buf, r.memberId)
    if (version >= 5) c.putStr(buf, null)
    c.putStr(buf, r.protocolType)
    c.putLen(buf, r.protocols.size)
    r.protocols.foreach { p =>
      c.putStr(buf, p.name)
      c.putBytes(buf, p.metadata)
      c.putTags(buf)
    }
    c.putTags(buf)
  }

  /** JoinGroup response: throttle (v2+) error generation protocol leader
    * member_id [member_id group_instance_id (v5+) metadata] (members only
    * populated for the leader).
    */
  def writeJoinGroupResponse(buf: ByteBuffer, error: Short, generation: Int,
                             protocol: String, leader: String, memberId: String,
                             members: Seq[(String, Array[Byte])],
                             version: Int = 0): Unit = {
    val c = new Codec(version >= 6)
    if (version >= 2) buf.putInt(0) // throttle
    buf.putShort(error)
    buf.putInt(generation)
    c.putStr(buf, protocol)
    c.putStr(buf, leader)
    c.putStr(buf, memberId)
    c.putLen(buf, members.size)
    members.foreach { case (m, meta) =>
      c.putStr(buf, m)
      if (version >= 5) c.putStr(buf, null) // group_instance_id
      c.putBytes(buf, meta)
      c.putTags(buf)
    }
    c.putTags(buf)
  }

  final case class JoinGroupResult(error: Short, generation: Int,
                                   protocol: String, leader: String,
                                   memberId: String,
                                   members: Seq[(String, Array[Byte])])

  def readJoinGroupResponse(buf: ByteBuffer, version: Int = 0): JoinGroupResult = {
    val c = new Codec(version >= 6)
    if (version >= 2) buf.getInt // throttle
    val error = buf.getShort
    val gen = buf.getInt
    val protocol = c.str(buf)
    val leader = c.str(buf)
    val member = c.str(buf)
    val members = (0 until c.len(buf)).map { _ =>
      val m = c.str(buf)
      if (version >= 5) c.str(buf)
      val meta = c.bytes(buf)
      c.tags(buf)
      m -> meta
    }
    c.tags(buf)
    JoinGroupResult(error, gen, protocol, leader, member, members)
  }

  final case class SyncGroupRequest(group: String, generation: Int,
                                    memberId: String,
                                    assignments: Seq[(String, Array[Byte])])

  /** SyncGroup v0-v4 (SyncGroupRequest.json): group generation member
    * group_instance_id (v3+) [member_id assignment]; flexible v4.
    */
  def readSyncGroup(buf: ByteBuffer, version: Int = 0): SyncGroupRequest = {
    val c = new Codec(version >= 4)
    val group = c.str(buf)
    val gen = buf.getInt
    val member = c.str(buf)
    if (version >= 3) c.str(buf) // group_instance_id
    val assignments = (0 until c.len(buf)).map { _ =>
      val a = c.str(buf) -> c.bytes(buf)
      c.tags(buf)
      a
    }
    c.tags(buf)
    SyncGroupRequest(group, gen, member, assignments)
  }

  def writeSyncGroup(buf: ByteBuffer, r: SyncGroupRequest,
                     version: Int = 0): Unit = {
    val c = new Codec(version >= 4)
    c.putStr(buf, r.group)
    buf.putInt(r.generation)
    c.putStr(buf, r.memberId)
    if (version >= 3) c.putStr(buf, null)
    c.putLen(buf, r.assignments.size)
    r.assignments.foreach { case (m, a) =>
      c.putStr(buf, m)
      c.putBytes(buf, a)
      c.putTags(buf)
    }
    c.putTags(buf)
  }

  /** SyncGroup response: throttle (v1+) error assignment_bytes. */
  def writeSyncGroupResponse(buf: ByteBuffer, error: Short,
                             assignment: Array[Byte],
                             version: Int = 0): Unit = {
    val c = new Codec(version >= 4)
    if (version >= 1) buf.putInt(0) // throttle
    buf.putShort(error)
    c.putBytes(buf, assignment)
    c.putTags(buf)
  }

  def readSyncGroupResponse(buf: ByteBuffer,
                            version: Int = 0): (Short, Array[Byte]) = {
    val c = new Codec(version >= 4)
    if (version >= 1) buf.getInt
    val r = (buf.getShort, c.bytes(buf))
    c.tags(buf)
    r
  }

  /** Heartbeat v0-v4 (HeartbeatRequest.json): group generation member
    * group_instance_id (v3+) → throttle (v1+) error; flexible v4.
    */
  def readHeartbeat(buf: ByteBuffer, version: Int = 0): (String, Int, String) = {
    val c = new Codec(version >= 4)
    val r = (c.str(buf), buf.getInt, c.str(buf))
    if (version >= 3) c.str(buf)
    c.tags(buf)
    r
  }

  def writeHeartbeat(buf: ByteBuffer, group: String, generation: Int,
                     memberId: String, version: Int = 0): Unit = {
    val c = new Codec(version >= 4)
    c.putStr(buf, group)
    buf.putInt(generation)
    c.putStr(buf, memberId)
    if (version >= 3) c.putStr(buf, null)
    c.putTags(buf)
  }

  /** Error-only response body (Heartbeat, LeaveGroup ≤v2). */
  def writeErrorResponse(buf: ByteBuffer, error: Short, version: Int,
                         flexible: Boolean, throttleFrom: Int = 1): Unit = {
    if (version >= throttleFrom) buf.putInt(0) // throttle
    buf.putShort(error)
    if (flexible) writeEmptyTaggedFields(buf)
  }

  def readErrorResponse(buf: ByteBuffer, version: Int, flexible: Boolean,
                        throttleFrom: Int = 1): Short = {
    if (version >= throttleFrom) buf.getInt
    val e = buf.getShort
    if (flexible) skipTaggedFields(buf)
    e
  }

  /** LeaveGroup v0-v4 (LeaveGroupRequest.json): group member (≤v2) /
    * [member_id group_instance_id] (v3+, batched); flexible v4.
    */
  def readLeaveGroup(buf: ByteBuffer, version: Int = 0): (String, Seq[String]) = {
    val c = new Codec(version >= 4)
    val group = c.str(buf)
    val members =
      if (version < 3) Seq(c.str(buf))
      else (0 until c.len(buf)).map { _ =>
        val m = c.str(buf)
        c.str(buf) // group_instance_id
        c.tags(buf)
        m
      }
    c.tags(buf)
    (group, members)
  }

  def writeLeaveGroup(buf: ByteBuffer, group: String, memberId: String,
                      version: Int = 0): Unit =
    writeLeaveGroupBatch(buf, group, Seq(memberId), version)

  def writeLeaveGroupBatch(buf: ByteBuffer, group: String,
                           members: Seq[String], version: Int = 0): Unit = {
    val c = new Codec(version >= 4)
    c.putStr(buf, group)
    if (version < 3) c.putStr(buf, members.head)
    else {
      c.putLen(buf, members.size)
      members.foreach { m =>
        c.putStr(buf, m)
        c.putStr(buf, null)
        c.putTags(buf)
      }
    }
    c.putTags(buf)
  }

  /** LeaveGroup response: throttle (v1+) error [member_id
    * group_instance_id error] (v3+).
    */
  def writeLeaveGroupResponse(buf: ByteBuffer,
                              results: Seq[(String, Short)],
                              version: Int = 0): Unit = {
    val c = new Codec(version >= 4)
    if (version >= 1) buf.putInt(0)
    buf.putShort(results.collectFirst { case (_, e) if e != 0 => e }.getOrElse(0))
    if (version >= 3) {
      c.putLen(buf, results.size)
      results.foreach { case (m, e) =>
        c.putStr(buf, m)
        c.putStr(buf, null)
        buf.putShort(e)
        c.putTags(buf)
      }
    }
    c.putTags(buf)
  }

  def readLeaveGroupResponse(buf: ByteBuffer,
                             version: Int = 0): (Short, Seq[(String, Short)]) = {
    val c = new Codec(version >= 4)
    if (version >= 1) buf.getInt
    val top = buf.getShort
    val members =
      if (version < 3) Nil
      else (0 until c.len(buf)).map { _ =>
        val m = c.str(buf); c.str(buf)
        val e = buf.getShort
        c.tags(buf)
        m -> e
      }
    c.tags(buf)
    (top, members)
  }

  /** FindCoordinator v0-v3 (FindCoordinatorRequest.json): key key_type
    * (v1+) → throttle (v1+) error error_message (v1+) node_id host port;
    * flexible v3.
    */
  def readFindCoordinator(buf: ByteBuffer, version: Int = 0): String = {
    val c = new Codec(version >= 3)
    val key = c.str(buf)
    if (version >= 1) buf.get // key_type
    c.tags(buf)
    key
  }

  def writeFindCoordinator(buf: ByteBuffer, key: String,
                           version: Int = 0): Unit = {
    val c = new Codec(version >= 3)
    c.putStr(buf, key)
    if (version >= 1) buf.put(0.toByte)
    c.putTags(buf)
  }

  def writeFindCoordinatorResponse(buf: ByteBuffer, error: Short, nodeId: Int,
                                   host: String, port: Int,
                                   version: Int = 0): Unit = {
    val c = new Codec(version >= 3)
    if (version >= 1) buf.putInt(0) // throttle
    buf.putShort(error)
    if (version >= 1) c.putStr(buf, null) // error_message
    buf.putInt(nodeId)
    c.putStr(buf, host)
    buf.putInt(port)
    c.putTags(buf)
  }

  def readFindCoordinatorResponse(buf: ByteBuffer,
                                  version: Int = 0): (Short, Int, String, Int) = {
    val c = new Codec(version >= 3)
    if (version >= 1) buf.getInt
    val e = buf.getShort
    if (version >= 1) c.str(buf)
    val r = (e, buf.getInt, c.str(buf), buf.getInt)
    c.tags(buf)
    r
  }

  // ------------------------------------------------- topic lifecycle APIs

  final case class CreateTopic(name: String, numPartitions: Int,
                               replicationFactor: Short,
                               configs: Map[String, String])

  /** CreateTopics v0: [name num_partitions replication_factor
    * [partition [broker]] [config_key config_value]] timeout.
    */
  def readCreateTopics(buf: ByteBuffer): Seq[CreateTopic] = {
    val topics = (0 until buf.getInt).map { _ =>
      val name = readString(buf)
      val nParts = buf.getInt
      val rf = buf.getShort
      (0 until buf.getInt).foreach { _ =>
        buf.getInt // partition
        (0 until buf.getInt).foreach(_ => buf.getInt) // replicas
      }
      val configs = (0 until buf.getInt).map { _ =>
        readString(buf) -> readString(buf)
      }.toMap
      CreateTopic(name, nParts, rf, configs)
    }
    buf.getInt // timeout_ms
    topics
  }

  def writeCreateTopics(buf: ByteBuffer, topics: Seq[CreateTopic],
                        timeoutMs: Int): Unit = {
    buf.putInt(topics.size)
    topics.foreach { t =>
      writeString(buf, t.name)
      buf.putInt(t.numPartitions)
      buf.putShort(t.replicationFactor)
      buf.putInt(0) // no manual replica assignments
      buf.putInt(t.configs.size)
      t.configs.foreach { case (k, v) =>
        writeString(buf, k)
        writeString(buf, v)
      }
    }
    buf.putInt(timeoutMs)
  }

  /** DeleteTopics v0: [name] timeout. */
  def readDeleteTopics(buf: ByteBuffer): Seq[String] = {
    val names = (0 until buf.getInt).map(_ => readString(buf))
    buf.getInt // timeout_ms
    names
  }

  def writeDeleteTopics(buf: ByteBuffer, names: Seq[String], timeoutMs: Int): Unit = {
    buf.putInt(names.size)
    names.foreach(writeString(buf, _))
    buf.putInt(timeoutMs)
  }

  /** CreateTopics/DeleteTopics v0 response: [name error]. */
  def writeTopicErrorsResponse(buf: ByteBuffer, results: Seq[(String, Short)]): Unit = {
    buf.putInt(results.size)
    results.foreach { case (n, e) =>
      writeString(buf, n)
      buf.putShort(e)
    }
  }

  // -------------------------------------------------------- txn wire APIs

  /** InitProducerId v0: transactional_id transaction_timeout →
    * throttle error producer_id producer_epoch.
    */
  def readInitProducerId(buf: ByteBuffer): (String, Int) =
    (readString(buf), buf.getInt)

  def writeInitProducerId(buf: ByteBuffer, txnId: String, timeoutMs: Int): Unit = {
    writeString(buf, txnId)
    buf.putInt(timeoutMs)
  }

  def writeInitProducerIdResponse(buf: ByteBuffer, error: Short,
                                  producerId: Long, epoch: Short): Unit = {
    buf.putInt(0) // throttle
    buf.putShort(error)
    buf.putLong(producerId)
    buf.putShort(epoch)
  }

  final case class AddPartitionsToTxnRequest(txnId: String, producerId: Long,
                                             epoch: Short,
                                             topics: Seq[(String, Seq[Int])])

  /** AddPartitionsToTxn v0: txn_id producer_id epoch [topic [partition]]. */
  def readAddPartitionsToTxn(buf: ByteBuffer): AddPartitionsToTxnRequest = {
    val txn = readString(buf)
    val pid = buf.getLong
    val epoch = buf.getShort
    val topics = (0 until buf.getInt).map { _ =>
      readString(buf) -> (0 until buf.getInt).map(_ => buf.getInt)
    }
    AddPartitionsToTxnRequest(txn, pid, epoch, topics)
  }

  def writeAddPartitionsToTxn(buf: ByteBuffer, r: AddPartitionsToTxnRequest): Unit = {
    writeString(buf, r.txnId)
    buf.putLong(r.producerId)
    buf.putShort(r.epoch)
    buf.putInt(r.topics.size)
    r.topics.foreach { case (t, ps) =>
      writeString(buf, t)
      buf.putInt(ps.size)
      ps.foreach(buf.putInt)
    }
  }

  /** AddPartitionsToTxn v0 response: throttle [topic [partition error]]. */
  def writeAddPartitionsToTxnResponse(buf: ByteBuffer,
                                      results: Seq[(String, Seq[(Int, Short)])]): Unit = {
    buf.putInt(0) // throttle
    buf.putInt(results.size)
    results.foreach { case (t, parts) =>
      writeString(buf, t)
      buf.putInt(parts.size)
      parts.foreach { case (p, e) => buf.putInt(p); buf.putShort(e) }
    }
  }

  /** EndTxn v0: txn_id producer_id epoch committed → throttle error. */
  def readEndTxn(buf: ByteBuffer): (String, Long, Short, Boolean) =
    (readString(buf), buf.getLong, buf.getShort, buf.get() != 0)

  def writeEndTxn(buf: ByteBuffer, txnId: String, producerId: Long,
                  epoch: Short, committed: Boolean): Unit = {
    writeString(buf, txnId)
    buf.putLong(producerId)
    buf.putShort(epoch)
    buf.put(if (committed) 1: Byte else 0: Byte)
  }

  def writeEndTxnResponse(buf: ByteBuffer, error: Short): Unit = {
    buf.putInt(0) // throttle
    buf.putShort(error)
  }

  final case class TxnOffsetCommitRequest(txnId: String, group: String,
                                          producerId: Long, epoch: Short,
                                          topics: Seq[(String, Seq[(Int, Long)])])

  /** TxnOffsetCommit v0: txn_id group producer_id epoch
    * [topic [partition offset metadata]] — consumer offsets staged inside
    * the transaction (EOS consume-transform-produce).
    */
  def readTxnOffsetCommit(buf: ByteBuffer): TxnOffsetCommitRequest = {
    val txn = readString(buf)
    val group = readString(buf)
    val pid = buf.getLong
    val epoch = buf.getShort
    val topics = (0 until buf.getInt).map { _ =>
      val t = readString(buf)
      val parts = (0 until buf.getInt).map { _ =>
        val p = buf.getInt
        val off = buf.getLong
        readString(buf) // metadata
        p -> off
      }
      t -> parts
    }
    TxnOffsetCommitRequest(txn, group, pid, epoch, topics)
  }

  def writeTxnOffsetCommit(buf: ByteBuffer, r: TxnOffsetCommitRequest): Unit = {
    writeString(buf, r.txnId)
    writeString(buf, r.group)
    buf.putLong(r.producerId)
    buf.putShort(r.epoch)
    buf.putInt(r.topics.size)
    r.topics.foreach { case (t, parts) =>
      writeString(buf, t)
      buf.putInt(parts.size)
      parts.foreach { case (p, off) =>
        buf.putInt(p)
        buf.putLong(off)
        writeString(buf, null)
      }
    }
  }

  /** TxnOffsetCommit v0 response: throttle [topic [partition error]]. */
  def writeTxnOffsetCommitResponse(buf: ByteBuffer,
                                   results: Seq[(String, Seq[(Int, Short)])]): Unit = {
    buf.putInt(0) // throttle
    buf.putInt(results.size)
    results.foreach { case (t, parts) =>
      writeString(buf, t)
      buf.putInt(parts.size)
      parts.foreach { case (p, e) => buf.putInt(p); buf.putShort(e) }
    }
  }

  // ---------------------------------------------------------- SASL (F9)

  /** SaslHandshake v1 (17): mechanism → error [enabled mechanisms]. */
  def readSaslHandshake(buf: ByteBuffer): String = readString(buf)
  def writeSaslHandshake(buf: ByteBuffer, mechanism: String): Unit =
    writeString(buf, mechanism)

  def writeSaslHandshakeResponse(buf: ByteBuffer, error: Short,
                                 mechanisms: Seq[String]): Unit = {
    buf.putShort(error)
    buf.putInt(mechanisms.size)
    mechanisms.foreach(writeString(buf, _))
  }

  /** SaslAuthenticate v0 (36): auth bytes → error, message, auth bytes. */
  def readSaslAuthenticate(buf: ByteBuffer): Array[Byte] = readBytes(buf)
  def writeSaslAuthenticate(buf: ByteBuffer, bytes: Array[Byte]): Unit =
    writeBytes(buf, bytes)

  def writeSaslAuthenticateResponse(buf: ByteBuffer, error: Short,
                                    message: String, bytes: Array[Byte]): Unit = {
    buf.putShort(error)
    writeString(buf, message)
    writeBytes(buf, bytes)
  }

  // ------------------------------------------------ admin/introspection

  /** DescribeGroups v0: [group_id] → [error group state protocol_type
    * protocol [member_id client_id client_host metadata assignment]].
    */
  def readDescribeGroups(buf: ByteBuffer): Seq[String] =
    (0 until buf.getInt).map(_ => readString(buf))

  def writeDescribeGroups(buf: ByteBuffer, groups: Seq[String]): Unit = {
    buf.putInt(groups.size)
    groups.foreach(writeString(buf, _))
  }

  final case class DescribedMember(memberId: String, metadata: Array[Byte],
                                   assignment: Array[Byte])
  final case class DescribedGroup(error: Short, group: String, state: String,
                                  protocolType: String, protocol: String,
                                  members: Seq[DescribedMember])

  def writeDescribeGroupsResponse(buf: ByteBuffer, groups: Seq[DescribedGroup]): Unit = {
    buf.putInt(groups.size)
    groups.foreach { g =>
      buf.putShort(g.error)
      writeString(buf, g.group)
      writeString(buf, g.state)
      writeString(buf, g.protocolType)
      writeString(buf, g.protocol)
      buf.putInt(g.members.size)
      g.members.foreach { m =>
        writeString(buf, m.memberId)
        writeString(buf, "") // client_id
        writeString(buf, "") // client_host
        writeBytes(buf, m.metadata)
        writeBytes(buf, m.assignment)
      }
    }
  }

  def readDescribeGroupsResponse(buf: ByteBuffer): Seq[DescribedGroup] =
    (0 until buf.getInt).map { _ =>
      val err = buf.getShort
      val group = readString(buf)
      val state = readString(buf)
      val ptype = readString(buf)
      val proto = readString(buf)
      val members = (0 until buf.getInt).map { _ =>
        val id = readString(buf)
        readString(buf); readString(buf)
        DescribedMember(id, readBytes(buf), readBytes(buf))
      }
      DescribedGroup(err, group, state, ptype, proto, members)
    }

  /** ListGroups v0: (empty) → error [group_id protocol_type]. */
  def writeListGroupsResponse(buf: ByteBuffer, groups: Seq[String]): Unit = {
    buf.putShort(0)
    buf.putInt(groups.size)
    groups.foreach { g =>
      writeString(buf, g)
      writeString(buf, "consumer")
    }
  }

  def readListGroupsResponse(buf: ByteBuffer): Seq[String] = {
    buf.getShort
    (0 until buf.getInt).map { _ =>
      val g = readString(buf)
      readString(buf) // protocol_type
      g
    }
  }

  /** DeleteRecords v0: [topic [partition offset]] timeout →
    * throttle [topic [partition low_watermark error]].
    */
  def readDeleteRecords(buf: ByteBuffer): Seq[(String, Seq[(Int, Long)])] = {
    val topics = (0 until buf.getInt).map { _ =>
      val t = readString(buf)
      t -> (0 until buf.getInt).map(_ => (buf.getInt, buf.getLong))
    }
    buf.getInt // timeout_ms
    topics
  }

  def writeDeleteRecords(buf: ByteBuffer, topics: Seq[(String, Seq[(Int, Long)])],
                         timeoutMs: Int): Unit = {
    buf.putInt(topics.size)
    topics.foreach { case (t, parts) =>
      writeString(buf, t)
      buf.putInt(parts.size)
      parts.foreach { case (p, off) => buf.putInt(p); buf.putLong(off) }
    }
    buf.putInt(timeoutMs)
  }

  def writeDeleteRecordsResponse(buf: ByteBuffer,
                                 results: Seq[(String, Seq[(Int, Long, Short)])]): Unit = {
    buf.putInt(0) // throttle
    buf.putInt(results.size)
    results.foreach { case (t, parts) =>
      writeString(buf, t)
      buf.putInt(parts.size)
      parts.foreach { case (p, lw, e) =>
        buf.putInt(p); buf.putLong(lw); buf.putShort(e)
      }
    }
  }

  def readDeleteRecordsResponse(buf: ByteBuffer): Seq[(String, Seq[(Int, Long, Short)])] = {
    buf.getInt // throttle
    (0 until buf.getInt).map { _ =>
      val t = readString(buf)
      t -> (0 until buf.getInt).map(_ => (buf.getInt, buf.getLong, buf.getShort))
    }
  }

  /** (api_key, min_version, max_version) triples this facade serves. */
  val SupportedApis: Seq[(Int, Int, Int)] = Seq(
    (0, 3, 9), (1, 4, 12), (2, 1, 1), (3, 1, 9),
    (8, 0, 8), (9, 0, 7), (10, 0, 3), (11, 0, 6), (12, 0, 4), (13, 0, 4),
    (14, 0, 4), (15, 0, 0), (16, 0, 0), (17, 1, 1), (18, 0, 3), (19, 0, 0),
    (20, 0, 0), (21, 0, 0), (22, 0, 0), (24, 0, 0), (26, 0, 0), (28, 0, 0),
    (32, 0, 0), (36, 0, 0), (42, 0, 0), (47, 0, 0))

  /** DeleteGroups v0 (42): [group] → throttle [group error]
    * (reference `nisshi-sans-io/message/DeleteGroupsRequest.json`).
    */
  def readDeleteGroups(buf: ByteBuffer): Seq[String] =
    (0 until buf.getInt).map(_ => readString(buf))

  def writeDeleteGroups(buf: ByteBuffer, groups: Seq[String]): Unit = {
    buf.putInt(groups.size)
    groups.foreach(writeString(buf, _))
  }

  def writeDeleteGroupsResponse(buf: ByteBuffer,
                                results: Seq[(String, Short)]): Unit = {
    buf.putInt(0) // throttle
    buf.putInt(results.size)
    results.foreach { case (g, e) => writeString(buf, g); buf.putShort(e) }
  }

  def readDeleteGroupsResponse(buf: ByteBuffer): Seq[(String, Short)] = {
    buf.getInt // throttle
    (0 until buf.getInt).map(_ => (readString(buf), buf.getShort))
  }

  /** OffsetDelete v0 (47): group [topic [partition]] →
    * error throttle [topic [partition error]] (reference
    * `nisshi-sans-io/message/OffsetDeleteRequest.json`).
    */
  def readOffsetDelete(buf: ByteBuffer): (String, Seq[(String, Seq[Int])]) = {
    val g = readString(buf)
    val topics = (0 until buf.getInt).map { _ =>
      val t = readString(buf)
      t -> (0 until buf.getInt).map(_ => buf.getInt)
    }
    (g, topics)
  }

  def writeOffsetDelete(buf: ByteBuffer, group: String,
                        topics: Seq[(String, Seq[Int])]): Unit = {
    writeString(buf, group)
    buf.putInt(topics.size)
    topics.foreach { case (t, parts) =>
      writeString(buf, t)
      buf.putInt(parts.size)
      parts.foreach(buf.putInt)
    }
  }

  def writeOffsetDeleteResponse(buf: ByteBuffer, error: Short,
                                results: Seq[(String, Seq[(Int, Short)])]): Unit = {
    buf.putShort(error)
    buf.putInt(0) // throttle
    buf.putInt(results.size)
    results.foreach { case (t, parts) =>
      writeString(buf, t)
      buf.putInt(parts.size)
      parts.foreach { case (p, e) => buf.putInt(p); buf.putShort(e) }
    }
  }

  def readOffsetDeleteResponse(buf: ByteBuffer): (Short, Seq[(String, Seq[(Int, Short)])]) = {
    val error = buf.getShort
    buf.getInt // throttle
    val topics = (0 until buf.getInt).map { _ =>
      val t = readString(buf)
      t -> (0 until buf.getInt).map(_ => (buf.getInt, buf.getShort))
    }
    (error, topics)
  }

  /** DescribeConfigs v0 (32): [resource_type resource_name [config_name]]
    * → throttle [error error_msg resource_type resource_name
    * [name value read_only is_default is_sensitive]].
    */
  def readDescribeConfigs(buf: ByteBuffer): Seq[(Byte, String, Option[Seq[String]])] =
    (0 until buf.getInt).map { _ =>
      val rt = buf.get()
      val name = readString(buf)
      val n = buf.getInt
      val keys = if (n < 0) None else Some((0 until n).map(_ => readString(buf)))
      (rt, name, keys)
    }

  def writeDescribeConfigs(buf: ByteBuffer,
                           resources: Seq[(Byte, String, Option[Seq[String]])]): Unit = {
    buf.putInt(resources.size)
    resources.foreach { case (rt, name, keys) =>
      buf.put(rt)
      writeString(buf, name)
      keys match {
        case None => buf.putInt(-1)
        case Some(ks) => buf.putInt(ks.size); ks.foreach(writeString(buf, _))
      }
    }
  }

  def writeDescribeConfigsResponse(
      buf: ByteBuffer,
      results: Seq[(Short, Byte, String, Seq[(String, String)])]): Unit = {
    buf.putInt(0) // throttle
    buf.putInt(results.size)
    results.foreach { case (err, rt, name, configs) =>
      buf.putShort(err)
      writeString(buf, null) // error_message
      buf.put(rt)
      writeString(buf, name)
      buf.putInt(configs.size)
      configs.foreach { case (k, v) =>
        writeString(buf, k)
        writeString(buf, v)
        buf.put(0: Byte) // read_only
        buf.put(0: Byte) // is_default
        buf.put(0: Byte) // is_sensitive
      }
    }
  }

  def readDescribeConfigsResponse(
      buf: ByteBuffer): Seq[(Short, Byte, String, Seq[(String, String)])] = {
    buf.getInt // throttle
    (0 until buf.getInt).map { _ =>
      val err = buf.getShort
      readString(buf)
      val rt = buf.get()
      val name = readString(buf)
      val configs = (0 until buf.getInt).map { _ =>
        val k = readString(buf)
        val v = readString(buf)
        buf.get(); buf.get(); buf.get()
        k -> v
      }
      (err, rt, name, configs)
    }
  }

  /** ApiVersions v0 response: error [api_key min max] */
  def writeApiVersionsResponse(buf: ByteBuffer, error: Short = 0): Unit = {
    buf.putShort(error)
    buf.putInt(SupportedApis.size)
    SupportedApis.foreach { case (k, lo, hi) =>
      buf.putShort(k.toShort)
      buf.putShort(lo.toShort)
      buf.putShort(hi.toShort)
    }
  }

  /** ApiVersions v3 request body: client software name/version (compact
    * strings) + tagged fields — identification only, read and skipped.
    */
  def readApiVersionsV3(buf: ByteBuffer): Unit =
    if (buf.hasRemaining) {
      readCompactString(buf)
      readCompactString(buf)
      skipTaggedFields(buf)
    }

  def writeApiVersionsV3(buf: ByteBuffer, name: String, version: String): Unit = {
    writeCompactString(buf, name)
    writeCompactString(buf, version)
    writeEmptyTaggedFields(buf)
  }

  /** ApiVersions v3 response (flexible): error, compact api array with
    * per-entry tagged fields, throttle, tagged fields. NOTE the protocol
    * quirk: the ApiVersions RESPONSE always uses header v0 (no header
    * tagged fields) so that clients can parse the error path before
    * versions are negotiated.
    */
  def writeApiVersionsResponseV3(buf: ByteBuffer): Unit = {
    buf.putShort(0)
    writeCompactArrayLen(buf, SupportedApis.size)
    SupportedApis.foreach { case (k, lo, hi) =>
      buf.putShort(k.toShort)
      buf.putShort(lo.toShort)
      buf.putShort(hi.toShort)
      writeEmptyTaggedFields(buf)
    }
    buf.putInt(0) // throttle_time_ms
    writeEmptyTaggedFields(buf)
  }

  def readApiVersionsResponseV3(buf: ByteBuffer): Seq[(Int, Int, Int)] = {
    val err = buf.getShort
    require(err == 0, s"ApiVersions error $err")
    val apis = (0 until readCompactArrayLen(buf)).map { _ =>
      val t = (buf.getShort.toInt, buf.getShort.toInt, buf.getShort.toInt)
      skipTaggedFields(buf)
      t
    }
    buf.getInt // throttle
    skipTaggedFields(buf)
    apis
  }

  /** Metadata v9 request: compact topic array (null = all), three bools
    * (auto-create, cluster/topic authorized-operations), tagged fields.
    * Returns the requested topic names, None = all.
    */
  def readMetadataV9(buf: ByteBuffer): Option[Seq[String]] = {
    val n = readCompactArrayLen(buf)
    val topics =
      if (n < 0) None
      else Some((0 until n).map { _ =>
        val t = readCompactString(buf)
        skipTaggedFields(buf)
        t
      })
    buf.get() // allow_auto_topic_creation
    buf.get() // include_cluster_authorized_operations
    buf.get() // include_topic_authorized_operations
    skipTaggedFields(buf)
    topics
  }

  def writeMetadataV9(buf: ByteBuffer, topics: Option[Seq[String]]): Unit = {
    topics match {
      case None => writeUnsignedVarint(0, buf)
      case Some(ts) =>
        writeCompactArrayLen(buf, ts.size)
        ts.foreach { t =>
          writeCompactString(buf, t)
          writeEmptyTaggedFields(buf)
        }
    }
    buf.put(0: Byte); buf.put(0: Byte); buf.put(0: Byte)
    writeEmptyTaggedFields(buf)
  }

  /** Metadata v9 response (flexible): throttle, compact broker array,
    * cluster_id, controller, compact topic array with leader epochs and
    * authorized-operations, tagged fields throughout.
    */
  def writeMetadataResponseV9(buf: ByteBuffer, host: String, port: Int,
                              topics: Seq[(String, Int, Short)]): Unit = {
    buf.putInt(0) // throttle
    writeCompactArrayLen(buf, 1)
    buf.putInt(0) // node_id
    writeCompactString(buf, host)
    buf.putInt(port)
    writeCompactString(buf, null) // rack
    writeEmptyTaggedFields(buf)
    writeCompactString(buf, "graft") // cluster_id
    buf.putInt(0) // controller_id
    writeCompactArrayLen(buf, topics.size)
    topics.foreach { case (t, nParts, err) =>
      buf.putShort(err)
      writeCompactString(buf, t)
      buf.put(0: Byte) // is_internal
      writeCompactArrayLen(buf, nParts)
      (0 until nParts).foreach { p =>
        buf.putShort(0) // error
        buf.putInt(p)
        buf.putInt(0) // leader
        buf.putInt(0) // leader_epoch
        writeCompactArrayLen(buf, 1); buf.putInt(0) // replicas
        writeCompactArrayLen(buf, 1); buf.putInt(0) // isr
        writeCompactArrayLen(buf, 0)                // offline replicas
        writeEmptyTaggedFields(buf)
      }
      buf.putInt(Int.MinValue) // topic_authorized_operations: null
      writeEmptyTaggedFields(buf)
    }
    buf.putInt(Int.MinValue) // cluster_authorized_operations: null
    writeEmptyTaggedFields(buf)
  }

  /** Compact (nullable) bytes: uvarint of length+1, 0 = null. */
  def readCompactBytes(buf: ByteBuffer): Array[Byte] = {
    val n = readUnsignedVarint(buf) - 1
    if (n < 0) null
    else {
      val a = new Array[Byte](n)
      buf.get(a)
      a
    }
  }

  def writeCompactBytes(buf: ByteBuffer, a: Array[Byte]): Unit =
    if (a == null) writeUnsignedVarint(0, buf)
    else {
      writeUnsignedVarint(a.length + 1, buf)
      buf.put(a)
      ()
    }

  /** Produce v9 (flexible) request: txn_id, acks, timeout, compact topic
    * array of compact partition arrays with compact-bytes record sets.
    */
  def readProduceV9(buf: ByteBuffer): ProduceRequest = {
    readCompactString(buf) // transactional_id
    val acks = buf.getShort
    val timeout = buf.getInt
    val topics = (0 until readCompactArrayLen(buf)).map { _ =>
      val t = readCompactString(buf)
      val parts = (0 until readCompactArrayLen(buf)).map { _ =>
        val p = buf.getInt
        val records = readCompactBytes(buf)
        skipTaggedFields(buf)
        ProducePartition(p, records)
      }
      skipTaggedFields(buf)
      ProduceTopic(t, parts)
    }
    skipTaggedFields(buf)
    ProduceRequest(acks, timeout, topics)
  }

  def writeProduceV9(buf: ByteBuffer, r: ProduceRequest): Unit = {
    writeCompactString(buf, null)
    buf.putShort(r.acks)
    buf.putInt(r.timeoutMs)
    writeCompactArrayLen(buf, r.topics.size)
    r.topics.foreach { t =>
      writeCompactString(buf, t.topic)
      writeCompactArrayLen(buf, t.partitions.size)
      t.partitions.foreach { p =>
        buf.putInt(p.partition)
        writeCompactBytes(buf, p.records)
        writeEmptyTaggedFields(buf)
      }
      writeEmptyTaggedFields(buf)
    }
    writeEmptyTaggedFields(buf)
  }

  /** Produce v9 response: per-partition error/base_offset plus
    * log_append_time, log_start_offset, record_errors, error_message.
    */
  def writeProduceResponseV9(buf: ByteBuffer,
                             results: Seq[(String, Seq[(Int, Short, Long, Long)])],
                             throttleMs: Int = 0): Unit = {
    writeCompactArrayLen(buf, results.size)
    results.foreach { case (topic, parts) =>
      writeCompactString(buf, topic)
      writeCompactArrayLen(buf, parts.size)
      parts.foreach { case (p, err, baseOffset, logStart) =>
        buf.putInt(p)
        buf.putShort(err)
        buf.putLong(baseOffset)
        buf.putLong(-1L) // log_append_time
        buf.putLong(logStart)
        writeCompactArrayLen(buf, 0) // record_errors
        writeCompactString(buf, null) // error_message
        writeEmptyTaggedFields(buf)
      }
      writeEmptyTaggedFields(buf)
    }
    buf.putInt(throttleMs)
    writeEmptyTaggedFields(buf)
  }

  def readProduceResponseV9(buf: ByteBuffer): (Seq[(String, Seq[(Int, Short, Long)])], Int) = {
    val topics = (0 until readCompactArrayLen(buf)).map { _ =>
      val t = readCompactString(buf)
      val parts = (0 until readCompactArrayLen(buf)).map { _ =>
        val p = buf.getInt
        val err = buf.getShort
        val off = buf.getLong
        buf.getLong // log_append_time
        buf.getLong // log_start_offset
        (0 until readCompactArrayLen(buf)).foreach { _ =>
          buf.getInt; readCompactString(buf); skipTaggedFields(buf)
        }
        readCompactString(buf) // error_message
        skipTaggedFields(buf)
        (p, err, off)
      }
      skipTaggedFields(buf)
      t -> parts
    }
    val throttle = buf.getInt
    skipTaggedFields(buf)
    (topics, throttle)
  }

  /** Fetch v12 (flexible) request — session fields drive the
    * incremental fetch-session machinery in the broker.
    */
  def readFetchV12(buf: ByteBuffer): FetchRequest = {
    buf.getInt // replica_id
    val maxWait = buf.getInt
    val minBytes = buf.getInt
    val maxBytes = buf.getInt
    val isolation = buf.get()
    val sid = buf.getInt
    val sep = buf.getInt
    val topics = (0 until readCompactArrayLen(buf)).map { _ =>
      val t = readCompactString(buf)
      val parts = (0 until readCompactArrayLen(buf)).map { _ =>
        val p = buf.getInt
        buf.getInt // current_leader_epoch
        val off = buf.getLong
        buf.getInt // last_fetched_epoch
        buf.getLong // log_start_offset
        val pmax = buf.getInt
        skipTaggedFields(buf)
        FetchPartition(p, off, pmax)
      }
      skipTaggedFields(buf)
      FetchTopic(t, parts)
    }
    val forgotten = (0 until readCompactArrayLen(buf)).map { _ =>
      val t = readCompactString(buf)
      val ps = (0 until readCompactArrayLen(buf)).map(_ => buf.getInt).toSeq
      skipTaggedFields(buf)
      t -> ps
    }
    readCompactString(buf) // rack_id
    skipTaggedFields(buf)
    FetchRequest(maxWait, minBytes, maxBytes, isolation, topics,
      sid, sep, forgotten)
  }

  def writeFetchV12(buf: ByteBuffer, r: FetchRequest): Unit = {
    buf.putInt(-1)
    buf.putInt(r.maxWaitMs)
    buf.putInt(r.minBytes)
    buf.putInt(r.maxBytes)
    buf.put(r.isolation)
    buf.putInt(r.sessionId)
    buf.putInt(r.sessionEpoch)
    writeCompactArrayLen(buf, r.topics.size)
    r.topics.foreach { t =>
      writeCompactString(buf, t.topic)
      writeCompactArrayLen(buf, t.partitions.size)
      t.partitions.foreach { p =>
        buf.putInt(p.partition)
        buf.putInt(-1)
        buf.putLong(p.fetchOffset)
        buf.putInt(-1)
        buf.putLong(-1L)
        buf.putInt(p.maxBytes)
        writeEmptyTaggedFields(buf)
      }
      writeEmptyTaggedFields(buf)
    }
    writeCompactArrayLen(buf, r.forgotten.size)
    r.forgotten.foreach { case (t, ps) =>
      writeCompactString(buf, t)
      writeCompactArrayLen(buf, ps.size); ps.foreach(buf.putInt)
      writeEmptyTaggedFields(buf)
    }
    writeCompactString(buf, "")  // rack
    writeEmptyTaggedFields(buf)
  }

  final case class FetchV12PartResult(partition: Int, error: Short,
                                      highWatermark: Long, lastStable: Long,
                                      logStart: Long,
                                      aborted: Seq[(Long, Long)],
                                      records: Array[Byte])

  /** Fetch v12 response — includes the aborted-transaction list that
    * read_committed consumers use to drop aborted records client-side.
    */
  def writeFetchResponseV12(buf: ByteBuffer,
                            results: Seq[(String, Seq[FetchV12PartResult])],
                            error: Short = 0, sessionId: Int = 0): Unit = {
    buf.putInt(0)  // throttle
    buf.putShort(error)
    buf.putInt(sessionId)
    writeCompactArrayLen(buf, results.size)
    results.foreach { case (topic, parts) =>
      writeCompactString(buf, topic)
      writeCompactArrayLen(buf, parts.size)
      parts.foreach { r =>
        buf.putInt(r.partition)
        buf.putShort(r.error)
        buf.putLong(r.highWatermark)
        buf.putLong(r.lastStable)
        buf.putLong(r.logStart)
        writeCompactArrayLen(buf, r.aborted.size)
        r.aborted.foreach { case (pid, first) =>
          buf.putLong(pid)
          buf.putLong(first)
          writeEmptyTaggedFields(buf)
        }
        buf.putInt(-1) // preferred_read_replica
        writeCompactBytes(buf, r.records)
        writeEmptyTaggedFields(buf)
      }
      writeEmptyTaggedFields(buf)
    }
    writeEmptyTaggedFields(buf)
  }

  def readFetchResponseV12(buf: ByteBuffer): Seq[(String, Seq[FetchV12PartResult])] =
    readFetchResponseV12Full(buf)._3

  /** Like [[readFetchResponseV12]] but surfacing the session header
    * (top-level error code, session id).
    */
  def readFetchResponseV12Full(buf: ByteBuffer)
      : (Short, Int, Seq[(String, Seq[FetchV12PartResult])]) = {
    buf.getInt // throttle
    val error = buf.getShort
    val sessionId = buf.getInt
    val out = (0 until readCompactArrayLen(buf)).map { _ =>
      val t = readCompactString(buf)
      val parts = (0 until readCompactArrayLen(buf)).map { _ =>
        val p = buf.getInt
        val err = buf.getShort
        val hw = buf.getLong
        val lso = buf.getLong
        val ls = buf.getLong
        val aborted = (0 until readCompactArrayLen(buf)).map { _ =>
          val pid = buf.getLong
          val first = buf.getLong
          skipTaggedFields(buf)
          (pid, first)
        }
        buf.getInt // preferred replica
        val records = readCompactBytes(buf)
        skipTaggedFields(buf)
        FetchV12PartResult(p, err, hw, lso, ls, aborted, records)
      }
      skipTaggedFields(buf)
      t -> parts
    }
    skipTaggedFields(buf)
    (error, sessionId, out)
  }

  final case class MetadataV9Topic(name: String, partitions: Seq[Int],
                                   error: Short = 0)

  def readMetadataResponseV9(buf: ByteBuffer): (String, Int, Seq[MetadataV9Topic]) = {
    buf.getInt // throttle
    val nBrokers = readCompactArrayLen(buf)
    var host: String = null
    var port = 0
    (0 until nBrokers).foreach { _ =>
      buf.getInt
      host = readCompactString(buf)
      port = buf.getInt
      readCompactString(buf) // rack
      skipTaggedFields(buf)
    }
    readCompactString(buf) // cluster id
    buf.getInt // controller
    val topics = (0 until readCompactArrayLen(buf)).map { _ =>
      val err = buf.getShort
      val name = readCompactString(buf)
      buf.get()
      val parts = (0 until readCompactArrayLen(buf)).map { _ =>
        buf.getShort
        val p = buf.getInt
        buf.getInt; buf.getInt
        (0 until readCompactArrayLen(buf)).foreach(_ => buf.getInt)
        (0 until readCompactArrayLen(buf)).foreach(_ => buf.getInt)
        (0 until readCompactArrayLen(buf)).foreach(_ => buf.getInt)
        skipTaggedFields(buf)
        p
      }
      buf.getInt // topic_authorized_operations
      skipTaggedFields(buf)
      MetadataV9Topic(name, parts, err)
    }
    buf.getInt // cluster_authorized_operations
    skipTaggedFields(buf)
    (host, port, topics)
  }

  /** Classic Metadata request, v1-v8: [topics] (null array = all),
    * allow_auto_topic_creation(v4+), include-authorized-ops flags(v8+).
    */
  def readMetadataClassic(buf: ByteBuffer, version: Int = 1): Option[Seq[String]] = {
    val n = buf.getInt
    val topics = if (n < 0) None else Some((0 until n).map(_ => readString(buf)))
    if (version >= 4) buf.get() // allow_auto_topic_creation
    if (version >= 8) { buf.get(); buf.get() } // include_*_authorized_operations
    topics
  }

  def writeMetadataClassic(buf: ByteBuffer, topics: Option[Seq[String]],
                           version: Int = 1): Unit = {
    topics match {
      case None => buf.putInt(-1)
      case Some(ts) => buf.putInt(ts.size); ts.foreach(writeString(buf, _))
    }
    if (version >= 4) buf.put(1: Byte)
    if (version >= 8) { buf.put(0: Byte); buf.put(0: Byte) }
    ()
  }

  /** Classic Metadata response, v1-v8 (MetadataResponse.json layout):
    * throttle(v3+) [broker] cluster_id(v2+) controller_id [topic: error
    * name is_internal [partition: error idx leader leader_epoch(v7+)
    * replicas isr offline(v5+)] topic_authorized_operations(v8+)]
    * cluster_authorized_operations(v8). Topics carry a per-topic error
    * (3 = UNKNOWN_TOPIC_OR_PARTITION for explicitly requested absentees).
    */
  def writeMetadataResponse(buf: ByteBuffer, host: String, port: Int,
                            topics: Seq[(String, Int, Short)],
                            version: Int = 1): Unit = {
    if (version >= 3) buf.putInt(0) // throttle
    buf.putInt(1) // one broker
    buf.putInt(0) // node_id
    writeString(buf, host)
    buf.putInt(port)
    writeString(buf, null) // rack
    if (version >= 2) writeString(buf, "graft") // cluster_id
    buf.putInt(0) // controller id
    buf.putInt(topics.size)
    topics.foreach { case (t, nParts, err) =>
      buf.putShort(err)
      writeString(buf, t)
      buf.put(0: Byte) // is_internal
      buf.putInt(nParts)
      (0 until nParts).foreach { p =>
        buf.putShort(0) // error
        buf.putInt(p)   // partition
        buf.putInt(0)   // leader
        if (version >= 7) buf.putInt(0) // leader_epoch
        buf.putInt(1)   // replicas
        buf.putInt(0)
        buf.putInt(1)   // isr
        buf.putInt(0)
        if (version >= 5) buf.putInt(0) // offline_replicas
      }
      if (version >= 8) buf.putInt(Int.MinValue) // topic_authorized_operations
    }
    if (version >= 8) buf.putInt(Int.MinValue) // cluster_authorized_operations
  }

  def readMetadataResponse(buf: ByteBuffer,
                           version: Int = 1): (String, Int, Seq[(String, Int, Short)]) = {
    if (version >= 3) buf.getInt // throttle
    var host: String = null
    var port = 0
    (0 until buf.getInt).foreach { _ =>
      buf.getInt // node_id
      host = readString(buf)
      port = buf.getInt
      readString(buf) // rack
    }
    if (version >= 2) readString(buf) // cluster_id
    buf.getInt // controller
    val topics = (0 until buf.getInt).map { _ =>
      val err = buf.getShort
      val name = readString(buf)
      buf.get() // is_internal
      val nParts = buf.getInt
      (0 until nParts).foreach { _ =>
        buf.getShort; buf.getInt; buf.getInt
        if (version >= 7) buf.getInt
        (0 until buf.getInt).foreach(_ => buf.getInt) // replicas
        (0 until buf.getInt).foreach(_ => buf.getInt) // isr
        if (version >= 5) (0 until buf.getInt).foreach(_ => buf.getInt)
      }
      if (version >= 8) buf.getInt
      (name, nParts, err)
    }
    if (version >= 8) buf.getInt
    (host, port, topics)
  }

  /** Classic Produce response, v3-v8 (ProduceResponse.json layout):
    * [topic [partition error base_offset log_append_time
    * log_start_offset(v5+) record_errors(v8+) error_message(v8+)]]
    * throttle. The 4-tuple's last element is the partition's log-start
    * offset. throttleMs > 0 tells the client to back off — the
    * client-quota mechanism (T10 rate limiting).
    */
  def writeProduceResponse(buf: ByteBuffer,
                           results: Seq[(String, Seq[(Int, Short, Long, Long)])],
                           throttleMs: Int = 0, version: Int = 3): Unit = {
    buf.putInt(results.size)
    results.foreach { case (topic, parts) =>
      writeString(buf, topic)
      buf.putInt(parts.size)
      parts.foreach { case (p, err, baseOffset, logStart) =>
        buf.putInt(p)
        buf.putShort(err)
        buf.putLong(baseOffset)
        buf.putLong(-1L) // log_append_time
        if (version >= 5) buf.putLong(logStart)
        if (version >= 8) {
          buf.putInt(0) // record_errors: none (whole batch accepted/rejected)
          writeString(buf, null) // error_message
        }
      }
    }
    buf.putInt(throttleMs)
  }

  /** Reads a classic Produce response (v3-v8) incl. the trailing throttle. */
  def readProduceResponse(buf: ByteBuffer,
                          version: Int = 3): (Seq[(String, Seq[(Int, Short, Long)])], Int) = {
    val topics = (0 until buf.getInt).map { _ =>
      val t = readString(buf)
      t -> (0 until buf.getInt).map { _ =>
        val p = buf.getInt
        val err = buf.getShort
        val off = buf.getLong
        buf.getLong // log_append_time
        if (version >= 5) buf.getLong // log_start_offset
        if (version >= 8) {
          (0 until buf.getInt).foreach { _ => buf.getInt; readString(buf) }
          readString(buf) // error_message
        }
        (p, err, off)
      }
    }
    (topics, buf.getInt)
  }

  /** Classic Fetch response, v4-v11 (FetchResponse.json layout):
    * throttle error+session(v7+) [topic [partition error hw lso
    * log_start(v5+) [aborted: pid first_offset]
    * preferred_read_replica(v11+) records]].
    */
  def writeFetchResponseClassic(buf: ByteBuffer,
                                results: Seq[(String, Seq[FetchV12PartResult])],
                                version: Int = 4, error: Short = 0,
                                sessionId: Int = 0): Unit = {
    buf.putInt(0) // throttle
    if (version >= 7) {
      buf.putShort(error)
      buf.putInt(sessionId)
    }
    buf.putInt(results.size)
    results.foreach { case (topic, parts) =>
      writeString(buf, topic)
      buf.putInt(parts.size)
      parts.foreach { r =>
        buf.putInt(r.partition)
        buf.putShort(r.error)
        buf.putLong(r.highWatermark)
        buf.putLong(r.lastStable)
        if (version >= 5) buf.putLong(r.logStart)
        buf.putInt(r.aborted.size)
        r.aborted.foreach { case (pid, first) =>
          buf.putLong(pid); buf.putLong(first)
        }
        if (version >= 11) buf.putInt(-1) // preferred_read_replica
        writeBytes(buf, r.records)
      }
    }
  }

  def readFetchResponseClassic(buf: ByteBuffer,
                               version: Int = 4): Seq[(String, Seq[FetchV12PartResult])] =
    readFetchResponseClassicFull(buf, version)._3

  def readFetchResponseClassicFull(buf: ByteBuffer, version: Int = 4)
      : (Short, Int, Seq[(String, Seq[FetchV12PartResult])]) = {
    buf.getInt // throttle
    val (error, sessionId) =
      if (version >= 7) (buf.getShort, buf.getInt) else (0.toShort, 0)
    val topics = (0 until buf.getInt).map { _ =>
      val t = readString(buf)
      t -> (0 until buf.getInt).map { _ =>
        val p = buf.getInt
        val err = buf.getShort
        val hw = buf.getLong
        val lso = buf.getLong
        val ls = if (version >= 5) buf.getLong else -1L
        val aborted = (0 until buf.getInt).map(_ => (buf.getLong, buf.getLong))
        if (version >= 11) buf.getInt // preferred_read_replica
        FetchV12PartResult(p, err, hw, lso, ls, aborted, readBytes(buf))
      }
    }
    (error, sessionId, topics)
  }
}
