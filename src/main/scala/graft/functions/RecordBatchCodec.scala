package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32C, GZIPInputStream, GZIPOutputStream}

/** Kafka record-batch (magic v2) wire codec — decode/encode with CRC-32C
  * verification and gzip/snappy/lz4/zstd compression (reference
  * `nisshi-sans-io/src/record/deflated.rs:116-199`, crc at 158-165,
  * codecs 341-380; layout per the public Kafka protocol spec).
  *
  * Codec streams match what Kafka clients produce: snappy-java's xerial
  * stream framing, the LZ4 Frame format, and zstd frames — all via the
  * libraries Spark itself ships. The analytic path stores batches as
  * Parquet; this codec exists for the wire facade and for ingesting
  * captured Kafka batches.
  */
object RecordBatchCodec {

  final case class Header(key: String, value: Array[Byte])
  final case class Record(offsetDelta: Int, timestampDelta: Long,
                          key: Array[Byte], value: Array[Byte],
                          headers: Seq[Header])
  final case class Batch(baseOffset: Long, partitionLeaderEpoch: Int,
                         attributes: Short, baseTimestamp: Long, maxTimestamp: Long,
                         producerId: Long, producerEpoch: Short, baseSequence: Int,
                         records: Seq[Record]) {
    def compression: Int = attributes & 0x07
    def isControl: Boolean = (attributes & 0x20) != 0
    def isTransactional: Boolean = (attributes & 0x10) != 0
  }

  val CodecNone = 0
  val CodecGzip = 1
  val CodecSnappy = 2
  val CodecLz4 = 3
  val CodecZstd = 4

  def crc32c(bytes: Array[Byte], from: Int, len: Int): Long = {
    val c = new CRC32C()
    c.update(bytes, from, len)
    c.getValue
  }

  /** Decode the FIRST wire batch, verifying the CRC over the post-crc
    * region (reference deflated.rs:155-165). A records blob may legally
    * hold several consecutive batches — use [[decodeAll]] for the full
    * set; this single-batch form slices at the declared batch length
    * rather than consuming the whole buffer, so trailing batches can
    * never corrupt the decompressor input.
    */
  def decode(wire: Array[Byte]): Batch = decodeAt(wire, 0)._1

  /** Every batch in a records blob, in order (the multi-batch produce /
    * fetch shape real clients send after retries and compaction).
    */
  def decodeAll(wire: Array[Byte]): Seq[Batch] = {
    val out = Seq.newBuilder[Batch]
    var pos = 0
    while (pos < wire.length) {
      val (b, next) = decodeAt(wire, pos)
      out += b
      pos = next
    }
    out.result()
  }

  private def decodeAt(wire: Array[Byte], start: Int): (Batch, Int) = {
    val buf = ByteBuffer.wrap(wire, start, wire.length - start)
      .order(ByteOrder.BIG_ENDIAN)
    val baseOffset = buf.getLong
    val batchLength = buf.getInt
    val partitionLeaderEpoch = buf.getInt
    val magic = buf.get()
    require(magic == 2, s"unsupported magic $magic")
    val crc = buf.getInt & 0xffffffffL
    val crcStart = buf.position()
    val crcLen = batchLength - (crcStart - start - 12)
    // hostile batchLength: bound-check BEFORE the CRC touches the array
    // (long arithmetic — a near-MaxValue length overflows int sums)
    // 40 = header bytes between the CRC and the records payload
    // (attributes 2 + lastOffsetDelta 4 + timestamps 16 + producerId 8 +
    // producerEpoch 2 + baseSequence 4 + recordCount 4); a declared
    // length shorter than that would read header fields past the batch
    // end and allocate a negative-sized payload
    require(crcLen >= 40 && crcStart.toLong + crcLen.toLong <= wire.length,
      s"declared batch length $batchLength exceeds frame or truncates header")
    require(crc32c(wire, crcStart, crcLen) == crc, "CRC-32C mismatch")
    val attributes = buf.getShort
    val lastOffsetDelta = buf.getInt
    val baseTimestamp = buf.getLong
    val maxTimestamp = buf.getLong
    val producerId = buf.getLong
    val producerEpoch = buf.getShort
    val baseSequence = buf.getInt
    val recordCount = buf.getInt
    // slice at the declared batch end, not the buffer end
    val batchEnd = start + 12 + batchLength
    val payload = new Array[Byte](batchEnd - buf.position())
    buf.get(payload)
    // hostile compressed payloads (reference fuzz_deflated_batch class):
    // a CRC-valid frame can still carry (a) garbage the codec stream
    // rejects with codec-specific throwables — snappy-java's failure
    // type is even a java.lang.Error — or (b) a decompression bomb
    // whose tiny payload inflates without bound. Normalize every codec
    // failure to the typed frame error and cap the inflated size, so
    // decode's contract is "IllegalArgumentException or a Batch",
    // never an engine-specific throwable or an OOM.
    val recordsBytes =
      try decompressBounded(attributes & 0x07, payload, MaxInflatedBytes)
      catch {
        case e: IllegalArgumentException => throw e
        case e: UnsupportedOperationException => throw e
        case e: Throwable if !e.isInstanceOf[VirtualMachineError] =>
          throw new IllegalArgumentException(
            s"corrupt compressed payload: ${e.getClass.getSimpleName}")
      }
    val rbuf = ByteBuffer.wrap(recordsBytes).order(ByteOrder.BIG_ENDIAN)
    val records = (0 until recordCount).map(_ => readRecord(rbuf))
    // <= not ==: compaction removes records from a batch but preserves
    // the header's lastOffsetDelta for offset continuity
    require(records.isEmpty || records.map(_.offsetDelta).max <= lastOffsetDelta,
      "lastOffsetDelta mismatch")
    (Batch(baseOffset, partitionLeaderEpoch, attributes, baseTimestamp,
      maxTimestamp, producerId, producerEpoch, baseSequence, records),
      batchEnd)
  }

  private def readRecord(buf: ByteBuffer): Record = {
    val len = Varint.readVarint(buf)
    val end = buf.position() + len
    buf.get() // record attributes (unused)
    val tsDelta = Varint.readVarlong(buf)
    val offDelta = Varint.readVarint(buf)
    val key = readBytes(buf)
    val value = readBytes(buf)
    val nHeaders = Varint.readVarint(buf)
    val headers = (0 until nHeaders).map { _ =>
      val k = new String(Option(readBytes(buf)).getOrElse(Array.empty), "UTF-8")
      Header(k, readBytes(buf))
    }
    buf.position(end)
    Record(offDelta, tsDelta, key, value, headers)
  }

  private def readBytes(buf: ByteBuffer): Array[Byte] = {
    val n = Varint.readVarint(buf)
    if (n < 0) null
    else {
      // fail BEFORE allocating on a hostile declared length (fuzz class)
      if (n > buf.remaining())
        throw new IllegalArgumentException(
          s"declared length $n exceeds remaining ${buf.remaining()}")
      val a = new Array[Byte](n)
      buf.get(a)
      a
    }
  }

  /** Upper bound on one record's encoded size (varints + payloads). */
  private def recordSizeBound(r: Record): Int =
    64 + (if (r.key == null) 0 else r.key.length) +
      (if (r.value == null) 0 else r.value.length) +
      // header VALUES may be null (varint length -1 on the wire — the
      // decoder produces them); keys may not
      r.headers.map(h => 16 + h.key.length +
        (if (h.value == null) 0 else h.value.length)).sum

  def encode(batch: Batch): Array[Byte] = {
    val recBuf = ByteBuffer
      .allocate(math.max(1 << 10, batch.records.map(recordSizeBound).sum))
      .order(ByteOrder.BIG_ENDIAN)
    batch.records.foreach(r => writeRecord(recBuf, r))
    recBuf.flip()
    var records = new Array[Byte](recBuf.remaining())
    recBuf.get(records)
    records = compress(batch.attributes & 0x07, records)

    val lastOffsetDelta =
      if (batch.records.isEmpty) 0 else batch.records.map(_.offsetDelta).max
    val body = ByteBuffer.allocate(45 + records.length).order(ByteOrder.BIG_ENDIAN)
    body.putShort(batch.attributes)
    body.putInt(lastOffsetDelta)
    body.putLong(batch.baseTimestamp)
    body.putLong(batch.maxTimestamp)
    body.putLong(batch.producerId)
    body.putShort(batch.producerEpoch)
    body.putInt(batch.baseSequence)
    body.putInt(batch.records.size)
    body.put(records)
    body.flip()
    val bodyArr = new Array[Byte](body.remaining())
    body.get(bodyArr)

    val crc = crc32c(bodyArr, 0, bodyArr.length)
    val batchLength = 4 + 1 + 4 + bodyArr.length // pl epoch + magic + crc + body
    val out = ByteBuffer.allocate(12 + batchLength).order(ByteOrder.BIG_ENDIAN)
    out.putLong(batch.baseOffset)
    out.putInt(batchLength)
    out.putInt(batch.partitionLeaderEpoch)
    out.put(2.toByte)
    out.putInt(crc.toInt)
    out.put(bodyArr)
    out.array()
  }

  private def writeRecord(buf: ByteBuffer, r: Record): Unit = {
    val tmp = ByteBuffer.allocate(recordSizeBound(r)).order(ByteOrder.BIG_ENDIAN)
    tmp.put(0.toByte)
    Varint.writeVarlong(r.timestampDelta, tmp)
    Varint.writeVarint(r.offsetDelta, tmp)
    writeBytes(tmp, r.key)
    writeBytes(tmp, r.value)
    Varint.writeVarint(r.headers.size, tmp)
    r.headers.foreach { h =>
      writeBytes(tmp, h.key.getBytes("UTF-8"))
      writeBytes(tmp, h.value)
    }
    tmp.flip()
    Varint.writeVarint(tmp.remaining(), buf)
    buf.put(tmp)
  }

  private def writeBytes(buf: ByteBuffer, a: Array[Byte]): Unit =
    if (a == null) Varint.writeVarint(-1, buf)
    else { Varint.writeVarint(a.length, buf); buf.put(a) }

  /** Compress per the batch attribute codec (reference
    * deflated.rs:341-380). Streams are the same framings Kafka clients
    * use: gzip, xerial snappy stream, LZ4 frame, zstd frame.
    */
  def compress(codec: Int, a: Array[Byte]): Array[Byte] = codec match {
    case CodecNone => a
    case _ =>
      val bos = new java.io.ByteArrayOutputStream()
      val out = codec match {
        case CodecGzip => new GZIPOutputStream(bos)
        case CodecSnappy => new org.xerial.snappy.SnappyOutputStream(bos)
        case CodecLz4 => new net.jpountz.lz4.LZ4FrameOutputStream(bos)
        case CodecZstd => new com.github.luben.zstd.ZstdOutputStream(bos)
        case c => throw new UnsupportedOperationException(s"codec $c unknown")
      }
      out.write(a); out.close()
      bos.toByteArray
  }

  def decompress(codec: Int, a: Array[Byte]): Array[Byte] =
    decompressBounded(codec, a, Int.MaxValue)

  /** Decompression-bomb guard for the batch decode path: Kafka bounds
    * every batch by message.max.bytes BEFORE compression, so a legit
    * frame can never inflate past the broker's frame ceiling by much —
    * a payload that exceeds `maxOut` is hostile by construction and
    * fails BEFORE the next read would allocate past the cap.
    */
  val MaxInflatedBytes: Int = 512 * 1024 * 1024

  private def decompressBounded(codec: Int, a: Array[Byte],
                                maxOut: Int): Array[Byte] = codec match {
    case CodecNone => a
    case _ =>
      val bis = new java.io.ByteArrayInputStream(a)
      val in = codec match {
        case CodecGzip => new GZIPInputStream(bis)
        case CodecSnappy => new org.xerial.snappy.SnappyInputStream(bis)
        case CodecLz4 => new net.jpountz.lz4.LZ4FrameInputStream(bis)
        case CodecZstd => new com.github.luben.zstd.ZstdInputStream(bis)
        case c => throw new UnsupportedOperationException(s"codec $c unknown")
      }
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) {
          if (out.size().toLong + n > maxOut)
            throw new IllegalArgumentException(
              s"decompressed payload exceeds $maxOut bytes")
          out.write(buf, 0, n)
          n = in.read(buf)
        }
        out.toByteArray
      } finally in.close()
  }
}
