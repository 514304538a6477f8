package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32C, GZIPInputStream, GZIPOutputStream}

/** Kafka record-batch (magic v2) wire codec — decode/encode with CRC-32C
  * verification and gzip compression (reference
  * `nisshi-sans-io/src/record/deflated.rs:116-199`, crc at 158-165,
  * codecs 341-380; layout per the public Kafka protocol spec).
  *
  * Snappy/LZ4/Zstd are recognized attribute codes but unsupported in this
  * build (no codec jars) — decode raises rather than mis-parsing. The
  * analytic path stores batches as Parquet; this codec exists for the
  * wire facade and for ingesting captured Kafka batches.
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

  def crc32c(bytes: Array[Byte], from: Int, len: Int): Long = {
    val c = new CRC32C()
    c.update(bytes, from, len)
    c.getValue
  }

  /** Decode one wire batch, verifying the CRC over the post-crc region
    * (reference deflated.rs:155-165).
    */
  def decode(wire: Array[Byte]): Batch = {
    val buf = ByteBuffer.wrap(wire).order(ByteOrder.BIG_ENDIAN)
    val baseOffset = buf.getLong
    val batchLength = buf.getInt
    val partitionLeaderEpoch = buf.getInt
    val magic = buf.get()
    require(magic == 2, s"unsupported magic $magic")
    val crc = buf.getInt & 0xffffffffL
    val crcStart = buf.position()
    val crcLen = batchLength - (crcStart - 12)
    require(crc32c(wire, crcStart, crcLen) == crc, "CRC-32C mismatch")
    val attributes = buf.getShort
    val lastOffsetDelta = buf.getInt
    val baseTimestamp = buf.getLong
    val maxTimestamp = buf.getLong
    val producerId = buf.getLong
    val producerEpoch = buf.getShort
    val baseSequence = buf.getInt
    val recordCount = buf.getInt
    val payload = new Array[Byte](buf.remaining())
    buf.get(payload)
    val recordsBytes = (attributes & 0x07) match {
      case CodecNone => payload
      case CodecGzip => gunzip(payload)
      case c => throw new UnsupportedOperationException(s"codec $c not available")
    }
    val rbuf = ByteBuffer.wrap(recordsBytes).order(ByteOrder.BIG_ENDIAN)
    val records = (0 until recordCount).map(_ => readRecord(rbuf))
    require(records.isEmpty || records.map(_.offsetDelta).max == lastOffsetDelta,
      "lastOffsetDelta mismatch")
    Batch(baseOffset, partitionLeaderEpoch, attributes, baseTimestamp,
      maxTimestamp, producerId, producerEpoch, baseSequence, records)
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
      val a = new Array[Byte](n)
      buf.get(a)
      a
    }
  }

  def encode(batch: Batch): Array[Byte] = {
    val recBuf = ByteBuffer.allocate(1 << 20).order(ByteOrder.BIG_ENDIAN)
    batch.records.foreach(r => writeRecord(recBuf, r))
    recBuf.flip()
    var records = new Array[Byte](recBuf.remaining())
    recBuf.get(records)
    if ((batch.attributes & 0x07) == CodecGzip) records = gzip(records)

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
    val tmp = ByteBuffer.allocate(1 << 16).order(ByteOrder.BIG_ENDIAN)
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

  private def gzip(a: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(a); g.close()
    bos.toByteArray
  }

  private def gunzip(a: Array[Byte]): Array[Byte] = {
    val g = new GZIPInputStream(new java.io.ByteArrayInputStream(a))
    g.readAllBytes()
  }
}
