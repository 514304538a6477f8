package graft.functions

import java.nio.ByteBuffer

/** Zig-zag varint/varlong codec (Kafka wire encoding; reference
  * `nisshi-sans-io/src/primitive/varint.rs`). Wire-facade only — the
  * analytic path never sees varints (Parquet encodings replace them).
  */
object Varint {

  def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  def writeVarlong(v: Long, buf: ByteBuffer): Unit = {
    var u = zigzag(v)
    while ((u & ~0x7fL) != 0) {
      buf.put(((u & 0x7f) | 0x80).toByte)
      u >>>= 7
    }
    buf.put(u.toByte)
  }

  def readVarlong(buf: ByteBuffer): Long = {
    var value = 0L
    var shift = 0
    var b = buf.get()
    while ((b & 0x80) != 0) {
      value |= (b & 0x7fL) << shift
      shift += 7
      require(shift < 64, "varlong too long")
      b = buf.get()
    }
    value |= (b & 0x7fL) << shift
    unzigzag(value)
  }

  def writeVarint(v: Int, buf: ByteBuffer): Unit = writeVarlong(v.toLong, buf)
  def readVarint(buf: ByteBuffer): Int = {
    val v = readVarlong(buf)
    require(v >= Int.MinValue && v <= Int.MaxValue, "varint out of range")
    v.toInt
  }

  def sizeOfVarlong(v: Long): Int = {
    var u = zigzag(v)
    var n = 1
    while ((u & ~0x7fL) != 0) { u >>>= 7; n += 1 }
    n
  }
  def sizeOfVarint(v: Int): Int = sizeOfVarlong(v.toLong)

  /** Byte width of the unsigned-varint encoding of a NON-NEGATIVE
    * long (7 bits per byte, no zig-zag) — the posting-gap sizing used
    * by the inverted-index build. Rejects negatives loudly: their
    * 10-byte sign-extension form is never a valid gap.
    */
  def sizeOfUnsignedVarlong(v: Long): Int = {
    require(v >= 0, s"unsigned varlong must be non-negative: $v")
    var u = v
    var n = 1
    while ((u & ~0x7fL) != 0) { u >>>= 7; n += 1 }
    n
  }

  /** UNSIGNED varints — the flexible-protocol length/tag encoding
    * (compact strings/arrays and tagged fields use these, NOT zig-zag).
    */
  def writeUnsignedVarint(v: Int, buf: ByteBuffer): Unit = {
    var u = v
    while ((u & ~0x7f) != 0) {
      buf.put(((u & 0x7f) | 0x80).toByte)
      u >>>= 7
    }
    buf.put(u.toByte)
  }

  def readUnsignedVarint(buf: ByteBuffer): Int = {
    var value = 0
    var shift = 0
    var b = buf.get()
    while ((b & 0x80) != 0) {
      value |= (b & 0x7f) << shift
      shift += 7
      require(shift < 32, "uvarint too long")
      b = buf.get()
    }
    value | ((b & 0x7f) << shift)
  }
}
