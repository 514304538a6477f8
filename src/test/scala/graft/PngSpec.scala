package graft

import org.apache.spark.sql.functions._
import graft.functions.PngCodecKernels._
import graft.ops.Multimodal

/** Real PNG codec (JDK zlib; round-12 verdict item 3): encode/decode
  * round-trips across every scanline filter, hostile-input contract,
  * and the columnar decode/resize plumbing.
  */
class PngSpec extends SparkSpec {

  // 7x5 RGB image with non-trivial structure: every row different so a
  // wrong unfilter (Sub/Up/Average/Paeth mixed) shows in the sums
  private val w = 7; private val h = 5
  private def rgb: Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 37 + (i / 21) * 11) % 251).toByte)
  private def rgba: Array[Byte] =
    Array.tabulate(w * h * 4)(i => ((i * 53 + 7) % 249).toByte)

  private def sum(px: Array[Byte]): Long =
    px.map(b => (b & 0xff).toLong).sum
  private def row0(px: Array[Byte], rowBytes: Int): Long =
    px.take(rowBytes).map(b => (b & 0xff).toLong).sum

  test("PNG kernel: encode/decode round-trip, both filter modes, RGB + RGBA") {
    for (mode <- Seq(0, 1)) {
      val png = pngEncode(rgb, w, h, 3, mode)
      // signature + IHDR present
      assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte)
      val st = pngDecodeStats(png)
      assert(st.toSeq === Seq(1L, w.toLong, h.toLong, 3L, (w * h).toLong,
        sum(rgb), row0(rgb, w * 3)),
        s"filterMode=$mode RGB stats diverged")
      val png4 = pngEncode(rgba, w, h, 4, mode)
      val st4 = pngDecodeStats(png4)
      assert(st4.toSeq === Seq(1L, w.toLong, h.toLong, 4L, (w * h).toLong,
        sum(rgba), row0(rgba, w * 4)),
        s"filterMode=$mode RGBA stats diverged")
    }
  }

  test("PNG unfilter reproduces the exact pixel bytes (resize-identity pin)") {
    // filterMode 1 cycles None/Sub/Up/Average/Paeth over the 5 rows; a
    // same-size NN resize decodes then re-encodes with filter None, so
    // byte-equality against a direct filter-None encode pins that every
    // unfilter path reproduced the raw pixels EXACTLY, not just in sum
    val cycled = pngEncode(rgb, w, h, 3, 1)
    val identity = pngResizeNn(cycled, w, h)
    assert(identity != null)
    assert(identity.toSeq === pngEncode(rgb, w, h, 3, 0).toSeq,
      "round-trip through the five filters lost pixel bytes")
  }

  test("PNG NN resize: floor mapping, upscale works, channels preserved") {
    val png = pngEncode(rgb, w, h, 3, 1)
    val down = pngResizeNn(png, 3, 2)
    val expect = Array.tabulate(3 * 2 * 3) { k =>
      val c = k % 3; val x = (k / 3) % 3; val y = k / 9
      rgb((y * h / 2 * w + x * w / 3) * 3 + c)
    }
    assert(pngDecodeStats(down).toSeq ===
      Seq(1L, 3L, 2L, 3L, 6L, sum(expect), row0(expect, 9)))
    val up = pngResizeNn(png, 14, 10)
    val stUp = pngDecodeStats(up)
    assert(stUp(0) === 1L && stUp(1) === 14L && stUp(2) === 10L &&
      stUp(3) === 3L)
  }

  test("PNG hostile inputs: null, never a throw") {
    val png = pngEncode(rgb, w, h, 3, 1)
    def okOf(p: Array[Byte]): Long = pngDecodeStats(p)(0)
    // truncations at every interesting boundary
    assert(okOf(png.take(7)) === 0L)
    assert(okOf(png.take(20)) === 0L)
    assert(okOf(png.take(png.length - 1)) === 0L)
    // wrong magic
    val m = png.clone(); m(1) = 'X'.toByte
    assert(okOf(m) === 0L)
    // a flipped IDAT byte must fail the chunk CRC, not decode garbage
    val flip = png.clone(); flip(8 + 25 + 12 + 8) =
      (flip(8 + 25 + 12 + 8) ^ 0x40).toByte
    assert(okOf(flip) === 0L)
    // unsupported layouts need a VALID crc to reach the IHDR checks:
    // patch the field, then re-crc the chunk
    def patchIhdr(f: Array[Byte] => Unit): Array[Byte] = {
      val p = png.clone(); f(p)
      val crc = new java.util.zip.CRC32()
      crc.update(p, 12, 17) // type + 13 data bytes
      val v = crc.getValue.toInt
      p(29) = ((v >>> 24) & 0xff).toByte; p(30) = ((v >>> 16) & 0xff).toByte
      p(31) = ((v >>> 8) & 0xff).toByte; p(32) = (v & 0xff).toByte
      p
    }
    assert(okOf(patchIhdr(_(24) = 16)) === 0L, "16-bit depth must reject")
    assert(okOf(patchIhdr(_(25) = 3)) === 0L, "palette must reject")
    assert(okOf(patchIhdr(_(28) = 1)) === 0L, "Adam7 must reject")
    // a decompression bomb: huge claimed height with a tiny IDAT
    assert(okOf(patchIhdr { p => p(20) = 0x7f.toByte }) === 0L,
      "bogus raster size must reject, not allocate")
    // raster-size lie small enough to allocate: inflate length mismatch
    assert(okOf(patchIhdr { p => p(23) = (h + 1).toByte }) === 0L)
    assert(pngResizeNn(png.take(30), 2, 2) === null)
    assert(pngResizeNn(null, 2, 2) === null)
  }

  test("PNG preset-dictionary (FDICT) stream rejects instead of hanging") {
    // a zlib stream with the FDICT flag makes Inflater.inflate return 0
    // with needsDictionary — without the explicit check the decode loop
    // never terminates. CMF=0x78, FLG=0x3F (FDICT bit set, FCHECK
    // valid: (0x78*256 + 0x3F) % 31 == 0), then a 4-byte DICTID.
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def be(v: Int): Array[Byte] = Array(((v >>> 24) & 0xff).toByte,
        ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
        (v & 0xff).toByte)
      out.write(be(data.length))
      val t = typ.getBytes("US-ASCII")
      out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
      out.write(be(crc.getValue.toInt))
      out.toByteArray
    }
    val ihdr = new Array[Byte](13)
    ihdr(3) = 1; ihdr(7) = 1 // 1x1
    ihdr(8) = 8; ihdr(9) = 2 // 8-bit RGB
    val idat = Array[Byte](0x78, 0x3f, 1, 2, 3, 4, 0, 0, 0, 0)
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val hostile = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
    // must return the zero row promptly, not spin on inflate
    assert(pngDecodeStats(hostile)(0) === 0L)
  }

  test("decodePngStats/resizePng: columnar path is null-safe, meta syncs") {
    import spark.implicits._
    val pngBytes = pngEncode(rgb, w, h, 3, 1)
    val rows = Seq(
      (1L, pngBytes),
      (2L, "not a png at all".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]))
    val media = Multimodal.asMediaTable(
      rows.toDF("id", "blob"), "id", "blob", "image", "png")
    val st = Multimodal.decodePngStats(media)
      .orderBy(col("media_id")).collect()
    assert(st(0).getLong(1) === 1L && st(0).getLong(6) === sum(rgb))
    assert(st(1).getLong(1) === 0L, "hostile blob must decode as ok=0")
    assert(st(2).isNullAt(1), "null payload stays null")
    val rs = Multimodal.resizePng(media, 3, 2)
      .orderBy(col("media_id")).collect()
    assert(rs(0).getAs[Array[Byte]]("payload") != null)
    assert(rs(0).getStruct(2).getInt(2) === 3 &&
      rs(0).getStruct(2).getInt(3) === 2, "meta dims must sync to 3x2")
    assert(rs(1).isNullAt(1), "hostile blob resizes to NULL payload")
    assert(rs(1).getStruct(2).isNullAt(2),
      "rejected blob must null meta.width too")
  }
}
