package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Real PNG decode — closing the round-12 finding that the "PNG needs
  * codec libraries this build does not ship" claim was false: PNG's
  * entropy coding is zlib DEFLATE and `java.util.zip.{Inflater,
  * Deflater}` ship with the JDK (the gzip wire codec already uses
  * them), so 8-bit RGB/RGBA PNG decode is a chunk walk + inflate +
  * the five scanline unfilters (None/Sub/Up/Average/Paeth), no new
  * dependency. (JPEG/GIF decode later landed on the JDK's own ImageIO
  * — [[ImageIoKernels]] — leaving only MP4/video stand-ins.)
  *
  * Scope: bit depth 8, color types 2 (RGB) and 6 (RGBA), no interlace —
  * the layouts a training-data pipeline mints and the fixtures encode;
  * everything else (palette, 16-bit, Adam7) is rejected as
  * unsupported → the hostile-input contract (ok=0 / NULL, never a
  * throw: corrupt blobs are data at corpus scale, not exceptions).
  * Chunk CRC-32s are verified — a flipped payload byte reads as
  * corrupt, not as silently wrong pixels.
  *
  * Encode exists so tests and oracle queries can mint byte-exact
  * fixtures from deterministic payloads (filterMode 1 cycles all five
  * filters row by row, so a decode of an encoded fixture exercises
  * every unfilter path); decode is the operator under test.
  */
object PngCodecKernels {

  private val Sig = Array[Byte](0x89.toByte, 'P', 'N', 'G',
    0x0d, 0x0a, 0x1a, 0x0a)

  private def beInt(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def wrBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = ((v >>> 24) & 0xff).toByte; b(i + 1) = ((v >>> 16) & 0xff).toByte
    b(i + 2) = ((v >>> 8) & 0xff).toByte; b(i + 3) = (v & 0xff).toByte
  }

  /** Paeth predictor (PNG spec §9, Filter type 4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def writeChunk(bos: java.io.ByteArrayOutputStream, typ: String,
                         data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); wrBe32(len, 0, data.length)
    bos.write(len, 0, 4)
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    bos.write(t, 0, 4); bos.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    val c = new Array[Byte](4); wrBe32(c, 0, crc.getValue.toInt)
    bos.write(c, 0, 4)
  }

  /** Build an 8-bit PNG from display-order pixel bytes (top row first,
    * `width*height*channels` bytes; channels 3 = RGB, 4 = RGBA).
    * filterMode 0 writes every scanline with filter None; filterMode 1
    * cycles filter `row % 5` so a round-trip exercises every unfilter.
    */
  def pngEncode(pixels: Array[Byte], width: Int, height: Int,
                channels: Int, filterMode: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims: ${width}x$height")
    require(channels == 3 || channels == 4, s"bad channels: $channels")
    require(filterMode == 0 || filterMode == 1, s"bad filterMode: $filterMode")
    require(pixels.length == width * height * channels,
      s"pixels must be w*h*ch=${width * height * channels} bytes: " +
        pixels.length)
    val rowBytes = width * channels
    val raw = new Array[Byte](height * (1 + rowBytes))
    var y = 0
    while (y < height) {
      val f = if (filterMode == 0) 0 else y % 5
      val base = y * (1 + rowBytes)
      raw(base) = f.toByte
      var i = 0
      while (i < rowBytes) {
        val cur = pixels(y * rowBytes + i) & 0xff
        val a = if (i >= channels) pixels(y * rowBytes + i - channels) & 0xff
          else 0
        val b = if (y > 0) pixels((y - 1) * rowBytes + i) & 0xff else 0
        val c = if (y > 0 && i >= channels)
          pixels((y - 1) * rowBytes + i - channels) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case _ => cur - paeth(a, b, c)
        }
        raw(base + 1 + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    val idat = try {
      defl.setInput(raw); defl.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) {
        val n = defl.deflate(buf); out.write(buf, 0, n)
      }
      out.toByteArray
    } finally defl.end()
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Sig, 0, 8)
    val ihdr = new Array[Byte](13)
    wrBe32(ihdr, 0, width); wrBe32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = (if (channels == 3) 2 else 6).toByte // color type
    // bytes 10-12 stay 0: compression, filter method, interlace
    writeChunk(bos, "IHDR", ihdr)
    writeChunk(bos, "IDAT", idat)
    writeChunk(bos, "IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** Full decode to display-order pixels; null on hostile/unsupported
    * input. Returns (width, height, channels, pixels).
    */
  private[functions] def decode(
      p: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    if (p == null || p.length < 8 + 25 + 12) return null
    var s = 0
    while (s < 8) { if (p(s) != Sig(s)) return null; s += 1 }
    var i = 8
    var w = 0; var h = 0; var ch = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      if (i + 12 > p.length) return null // truncated chunk header
      val len = beInt(p, i)
      if (len < 0 || i.toLong + 12L + len > p.length) return null
      // CRC over type+data: a flipped byte is corruption, not pixels
      val crc = new java.util.zip.CRC32()
      crc.update(p, i + 4, 4 + len)
      if (crc.getValue.toInt != beInt(p, i + 8 + len)) return null
      val typ = new String(p, i + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return null
          w = beInt(p, i + 8); h = beInt(p, i + 12)
          val depth = p(i + 16) & 0xff; val color = p(i + 17) & 0xff
          if (depth != 8 || p(i + 18) != 0 || p(i + 19) != 0 ||
              p(i + 20) != 0) return null // 16-bit / Adam7 unsupported
          ch = color match { case 2 => 3; case 6 => 4; case _ => return null }
          if (w <= 0 || w > (1 << 20) || h <= 0 || h > (1 << 20)) return null
          // inflate bound: reject rasters past 64 MiB (decompression-bomb
          // guard — a 100-byte blob may claim a terabyte raster)
          if ((1L + w.toLong * ch) * h > (1L << 26)) return null
        case "IDAT" =>
          if (!seenIhdr) return null
          idat.write(p, i + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks skipped
      }
      if (typ == "IHDR") seenIhdr = true
      i += 12 + len
    }
    if (!seenIhdr || idat.size == 0) return null
    val rowBytes = w * ch
    val expect = h * (1 + rowBytes)
    val raw = new Array[Byte](expect)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < expect && !inf.finished()) {
        val n = inf.inflate(raw, got, expect - got)
        // n == 0 while unfinished means truncated input OR a preset-
        // dictionary stream (FDICT) — either way hostile here, and
        // without the needsDictionary check the loop would never
        // terminate (inflate keeps returning 0)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          return null
        got += n
      }
      if (got != expect) return null
      // a stream longer than the raster is hostile, not extra pixels
      if (!inf.finished() && inf.inflate(new Array[Byte](1)) > 0) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    val px = new Array[Byte](h * rowBytes)
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + rowBytes)) & 0xff
      if (f > 4) return null
      val src = y * (1 + rowBytes) + 1
      var k = 0
      while (k < rowBytes) {
        val x = raw(src + k) & 0xff
        val a = if (k >= ch) px(y * rowBytes + k - ch) & 0xff else 0
        val b = if (y > 0) px((y - 1) * rowBytes + k) & 0xff else 0
        val c = if (y > 0 && k >= ch) px((y - 1) * rowBytes + k - ch) & 0xff
          else 0
        val v = f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) >> 1)
          case _ => x + paeth(a, b, c)
        }
        px(y * rowBytes + k) = (v & 0xff).toByte
        k += 1
      }
      y += 1
    }
    (w, h, ch, px)
  }

  /** Decode an 8-bit RGB/RGBA PNG's pixel stats:
    * `[ok, width, height, channels, n_pixels, pixel_sum, row0_sum]` —
    * pixel_sum over every channel byte of every pixel, row0_sum over
    * display row 0 (PNG stores top-down). Hostile input → ok=0 row of
    * zeros, never a throw.
    */
  def pngDecodeStats(p: Array[Byte]): Array[Long] = {
    val bad = new Array[Long](7)
    val d = decode(p)
    if (d == null) return bad
    val (w, h, ch, px) = d
    val rowBytes = w * ch
    var pixelSum = 0L; var row0Sum = 0L
    var k = 0
    while (k < px.length) {
      val v = (px(k) & 0xff).toLong
      pixelSum += v
      if (k < rowBytes) row0Sum += v
      k += 1
    }
    Array(1L, w.toLong, h.toLong, ch.toLong, w.toLong * h, pixelSum, row0Sum)
  }

  /** Nearest-neighbor resize of an 8-bit RGB/RGBA PNG to dstW × dstH,
    * re-encoded via [[pngEncode]] (filter None). Source pixel for
    * display (x, y) is (x*srcW div dstW, y*srcH div dstH) — the same
    * floor mapping as the BMP kernel and the oracle replay. Hostile
    * input → null, never a throw.
    */
  def pngResizeNn(p: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
    val d = decode(p)
    if (d == null) return null
    val (w, h, ch, px) = d
    val out = new Array[Byte](dstW * dstH * ch)
    var y = 0
    while (y < dstH) {
      val sy = (y.toLong * h / dstH).toInt
      var x = 0
      while (x < dstW) {
        val sx = (x.toLong * w / dstW).toInt
        var c = 0
        while (c < ch) {
          out((y * dstW + x) * ch + c) = px((sy * w + sx) * ch + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    pngEncode(out, dstW, dstH, ch, filterMode = 0)
  }
}

/** `png_encode(pixels)`: display-order w*h*ch pixel bytes → 8-bit PNG. */
case class PngEncode(child: Expression, imgWidth: Int, imgHeight: Int,
                     channels: Int, filterMode: Int)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_encode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"png_encode requires binary, got ${t.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    PngCodecKernels.pngEncode(v.asInstanceOf[Array[Byte]], imgWidth,
      imgHeight, channels, filterMode)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.PngCodecKernels.pngEncode($v, $imgWidth, " +
        s"$imgHeight, $channels, $filterMode)")
  override protected def withNewChildInternal(
      newChild: Expression): PngEncode = copy(child = newChild)
}

/** `png_decode_stats(payload)` →
  * [ok, w, h, channels, n_pixels, pixel_sum, row0_sum].
  */
case class PngDecodeStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "png_decode_stats"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"png_decode_stats requires binary, got ${t.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      PngCodecKernels.pngDecodeStats(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.PngCodecKernels.pngDecodeStats($v))")
  override protected def withNewChildInternal(
      newChild: Expression): PngDecodeStats = copy(child = newChild)
}

/** `png_resize_nn(payload)`: 8-bit RGB/RGBA PNG → dstW×dstH
  * nearest-neighbor resized PNG; null on hostile input (nullSafeEval
  * may return null — corrupt blobs flow through as missing, never as
  * task failures).
  */
case class PngResizeNn(child: Expression, dstW: Int, dstH: Int)
    extends UnaryExpression {
  require(dstW > 0 && dstH > 0 && dstW <= (1 << 14) && dstH <= (1 << 14),
    s"bad target dims: ${dstW}x$dstH")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_resize_nn"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"png_resize_nn requires binary, got ${t.catalogString}")
  }
  // the kernel returns null on HOSTILE input, not only on null input —
  // defineCodeGen would leave isNull=false and smuggle a Java null into
  // downstream generated code (same contract as BmpResizeNn)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    PngCodecKernels.pngResizeNn(v.asInstanceOf[Array[Byte]], dstW, dstH)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} =
         |  graft.functions.PngCodecKernels.pngResizeNn($v, $dstW, $dstH);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(
      newChild: Expression): PngResizeNn = copy(child = newChild)
}

object PngCodecExpressions {
  def pngEncode(pixels: Column, width: Int, height: Int,
                channels: Int = 3, filterMode: Int = 0): Column =
    ColumnBridge.column(PngEncode(
      ColumnBridge.expression(pixels), width, height, channels, filterMode))
  def pngDecodeStats(payload: Column): Column =
    ColumnBridge.column(PngDecodeStats(ColumnBridge.expression(payload)))
  def pngResizeNn(payload: Column, dstW: Int, dstH: Int): Column =
    ColumnBridge.column(
      PngResizeNn(ColumnBridge.expression(payload), dstW, dstH))
}
