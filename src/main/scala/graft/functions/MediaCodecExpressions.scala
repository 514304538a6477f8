package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** Real pixel/sample codecs for the media containers that need no
  * codec library — BMP (uncompressed 24-bit) and WAV (PCM16) are pure
  * byte layouts, so "decode" is a walk, not a stub; PNG (zlib DEFLATE
  * ships with the JDK) lives in [[PngCodecExpressions]]. This closes
  * the gap the multimodal column had; JPEG/GIF decode ride the JDK's
  * own ImageIO ([[ImageIoKernels]]), leaving only MP4/video (no
  * inter-frame codec in the JDK) on a stand-in.
  *
  * Encode exists so tests and oracle queries can mint byte-exact
  * containers from deterministic payloads; decode is the operator under
  * test. Both are native codegen'd kernels ([[MediaKernels]] pattern):
  * per-byte walks over binary columns have no builtin expression form,
  * and a string-cast + per-char lambda runs interpreted per byte.
  *
  * Reference behavior: the reference treats media payloads as opaque
  * bytes end-to-end; these kernels extend the probe-only surface
  * (`Multimodal.Probe`) to real content decode for uncompressed formats.
  */
object MediaCodecKernels {

  private def le16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
  }
  private def le32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
    b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
  }
  private def rdLe16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
  private def rdLe32(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
      ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)

  /** Build a bottom-up 24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
    * 4-byte row stride padding) from `pixels` — the display-order byte
    * array, top row first, `width*height*3` bytes. Stored row k holds
    * display row height-1-k, per the positive-height BMP contract.
    */
  def bmpEncode(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims: ${width}x$height")
    require(pixels.length == width * height * 3,
      s"pixels must be w*h*3=${width * height * 3} bytes: ${pixels.length}")
    val stride = ((width * 3 + 3) / 4) * 4
    val dataSize = stride * height
    val out = new Array[Byte](54 + dataSize) // padding bytes stay 0
    out(0) = 'B'; out(1) = 'M'
    le32(out, 2, 54 + dataSize)
    le32(out, 10, 54) // pixel-data offset
    le32(out, 14, 40) // BITMAPINFOHEADER size
    le32(out, 18, width)
    le32(out, 22, height) // positive = bottom-up
    le16(out, 26, 1) // planes
    le16(out, 28, 24) // bpp
    le32(out, 30, 0) // BI_RGB, uncompressed
    le32(out, 34, dataSize)
    var k = 0
    while (k < height) {
      System.arraycopy(pixels, (height - 1 - k) * width * 3,
        out, 54 + k * stride, width * 3)
      k += 1
    }
    out
  }

  /** Decode a 24-bit uncompressed BMP's pixel stats:
    * `[ok, width, height, n_pixels, pixel_sum, row0_sum]` — pixel_sum
    * over every channel byte of every pixel (padding EXCLUDED), row0_sum
    * over DISPLAY row 0 (the last stored row when bottom-up, the first
    * when height is negative/top-down). A decoder that ignores the
    * stride padding or the bottom-up row order gets both wrong on any
    * image whose rows differ. Hostile input → ok=0 row of zeros, never
    * a throw (corrupt blobs are data at corpus scale, not exceptions).
    */
  def bmpDecodeStats(p: Array[Byte]): Array[Long] = {
    val bad = new Array[Long](6)
    if (p == null || p.length < 54 || p(0) != 'B' || p(1) != 'M') return bad
    val off = rdLe32(p, 10)
    val hdrSize = rdLe32(p, 14)
    val w = rdLe32(p, 18)
    val hRaw = rdLe32(p, 22)
    val bpp = rdLe16(p, 28)
    val compression = rdLe32(p, 30)
    if (hdrSize < 40 || bpp != 24 || compression != 0 || w <= 0 ||
        hRaw == 0 || w > (1 << 20)) return bad
    val h = math.abs(hRaw)
    // math.abs(Int.MinValue) stays negative: bound h exactly like w so a
    // hostile height can never feed a negative stride*h into the bounds check.
    if (h <= 0 || h > (1 << 20)) return bad
    val bottomUp = hRaw > 0
    val stride = ((w * 3 + 3) / 4) * 4
    if (off < 54 || off.toLong + stride.toLong * h > p.length) return bad
    var pixelSum = 0L
    var row0Sum = 0L
    var k = 0
    while (k < h) {
      val displayRow = if (bottomUp) h - 1 - k else k
      val base = off + k * stride
      var x = 0
      var s = 0L
      while (x < w * 3) { s += (p(base + x) & 0xff); x += 1 }
      pixelSum += s
      if (displayRow == 0) row0Sum = s
      k += 1
    }
    Array(1L, w.toLong, h.toLong, w.toLong * h, pixelSum, row0Sum)
  }

  /** Nearest-neighbor resize of a 24-bit uncompressed BMP to
    * dstW × dstH, re-encoded via [[bmpEncode]] — the real "resize" leg
    * of the multimodal decode/feature/resize/frame-sample contract for
    * the codec-free format. Source pixel for display (x, y) is
    * (x·srcW DIV dstW, y·srcH DIV dstH) — the standard floor mapping,
    * chosen because an oracle can replay every byte choice exactly.
    * Handles bottom-up AND top-down sources (output is always the
    * canonical bottom-up layout [[bmpEncode]] writes). Hostile or
    * non-24-bit input → null, never a throw.
    */
  def bmpResizeNn(p: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
    if (p == null || p.length < 54 || p(0) != 'B' || p(1) != 'M') return null
    val off = rdLe32(p, 10)
    val hdrSize = rdLe32(p, 14)
    val w = rdLe32(p, 18)
    val hRaw = rdLe32(p, 22)
    val bpp = rdLe16(p, 28)
    val compression = rdLe32(p, 30)
    if (hdrSize < 40 || bpp != 24 || compression != 0 || w <= 0 ||
        hRaw == 0 || w > (1 << 20)) return null
    val h = math.abs(hRaw)
    // math.abs(Int.MinValue) stays negative: a negative stride*h product
    // would pass the length check below and the pixel loop would index out
    // of range — bound h exactly like w (hostile input → null, not a throw).
    if (h <= 0 || h > (1 << 20)) return null
    val bottomUp = hRaw > 0
    val stride = ((w * 3 + 3) / 4) * 4
    if (off < 54 || off.toLong + stride.toLong * h > p.length) return null
    val out = new Array[Byte](dstW * dstH * 3)
    var y = 0
    while (y < dstH) {
      val sy = (y.toLong * h / dstH).toInt
      val stored = if (bottomUp) h - 1 - sy else sy
      val base = off + stored * stride
      var x = 0
      while (x < dstW) {
        val sx = (x.toLong * w / dstW).toInt
        val si = base + sx * 3
        val di = (y * dstW + x) * 3
        out(di) = p(si); out(di + 1) = p(si + 1); out(di + 2) = p(si + 2)
        x += 1
      }
      y += 1
    }
    bmpEncode(out, dstW, dstH)
  }

  /** AREA-AVERAGE downscale of a 24-bit BMP (the "box" reduce real
    * image pipelines use below 1:1 — each destination pixel is the
    * per-channel mean of its floor-partitioned source block
    * [x·w DIV dw, (x+1)·w DIV dw) × [y·h DIV dh, (y+1)·h DIV dh), so
    * every source pixel lands in exactly one block and the oracle can
    * replay the integer mean). Division truncates toward zero — the
    * same semantics as DuckDB's `//` on the non-negative byte sums.
    * Downscale only (an upscale would make empty blocks): larger
    * target dims → null, like hostile input.
    */
  def bmpResizeArea(p: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
    if (p == null || p.length < 54 || p(0) != 'B' || p(1) != 'M') return null
    val off = rdLe32(p, 10)
    val hdrSize = rdLe32(p, 14)
    val w = rdLe32(p, 18)
    val hRaw = rdLe32(p, 22)
    val bpp = rdLe16(p, 28)
    val compression = rdLe32(p, 30)
    if (hdrSize < 40 || bpp != 24 || compression != 0 || w <= 0 ||
        hRaw == 0 || w > (1 << 20)) return null
    val h = math.abs(hRaw)
    // Same Int.MinValue abs hazard as bmpResizeNn (the dstH > h guard
    // already rejects negative h, but keep the bound uniform across kernels).
    if (h <= 0 || h > (1 << 20)) return null
    if (dstW > w || dstH > h) return null
    val bottomUp = hRaw > 0
    val stride = ((w * 3 + 3) / 4) * 4
    if (off < 54 || off.toLong + stride.toLong * h > p.length) return null
    val out = new Array[Byte](dstW * dstH * 3)
    var y = 0
    while (y < dstH) {
      val ys0 = (y.toLong * h / dstH).toInt
      val ys1 = ((y + 1).toLong * h / dstH).toInt
      var x = 0
      while (x < dstW) {
        val xs0 = (x.toLong * w / dstW).toInt
        val xs1 = ((x + 1).toLong * w / dstW).toInt
        val n = (ys1 - ys0).toLong * (xs1 - xs0)
        var ch = 0
        while (ch < 3) {
          var s = 0L
          var sy = ys0
          while (sy < ys1) {
            val stored = if (bottomUp) h - 1 - sy else sy
            val base = off + stored * stride
            var sx = xs0
            while (sx < xs1) {
              s += (p(base + sx * 3 + ch) & 0xff)
              sx += 1
            }
            sy += 1
          }
          out((y * dstW + x) * 3 + ch) = (s / n).toByte
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    bmpEncode(out, dstW, dstH)
  }

  /** Build a mono PCM16 RIFF/WAVE container from `samples` (each
    * clamped-assumed int16 range; caller guarantees range).
    */
  def wavEncode(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate: $sampleRate")
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    le32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    le32(out, 16, 16) // fmt chunk size
    le16(out, 20, 1) // PCM
    le16(out, 22, 1) // mono
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate * 2) // byte rate
    le16(out, 32, 2) // block align
    le16(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    le32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) {
      le16(out, 44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode a PCM16 WAV's sample stats:
    * `[ok, sample_rate, n_samples, sum_amp, sum_sq, duration_ms]` —
    * sum_amp over sign-extended samples (negative amplitudes must
    * survive the 16-bit read), sum_sq the exact integer energy (the
    * fixed-point RMS numerator), duration from data bytes over the fmt
    * byte rate. Chunk-walks the RIFF body (fmt need not be adjacent to
    * data — encoders drop LIST/INFO chunks in between), same hostile-
    * input discipline as [[bmpDecodeStats]]: non-PCM16, truncated, or
    * non-advancing chunks → ok=0, never a throw.
    */
  /** RIFF chunk walk shared by the WAV kernels:
    * `[ok, sampleRate, byteRate, dataStart, dataLen]`, ok=0 on hostile
    * input (non-PCM16, truncated, non-advancing chunks).
    */
  private def wavLayout(p: Array[Byte]): Array[Long] = {
    val bad = new Array[Long](5)
    if (p == null || p.length < 44 ||
        p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
        p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E') return bad
    var i = 12
    var sampleRate = -1L
    var byteRate = -1L
    var fmtOk = false
    var dataStart = -1
    var dataLen = -1
    while (i + 8 <= p.length) {
      val isFmt = p(i) == 'f' && p(i + 1) == 'm' && p(i + 2) == 't' &&
        p(i + 3) == ' '
      val isData = p(i) == 'd' && p(i + 1) == 'a' && p(i + 2) == 't' &&
        p(i + 3) == 'a'
      val size = rdLe32(p, i + 4).toLong & 0xffffffffL
      if (isFmt && i + 8 + 16 <= p.length) {
        val audioFormat = rdLe16(p, i + 8)
        val channels = rdLe16(p, i + 10)
        val bits = rdLe16(p, i + 22)
        sampleRate = rdLe32(p, i + 12).toLong & 0xffffffffL
        byteRate = rdLe32(p, i + 16).toLong & 0xffffffffL
        fmtOk = audioFormat == 1 && channels >= 1 && bits == 16 &&
          sampleRate > 0
      }
      if (isData) {
        dataStart = i + 8
        dataLen = math.min(size, (p.length - dataStart).toLong).toInt
      }
      val advance = 8L + size + (size & 1L) // chunks are word-aligned
      if (advance <= 8L || i + advance > Int.MaxValue) i = p.length
      else i += advance.toInt
    }
    if (!fmtOk || dataStart < 0 || dataLen < 0) return bad
    Array(1L, sampleRate, byteRate, dataStart.toLong, dataLen.toLong)
  }

  def wavDecodeStats(p: Array[Byte]): Array[Long] = {
    val bad = new Array[Long](6)
    val lay = wavLayout(p)
    if (lay(0) == 0L) return bad
    val sampleRate = lay(1)
    val byteRate = lay(2)
    val dataStart = lay(3).toInt
    val dataLen = lay(4).toInt
    val nSamples = dataLen / 2
    var sumAmp = 0L
    var sumSq = 0L
    var j = 0
    while (j < nSamples) {
      val s = rdLe16(p, dataStart + j * 2).toShort.toLong // sign-extend
      sumAmp += s
      sumSq += s * s
      j += 1
    }
    val durationMs = if (byteRate > 0) dataLen.toLong * 1000L / byteRate
                     else -1L
    Array(1L, sampleRate, nSamples.toLong, sumAmp, sumSq, durationMs)
  }

  /** Decode a PCM16 WAV's samples as a plain int array (sign-extended)
    * — the compose-built-ins bridge for audio feature extraction: one
    * kernel call turns the payload into data the DataFrame layer can
    * explode/window/aggregate (frame energy, zero crossings, clipping),
    * keeping the FEATURE math declarative and oracle-replayable instead
    * of buried in another kernel. The array is 2x the payload's data
    * bytes — proportional, never a decompression bomb. Hostile input →
    * null, never a throw.
    */
  def wavSamples(p: Array[Byte]): Array[Int] = {
    val lay = wavLayout(p)
    if (lay(0) == 0L) return null
    val dataStart = lay(3).toInt
    val nSamples = lay(4).toInt / 2
    val out = new Array[Int](nSamples)
    var j = 0
    while (j < nSamples) {
      out(j) = rdLe16(p, dataStart + j * 2).toShort.toInt // sign-extend
      j += 1
    }
    out
  }

  /** Integer-factor PCM16 decimation: keep every `factor`-th sample
    * starting at sample 0, re-encoded at srcRate/factor via
    * [[wavEncode]] — the real "resample" leg for the codec-free audio
    * format. Deliberately the NAIVE decimator (no anti-alias filter):
    * the byte choices are exactly oracle-replayable, and the filtered
    * variant is a windowed integer convolution over the same walk.
    * Hostile input or a rate not divisible by `factor` → null.
    */
  def wavDownsample(p: Array[Byte], factor: Int): Array[Byte] = {
    val lay = wavLayout(p)
    if (lay(0) == 0L) return null
    val sampleRate = lay(1)
    val dataStart = lay(3).toInt
    val nSamples = lay(4).toInt / 2
    // wavLayout reads the rate as UNSIGNED 32-bit: a hostile fmt header with
    // rate >= 2^31 would wrap (rate/factor).toInt negative and wavEncode's
    // require would throw — hostile input must return null, never a throw.
    if (factor <= 0 || sampleRate <= 0 || sampleRate > Int.MaxValue) return null
    if (sampleRate % factor != 0) return null
    val outN = (nSamples + factor - 1) / factor
    val samples = new Array[Int](outN)
    var j = 0
    while (j < outN) {
      samples(j) = rdLe16(p, dataStart + j * factor * 2).toShort.toInt
      j += 1
    }
    wavEncode(samples, (sampleRate / factor).toInt)
  }

  /** Mean-decimating PCM16 downsample — the box anti-alias filter over
    * the same walk as [[wavDownsample]]: output sample j is the
    * truncating-toward-zero integer mean of source window
    * [j·factor, min((j+1)·factor, n)) (Scala `/` and DuckDB `//` agree
    * on negatives, so the oracle replays the mean bit for bit; the
    * tail window may be partial). Same rate-divisibility guard.
    */
  def wavDownsampleMean(p: Array[Byte], factor: Int): Array[Byte] = {
    val lay = wavLayout(p)
    if (lay(0) == 0L) return null
    val sampleRate = lay(1)
    val dataStart = lay(3).toInt
    val nSamples = lay(4).toInt / 2
    // Same unsigned-rate wrap hazard as wavDownsample: guard before dividing.
    if (factor <= 0 || sampleRate <= 0 || sampleRate > Int.MaxValue) return null
    if (sampleRate % factor != 0) return null
    val outN = (nSamples + factor - 1) / factor
    val samples = new Array[Int](outN)
    var j = 0
    while (j < outN) {
      val from = j * factor
      val until = math.min(from + factor, nSamples)
      var s = 0L
      var i = from
      while (i < until) {
        s += rdLe16(p, dataStart + i * 2).toShort.toLong
        i += 1
      }
      samples(j) = (s / (until - from)).toInt
      j += 1
    }
    wavEncode(samples, (sampleRate / factor).toInt)
  }
}

/** `bmp_encode(pixels)`: display-order w*h*3 pixel bytes → 24-bit BMP. */
case class BmpEncode(child: Expression, imgWidth: Int, imgHeight: Int)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bmp_encode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bmp_encode requires binary, got ${t.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    MediaCodecKernels.bmpEncode(v.asInstanceOf[Array[Byte]], imgWidth, imgHeight)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.MediaCodecKernels.bmpEncode($v, $imgWidth, $imgHeight)")
  override protected def withNewChildInternal(
      newChild: Expression): BmpEncode = copy(child = newChild)
}

/** `bmp_decode_stats(payload)` → [ok, w, h, n_pixels, pixel_sum, row0_sum]. */
case class BmpDecodeStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bmp_decode_stats"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bmp_decode_stats requires binary, got ${t.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      MediaCodecKernels.bmpDecodeStats(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MediaCodecKernels.bmpDecodeStats($v))")
  override protected def withNewChildInternal(
      newChild: Expression): BmpDecodeStats = copy(child = newChild)
}

/** `bmp_resize_nn(payload)`: 24-bit BMP → dstW×dstH nearest-neighbor
  * resized BMP; null on hostile input (nullSafeEval may return null —
  * corrupt blobs flow through as missing, never as task failures).
  */
case class BmpResizeNn(child: Expression, dstW: Int, dstH: Int)
    extends UnaryExpression {
  require(dstW > 0 && dstH > 0 && dstW <= (1 << 14) && dstH <= (1 << 14),
    s"bad target dims: ${dstW}x$dstH")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bmp_resize_nn"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bmp_resize_nn requires binary, got ${t.catalogString}")
  }
  // the kernel returns null on HOSTILE input, not only on null input —
  // defineCodeGen would leave isNull=false and smuggle a Java null into
  // downstream generated code (the interpreted path was already correct)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaCodecKernels.bmpResizeNn(v.asInstanceOf[Array[Byte]], dstW, dstH)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} =
         |  graft.functions.MediaCodecKernels.bmpResizeNn($v, $dstW, $dstH);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(
      newChild: Expression): BmpResizeNn = copy(child = newChild)
}

/** `bmp_resize_area(payload)`: 24-bit BMP → dstW×dstH box-filtered
  * downscale; null on hostile input or an upscale request.
  */
case class BmpResizeArea(child: Expression, dstW: Int, dstH: Int)
    extends UnaryExpression {
  require(dstW > 0 && dstH > 0 && dstW <= (1 << 14) && dstH <= (1 << 14),
    s"bad target dims: ${dstW}x$dstH")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bmp_resize_area"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bmp_resize_area requires binary, got ${t.catalogString}")
  }
  // null on hostile/upscale from NON-null input: see BmpResizeNn's note
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaCodecKernels.bmpResizeArea(v.asInstanceOf[Array[Byte]], dstW, dstH)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} =
         |  graft.functions.MediaCodecKernels.bmpResizeArea($v, $dstW, $dstH);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(
      newChild: Expression): BmpResizeArea = copy(child = newChild)
}

/** `wav_downsample_mean(payload)`: PCM16 WAV → per-window integer-mean
  * WAV at srcRate/factor; null on hostile input or non-divisible rate.
  */
case class WavDownsampleMean(child: Expression, factor: Int)
    extends UnaryExpression {
  require(factor > 0, s"bad decimation factor: $factor")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_downsample_mean"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wav_downsample_mean requires binary, got ${t.catalogString}")
  }
  // null on hostile/non-divisible from NON-null input: see BmpResizeNn
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaCodecKernels.wavDownsampleMean(v.asInstanceOf[Array[Byte]], factor)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} =
         |  graft.functions.MediaCodecKernels.wavDownsampleMean($v, $factor);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(
      newChild: Expression): WavDownsampleMean = copy(child = newChild)
}

/** `wav_downsample(payload)`: PCM16 WAV → every-factor-th-sample WAV at
  * srcRate/factor; null on hostile input or non-divisible rate.
  */
case class WavDownsample(child: Expression, factor: Int)
    extends UnaryExpression {
  require(factor > 0, s"bad decimation factor: $factor")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_downsample"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wav_downsample requires binary, got ${t.catalogString}")
  }
  // null on hostile/non-divisible from NON-null input: see BmpResizeNn
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaCodecKernels.wavDownsample(v.asInstanceOf[Array[Byte]], factor)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} =
         |  graft.functions.MediaCodecKernels.wavDownsample($v, $factor);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(
      newChild: Expression): WavDownsample = copy(child = newChild)
}

/** `wav_encode(samples)`: array<int> int16-range samples → PCM16 WAV. */
case class WavEncode(child: Expression, sampleRate: Int)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_encode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wav_encode requires array<int>, got ${t.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    MediaCodecKernels.wavEncode(
      v.asInstanceOf[ArrayData].toIntArray(), sampleRate)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.MediaCodecKernels.wavEncode($v.toIntArray(), $sampleRate)")
  override protected def withNewChildInternal(
      newChild: Expression): WavEncode = copy(child = newChild)
}

/** `wav_decode_stats(payload)` →
  * [ok, sample_rate, n_samples, sum_amp, sum_sq, duration_ms].
  */
case class WavDecodeStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "wav_decode_stats"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wav_decode_stats requires binary, got ${t.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      MediaCodecKernels.wavDecodeStats(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MediaCodecKernels.wavDecodeStats($v))")
  override protected def withNewChildInternal(
      newChild: Expression): WavDecodeStats = copy(child = newChild)
}

/** `wav_samples(payload)` → array<int> of sign-extended PCM16 samples;
  * null on hostile input (the kernel returns null for non-null bad
  * bytes, so codegen carries an explicit null check — the BmpResizeNn
  * contract).
  */
case class WavSamples(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "wav_samples"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wav_samples requires binary, got ${t.catalogString}")
  }
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val s = MediaCodecKernels.wavSamples(v.asInstanceOf[Array[Byte]])
    if (s == null) null else new GenericArrayData(s)
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { v =>
      val s = ctx.freshName("wavSamples")
      s"""int[] $s = graft.functions.MediaCodecKernels.wavSamples($v);
         |${ev.isNull} = $s == null;
         |if (!${ev.isNull}) {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($s);
         |}""".stripMargin
    })
  override protected def withNewChildInternal(
      newChild: Expression): WavSamples = copy(child = newChild)
}

object MediaCodecExpressions {
  def wavSamples(payload: Column): Column =
    ColumnBridge.column(WavSamples(ColumnBridge.expression(payload)))
  def bmpEncode(pixels: Column, width: Int, height: Int): Column =
    ColumnBridge.column(
      BmpEncode(ColumnBridge.expression(pixels), width, height))
  def bmpDecodeStats(payload: Column): Column =
    ColumnBridge.column(BmpDecodeStats(ColumnBridge.expression(payload)))
  def bmpResizeNn(payload: Column, dstW: Int, dstH: Int): Column =
    ColumnBridge.column(
      BmpResizeNn(ColumnBridge.expression(payload), dstW, dstH))
  def wavEncode(samples: Column, sampleRate: Int): Column =
    ColumnBridge.column(
      WavEncode(ColumnBridge.expression(samples), sampleRate))
  def wavDecodeStats(payload: Column): Column =
    ColumnBridge.column(WavDecodeStats(ColumnBridge.expression(payload)))
  def wavDownsample(payload: Column, factor: Int): Column =
    ColumnBridge.column(
      WavDownsample(ColumnBridge.expression(payload), factor))
  def bmpResizeArea(payload: Column, dstW: Int, dstH: Int): Column =
    ColumnBridge.column(
      BmpResizeArea(ColumnBridge.expression(payload), dstW, dstH))
  def wavDownsampleMean(payload: Column, factor: Int): Column =
    ColumnBridge.column(
      WavDownsampleMean(ColumnBridge.expression(payload), factor))
}
