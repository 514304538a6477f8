package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** JPEG/GIF decode via the JDK's own `javax.imageio` — the last
  * "needs codec libraries this build does not ship" claim for still
  * images was false too: `java.desktop` ships with the JDK and its
  * ImageIO registry carries JPEG, GIF, PNG and BMP readers/writers
  * that run headless. The remaining genuine constraint is MP4/video
  * (no inter-frame codec anywhere in the JDK).
  *
  * Division of labor with the native kernels: BMP/PNG/WAV stay on the
  * hand-written byte walks ([[MediaCodecKernels]], [[PngCodecKernels]])
  * — engine-deterministic, allocation-light, hostile-input-bounded —
  * while ImageIO covers the formats whose entropy coding the JDK only
  * exposes through `BufferedImage` (JPEG's DCT, GIF's LZW). Stats
  * semantics match the native kernels: pixel bytes are the R,G,B
  * channels per pixel (alpha dropped — JPEG has none and GIF's is
  * 1-bit), row 0 is the display top row.
  *
  * Determinism: a decode of fixed bytes is deterministic within one
  * JVM (the fixtures are minted and decoded by the same runtime), and
  * GIF's palette round trip is LOSSLESS for sources with <= 256
  * distinct colors — so GIF decode is oracle-exact end to end, while
  * JPEG's lossy sums are spec-pinned (tolerance + repeat-determinism)
  * and its oracle checks the exact fields: dimensions and pixel count.
  *
  * Hostile input → ok=0 / NULL, never a throw: ImageIO.read returns
  * null or throws on corrupt bytes; both map to the zero row.
  */
object ImageIoKernels {
  // executors inherit no -Djava.awt.headless; set it before any AWT
  // class loads, and keep ImageIO off its disk cache (a temp FILE per
  // row otherwise)
  System.setProperty("java.awt.headless", "true")
  javax.imageio.ImageIO.setUseCache(false)

  /** Raster cap: a hostile header claiming huge dims must be rejected
    * from the HEADER, before the library allocates the raster — a
    * post-decode check guards nothing (the decompression-bomb rule the
    * PNG kernel already follows). 16M pixels = a 64 MB int raster.
    */
  private val MaxPixels = 1L << 24

  private def readImage(p: Array[Byte]): java.awt.image.BufferedImage = {
    if (p == null || p.length == 0) return null
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(p))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val r = readers.next()
        try {
          r.setInput(iis)
          // header-only dims — the raster is not decoded yet
          val w = r.getWidth(0); val h = r.getHeight(0)
          if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) ||
            w.toLong * h > MaxPixels) return null
          r.read(0)
        } finally r.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** One bulk getRGB per image: the per-pixel form pays a virtual call
    * + color-model conversion per pixel — 10-50x the cost on the
    * feature-extraction path.
    */
  private def rgbRows(img: java.awt.image.BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)

  /** `[ok, width, height, n_pixels, pixel_sum, row0_sum]` over the
    * decoded R,G,B bytes; zero row on hostile/undecodable input.
    */
  def imageDecodeStats(p: Array[Byte]): Array[Long] = {
    val bad = new Array[Long](6)
    val img = readImage(p)
    if (img == null) return bad
    val w = img.getWidth; val h = img.getHeight
    val px = rgbRows(img)
    var pixelSum = 0L; var row0Sum = 0L
    var k = 0
    while (k < px.length) {
      val rgb = px(k)
      pixelSum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      if (k == w - 1) row0Sum = pixelSum
      k += 1
    }
    Array(1L, w.toLong, h.toLong, w.toLong * h, pixelSum, row0Sum)
  }

  /** Per-pixel luma bytes (truncating (r+g+b)/3, display order) of the
    * decoded raster — the RASTER-space input for perceptual hashing:
    * hashing decoded luma is stable under re-encoding (the point of a
    * perceptual hash), where hashing container bytes is not for
    * entropy-coded formats. Null on hostile/undecodable input.
    */
  def imageLumaBytes(p: Array[Byte]): Array[Byte] = {
    val img = readImage(p)
    if (img == null) return null
    // w*h <= MaxPixels by readImage's header gate, so the product and
    // the allocation are safe
    val px = rgbRows(img)
    val out = new Array[Byte](px.length)
    var k = 0
    while (k < px.length) {
      val rgb = px(k)
      out(k) = ((((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
        (rgb & 0xff)) / 3).toByte
      k += 1
    }
    out
  }

  /** Encode display-order RGB bytes (w*h*3, top row first) into
    * `format` ("jpg" | "gif" | "png" | "bmp") — the fixture minter.
    */
  def imageEncode(pixels: Array[Byte], width: Int, height: Int,
                  format: String): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims: ${width}x$height")
    require(pixels.length == width * height * 3,
      s"pixels must be w*h*3=${width * height * 3} bytes: ${pixels.length}")
    val rgbs = Array.tabulate(width * height) { k =>
      ((pixels(k * 3) & 0xff) << 16) | ((pixels(k * 3 + 1) & 0xff) << 8) |
        (pixels(k * 3 + 2) & 0xff)
    }
    writeImage(toImage(rgbs, width, height, format), format)
  }

  /** Raster → BufferedImage for `format`. GIF is palette-coded and the
    * JDK writer QUANTIZES a direct-color raster even when it holds few
    * colors, which would break the lossless-round-trip contract the
    * oracle fixtures rely on — hand it an explicitly indexed image
    * whenever the palette fits, so the written indices are exact.
    * Shared by encode AND resize (a gif→gif resize of a <=256-color
    * image must stay lossless too).
    */
  private def toImage(rgbs: Array[Int], width: Int, height: Int,
                      format: String): java.awt.image.BufferedImage = {
    val distinct = rgbs.distinct
    val img =
      if (format == "gif" && distinct.length <= 256) {
        val icm = new java.awt.image.IndexColorModel(8, distinct.length,
          distinct.map(v => ((v >> 16) & 0xff).toByte),
          distinct.map(v => ((v >> 8) & 0xff).toByte),
          distinct.map(v => (v & 0xff).toByte))
        new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      } else new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, rgbs, 0, width)
    img
  }

  /** ImageIO write with GIF forced NON-interlaced: the JDK GIF writer
    * default-interlaces, and its interlaced output round-trips with
    * PERMUTED ROWS for short images (reproduced at h=4: rows come back
    * as [0,3,1,*]; h=8 is fine) — a writer bug the explicit
    * ImageDescriptor interlaceFlag=FALSE sidesteps entirely.
    */
  private def writeImage(img: java.awt.image.BufferedImage,
                         format: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    if (format == "gif") {
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        wr.setOutput(ios)
        val wp = wr.getDefaultWriteParam
        val meta = wr.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), wp)
        val fmt = meta.getNativeMetadataFormatName
        val tree = meta.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
        val kids = tree.getChildNodes
        var k = 0
        while (k < kids.getLength) {
          if (kids.item(k).getNodeName == "ImageDescriptor")
            kids.item(k).asInstanceOf[org.w3c.dom.Element]
              .setAttribute("interlaceFlag", "FALSE")
          k += 1
        }
        meta.setFromTree(fmt, tree)
        wr.write(null, new javax.imageio.IIOImage(img, null, meta), wp)
      } finally { wr.dispose(); ios.close() }
    } else require(javax.imageio.ImageIO.write(img, format, bos),
      s"no ImageIO writer for format '$format'")
    bos.toByteArray
  }

  /** Nearest-neighbor resize to dstW × dstH, re-encoded in `format` —
    * the same floor mapping as the BMP/PNG kernels (src pixel =
    * (x*srcW div dstW, y*srcH div dstH)), applied through the decoded
    * raster so it is REAL for JPEG/GIF too. Null on hostile input.
    */
  def imageResizeNn(p: Array[Byte], dstW: Int, dstH: Int,
                    format: String): Array[Byte] = {
    val img = readImage(p) // dims header-gated inside
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    val src = rgbRows(img)
    val dst = new Array[Int](dstW * dstH)
    var y = 0
    while (y < dstH) {
      val sy = (y.toLong * h / dstH).toInt
      var x = 0
      while (x < dstW) {
        dst(y * dstW + x) = src(sy * w + (x.toLong * w / dstW).toInt)
        x += 1
      }
      y += 1
    }
    try writeImage(toImage(dst, dstW, dstH, format), format)
    catch { case scala.util.control.NonFatal(_) => null }
  }
}

/** `image_decode_stats(payload)` →
  * [ok, w, h, n_pixels, pixel_sum, row0_sum] via the JDK's ImageIO.
  */
case class ImageDecodeStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "image_decode_stats"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"image_decode_stats requires binary, got ${t.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      ImageIoKernels.imageDecodeStats(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ImageIoKernels.imageDecodeStats($v))")
  override protected def withNewChildInternal(
      newChild: Expression): ImageDecodeStats = copy(child = newChild)
}

/** `image_encode(pixels, w, h, format)`: display-order RGB bytes →
  * encoded container (fixture minting; require-throws on bad args,
  * like the other encoders).
  */
case class ImageEncode(child: Expression, imgWidth: Int, imgHeight: Int,
                       format: String) extends UnaryExpression {
  require(Seq("jpg", "gif", "png", "bmp").contains(format),
    s"unsupported image_encode format: $format")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "image_encode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"image_encode requires binary, got ${t.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    ImageIoKernels.imageEncode(v.asInstanceOf[Array[Byte]], imgWidth,
      imgHeight, format)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"""graft.functions.ImageIoKernels.imageEncode($v, $imgWidth, """ +
        s"""$imgHeight, "$format")""")
  override protected def withNewChildInternal(
      newChild: Expression): ImageEncode = copy(child = newChild)
}

/** `image_resize_nn(payload, w, h, format)`: decode (any ImageIO
  * format) → floor-mapped NN resample → re-encode; null on hostile
  * input (explicit codegen null check — the BmpResizeNn contract).
  */
case class ImageResizeNn(child: Expression, dstW: Int, dstH: Int,
                         format: String) extends UnaryExpression {
  require(dstW > 0 && dstH > 0 && dstW <= (1 << 14) && dstH <= (1 << 14),
    s"bad target dims: ${dstW}x$dstH")
  require(Seq("jpg", "gif", "png", "bmp").contains(format),
    s"unsupported image_resize_nn format: $format")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "image_resize_nn"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"image_resize_nn requires binary, got ${t.catalogString}")
  }
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ImageIoKernels.imageResizeNn(v.asInstanceOf[Array[Byte]], dstW, dstH,
      format)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.ImageIoKernels.imageResizeNn(
         |  $v, $dstW, $dstH, "$format");
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(
      newChild: Expression): ImageResizeNn = copy(child = newChild)
}

object ImageIoExpressions {
  def imageDecodeStats(payload: Column): Column =
    ColumnBridge.column(ImageDecodeStats(ColumnBridge.expression(payload)))
  def imageEncode(pixels: Column, width: Int, height: Int,
                  format: String): Column =
    ColumnBridge.column(ImageEncode(
      ColumnBridge.expression(pixels), width, height, format))
  def imageResizeNn(payload: Column, dstW: Int, dstH: Int,
                    format: String): Column =
    ColumnBridge.column(ImageResizeNn(
      ColumnBridge.expression(payload), dstW, dstH, format))
}
