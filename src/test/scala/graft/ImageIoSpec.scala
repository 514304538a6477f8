package graft

import org.apache.spark.sql.functions._
import graft.functions.{ImageIoKernels, MediaCodecKernels, PngCodecKernels}
import graft.ops.Multimodal

/** JPEG/GIF decode via the JDK's ImageIO, and CROSS-VALIDATION of the
  * hand-rolled PNG/BMP kernels against the JDK's independent decoders —
  * two implementations agreeing on the same bytes is the strongest
  * reference available in-image.
  */
class ImageIoSpec extends SparkSpec {

  private val w = 9; private val h = 6
  private def rgb: Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 31 + (i / 27) * 13) % 253).toByte)
  private def sum(px: Array[Byte]): Long =
    px.map(b => (b & 0xff).toLong).sum
  private def row0(px: Array[Byte]): Long =
    px.take(w * 3).map(b => (b & 0xff).toLong).sum

  test("GIF round trip is LOSSLESS for <=256-color sources (incl. the h=4 writer bug)") {
    val gif = ImageIoKernels.imageEncode(rgb, w, h, "gif")
    assert(ImageIoKernels.imageDecodeStats(gif).toSeq ===
      Seq(1L, w.toLong, h.toLong, (w * h).toLong, sum(rgb), row0(rgb)))
    // the JDK GIF writer default-interlaces and PERMUTES rows for short
    // images (h=4 reproduces it); the explicit non-interlaced write
    // must round-trip row0 exactly there too
    val px4 = rgb.take(7 * 4 * 3)
    val gif4 = ImageIoKernels.imageEncode(px4, 7, 4, "gif")
    assert(ImageIoKernels.imageDecodeStats(gif4).toSeq ===
      Seq(1L, 7L, 4L, 28L, sum(px4),
        px4.take(21).map(b => (b & 0xff).toLong).sum))
  }

  test("cross-validation: the JDK's independent decoders agree with the native kernels") {
    // our PNG encoder (all five filters cycled) -> JDK decode
    val png = PngCodecKernels.pngEncode(rgb, w, h, 3, 1)
    assert(ImageIoKernels.imageDecodeStats(png).toSeq ===
      Seq(1L, w.toLong, h.toLong, (w * h).toLong, sum(rgb), row0(rgb)),
      "JDK PNG decoder disagrees with our PNG encoder")
    // and the reverse: JDK PNG encoder -> our decoder
    val jdkPng = ImageIoKernels.imageEncode(rgb, w, h, "png")
    val ours = PngCodecKernels.pngDecodeStats(jdkPng)
    assert(ours.toSeq === Seq(1L, w.toLong, h.toLong, 3L, (w * h).toLong,
      sum(rgb), row0(rgb)),
      "our PNG decoder disagrees with the JDK encoder")
    // BMP: channel bytes reorder (BGR vs RGB) but sums are invariant
    val bmp = MediaCodecKernels.bmpEncode(rgb, w, h)
    assert(ImageIoKernels.imageDecodeStats(bmp).toSeq ===
      Seq(1L, w.toLong, h.toLong, (w * h).toLong, sum(rgb), row0(rgb)),
      "JDK BMP decoder disagrees with our BMP encoder")
  }

  test("JPEG decode: dims exact, sums lossy-but-close and deterministic") {
    val jpg = ImageIoKernels.imageEncode(rgb, w, h, "jpg")
    val st1 = ImageIoKernels.imageDecodeStats(jpg)
    val st2 = ImageIoKernels.imageDecodeStats(jpg)
    assert(st1.toSeq === st2.toSeq, "JPEG decode must be deterministic")
    assert(st1(0) === 1L && st1(1) === w && st1(2) === h &&
      st1(3) === w * h)
    val meanWant = sum(rgb).toDouble / (w * h * 3)
    val meanGot = st1(4).toDouble / (w * h * 3)
    assert(math.abs(meanGot - meanWant) <= 16.0,
      s"JPEG mean drifted: want ~$meanWant got $meanGot")
  }

  test("imageResizeNn: exact floor mapping through GIF, real for JPEG, hostile-null") {
    val gif = ImageIoKernels.imageEncode(rgb, w, h, "gif")
    val down = ImageIoKernels.imageResizeNn(gif, 3, 2, "gif")
    val expect = Array.tabulate(3 * 2 * 3) { k =>
      val c = k % 3; val x = (k / 3) % 3; val y = k / 9
      rgb((y * h / 2 * w + x * w / 3) * 3 + c)
    }
    assert(ImageIoKernels.imageDecodeStats(down).toSeq ===
      Seq(1L, 3L, 2L, 6L, sum(expect),
        expect.take(9).map(b => (b & 0xff).toLong).sum))
    // identity gif->gif resize of a ~54-color image must stay lossless
    // (the re-encode goes through the same indexed-palette path as the
    // encoder — a direct-color write would let the JDK writer quantize)
    val same = ImageIoKernels.imageResizeNn(gif, w, h, "gif")
    assert(ImageIoKernels.imageDecodeStats(same).toSeq ===
      Seq(1L, w.toLong, h.toLong, (w * h).toLong, sum(rgb), row0(rgb)),
      "gif->gif resize quantized a <=256-color raster")
    val jr = ImageIoKernels.imageResizeNn(
      ImageIoKernels.imageEncode(rgb, w, h, "jpg"), 4, 3, "jpg")
    val jst = ImageIoKernels.imageDecodeStats(jr)
    assert(jst(0) === 1L && jst(1) === 4L && jst(2) === 3L)
    assert(ImageIoKernels.imageResizeNn(
      "not an image".getBytes("UTF-8"), 2, 2, "gif") === null)
    assert(ImageIoKernels.imageDecodeStats(
      "not an image".getBytes("UTF-8"))(0) === 0L)
  }

  test("Codec.decodeImage: REAL luma + raster phash for decodable, fallback otherwise") {
    val gif = ImageIoKernels.imageEncode(rgb, w, h, "gif")
    val (luma, phash, ok) = Multimodal.Codec.decodeImage(gif)
    assert(ok, "a decodable image must report decode_ok")
    val wantLuma = rgb.grouped(3)
      .map(t => ((t(0) & 0xff) + (t(1) & 0xff) + (t(2) & 0xff)) / 3)
      .sum.toDouble / (w * h) / 255.0
    assert(math.abs(luma - wantLuma) < 1e-9, s"luma $luma != $wantLuma")
    // the phash is over decoded LUMA, so a re-encode through a
    // different lossless container hashes IDENTICALLY — the property
    // payload-byte hashing cannot have for entropy-coded formats
    val png = ImageIoKernels.imageEncode(rgb, w, h, "png")
    assert(Multimodal.Codec.decodeImage(png)._2 === phash,
      "raster phash must be container-independent")
    val (_, _, okBad) = Multimodal.Codec.decodeImage("junk".getBytes)
    assert(!okBad, "undecodable bytes must report decode_ok=false")
  }

  test("decodeImageIoStats/resizeImageIo: columnar null-safety and meta sync") {
    import spark.implicits._
    val rows = Seq(
      (1L, ImageIoKernels.imageEncode(rgb, w, h, "jpg")),
      (2L, "garbage".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]))
    val media = Multimodal.asMediaTable(
      rows.toDF("id", "blob"), "id", "blob", "image", "jpeg")
    val st = Multimodal.decodeImageIoStats(media)
      .orderBy(col("media_id")).collect()
    assert(st(0).getLong(1) === 1L && st(0).getLong(2) === w)
    assert(st(1).getLong(1) === 0L)
    assert(st(2).isNullAt(1))
    val rs = Multimodal.resizeImageIo(media, 3, 2, "jpg")
      .orderBy(col("media_id")).collect()
    assert(rs(0).getAs[Array[Byte]]("payload") != null)
    assert(rs(0).getStruct(2).getInt(2) === 3 &&
      rs(0).getStruct(2).getInt(3) === 2)
    assert(rs(1).isNullAt(1) && rs(1).getStruct(2).isNullAt(2))
  }
}
