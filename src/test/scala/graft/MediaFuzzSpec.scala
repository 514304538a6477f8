package graft

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.BinaryType
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._
import graft.ops.Multimodal

/** Generator-driven hostile-input sweep over every BINARY media kernel —
  * the media face of [[FuzzSpec]]. The documented contract for
  * untrusted blobs ("corrupt blobs never cause task failures") is
  * stricter than the wire decoders' typed-error contract: these kernels
  * sit inside per-row expression eval on crawl payloads, where ANY
  * throw fails the whole task, so every decode-direction expression
  * must return a value or null on EVERY input — no exception class is
  * acceptable.
  *
  * Two corpora per sweep: pure random bytes (front-guard coverage — a
  * magic-number check rejects almost everything) and single-byte
  * mutations/truncations of VALID containers minted by the repo's own
  * encoders (deep-field coverage: a mutated valid header reaches the
  * sample tables, chunk-offset walks, scanline unfilters, and inflate
  * loops that random bytes never do).
  */
class MediaFuzzSpec extends AnyFunSuite with PropSupport {

  private def lit(bs: Array[Byte]) = Literal(bs, BinaryType)

  /** Every decode-direction media kernel, driven at the EXPRESSION
    * level (interpreted eval — the same nullSafeEval codegen calls).
    */
  private val targets: Seq[(String, Array[Byte] => Any)] = Seq(
    ("png_decode_stats", bs => PngDecodeStats(lit(bs)).eval(null)),
    ("png_resize_nn", bs => PngResizeNn(lit(bs), 2, 2).eval(null)),
    ("bmp_decode_stats", bs => BmpDecodeStats(lit(bs)).eval(null)),
    ("bmp_resize_nn", bs => BmpResizeNn(lit(bs), 2, 2).eval(null)),
    ("bmp_resize_area", bs => BmpResizeArea(lit(bs), 2, 2).eval(null)),
    ("wav_decode_stats", bs => WavDecodeStats(lit(bs)).eval(null)),
    ("wav_samples", bs => WavSamples(lit(bs)).eval(null)),
    ("wav_downsample", bs => WavDownsample(lit(bs), 2).eval(null)),
    ("wav_downsample_mean", bs => WavDownsampleMean(lit(bs), 2).eval(null)),
    ("mp4_demux_stats", bs => Mp4DemuxStats(lit(bs)).eval(null)),
    ("mp4_sync_indices", bs => Mp4SyncIndices(lit(bs)).eval(null)),
    ("mp4_sync_samples", bs => Mp4SyncSamples(lit(bs)).eval(null)),
    ("warc_records", bs => WarcRecords(lit(bs)).eval(null)),
    ("image_decode_stats", bs => ImageDecodeStats(lit(bs)).eval(null)),
    ("image_resize_nn", bs => ImageResizeNn(lit(bs), 2, 2, "png").eval(null)),
    ("probe_sniff", bs => Multimodal.Probe.sniff(bs))
  )

  private def sweep(bs: Array[Byte]): Unit =
    targets.foreach { case (name, run) =>
      try { run(bs); () }
      catch {
        case e: Throwable =>
          throw new AssertionError(
            s"$name threw ${e.getClass.getName} on ${bs.length}-byte input " +
              bs.take(64).map(b => f"$b%02x").mkString, e)
      }
    }

  private val randomBytes: Gen[Array[Byte]] = for {
    n <- Gen.frequency(4 -> Gen.choose(0, 64), 2 -> Gen.choose(64, 512),
      1 -> Gen.choose(512, 4096))
    bs <- Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield bs

  /** One random single-byte mutation + an optional truncation of a
    * valid base container ([[FuzzSpec]]'s mutated-corpus half).
    */
  private def mutatedGen(base: Array[Byte]): Gen[Array[Byte]] = for {
    pos <- Gen.choose(0, base.length - 1)
    b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
    cut <- Gen.frequency(3 -> Gen.const(base.length),
      1 -> Gen.choose(0, base.length))
  } yield {
    val a = java.util.Arrays.copyOf(base, math.min(cut, base.length))
    if (pos < a.length) a(pos) = b
    a
  }

  // ---- valid containers minted by the repo's own encoders ----

  private val pngFix = PngCodecKernels.pngEncode(
    Array.tabulate(4 * 3 * 3)(i => (i * 7).toByte), 4, 3, 3, 1)
  private val bmpFix = MediaCodecKernels.bmpEncode(
    Array.tabulate(4 * 3 * 3)(i => (i * 5).toByte), 4, 3)
  private val wavFix = MediaCodecKernels.wavEncode(
    Array.tabulate(50)(i => i * 97 - 2500), 8000)
  private val mp4Fix = Mp4CodecKernels.mp4Encode(
    Array.tabulate(6)(i => Array.tabulate(8)(j => ((i * 8 + j) * 3).toByte)),
    90000, 3000, 2)
  // the 64-bit parse paths (co64 chunk offsets + v1 mdhd) — where the
  // Long-overflow bound fix lives, so mutations must hammer it
  private val mp4Co64Fix = Mp4CodecKernels.mp4EncodeOpt(
    Array.tabulate(5)(i => Array.tabulate(6)(j => ((i * 6 + j) * 11).toByte)),
    90000, 3000, 2, useCo64 = true, mdhdV1 = true)
  private val gifFix = ImageIoKernels.imageEncode(
    Array.tabulate(4 * 3 * 3)(i => (i * 13).toByte), 4, 3, "gif")

  private def warcRec(tpe: String, body: String): String =
    s"WARC/1.0\r\nWARC-Type: $tpe\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n" +
      body + "\r\n\r\n"
  private val warcFix =
    (warcRec("warcinfo", "software: fuzz\r\n") +
      warcRec("response", "HTTP/1.1 200 OK\r\n\r\nhello")).getBytes("UTF-8")
  private val warcGzFix = {
    val out = new ByteArrayOutputStream()
    Seq(warcRec("warcinfo", "software: fuzz\r\n"),
      warcRec("response", "HTTP/1.1 200 OK\r\n\r\nhello")).foreach { r =>
      val gz = new GZIPOutputStream(out)
      gz.write(r.getBytes("UTF-8")); gz.finish()
    }
    out.toByteArray
  }

  test("media fuzz: random bytes — every kernel returns or nulls, never throws") {
    forAllGen(randomBytes, cases = 4000)(sweep)
  }

  test("media fuzz: empty and every single-byte input") {
    sweep(Array.emptyByteArray)
    (0 until 256).foreach(b => sweep(Array(b.toByte)))
  }

  test("media fuzz: mutated valid containers reach the deep field readers") {
    for (fix <- Seq(pngFix, bmpFix, wavFix, mp4Fix, mp4Co64Fix, gifFix,
      warcFix, warcGzFix)) {
      assert(fix != null && fix.nonEmpty, "fixture minting failed")
      forAllGen(mutatedGen(fix), cases = 800)(sweep)
    }
  }

  test("media fuzz: cross-container confusion (each valid container into every other kernel)") {
    // a PNG fed to the WAV kernel etc. — the magic-number guards must
    // reject cleanly, not parse garbage fields
    for (fix <- Seq(pngFix, bmpFix, wavFix, mp4Fix, mp4Co64Fix, gifFix,
      warcFix, warcGzFix)) sweep(fix)
  }
}
