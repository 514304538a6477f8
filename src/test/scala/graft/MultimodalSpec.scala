package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMediaTable(
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob")),
    "doc_id", "blob", "image", "jpeg").cache()

  test("asMediaTable enforces the media schema contract") {
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.toSeq.map(f =>
        f.name -> f.dataType.sql.replace(" NOT NULL", ""))
    assert(shape(media.schema) === shape(Multimodal.mediaSchema))
    assert(media.count() === 500)
  }

  test("extractImageFeatures is deterministic, partition-local, null-safe") {
    val f1 = Multimodal.extractImageFeatures(media)
    assert(f1.schema === Multimodal.imageFeatureSchema)
    assert(f1.count() === 500)
    // the text-byte payloads are NOT decodable images: decode_ok now
    // means DECODED, so every row takes the deterministic fallback
    assert(f1.filter(col("decode_ok")).count() === 0)
    assert(f1.filter(col("mean_luma") < 0 || col("mean_luma") > 1).count() === 0)
    // deterministic across runs (xor-fold avoids ANSI sum overflow)
    val h1 = f1.agg(expr("bit_xor(phash)")).head().getLong(0)
    val h2 = Multimodal.extractImageFeatures(media)
      .agg(expr("bit_xor(phash)")).head().getLong(0)
    assert(h1 === h2)
    // null payload -> decode_ok=false, not a crash
    val withNull = media.withColumn("payload",
      when(col("media_id") === 0, lit(null)).otherwise(col("payload")))
    val fn = Multimodal.extractImageFeatures(withNull)
    assert(fn.filter(col("media_id") === 0).head().getAs[Boolean]("decode_ok") === false)
  }

  test("sampleFrames explodes n frames per video with payload slices") {
    val video = Multimodal.asMediaTable(
      Tables.load(spark, sf, "documents").limit(10)
        .select(col("doc_id"), col("text").cast("binary").as("blob")),
      "doc_id", "blob", "video", "mp4")
    val frames = Multimodal.sampleFrames(video, 4)
    assert(frames.count() === 40)
    assert(frames.columns.toSeq ===
      Seq("media_id", "frame_idx", "frame_payload"))
    assert(frames.filter(col("frame_payload").isNull).count() === 0)
  }

  test("probeMedia extracts REAL container metadata from payload headers") {
    import Multimodal.Probe
    def alloc(n: Int) = java.nio.ByteBuffer.allocate(n)

    // PNG: signature + IHDR(640x480)
    val png = alloc(33)
      .put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
      .putInt(13).put("IHDR".getBytes).putInt(640).putInt(480)
      .put(Array[Byte](8, 6, 0, 0, 0)).array()
    assert(Probe.sniff(png) === Some(Probe.Info("png", "image", 640, 480, -1L)))

    // JPEG: SOI, APP0 segment, SOF0 with height=1080 width=1920
    val jpeg = alloc(64)
      .put(Array[Byte](0xff.toByte, 0xd8.toByte)) // SOI
      .put(Array[Byte](0xff.toByte, 0xe0.toByte)).putShort(16) // APP0 len 16
      .put(new Array[Byte](14))
      .put(Array[Byte](0xff.toByte, 0xc0.toByte)).putShort(17) // SOF0
      .put(8: Byte).putShort(1080).putShort(1920)
      .array()
    assert(Probe.sniff(jpeg) === Some(Probe.Info("jpeg", "image", 1920, 1080, -1L)))

    // GIF89a 320x200 (little-endian dims)
    val gif = alloc(16).put("GIF89a".getBytes)
      .put(Array[Byte](0x40, 0x01)).put(Array[Byte](0xc8.toByte, 0x00))
      .array()
    assert(Probe.sniff(gif) === Some(Probe.Info("gif", "image", 320, 200, -1L)))

    // WAV: RIFF/WAVE, fmt chunk byteRate=32000, data chunk 64000 bytes
    // -> 2000 ms
    val wav = alloc(60).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes).putInt(52).put("WAVE".getBytes)
    wav.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(2).putInt(8000).putInt(32000) // byte_rate @ +16
      .putShort(4).putShort(16)
    wav.put("data".getBytes).putInt(64000)
    assert(Probe.sniff(wav.array()) ===
      Some(Probe.Info("wav", "audio", -1, -1, 2000L)))

    // MP4 (ISO BMFF): ftyp, then moov{mvhd(timescale 1000, duration
    // 2500 -> 2500 ms), trak{tkhd v0 with 640x360 as 16.16 fixed}}
    val mvhd = alloc(8 + 4 + 96)
      .putInt(8 + 4 + 96).put("mvhd".getBytes)
      .putInt(0)            // version 0 + flags
      .putInt(0).putInt(0)  // creation, modification
      .putInt(1000)         // timescale
      .putInt(2500)         // duration
      .array()
    val tkhd = alloc(8 + 4 + 88)
      .putInt(8 + 4 + 88).put("tkhd".getBytes)
      .putInt(0)                         // version 0 + flags
      .put(new Array[Byte](72))          // times/ids/layer/matrix
      .putInt(640 << 16).putInt(360 << 16) // width, height (16.16)
      .array()
    val trak = alloc(8 + tkhd.length)
      .putInt(8 + tkhd.length).put("trak".getBytes).put(tkhd).array()
    val moov = alloc(8 + mvhd.length + trak.length)
      .putInt(8 + mvhd.length + trak.length).put("moov".getBytes)
      .put(mvhd).put(trak).array()
    val mp4 = alloc(16 + moov.length)
      .putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
      .put(moov).array()
    assert(Probe.sniff(mp4) === Some(Probe.Info("mp4", "video", 640, 360, 2500L)))
    // hostile box sizes must not loop or crash: zero-size moov child,
    // truncated payload
    val hostile = alloc(32)
      .putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
      .putInt(0).put("moov".getBytes).putInt(0).putInt(0).array()
    assert(Probe.sniff(hostile) === Some(Probe.Info("mp4", "video", -1, -1, -1L)))
    assert(Probe.sniff(mp4.take(20)) ===
      Some(Probe.Info("mp4", "video", -1, -1, -1L)))
    // a bare 8-byte mvhd header at the END of the buffer: payloadStart
    // == end == length — the version read must not run off the payload
    val bareMvhd = alloc(16 + 16)
      .putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
      .putInt(16).put("moov".getBytes)
      .putInt(8).put("mvhd".getBytes).array()
    assert(Probe.sniff(bareMvhd) === Some(Probe.Info("mp4", "video", -1, -1, -1L)))
    val bareTkhd = alloc(16 + 24)
      .putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
      .putInt(24).put("moov".getBytes)
      .putInt(16).put("trak".getBytes)
      .putInt(8).put("tkhd".getBytes).array()
    assert(Probe.sniff(bareTkhd) === Some(Probe.Info("mp4", "video", -1, -1, -1L)))

    // FLAC: fLaC magic + STREAMINFO — sample rate 44100, total samples
    // 44100 -> exactly 1000 ms
    val flac = alloc(8 + 34)
      .put("fLaC".getBytes)
      .put(0: Byte).put(0: Byte).put(0: Byte).put(34: Byte) // STREAMINFO hdr
      .putShort(4096).putShort(4096)       // min/max blocksize
      .put(new Array[Byte](6))             // min/max frame size (3+3)
      .put(0x0a: Byte).put(0xc4.toByte)    // sr bits 19-4 (44100 >> 4)
      .put(0x40: Byte)                     // sr low nibble + ch/bps bits
      .put(0x00: Byte)                     // bps low + total-samples bits 35-32
      .putInt(44100)                       // total samples low 32
      .array()
    assert(Probe.sniff(flac) === Some(Probe.Info("flac", "audio", -1, -1, 1000L)))
    // non-STREAMINFO first block: format recognized, duration unknown
    val flacOdd = flac.clone(); flacOdd(4) = 4 // VORBIS_COMMENT first
    assert(Probe.sniff(flacOdd) === Some(Probe.Info("flac", "audio", -1, -1, -1L)))

    // MP3: ID3v2 tag (syncsafe size 0) + MPEG-1 Layer III frame at
    // 128 kbps -> CBR estimate (170-10) bytes * 8 / 128 = 10 ms
    val mp3 = alloc(170)
      .put("ID3".getBytes).put(4: Byte).put(0: Byte).put(0: Byte)
      .putInt(0)                                     // syncsafe size 0
      .put(0xff.toByte).put(0xfb.toByte)             // sync + MPEG1 L3
      .put(0x90.toByte).put(0x00: Byte)              // bitrate idx 9 = 128k
      .array()
    assert(Probe.sniff(mp3) === Some(Probe.Info("mp3", "audio", -1, -1, 10L)))
    // a hostile syncsafe size far past the payload must not probe
    val mp3Bad = mp3.clone(); mp3Bad(9) = 0x7f; mp3Bad(8) = 0x7f
    assert(Probe.sniff(mp3Bad) === None)
    // reserved bitrate index 0xF must not crash the table lookup (an
    // ID3-tagged stream stays mp3 with unknown duration)
    val mp3Res = mp3.clone(); mp3Res(12) = 0xf0.toByte
    assert(Probe.sniff(mp3Res) === Some(Probe.Info("mp3", "audio", -1, -1, -1L)))
    // a BARE frame sync with reserved header fields is NOT an mp3 —
    // ~1/2048 of arbitrary binaries start ff ex and must stay unprobed
    val fakeSync = alloc(32).put(0xff.toByte).put(0xeb.toByte)
      .put(0xf0.toByte).array() // version=reserved would also do
    assert(Probe.sniff(fakeSync) === None)
    // a bare but fully-VALID frame header still probes
    val bare = alloc(160).put(0xff.toByte).put(0xfb.toByte)
      .put(0x90.toByte).array()
    assert(Probe.sniff(bare) === Some(Probe.Info("mp3", "audio", -1, -1, 10L)))

    // garbage and null stay unprobed
    assert(Probe.sniff(Array.fill[Byte](32)(0x42)) === None)
    assert(Probe.sniff(null) === None)

    // distributed: probeMedia fills the meta struct, leaves unknowns
    import spark.implicits._
    val media = Multimodal.asMediaTable(
      Seq((1L, png), (2L, jpeg), (3L, wav.array()), (4L, Array.fill[Byte](20)(7)))
        .toDF("id", "bytes"),
      "id", "bytes", "unknown", "unknown")
    val probed = Multimodal.probeMedia(media)
      .select(col("media_id"), col("meta.modality"), col("meta.format"),
        col("meta.width"), col("meta.duration_ms"))
      .orderBy("media_id").collect()
    assert(probed(0).getString(1) === "image" && probed(0).getString(2) === "png")
    assert(probed(0).getInt(3) === 640)
    assert(probed(1).getInt(3) === 1920)
    assert(probed(2).getString(1) === "audio" && probed(2).getLong(4) === 2000L)
    assert(probed(3).getString(2) === "unknown") // ingest meta kept
  }

  test("blockMeanHash kernel: constant blob is 0, one edit flips one bit") {
    import graft.functions.MediaKernels
    assert(MediaKernels.blockMeanHash(Array.emptyByteArray, 60) === 0L)
    // constant payload: no segment is STRICTLY above the global mean
    val flat = Array.fill(600)('a'.toByte)
    assert(MediaKernels.blockMeanHash(flat, 60) === 0L)
    // raising one byte lifts exactly its 10-byte segment above the mean
    val edited = flat.clone(); edited(307) = '~'.toByte
    val h = MediaKernels.blockMeanHash(edited, 60)
    assert(java.lang.Long.bitCount(h) === 1 && (h >> 30 & 1L) === 1L)
    // shorter than blocks: only the byte-bearing segments can set bits
    val tiny = MediaKernels.blockMeanHash(Array[Byte](1, 9), 60)
    assert(java.lang.Long.bitCount(tiny) === 1) // only the 9 is above mean
  }

  test("blockMeanHash property: equals a naive reference on random blobs") {
    import graft.functions.MediaKernels
    import org.scalacheck.Gen
    def naive(p: Array[Byte], blocks: Int): Long = {
      val n = p.length
      if (n == 0) 0L
      else {
        val vals = p.map(b => (b & 0xff).toLong)
        val total = vals.sum
        (0 until blocks).map { b =>
          val seg = vals.slice(b * n / blocks, (b + 1) * n / blocks)
          if (seg.sum * n > total * seg.length) 1L << b else 0L
        }.sum
      }
    }
    val gen = for {
      n <- Gen.choose(0, 400)
      bytes <- Gen.listOfN(n, Gen.choose(0, 255))
      blocks <- Gen.choose(1, 60)
    } yield (bytes.map(_.toByte).toArray, blocks)
    new PropSupport {}.forAllGen(gen, cases = 60) { case (p, blocks) =>
      assert(MediaKernels.blockMeanHash(p, blocks) === naive(p, blocks))
    }
  }

  test("phashNearDupPairs: edits pair up, exact capture under the bound") {
    // base: flat blobs with per-id distinct high bytes so unrelated ids
    // share no band; copies edited in 1 and 3 separated segments
    def blob(id: Int): Array[Byte] = {
      val p = Array.fill(600)('a'.toByte)
      // make each base distinct: lift 4 id-dependent segments
      for (k <- 0 until 4) p(((id * 7 + k * 13) % 60) * 10) = '}'.toByte
      p
    }
    def edit(p: Array[Byte], segs: Seq[Int]): Array[Byte] = {
      val q = p.clone(); segs.foreach(s => q(s * 10 + 3) = '~'.toByte); q
    }
    val rows = (0 until 6).flatMap { id =>
      val base = blob(id)
      Seq((id.toLong, base),
        (id.toLong + 100, edit(base, Seq((id * 7 + 29) % 60))))
    } :+ (200L, edit(blob(0), Seq(11, 31, 51))) // 3 edits vs blob 0
    val media = Multimodal.asMediaTable(
      rows.toDF("media_id", "payload"), "media_id", "payload",
      "image", "png")
    val pairs = Multimodal.phashNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // every 1-edit copy pairs with its base
    for (id <- 0 until 6)
      assert(pairs.contains((id.toLong, id.toLong + 100)),
        s"1-edit pair missing for $id")
    // the 3-bits-apart pair is captured EXACTLY (pigeonhole: 4 bands)
    assert(pairs.get((0L, 200L)).exists(_ <= 3L), "3-edit pair missing")
  }

  test("BMP kernel: encode/decode round-trip, bottom-up + stride bind") {
    import graft.functions.MediaCodecKernels._
    // 3x2 image, display-order bytes 1..18: row0 = 1..9 (sum 45),
    // row1 = 10..18 (sum 126); stride = 12 (3 padding bytes per row)
    val pixels = (1 to 18).map(_.toByte).toArray
    val bmp = bmpEncode(pixels, 3, 2)
    assert(bmp.length === 54 + 12 * 2)
    // stored row 0 is DISPLAY row 1 (bottom-up): bytes 10..18 then pad
    assert(bmp.slice(54, 63).toSeq === (10 to 18).map(_.toByte))
    assert(bmp.slice(63, 66).toSeq === Seq[Byte](0, 0, 0))
    assert(bmp.slice(66, 75).toSeq === (1 to 9).map(_.toByte))
    val st = bmpDecodeStats(bmp)
    assert(st.toSeq === Seq(1L, 3L, 2L, 6L, (1 to 18).sum.toLong, 45L))
    // a TOP-DOWN variant (negative height) of the same stored bytes has
    // its display rows flipped: row0_sum becomes the other row
    val topDown = bmp.clone()
    val negH = -2
    topDown(22) = (negH & 0xff).toByte; topDown(23) = ((negH >> 8) & 0xff).toByte
    topDown(24) = ((negH >> 16) & 0xff).toByte
    topDown(25) = ((negH >> 24) & 0xff).toByte
    assert(bmpDecodeStats(topDown).toSeq ===
      Seq(1L, 3L, 2L, 6L, (1 to 18).sum.toLong, 126L))
    // hostile inputs: truncated, wrong magic, 32-bpp, compressed
    assert(bmpDecodeStats(bmp.take(53))(0) === 0L)
    assert(bmpDecodeStats("XXnot a bitmap at all".getBytes ++
      new Array[Byte](60))(0) === 0L)
    val b32 = bmp.clone(); b32(28) = 32
    assert(bmpDecodeStats(b32)(0) === 0L)
    val rle = bmp.clone(); rle(30) = 1 // BI_RLE8
    assert(bmpDecodeStats(rle)(0) === 0L)
    // data section running past the payload: reject, don't overread
    val deep = bmp.clone(); deep(22) = 100 // height 100 rows
    assert(bmpDecodeStats(deep)(0) === 0L)
  }

  test("WAV kernel: PCM16 round-trip, sign extension, chunk walk") {
    import graft.functions.MediaCodecKernels._
    val samples = Array(0, 1, -1, 32767, -32768, 100, -4064)
    val wav = wavEncode(samples, 16000)
    assert(wav.length === 44 + 14)
    val st = wavDecodeStats(wav)
    val sumSq = samples.map(s => s.toLong * s).sum
    assert(st.toSeq === Seq(1L, 16000L, samples.length.toLong,
      samples.map(_.toLong).sum, sumSq, 14L * 1000 / 32000))
    // a LIST chunk between fmt and data must be walked over, odd-sized
    // chunks word-aligned: build RIFF[fmt ][LIST(3+pad)][data]
    val junk = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 42, 42, 42, 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write(wav, 0, 36) // RIFF..WAVE + fmt chunk
    out.write(junk)
    out.write(wav, 36, wav.length - 36) // data chunk
    val walked = out.toByteArray
    // fix RIFF size (not checked by the decoder, but keep it honest)
    assert(wavDecodeStats(walked).toSeq === st.toSeq)
    // hostile: float PCM (format 3), 8-bit, truncated data, zero-size loop
    val f3 = wav.clone(); f3(20) = 3
    assert(wavDecodeStats(f3)(0) === 0L)
    val b8 = wav.clone(); b8(34) = 8
    assert(wavDecodeStats(b8)(0) === 0L)
    assert(wavDecodeStats(wav.take(43))(0) === 0L)
    // data size claiming more bytes than present: clamp, not overread
    val over = wav.clone(); over(40) = (200 & 0xff).toByte
    val stOver = wavDecodeStats(over)
    assert(stOver(0) === 1L && stOver(2) === samples.length.toLong)
    // a zero-size alien chunk must not loop forever
    val zero = new java.io.ByteArrayOutputStream()
    zero.write(wav, 0, 36)
    zero.write(Array[Byte]('j', 'u', 'n', 'k', 0, 0, 0, 0))
    zero.write(wav, 36, wav.length - 36)
    assert(wavDecodeStats(zero.toByteArray)(0) === 0L) // stops, reports bad
  }

  test("decodeBmpStats/decodeWavStats: null-safe columnar path") {
    import graft.functions.MediaCodecKernels._
    val bmp = bmpEncode((1 to 12).map(_.toByte).toArray, 2, 2)
    val wav = wavEncode(Array(5, -5, 7), 8000)
    val m = Seq((1L, bmp), (2L, null.asInstanceOf[Array[Byte]]),
      (3L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "payload")
    val got = Multimodal.decodeBmpStats(m).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L) === Some(1L)) // valid blob decodes
    assert(got(2L) === None)     // NULL payload -> NULL stats, no crash
    assert(got(3L) === Some(0L)) // garbage blob -> ok=0
    val w = Seq((1L, wav), (3L, Array[Byte](9, 9)))
      .toDF("media_id", "payload")
    val gw = Multimodal.decodeWavStats(w).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(5))).toMap
    assert(gw(1L) === ((1L, 5L * 5 + 5 * 5 + 7 * 7)))
    assert(gw(3L)._1 === 0L)
  }

  test("bmpResizeNn: exact byte trace, up/down, top-down source, hostile") {
    import graft.functions.MediaCodecKernels._
    // 4x2 display bytes 1..24: row0 pixels (1,2,3)(4,5,6)(7,8,9)(10,11,12)
    val src = bmpEncode((1 to 24).map(_.toByte).toArray, 4, 2)
    // downscale to 2x1: sy=0, sx = x*4/2 = 0,2 -> pixels (0,0) and (2,0)
    val down = bmpResizeNn(src, 2, 1)
    assert(down.toSeq === bmpEncode(Array[Byte](1, 2, 3, 7, 8, 9), 2, 1).toSeq)
    // upscale the 2x1 back to 4x1: sx = x*2/4 = 0,0,1,1 -> pixels repeat
    assert(bmpResizeNn(down, 4, 1).toSeq === bmpEncode(
      Array[Byte](1, 2, 3, 1, 2, 3, 7, 8, 9, 7, 8, 9), 4, 1).toSeq)
    // identity resize preserves every display pixel (stats equal)
    assert(bmpDecodeStats(bmpResizeNn(src, 4, 2)).toSeq ===
      bmpDecodeStats(src).toSeq)
    // a TOP-DOWN source (negative height): display row 0 is STORED row
    // 0, which in the bottom-up encode holds bytes 13..24 — the resize
    // must honor the flipped row order
    val topDown = src.clone()
    val negH = -2
    topDown(22) = (negH & 0xff).toByte
    topDown(23) = ((negH >> 8) & 0xff).toByte
    topDown(24) = ((negH >> 16) & 0xff).toByte
    topDown(25) = ((negH >> 24) & 0xff).toByte
    assert(bmpResizeNn(topDown, 2, 1).toSeq ===
      bmpEncode(Array[Byte](13, 14, 15, 19, 20, 21), 2, 1).toSeq)
    // hostile: garbage, 32-bpp, truncated -> null, never a throw
    assert(bmpResizeNn(Array[Byte](1, 2, 3), 2, 1) === null)
    val b32 = src.clone(); b32(28) = 32
    assert(bmpResizeNn(b32, 2, 1) === null)
    assert(bmpResizeNn(src.take(53), 2, 1) === null)
  }

  test("wavDownsample: exact decimation, identity, divisibility guard") {
    import graft.functions.MediaCodecKernels._
    val samples = Array(10, -20, 30, -40, 50, -60, 70, -80, 90)
    val wav = wavEncode(samples, 9000)
    // factor 3 keeps samples 0, 3, 6 at 3000 Hz
    val down = wavDownsample(wav, 3)
    assert(down.toSeq === wavEncode(Array(10, -40, 70), 3000).toSeq)
    val st = wavDecodeStats(down)
    assert(st.toSeq === Seq(1L, 3000L, 3L, (10 - 40 + 70).toLong,
      (100 + 1600 + 4900).toLong, 6L * 1000 / 6000))
    // factor 1 is the identity
    assert(wavDownsample(wav, 1).toSeq === wav.toSeq)
    // rate not divisible by the factor -> null (a fractional output
    // rate would lie in the header)
    assert(wavDownsample(wav, 7) === null)
    // hostile input -> null
    assert(wavDownsample(Array[Byte](1, 2, 3, 4), 2) === null)
  }

  test("bmpResizeArea: exact block means, identity, upscale refused") {
    import graft.functions.MediaCodecKernels._
    val src = bmpEncode((1 to 24).map(_.toByte).toArray, 4, 2)
    // 2x1: dst(0,0) averages pixels (0..1, 0..1) -> ch means 8,9,10;
    // dst(1,0) averages (2..3, 0..1) -> 14,15,16
    assert(bmpResizeArea(src, 2, 1).toSeq ===
      bmpEncode(Array[Byte](8, 9, 10, 14, 15, 16), 2, 1).toSeq)
    // 1x1 collapses everything: ch0 mean of 1,4,7,10,13,16,19,22 = 11
    assert(bmpResizeArea(src, 1, 1).toSeq ===
      bmpEncode(Array[Byte](11, 12, 13), 1, 1).toSeq)
    // identity dims = all-1x1 blocks = the source pixels
    assert(bmpDecodeStats(bmpResizeArea(src, 4, 2)).toSeq ===
      bmpDecodeStats(src).toSeq)
    // area is a DOWNSCALE: an upscale request returns null
    assert(bmpResizeArea(src, 8, 2) === null)
    assert(bmpResizeArea(Array[Byte](1, 2), 1, 1) === null)
  }

  test("wavDownsampleMean: window means truncate toward zero, tail partial") {
    import graft.functions.MediaCodecKernels._
    val samples = Array(10, -20, 30, -40, 50, -60, 70, -80, 90)
    val wav = wavEncode(samples, 9000)
    // windows (10,-20,30) (-40,50,-60) (70,-80,90): means 6, -16, 26
    // (-50/3 truncates toward zero, matching DuckDB's //)
    assert(wavDownsampleMean(wav, 3).toSeq ===
      wavEncode(Array(6, -16, 26), 3000).toSeq)
    // partial tail window: 8 samples, factor 3 -> windows of 3, 3, 2
    val wav8 = wavEncode(samples.take(8), 9000)
    assert(wavDownsampleMean(wav8, 3).toSeq ===
      wavEncode(Array(6, -16, -5), 3000).toSeq)
    // factor 1 is the identity; divisibility guard still binds
    assert(wavDownsampleMean(wav, 1).toSeq === wav.toSeq)
    assert(wavDownsampleMean(wav, 7) === null)
  }

  test("media kernels: Int.MinValue height and unsigned-rate wrap stay null") {
    import graft.functions.MediaCodecKernels._
    // hostile BMP height 0x80000000: math.abs stays negative; the
    // negative stride*h product must not bypass the bounds check
    val src = bmpEncode((1 to 24).map(_.toByte).toArray, 4, 2)
    val minH = src.clone()
    minH(22) = 0; minH(23) = 0; minH(24) = 0; minH(25) = 0x80.toByte
    assert(bmpResizeNn(minH, 2, 1) === null)
    assert(bmpResizeArea(minH, 2, 1) === null)
    assert(bmpDecodeStats(minH)(0) === 0L)
    // hostile WAV sample rate 0x80000000 (unsigned 2^31): divisible by
    // 2, and (rate/factor).toInt would wrap negative into wavEncode's
    // require — the contract is null, never a throw
    val wav = wavEncode(Array(10, -20, 30, -40), 16000)
    val hotRate = wav.clone()
    hotRate(24) = 0; hotRate(25) = 0; hotRate(26) = 0
    hotRate(27) = 0x80.toByte
    assert(wavDownsample(hotRate, 2) === null)
    assert(wavDownsampleMean(hotRate, 2) === null)
    // degenerate factor: 0 would throw in the % guard; negative is absurd
    assert(wavDownsample(wav, 0) === null)
    assert(wavDownsampleMean(wav, -3) === null)
  }

  test("wavFrameFeatures: exact energy/zero-cross/clip math, tail frame, hostile drop") {
    import spark.implicits._
    import graft.functions.MediaCodecKernels.wavEncode
    val samples = Array(0, 5, -3, 3, 32767, -32768, 0, 1)
    val rows = Seq(
      (1L, wavEncode(samples, 8000)),
      (2L, "junk not a riff".getBytes("UTF-8")))
    val media = Multimodal.asMediaTable(
      rows.toDF("id", "blob"), "id", "blob", "audio", "wav")
    val got = Multimodal.wavFrameFeatures(media, frameLen = 3)
      .orderBy(col("media_id"), col("frame_idx"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // frame 0 [0,5,-3]: one sign flip (5 -> -3; the 0*5 product is not
    // negative). frame 1 [3,32767,-32768]: flips at -3->3 (counted HERE,
    // second sample's frame) and 32767->-32768; both extremes clip.
    // frame 2 is the 2-sample tail. The hostile row drops entirely.
    assert(got.toSeq === Seq(
      (1L, 0L, 3L, 2L, 34L, 1L, 0L),
      (1L, 1L, 3L, 2L, 9L + 32767L * 32767L + 32768L * 32768L, 2L, 2L),
      (1L, 2L, 2L, 1L, 1L, 0L, 0L)))
  }

  test("resizeBmp syncs meta.width/height; rejected blobs null both") {
    import graft.functions.MediaCodecKernels._
    val bmp = bmpEncode((1 to 12).map(_.toByte).toArray, 2, 2)
    val m = Multimodal.asMediaTable(
      Seq((1L, bmp), (3L, Array[Byte](7, 7, 7)))
        .toDF("media_id", "payload"),
      "media_id", "payload", "image", "bmp")
      // plant stale dims to prove the resize rewrites them
      .withColumn("meta", col("meta")
        .withField("width", lit(2)).withField("height", lit(2)))
    val got = Multimodal.resizeBmp(m, 1, 1)
      .select(col("media_id"), col("meta.width"), col("meta.height"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2))))).toMap
    assert(got(1L) === Some((1, 1)))   // resized: meta follows the payload
    assert(got(3L) === None)           // rejected: payload NULL, meta dims NULL
    // area variant takes the same path
    val area = Multimodal.resizeBmpArea(m, 1, 1)
      .filter(col("media_id") === 1).select(col("meta.width")).head()
    assert(area.getInt(0) === 1)
    // a bare (media_id, payload) frame without meta passes through untouched
    val bare = Seq((1L, bmp)).toDF("media_id", "payload")
    assert(Multimodal.resizeBmp(bare, 1, 1).columns.toSeq ===
      Seq("media_id", "payload"))
  }

  test("resizeBmp/downsampleWav: columnar path is null-safe") {
    import graft.functions.MediaCodecKernels._
    val bmp = bmpEncode((1 to 12).map(_.toByte).toArray, 2, 2)
    val m = Seq((1L, bmp), (2L, null.asInstanceOf[Array[Byte]]),
      (3L, Array[Byte](7, 7, 7)))
      .toDF("media_id", "payload")
    val got = Multimodal.decodeBmpStats(Multimodal.resizeBmp(m, 1, 1))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // (1,1) resize of the 2x2 keeps display pixel (0,0) = bytes 1,2,3
    assert(got(1L) === Some(1L))
    assert(got(2L) === None) // NULL payload stays NULL
    assert(got(3L) === None) // corrupt blob -> NULL payload, no crash
    val one = Multimodal.decodeBmpStats(Multimodal.resizeBmp(m, 1, 1))
      .filter(col("media_id") === 1).head()
    assert(one.getLong(5) === 1L + 2 + 3) // pixel_sum of the kept pixel
  }
}
