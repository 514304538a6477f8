package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: payloads are opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * partition-local transforms (the Scala analog of `mapInPandas` — same
  * batch shape: an iterator of rows in, an iterator of rows out, no
  * shuffle).
  *
  * Container-header metadata extraction ([[Probe]]/[[probeMedia]]) is
  * REAL — format detection, dimensions and durations parse straight from
  * the leading bytes of PNG/JPEG/GIF/BMP/WAV containers, no codec
  * library needed. Pixel/sample DECODE is real for every STILL format
  * and for audio: BMP + WAV on hand-written byte walks
  * ([[graft.functions.MediaCodecKernels]]), PNG on JDK zlib + scanline
  * unfilters ([[graft.functions.PngCodecKernels]]), and JPEG + GIF via
  * the JDK's own ImageIO codecs
  * ([[graft.functions.ImageIoKernels]] — java.desktop ships with the
  * JDK and runs headless). MP4 container DEMUX is real too
  * ([[demuxMp4Stats]]/[[sampleSyncFrames]]: sample tables joined,
  * keyframe access units extracted from mdat). Only MP4's inter-frame
  * PIXEL decode keeps a stub (no such codec anywhere in the JDK):
  * [[Codec.decodeImage]] falls back to a deterministic fake for
  * undecodable bytes so corrupt blobs stay data, not task failures.
  *
  * Scale: media tables are partitioned by (modality, date); payloads
  * dominate bytes, so feature extraction SELECTs only (payload, meta) and
  * writes features to a separate narrow table to avoid rewriting blobs.
  */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("format", StringType),                     // jpeg|png|wav|mp4…
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("source_uri", StringType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaSchema)))

  /** Feature row produced by the (stubbed) image decode. */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType),
    StructField("mean_luma", DoubleType),
    StructField("phash", LongType),
    StructField("decode_ok", BooleanType)))

  /** Image feature codec: REAL decode first, deterministic fallback
    * for undecodable bytes so feature rows never fail a task.
    */
  object Codec {
    /** Image features: luminance mean and a 64-bit perceptual hash.
      * REAL for every ImageIO-readable payload (JPEG/GIF/PNG/BMP — the
      * JDK's own codecs, [[graft.functions.ImageIoKernels]]): luma is
      * the decoded rasters' mean channel byte and the phash is the
      * block-mean hash over decoded PER-PIXEL luma — stable under
      * re-encoding, which payload-byte hashing is not for
      * entropy-coded formats. decode_ok now means DECODED; undecodable
      * bytes take the deterministic FNV-ish fallback with
      * decode_ok=false (corrupt blobs are data at corpus scale).
      */
    def decodeImage(payload: Array[Byte]): (Double, Long, Boolean) = {
      if (payload == null || payload.isEmpty) return (0.0, 0L, false)
      // luma is raster-cap-bounded (ImageIoKernels.MaxPixels = 2^24
      // pixels, header-gated before decode), safely under
      // blockMeanHash's 2^27 input bound — oversized claims come back
      // null and take the fallback, never a throw
      val luma = graft.functions.ImageIoKernels.imageLumaBytes(payload)
      if (luma != null && luma.length > 0) {
        var acc = 0L
        luma.foreach(b => acc += (b & 0xff))
        return (acc.toDouble / luma.length / 255.0,
          graft.functions.MediaKernels.blockMeanHash(luma, 60), true)
      }
      var acc = 0L
      var h = 1125899906842597L // FNV-ish rolling fallback
      payload.foreach { b =>
        acc += (b & 0xff)
        h = h * 31 + (b & 0xff)
      }
      (acc.toDouble / payload.length / 255.0, h, false)
    }

    /** Stand-in resize for MP4/VIDEO ONLY (no inter-frame codec
      * anywhere in the JDK): truncates deterministically, preserving
      * the plumbing contract (binary in, binary out). Every STILL
      * format is REAL — [[resizeBmp]]/[[resizeBmpArea]], [[resizePng]]
      * (zlib ships with the JDK), and [[resizeImageIo]] for JPEG/GIF
      * (ImageIO ships with the JDK) — plus
      * [[downsampleWav]]/[[downsampleWavMean]] for audio.
      */
    def resizeImage(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      if (payload == null) null
      else payload.take(math.max(16, payload.length * w * h /
        math.max(1, 4096 * 4096)))
  }

  /** Feature extraction: partition-local, no shuffle; reads only the
    * columns it needs (payload pruning is what keeps this viable when
    * payloads are MBs).
    */
  def extractImageFeatures(media: DataFrame): DataFrame =
    media
      .filter(col("meta.modality") === "image")
      .select(col("media_id"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val (luma, phash, ok) = Codec.decodeImage(payload)
          Row(id, if (payload == null) 0 else payload.length, luma, phash, ok)
        }
      }(org.apache.spark.sql.Encoders.row(imageFeatureSchema))

  /** REAL ISO-BMFF demux stats: walk moov→trak→mdia→minf→stbl, join the
    * sample tables (stts/stsz/stsc/stco|co64/stss) and checksum the
    * ACTUAL sample bytes extracted from mdat — what a video pipeline
    * does before any decoder runs ([[graft.functions.Mp4CodecKernels]]).
    * Narrow map at scan speed, payload-pruned; corrupt blobs come back
    * ok=0, never a task failure.
    */
  def demuxMp4Stats(media: DataFrame): DataFrame =
    media.select(col("media_id"),
      graft.functions.Mp4CodecExpressions.mp4DemuxStats(col("payload"))
        .as("__st"))
      .select(col("media_id"),
        element_at(col("__st"), 1).as("ok"),
        element_at(col("__st"), 2).as("n_samples"),
        element_at(col("__st"), 3).as("n_keyframes"),
        element_at(col("__st"), 4).as("duration_ms"),
        element_at(col("__st"), 5).as("total_sample_bytes"),
        element_at(col("__st"), 6).as("samples_checksum"))

  /** REAL keyframe sampling for MP4 rows: the demuxer resolves each
    * sync sample's (offset, size) through the stsc/stco indirection and
    * slices the actual access-unit bytes out of mdat — the blobs a
    * downstream decoder would be handed. Explode shape like
    * [[sampleFrames]], but the frames are container-true, not
    * byte-range guesses. Hostile payloads vanish (null array → no
    * rows), matching the corpus-scale corrupt-blob contract.
    */
  def sampleSyncFrames(media: DataFrame): DataFrame =
    media
      .select(col("media_id"),
        graft.functions.Mp4CodecExpressions.mp4SyncIndices(col("payload"))
          .as("__fi"),
        graft.functions.Mp4CodecExpressions.mp4SyncSamples(col("payload"))
          .as("__fp"))
      .select(col("media_id"),
        explode(arrays_zip(col("__fi"), col("__fp"))).as("__f"))
      .select(col("media_id"),
        col("__f.__fi").cast("long").as("frame_idx"),
        col("__f.__fp").as("frame_payload"))

  /** Frame sampling for video rows: emits `n` pseudo-frames per video as
    * separate rows (payload slices in the stub; frame decodes for real),
    * the flatMap/explode shape a real sampler uses. For container-true
    * MP4 keyframe extraction use [[sampleSyncFrames]].
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media.filter(col("meta.modality") === "video")
      .select(col("media_id"), col("payload"),
        posexplode(sequence(lit(0), lit(n - 1))).as(Seq("frame_idx", "_s")))
      .drop("_s")
      .withColumn("frame_payload",
        // stub: byte-range slice standing in for a decoded frame
        expr(s"substring(payload, frame_idx * (octet_length(payload) DIV $n) + 1," +
          s" octet_length(payload) DIV $n)"))
      .drop("payload")

  /** Per-blob 60-bit block-mean perceptual hash — the codec-free
    * near-dup signature for media payloads (a re-encoded/one-byte-edited
    * copy lands within a few bits; see
    * [[graft.functions.MediaKernels.blockMeanHash]]). Narrow map at
    * scan speed: one native kernel call per row.
    */
  def perceptualHash(media: DataFrame, blocks: Int = 60): DataFrame =
    media.select(col("media_id"),
      graft.functions.MediaExpressions.blockMeanHash(col("payload"), blocks)
        .as("phash"))

  /** Near-duplicate media pairs by banded perceptual-hash LSH: the
    * 60-bit hash splits into `bands` 15-bit bands; blobs sharing ANY
    * band become candidates (an equi-join on (band, value) — never
    * all-pairs), then the exact Hamming distance filters to
    * ≤ `maxHamming`. Pigeonhole guarantee: a pair within
    * `maxHamming < bands` bit flips ALWAYS shares an intact band, so
    * capture is exact, not probabilistic, at the default (3, 4).
    * Scale: candidates are bounded by band-bucket sizes — a degenerate
    * bucket (all-identical blobs) degrades to that bucket's pairs, the
    * LSH contract shared with the MinHash path.
    */
  /** Explode a hashed media table into its 15-bit LSH band rows —
    * ONE definition shared by the batch pair join, the incremental
    * index delta, and the index lookup (a drifted copy would silently
    * stop pairs from ever matching).
    */
  private[graft] def phashBands(hashed: DataFrame, bands: Int): DataFrame = {
    require(bands >= 1 && bands * 15 <= 60, s"bands must be 1..4: $bands")
    hashed.select(hashed.columns.map(col).toSeq :+
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => call_function("shiftright", col("phash"), b * lit(15))
          .bitwiseAND(lit(32767L))))
        .as(Seq("band", "band_val")): _*)
  }

  def phashNearDupPairs(media: DataFrame, maxHamming: Int = 3,
                        bands: Int = 4): DataFrame = {
    require(maxHamming < bands,
      s"exact capture needs maxHamming < bands: $maxHamming >= $bands")
    val banded = phashBands(perceptualHash(media), bands)
    val a = banded.select(col("media_id").as("id_a"),
      col("phash").as("h_a"), col("band"), col("band_val"))
    val b = banded.select(col("media_id").as("id_b"),
      col("phash").as("h_b"), col("band"), col("band_val"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h_a"), col("h_b")).distinct()
      .withColumn("hamming",
        expr("bit_count(h_a ^ h_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Probe an at-rest phash band index (rows `(band, band_val,
    * media_id, phash)` — what [[graft.streaming.Streaming
    * .incrementalPhashIndex]] maintains) with a batch of new media:
    * hash + band the probes, equi-join the index on (band, band_val),
    * filter to exact Hamming ≤ `maxHamming`. One join against the
    * index — the new batch never re-hashes the corpus. Same
    * pigeonhole-exact capture as [[phashNearDupPairs]] for
    * maxHamming < bands.
    */
  def phashIndexLookup(probe: DataFrame, index: DataFrame,
                       maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(maxHamming < bands,
      s"exact capture needs maxHamming < bands: $maxHamming >= $bands")
    val banded = phashBands(perceptualHash(probe), bands)
      .select(col("media_id").as("probe_id"), col("phash").as("h_p"),
        col("band"), col("band_val"))
    banded.join(index.select(col("band"), col("band_val"),
        col("media_id").as("corpus_id"), col("phash").as("h_c")),
        Seq("band", "band_val"))
      .select(col("probe_id"), col("corpus_id"), col("h_p"), col("h_c"))
      .distinct()
      .withColumn("hamming", expr("bit_count(h_p ^ h_c)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("probe_id"), col("corpus_id"), col("hamming"))
  }

  /** REAL pixel decode for uncompressed 24-bit BMP payloads — no codec
    * library needed, the format is a pure byte layout (bottom-up rows,
    * 4-byte stride padding; see
    * [[graft.functions.MediaCodecKernels.bmpDecodeStats]]). Narrow map
    * at scan speed, payload-pruned; corrupt blobs come back ok=0, never
    * a task failure. The `__st` alias is deliberate: the stats array is
    * computed ONCE per row and fanned into columns (inlining the kernel
    * into six projections would re-walk the payload six times).
    */
  def decodeBmpStats(media: DataFrame): DataFrame =
    media.select(col("media_id"),
      graft.functions.MediaCodecExpressions.bmpDecodeStats(col("payload"))
        .as("__st"))
      .select(col("media_id"),
        element_at(col("__st"), 1).as("ok"),
        element_at(col("__st"), 2).as("width"),
        element_at(col("__st"), 3).as("height"),
        element_at(col("__st"), 4).as("n_pixels"),
        element_at(col("__st"), 5).as("pixel_sum"),
        element_at(col("__st"), 6).as("row0_sum"))

  /** REAL pixel decode for 8-bit RGB/RGBA PNG payloads: chunk walk +
    * JDK-zlib inflate + the five scanline unfilters
    * ([[graft.functions.PngCodecKernels]]). Same shape and hostile-
    * input contract as [[decodeBmpStats]], plus the channel count.
    */
  def decodePngStats(media: DataFrame): DataFrame =
    media.select(col("media_id"),
      graft.functions.PngCodecExpressions.pngDecodeStats(col("payload"))
        .as("__st"))
      .select(col("media_id"),
        element_at(col("__st"), 1).as("ok"),
        element_at(col("__st"), 2).as("width"),
        element_at(col("__st"), 3).as("height"),
        element_at(col("__st"), 4).as("channels"),
        element_at(col("__st"), 5).as("n_pixels"),
        element_at(col("__st"), 6).as("pixel_sum"),
        element_at(col("__st"), 7).as("row0_sum"))

  /** REAL nearest-neighbor resize for 8-bit RGB/RGBA PNG payloads —
    * decode (inflate + unfilter), NN-sample, re-encode. Same hostile-
    * input and meta-sync contract as [[resizeBmp]].
    */
  def resizePng(media: DataFrame, w: Int, h: Int): DataFrame =
    syncImageMeta(media.withColumn("payload",
      graft.functions.PngCodecExpressions.pngResizeNn(
        col("payload"), w, h)), w, h)

  /** REAL sample decode for PCM16 WAV payloads: chunk walk + sign-
    * extended 16-bit reads; emits the integer amplitude sum and the
    * exact energy (fixed-point RMS numerator). Same shape and hostile-
    * input contract as [[decodeBmpStats]].
    */
  def decodeWavStats(media: DataFrame): DataFrame =
    media.select(col("media_id"),
      graft.functions.MediaCodecExpressions.wavDecodeStats(col("payload"))
        .as("__st"))
      .select(col("media_id"),
        element_at(col("__st"), 1).as("ok"),
        element_at(col("__st"), 2).as("sample_rate"),
        element_at(col("__st"), 3).as("n_samples"),
        element_at(col("__st"), 4).as("sum_amp"),
        element_at(col("__st"), 5).as("sum_sq"),
        element_at(col("__st"), 6).as("duration_ms"))

  /** REAL decode stats for any ImageIO-readable payload — JPEG and GIF
    * included (the JDK's own codecs, no new dependency;
    * [[graft.functions.ImageIoKernels]]). Same shape and hostile-input
    * contract as [[decodeBmpStats]]; the native byte-walk kernels stay
    * the hot path for BMP/PNG, this is the coverage path for the
    * formats whose entropy coding the JDK only exposes through
    * BufferedImage.
    */
  def decodeImageIoStats(media: DataFrame): DataFrame =
    media.select(col("media_id"),
      graft.functions.ImageIoExpressions.imageDecodeStats(col("payload"))
        .as("__st"))
      .select(col("media_id"),
        element_at(col("__st"), 1).as("ok"),
        element_at(col("__st"), 2).as("width"),
        element_at(col("__st"), 3).as("height"),
        element_at(col("__st"), 4).as("n_pixels"),
        element_at(col("__st"), 5).as("pixel_sum"),
        element_at(col("__st"), 6).as("row0_sum"))

  /** REAL nearest-neighbor resize for any ImageIO-readable payload —
    * decode, floor-mapped NN sample, re-encode in `format`. Same
    * hostile-input and meta-sync contract as [[resizeBmp]].
    */
  def resizeImageIo(media: DataFrame, w: Int, h: Int,
                    format: String): DataFrame =
    syncImageMeta(media.withColumn("payload",
      graft.functions.ImageIoExpressions.imageResizeNn(
        col("payload"), w, h, format)), w, h)

  /** Frame-level PCM16 audio features — the speech-curation filters
    * (silence/VAD gating, clipping detection) computed EXACTLY, per
    * `frameLen`-sample frame:
    *
    *   n_samples, sum_amp, sum_sq (the RMS numerator — energy),
    *   n_zero_cross (sign flips; a crossing counts in the SECOND
    *   sample's frame), n_clipped (|s| >= clipAbs).
    *
    * One kernel call decodes the payload to samples
    * ([[graft.functions.MediaCodecExpressions.wavSamples]]); the
    * feature math stays DECLARATIVE — a per-sample transform (the
    * zero-cross flag reads the previous element, no window), posexplode,
    * and ONE (media, frame) micro-group aggregate with map-side
    * partials: the dedup_ngram scale family, everything integer-exact
    * and oracle-replayable. The tail partial frame is kept. Corrupt
    * payloads drop out (null sample arrays), never fail a task.
    */
  def wavFrameFeatures(media: DataFrame, frameLen: Int = 160,
                       clipAbs: Int = 32440): DataFrame = {
    require(frameLen > 0 && clipAbs > 0 && clipAbs <= 32768,
      s"bad params: frameLen=$frameLen clipAbs=$clipAbs")
    media
      .select(col("media_id"),
        graft.functions.MediaCodecExpressions.wavSamples(col("payload"))
          .as("__s"))
      .filter(col("__s").isNotNull)
      .select(col("media_id"),
        posexplode(transform(col("__s"), (x, i) => struct(
          x.as("s"),
          when(i === 0, lit(0))
            .otherwise((element_at(col("__s"), i) * x < 0).cast("int"))
            .as("zc")))).as(Seq("i", "f")))
      .groupBy(col("media_id"),
        expr("i DIV " + frameLen).cast("long").as("frame_idx"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("f.s").cast("long")).as("sum_amp"),
        sum(col("f.s").cast("long") * col("f.s")).as("sum_sq"),
        sum(col("f.zc").cast("long")).as("n_zero_cross"),
        sum((abs(col("f.s")) >= clipAbs).cast("long")).as("n_clipped"))
  }

  /** REAL nearest-neighbor resize for 24-bit BMP payloads — replaces
    * the truncation stand-in for the codec-free format ([[Codec]]
    * remains the stub only for entropy-coded formats). Narrow map,
    * payload-pruned; corrupt blobs come back as NULL payloads, never
    * task failures.
    */
  def resizeBmp(media: DataFrame, w: Int, h: Int): DataFrame =
    syncImageMeta(media.withColumn("payload",
      graft.functions.MediaCodecExpressions.bmpResizeNn(
        col("payload"), w, h)), w, h)

  /** REAL integer-factor decimation for PCM16 WAV payloads (naive,
    * filter-free — the oracle-replayable baseline; see the kernel doc).
    * meta.duration_ms stays valid: decimation preserves wall-clock
    * length (see [[syncImageMeta]]'s note).
    */
  def downsampleWav(media: DataFrame, factor: Int): DataFrame =
    media.withColumn("payload",
      graft.functions.MediaCodecExpressions.wavDownsample(
        col("payload"), factor))

  /** Box-filtered (area-average) BMP downscale — the anti-aliased
    * reduce real image pipelines use below 1:1; downscale only.
    */
  def resizeBmpArea(media: DataFrame, w: Int, h: Int): DataFrame =
    syncImageMeta(media.withColumn("payload",
      graft.functions.MediaCodecExpressions.bmpResizeArea(
        col("payload"), w, h)), w, h)

  /** After a real resize the carried metadata must not go stale: on full
    * [[mediaSchema]] tables rewrite meta.width/height to the new dims
    * (NULL when the kernel rejected the blob — the payload is NULL too,
    * so meta mirrors it). Tables without a meta struct pass through.
    * WAV decimation needs no analog: keep-every-k at rate/k preserves
    * wall-clock duration, so meta.duration_ms stays correct.
    */
  private def syncImageMeta(df: DataFrame, w: Int, h: Int): DataFrame =
    if (!df.columns.contains("meta")) df
    else df.withColumn("meta",
      col("meta")
        .withField("width",
          when(col("payload").isNotNull, lit(w)).cast("int"))
        .withField("height",
          when(col("payload").isNotNull, lit(h)).cast("int")))

  /** Mean-decimating (box anti-alias) WAV downsample. */
  def downsampleWavMean(media: DataFrame, factor: Int): DataFrame =
    media.withColumn("payload",
      graft.functions.MediaCodecExpressions.wavDownsampleMean(
        col("payload"), factor))

  /** Build a media table from any binary-bearing DataFrame (the ingest
    * adapter: schema contract enforced here).
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
                   modality: String, format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        lit(modality).as("modality"),
        lit(format).as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("string").as("source_uri")).as("meta"))

  /** REAL container-header sniffing — this part needs no codec library:
    * dimensions and durations live in the first bytes of every common
    * container (PNG IHDR, JPEG SOF markers, GIF screen descriptor, BMP
    * info header, WAV fmt/data chunks, MP4 moov/mvhd/tkhd boxes, FLAC
    * STREAMINFO, MP3 ID3v2-skip + first frame header). Only
    * pixel/sample DECODE stays stubbed; format detection and metadata
    * extraction are real.
    */
  object Probe {
    final case class Info(format: String, modality: String,
                          width: Int, height: Int, durationMs: Long)

    private def be16(p: Array[Byte], i: Int): Int =
      ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
    private def be32(p: Array[Byte], i: Int): Int =
      ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
        ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
    private def le16(p: Array[Byte], i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    private def le32(p: Array[Byte], i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
        ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
    private def ascii(p: Array[Byte], i: Int, n: Int): String =
      new String(p, i, n, "US-ASCII")

    def sniff(p: Array[Byte]): Option[Info] = {
      if (p == null || p.length < 16) return None
      // PNG: 8-byte signature, then the IHDR chunk is mandatory-first
      if ((p(0) & 0xff) == 0x89 && ascii(p, 1, 3) == "PNG" && p.length >= 24 &&
          ascii(p, 12, 4) == "IHDR")
        return Some(Info("png", "image", be32(p, 16), be32(p, 20), -1L))
      // JPEG: FFD8, then scan marker segments for a frame header (SOFn)
      if ((p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) {
        var i = 2
        while (i + 9 <= p.length && (p(i) & 0xff) == 0xff) {
          val marker = p(i + 1) & 0xff
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof)
            return Some(Info("jpeg", "image", be16(p, i + 7), be16(p, i + 5), -1L))
          i += 2 + be16(p, i + 2)
        }
        return Some(Info("jpeg", "image", -1, -1, -1L))
      }
      // GIF87a / GIF89a: logical screen descriptor right after the magic
      if (ascii(p, 0, 4) == "GIF8")
        return Some(Info("gif", "image", le16(p, 6), le16(p, 8), -1L))
      // BMP: BITMAPINFOHEADER at offset 14
      if (ascii(p, 0, 2) == "BM" && p.length >= 26)
        return Some(Info("bmp", "image", le32(p, 18), math.abs(le32(p, 22)), -1L))
      // MP4 / ISO BMFF: top-level box walk to moov, then moov→mvhd for
      // timescale+duration and moov→trak→tkhd for the video dimensions.
      // Box sizes are hostile input: size 0 (= to-end) and size 1
      // (64-bit largesize) are handled, and every step must advance.
      if (p.length >= 12 && ascii(p, 4, 4) == "ftyp") {
        def boxAt(i: Int): Option[(String, Int, Int)] = { // (type, payloadStart, end)
          if (i + 8 > p.length) return None
          var size = be32(p, i).toLong & 0xffffffffL
          var payloadStart = i + 8
          if (size == 1) { // 64-bit largesize follows the type
            if (i + 16 > p.length) return None
            val hi = be32(p, i + 8).toLong & 0xffffffffL
            val lo = be32(p, i + 12).toLong & 0xffffffffL
            size = (hi << 32) | lo
            payloadStart = i + 16
          } else if (size == 0) size = p.length.toLong - i // to end of file
          val end = i + size
          if (size < 8 || end > p.length || end <= i || payloadStart > end)
            None
          else Some((ascii(p, i + 4, 4), payloadStart, end.toInt))
        }
        def findChild(from: Int, until: Int, tpe: String): Option[(Int, Int)] = {
          var i = from
          while (i + 8 <= until) {
            boxAt(i) match {
              case Some((t, ps, end)) if end <= until =>
                if (t == tpe) return Some((ps, end))
                i = end
              case _ => return None
            }
          }
          None
        }
        var durationMs = -1L
        var width = -1
        var height = -1
        findChild(0, p.length, "moov").foreach { case (moovStart, moovEnd) =>
          // a bare 8-byte header box has ps == end — the version read
          // below must not run off the payload (hostile input)
          findChild(moovStart, moovEnd, "mvhd")
            .filter { case (ps, end) => ps < end }
            .foreach { case (ps, end) =>
            val v = p(ps) & 0xff // version: 0 = 32-bit times, 1 = 64-bit
            if (v == 0 && ps + 20 <= end) {
              val timescale = be32(p, ps + 12).toLong & 0xffffffffL
              val duration = be32(p, ps + 16).toLong & 0xffffffffL
              if (timescale > 0) durationMs = duration * 1000L / timescale
            } else if (v == 1 && ps + 32 <= end) {
              val timescale = be32(p, ps + 20).toLong & 0xffffffffL
              val duration = ((be32(p, ps + 24).toLong & 0xffffffffL) << 32) |
                (be32(p, ps + 28).toLong & 0xffffffffL)
              if (timescale > 0) durationMs = duration * 1000L / timescale
            }
          }
          // first trak carrying a nonzero tkhd width/height is the video
          var i = moovStart
          while ((width < 0 || height < 0) && i + 8 <= moovEnd) {
            boxAt(i) match {
              case Some((t, ps, end)) if end <= moovEnd =>
                if (t == "trak")
                  findChild(ps, end, "tkhd")
                    .filter { case (tps, tend) => tps < tend }
                    .foreach { case (tps, tend) =>
                    val v = p(tps) & 0xff
                    val dimOff = if (v == 1) 88 else 76 // 16.16 fixed-point
                    if (tps + dimOff + 8 <= tend) {
                      val w = be32(p, tps + dimOff) >>> 16
                      val h = be32(p, tps + dimOff + 4) >>> 16
                      if (w > 0 && h > 0) { width = w; height = h }
                    }
                  }
                i = end
              case _ => i = moovEnd // malformed child: stop the walk
            }
          }
        }
        return Some(Info("mp4", "video", width, height, durationMs))
      }
      // WAV: RIFF....WAVE, then fmt (byte rate) and data (size) chunks
      if (ascii(p, 0, 4) == "RIFF" && ascii(p, 8, 4) == "WAVE") {
        var i = 12
        var byteRate = 0L
        var dataSize = -1L
        var ok = true
        while (ok && i + 8 <= p.length) {
          val id = ascii(p, i, 4)
          val size = le32(p, i + 4).toLong & 0xffffffffL
          if (id == "fmt " && i + 16 + 8 <= p.length)
            byteRate = le32(p, i + 16).toLong & 0xffffffffL
          if (id == "data") dataSize = size
          // hostile/corrupt chunk size: a non-advancing step would loop
          // forever — stop walking, keep what was parsed so far
          val advance = 8L + size + (size & 1L)
          if (advance <= 0 || i + advance > Int.MaxValue) ok = false
          else i += advance.toInt
        }
        val dur = if (byteRate > 0 && dataSize >= 0)
          dataSize * 1000L / byteRate else -1L
        return Some(Info("wav", "audio", -1, -1, dur))
      }
      // FLAC: "fLaC" magic, then the MANDATORY-first STREAMINFO block
      // (type 0): sample rate is 20 bits at STREAMINFO+10, total
      // samples 36 bits ending at STREAMINFO+17 — exact duration, no
      // frame walk needed
      if (ascii(p, 0, 4) == "fLaC" && p.length >= 8 + 18) {
        val blockType = p(4) & 0x7f
        if (blockType == 0) {
          val si = 8 // streaminfo payload start (4 magic + 4 block header)
          val sr = ((p(si + 10) & 0xff) << 12) | ((p(si + 11) & 0xff) << 4) |
            ((p(si + 12) & 0xff) >>> 4)
          val totalSamples = ((p(si + 13) & 0x0fL) << 32) |
            ((p(si + 14) & 0xffL) << 24) | ((p(si + 15) & 0xffL) << 16) |
            ((p(si + 16) & 0xffL) << 8) | (p(si + 17) & 0xffL)
          // totalSamples 0 means "unknown" per spec, like sr 0
          val dur = if (sr > 0 && totalSamples > 0)
            totalSamples * 1000L / sr else -1L
          return Some(Info("flac", "audio", -1, -1, dur))
        }
        return Some(Info("flac", "audio", -1, -1, -1L))
      }
      // MP3: an ID3v2 tag (skipped via its syncsafe size) or a bare
      // frame sync; duration is the standard CBR ESTIMATE from the
      // first frame's bitrate (a VBR stream needs a full frame walk —
      // out of header-probe scope, reported as the estimate it is)
      val mp3Start: Int =
        if (ascii(p, 0, 3) == "ID3" && p.length >= 10) {
          val sz = ((p(6) & 0x7f) << 21) | ((p(7) & 0x7f) << 14) |
            ((p(8) & 0x7f) << 7) | (p(9) & 0x7f)
          val s = 10L + sz
          if (s + 4 <= p.length) s.toInt else -1
        } else if ((p(0) & 0xff) == 0xff && (p(1) & 0xe0) == 0xe0) 0
        else -1
      if (mp3Start >= 0 && mp3Start + 4 <= p.length &&
          (p(mp3Start) & 0xff) == 0xff && (p(mp3Start + 1) & 0xe0) == 0xe0) {
        val b1 = p(mp3Start + 1) & 0xff
        val b2 = p(mp3Start + 2) & 0xff
        // reserved field values mean "not actually an MPEG frame":
        // version 01, layer 00, bitrate 1111, samplerate 11. A bare
        // 11-bit sync alone would misclassify ~1/2048 of arbitrary
        // binaries as mp3 (and an out-of-table bitrate index would
        // crash the lookup) — an ID3 tag is accepted as evidence on
        // its own, a bare sync only with a fully-valid header.
        val verBits = (b1 >> 3) & 3
        val layerBits = (b1 >> 1) & 3
        val brIdx = (b2 >> 4) & 0xf
        val srIdx = (b2 >> 2) & 3
        val frameValid = verBits != 1 && layerBits != 0 &&
          brIdx != 0xf && srIdx != 3
        val taggedId3 = mp3Start > 0
        if (taggedId3 || frameValid) {
          val dur =
            if (frameValid && verBits == 3 && layerBits == 1) {
              // MPEG-1 Layer III bitrate table (kbps), index 1..14
              val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                160, 192, 224, 256, 320)(brIdx)
              if (kbps > 0) (p.length - mp3Start).toLong * 8L / kbps else -1L
            } else -1L
          return Some(Info("mp3", "audio", -1, -1, dur))
        }
      }
      None
    }
  }

  /** Fill the meta struct from the payload's container headers —
    * partition-local, payload-pruned (reads only media_id + payload +
    * meta), nothing stubbed. Unknown containers keep their ingest meta.
    */
  def probeMedia(media: DataFrame): DataFrame = {
    val schema = media.schema
    val idIdx = schema.fieldIndex("media_id")
    val payloadIdx = schema.fieldIndex("payload")
    val metaIdx = schema.fieldIndex("meta")
    media.mapPartitions { it =>
      it.map { r =>
        val payload = if (r.isNullAt(payloadIdx)) null
                      else r.getAs[Array[Byte]](payloadIdx)
        val oldMeta = if (r.isNullAt(metaIdx)) null else r.getAs[Row](metaIdx)
        // per-field coalesce with the ingest meta: a recognized container
        // whose header lacks a field (e.g. JPEG SOF beyond the scanned
        // region) must not null out a dimension the caller already knew
        def known(i: Int): Any = if (oldMeta == null) null else oldMeta.get(i)
        val newMeta = Probe.sniff(payload) match {
          case Some(info) => Row(
            info.modality, info.format,
            if (info.width >= 0) info.width else known(2),
            if (info.height >= 0) info.height else known(3),
            if (info.durationMs >= 0) info.durationMs else known(4),
            known(5))
          case None => oldMeta
        }
        Row(r.get(idIdx), payload, newMeta)
      }
    }(org.apache.spark.sql.Encoders.row(mediaSchema))
  }
}
