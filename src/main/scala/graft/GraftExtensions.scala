package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.functions.{BlockMeanHash, BmpDecodeStats, BmpEncode,
  BmpResizeArea, BmpResizeNn, Crc32C, DeflateLen, DotQLongs,
  ImageDecodeStats, ImageEncode, ImageResizeNn, Mp4DemuxStats,
  Mp4Encode, Mp4SyncIndices, Mp4SyncSamples, NfcNormalize,
  PhraseCount, PngDecodeStats, PngEncode, PngResizeNn, RandProjLongs,
  WavDecodeStats, WavDownsample, WavDownsampleMean, WavEncode,
  WavSamples, WordPieceEncodeWords}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * functions so they're usable from SQL text as well as the Column API.
  *
  * Usage:
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // programmatic
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *
  * This is the (c)-tier extension point from the build rules — the same
  * registration path a custom LogicalPlan/Strategy would use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("crc32c"),
      new ExpressionInfo(classOf[Crc32C].getName, "crc32c"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "crc32c takes exactly one argument")
        Crc32C(children.head)
      }))
    // exact fixed-point dot product over quantized long vectors — the
    // similarity kernel, usable straight from SQL text
    ext.injectFunction((
      new FunctionIdentifier("dotq"),
      new ExpressionInfo(classOf[DotQLongs].getName, "dotq"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dotq takes exactly two array<bigint> arguments")
        DotQLongs(children(0), children(1))
      }))
    // DEFLATE-compressed length of a string — the compression-ratio
    // repetitiveness signal's kernel
    ext.injectFunction((
      new FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "deflate_len takes exactly one argument")
        DeflateLen(children.head)
      }))
    // Aho–Corasick blocklist scan: phrase_count(text, array('p1','p2')).
    // The phrase list must be a literal — the table is built ONCE at
    // analysis time on the driver and broadcast (cached per list — a
    // re-analyzed query reuses it, never minting broadcast blocks per
    // analysis); a non-foldable list would mean an automaton per row.
    ext.injectFunction((
      new FunctionIdentifier("phrase_count"),
      new ExpressionInfo(classOf[PhraseCount].getName, "phrase_count"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "phrase_count(text, array<string> phrases)")
        PhraseCount(children.head,
          graft.functions.PhraseExpressions.broadcastFor(
            literalStrings(children(1), "phrase_count")))
      }))
    // WordPiece segmentation: wordpiece_encode(words, array('un','##a')).
    // Same literal-vocab contract (and broadcast cache) as phrase_count.
    ext.injectFunction((
      new FunctionIdentifier("wordpiece_encode"),
      new ExpressionInfo(classOf[WordPieceEncodeWords].getName,
        "wordpiece_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "wordpiece_encode(words, array<string> vocab)")
        WordPieceEncodeWords(children.head,
          graft.functions.WordPieceExpressions.broadcastFor(
            literalStrings(children(1), "wordpiece_encode"), "[UNK]", 100))
      }))
    // sparse sign random projection: rand_proj(array<bigint>, 16).
    // outDims must be a literal int — it sizes the kernel's loop.
    ext.injectFunction((
      new FunctionIdentifier("rand_proj"),
      new ExpressionInfo(classOf[RandProjLongs].getName, "rand_proj"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "rand_proj(q, int outDims)")
        RandProjLongs(children.head,
          literalInt(children(1), "rand_proj"))
      }))
    // block-mean perceptual hash: block_mean_hash(payload[, blocks]).
    ext.injectFunction((
      new FunctionIdentifier("block_mean_hash"),
      new ExpressionInfo(classOf[BlockMeanHash].getName, "block_mean_hash"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          "block_mean_hash(payload binary[, int blocks])")
        val blocks = if (children.size == 2)
          literalInt(children(1), "block_mean_hash") else 60
        require(blocks > 0 && blocks <= 60,
          s"block_mean_hash: blocks must be 1..60: $blocks")
        BlockMeanHash(children.head, blocks)
      }))
    // Unicode NFC canonical composition: nfc(text).
    ext.injectFunction((
      new FunctionIdentifier("nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "nfc takes exactly one argument")
        NfcNormalize(children.head)
      }))
    // the codec-free media kernels: decode stats, encode (for minting
    // byte-exact test containers from SQL), NN + area resize, naive +
    // mean decimation — dims/factors are literal ints (they size loops)
    ext.injectFunction((
      new FunctionIdentifier("bmp_decode_stats"),
      new ExpressionInfo(classOf[BmpDecodeStats].getName, "bmp_decode_stats"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "bmp_decode_stats(payload)")
        BmpDecodeStats(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("wav_decode_stats"),
      new ExpressionInfo(classOf[WavDecodeStats].getName, "wav_decode_stats"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "wav_decode_stats(payload)")
        WavDecodeStats(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("bmp_encode"),
      new ExpressionInfo(classOf[BmpEncode].getName, "bmp_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "bmp_encode(pixels, w, h)")
        BmpEncode(children.head, literalInt(children(1), "bmp_encode"),
          literalInt(children(2), "bmp_encode"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("wav_encode"),
      new ExpressionInfo(classOf[WavEncode].getName, "wav_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "wav_encode(samples, rate)")
        WavEncode(children.head, literalInt(children(1), "wav_encode"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bmp_resize_nn"),
      new ExpressionInfo(classOf[BmpResizeNn].getName, "bmp_resize_nn"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "bmp_resize_nn(payload, w, h)")
        BmpResizeNn(children.head, literalInt(children(1), "bmp_resize_nn"),
          literalInt(children(2), "bmp_resize_nn"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bmp_resize_area"),
      new ExpressionInfo(classOf[BmpResizeArea].getName, "bmp_resize_area"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "bmp_resize_area(payload, w, h)")
        BmpResizeArea(children.head,
          literalInt(children(1), "bmp_resize_area"),
          literalInt(children(2), "bmp_resize_area"))
      }))
    // ISO-BMFF (MP4) container demux: sample-table stats, keyframe
    // indices/bytes, and the fixture muxer (timescale/delta/keyEvery
    // are literal ints — they size the written tables)
    ext.injectFunction((
      new FunctionIdentifier("mp4_demux_stats"),
      new ExpressionInfo(classOf[Mp4DemuxStats].getName, "mp4_demux_stats"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "mp4_demux_stats(payload)")
        Mp4DemuxStats(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("mp4_sync_indices"),
      new ExpressionInfo(classOf[Mp4SyncIndices].getName, "mp4_sync_indices"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "mp4_sync_indices(payload)")
        Mp4SyncIndices(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("mp4_sync_samples"),
      new ExpressionInfo(classOf[Mp4SyncSamples].getName, "mp4_sync_samples"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "mp4_sync_samples(payload)")
        Mp4SyncSamples(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("mp4_encode"),
      new ExpressionInfo(classOf[Mp4Encode].getName, "mp4_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          "mp4_encode(samples, timescale, delta, keyEvery)")
        Mp4Encode(children.head, literalInt(children(1), "mp4_encode"),
          literalInt(children(2), "mp4_encode"),
          literalInt(children(3), "mp4_encode"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("image_decode_stats"),
      new ExpressionInfo(classOf[ImageDecodeStats].getName,
        "image_decode_stats"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "image_decode_stats(payload)")
        ImageDecodeStats(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("image_encode"),
      new ExpressionInfo(classOf[ImageEncode].getName, "image_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          "image_encode(pixels, w, h, format)")
        ImageEncode(children.head, literalInt(children(1), "image_encode"),
          literalInt(children(2), "image_encode"),
          literalString(children(3), "image_encode"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("image_resize_nn"),
      new ExpressionInfo(classOf[ImageResizeNn].getName, "image_resize_nn"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          "image_resize_nn(payload, w, h, format)")
        ImageResizeNn(children.head,
          literalInt(children(1), "image_resize_nn"),
          literalInt(children(2), "image_resize_nn"),
          literalString(children(3), "image_resize_nn"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("wav_samples"),
      new ExpressionInfo(classOf[WavSamples].getName, "wav_samples"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "wav_samples(payload)")
        WavSamples(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("png_decode_stats"),
      new ExpressionInfo(classOf[PngDecodeStats].getName, "png_decode_stats"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "png_decode_stats(payload)")
        PngDecodeStats(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("png_encode"),
      new ExpressionInfo(classOf[PngEncode].getName, "png_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 5,
          "png_encode(pixels, w, h, channels, filter_mode)")
        PngEncode(children.head, literalInt(children(1), "png_encode"),
          literalInt(children(2), "png_encode"),
          literalInt(children(3), "png_encode"),
          literalInt(children(4), "png_encode"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("png_resize_nn"),
      new ExpressionInfo(classOf[PngResizeNn].getName, "png_resize_nn"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "png_resize_nn(payload, w, h)")
        PngResizeNn(children.head, literalInt(children(1), "png_resize_nn"),
          literalInt(children(2), "png_resize_nn"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("wav_downsample"),
      new ExpressionInfo(classOf[WavDownsample].getName, "wav_downsample"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "wav_downsample(payload, factor)")
        WavDownsample(children.head,
          literalInt(children(1), "wav_downsample"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("wav_downsample_mean"),
      new ExpressionInfo(classOf[WavDownsampleMean].getName,
        "wav_downsample_mean"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "wav_downsample_mean(payload, factor)")
        WavDownsampleMean(children.head,
          literalInt(children(1), "wav_downsample_mean"))
      }))
    // per-doc TextTiling gap scores straight from SQL:
    // text_tile_gaps(tokens, blockK, step, depth_min_e6)
    ext.injectFunction((
      new FunctionIdentifier("text_tile_gaps"),
      new ExpressionInfo(
        classOf[graft.functions.TextTileGaps].getName, "text_tile_gaps"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          "text_tile_gaps(tokens, blockK, step, depth_min_e6)")
        graft.functions.TextTileGaps(children.head,
          literalInt(children(1), "text_tile_gaps"),
          literalInt(children(2), "text_tile_gaps"),
          literalInt(children(3), "text_tile_gaps").toLong)
      }))
    // clipped n-gram overlap (ROUGE/BLEU core) straight from SQL:
    // ngram_overlap(cand_tokens, ref_tokens, max_n)
    ext.injectFunction((
      new FunctionIdentifier("ngram_overlap"),
      new ExpressionInfo(
        classOf[graft.functions.NgramOverlapCounts].getName, "ngram_overlap"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "ngram_overlap(cand_tokens, ref_tokens, max_n)")
        graft.functions.NgramOverlapCounts(children.head, children(1),
          literalInt(children(2), "ngram_overlap"))
      }))
  }

  /** Evaluate a foldable int argument at analysis time. */
  private def literalInt(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: the size argument must be a literal int")
    e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: the size argument must be an int, got $other")
    }
  }

  private def literalString(e: Expression, fn: String): String = {
    require(e.foldable, s"$fn: the format argument must be a literal string")
    val v = e.eval()
    require(v != null, s"$fn: the format argument must not be NULL")
    v.toString
  }

  /** Evaluate a foldable array<string> argument with clean analysis-time
    * errors (wrong element type / NULLs raise a message, not a
    * ClassCastException from the internals).
    */
  private def literalStrings(e: Expression, fn: String): Seq[String] = {
    require(e.foldable, s"$fn: the list argument must be a literal array")
    val ok = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }
    require(ok, s"$fn: the list argument must be array<string>," +
      s" got ${e.dataType.catalogString}")
    val arr = e.eval()
    require(arr != null, s"$fn: the list argument must not be NULL")
    val vals = arr.asInstanceOf[ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType)
    require(vals.forall(_ != null), s"$fn: list entries must not be NULL")
    vals.map(_.toString).toSeq
  }
}
