package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Verifies the SparkSessionExtensions registration path. The shared test
  * session already exists, so rather than building a second session (and
  * risking getOrCreate returning the shared one), the extension's
  * injection list is applied to the live session's function registry —
  * the same wiring `--conf spark.sql.extensions` performs at startup.
  */
class ExtensionsSpec extends SparkSpec {

  test("crc32c callable from SQL text after extension registration") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // replay the injected functions into the live session's registry
    val m = classOf[SparkSessionExtensions].getDeclaredMethods
      .find(_.getName == "registerFunctions").get
    m.setAccessible(true)
    m.invoke(ext, spark.sessionState.functionRegistry)
    val v = spark.sql("SELECT crc32c(cast('hello' as binary)) AS c").head().getLong(0)
    assert(v === graft.functions.Crc32C.compute("hello".getBytes("UTF-8")))
    // and the expression itself matches the builtin-free compute
    assert(spark.sql("SELECT crc32c(cast('' as binary))").head().getLong(0) === 0L)
    // the vector and compression kernels ride the same registry
    assert(spark.sql(
      "SELECT dotq(array(2L, 3L), array(4L, 5L))").head().getLong(0) === 23L)
    val dl = spark.sql("SELECT deflate_len('aaaaaaaaaaaaaaaaaaaaaaaa')")
      .head().getLong(0)
    assert(dl > 0 && dl < 24, s"repetitive text must compress: $dl")
    // the broadcast-kernel expressions take their table as a literal
    // array and build/broadcast it once at analysis time
    assert(spark.sql(
      "SELECT phrase_count('aab aa', array('aa', 'ab', 'zz'))")
      .head().getSeq[Long](0) === Seq(2L, 1L, 0L))
    assert(spark.sql(
      "SELECT wordpiece_encode(array('unaffable'), " +
        "array('un', '##aff', '##able'))")
      .head().getSeq[String](0) === Seq("un", "##aff", "##able"))
    // a non-literal phrase list must be rejected at analysis, not
    // silently rebuilt per row
    val err = intercept[Exception] {
      spark.sql("SELECT phrase_count(c, array(c)) FROM " +
        "(SELECT 'x' AS c)").collect()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
    // the projection and perceptual-hash kernels: SQL results equal the
    // Column-API kernels on the same inputs
    assert(spark.sql("SELECT rand_proj(array(10000000L, -5000000L), 4)")
      .head().getSeq[Long](0) ===
      (0 until 4).map { j =>
        val p = 2147483647L
        val a = 1103515245L * (j + 1) % p
        val b = 12345L * (2 * j + 1) % p
        Seq(10000000L, -5000000L).zipWithIndex.map { case (x, i) =>
          ((a * (i + 1) + b) % p % 6) match {
            case 0 => x; case 1 => -x; case _ => 0L
          }
        }.sum
      })
    assert(spark.sql(
      "SELECT block_mean_hash(cast('aaaa' as binary))")
      .head().getLong(0) === 0L)
    assert(spark.sql(
      "SELECT block_mean_hash(cast('aaaa' as binary), 4)")
      .head().getLong(0) === 0L)
    val badBlocks = intercept[Exception] {
      spark.sql("SELECT block_mean_hash(cast('a' as binary), 61)").collect()
    }
    assert(badBlocks.getMessage.contains("1..60"), badBlocks.getMessage)
    // NFC: decomposed composes, precomposed passes through unchanged,
    // and canonical-only (the ligature U+FB01 must NOT decompose — that
    // would be NFKC, a lossy different normal form)
    assert(spark.sql("SELECT nfc('cafe\u0301')").head().getString(0)
      === "caf\u00e9")
    assert(spark.sql("SELECT nfc('caf\u00e9')").head().getString(0)
      === "caf\u00e9")
    assert(spark.sql("SELECT nfc('\ufb01le')").head().getString(0)
      === "\ufb01le")
    // the media kernels ride the same registry: mint a 2x1 BMP from
    // SQL, resize it to 1x1 (keeps display pixel (0,0) = bytes 1,2,3),
    // decode its stats \u2014 the full encode\u2192transform\u2192decode chain in SQL
    val bmpStats = spark.sql(
      "SELECT bmp_decode_stats(bmp_resize_nn(" +
        "bmp_encode(cast(x'010203040506' as binary), 2, 1), 1, 1))")
      .head().getSeq[Long](0)
    assert(bmpStats === Seq(1L, 1L, 1L, 1L, 1L + 2 + 3, 1L + 2 + 3))
    val areaStats = spark.sql(
      "SELECT bmp_decode_stats(bmp_resize_area(" +
        "bmp_encode(cast(x'010203070809' as binary), 2, 1), 1, 1))")
      .head().getSeq[Long](0)
    // area mean of pixels (1,2,3) and (7,8,9): channels 4,5,6
    assert(areaStats === Seq(1L, 1L, 1L, 1L, 4L + 5 + 6, 4L + 5 + 6))
    val wavStats = spark.sql(
      "SELECT wav_decode_stats(wav_downsample_mean(" +
        "wav_encode(array(10, -20, 30, -40), 8000), 2))")
      .head().getSeq[Long](0)
    // windows (10,-20) (30,-40): means -5, -5 at 4000 Hz
    assert(wavStats === Seq(1L, 4000L, 2L, -10L, 50L, 0L))
    // the ImageIO kernels ride the same registry: mint a 2x1 GIF from
    // SQL, resize 1x1 (keeps display pixel (0,0)), decode — lossless
    // for the 2-color palette
    val gifStats = spark.sql(
      "SELECT image_decode_stats(image_resize_nn(" +
        "image_encode(cast(x'0102030a0b0c' as binary), 2, 1, 'gif')," +
        " 1, 1, 'gif'))")
      .head().getSeq[Long](0)
    assert(gifStats === Seq(1L, 1L, 1L, 1L, 1L + 2 + 3, 1L + 2 + 3))
    // sample extraction rides the same registry (sign extension binds)
    assert(spark.sql(
      "SELECT wav_samples(wav_encode(array(1, -2, 32767), 8000))")
      .head().getSeq[Int](0) === Seq(1, -2, 32767))
    assert(spark.sql("SELECT wav_samples(cast('nope' as binary))")
      .head().isNullAt(0), "hostile payload must be NULL from SQL too")
    // non-literal dims are rejected at analysis time
    val badDim = intercept[Exception] {
      spark.sql("SELECT bmp_resize_nn(cast('x' as binary), n, 1) FROM " +
        "(SELECT 1 AS n)").collect()
    }
    assert(badDim.getMessage.contains("literal"), badDim.getMessage)
    // the TextTiling kernel rides the same registry: a doc of two
    // disjoint 10-token halves has its one zero-cosine gap at token 10
    val tiles = spark.sql(
      "SELECT text_tile_gaps(split(" +
        "'a b c d e f g h i j k l m n o p q r s t', ' '), 10, 5, 150000)")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(tiles.map(_.getLong(0)) === Seq(5L, 10L, 15L))
    assert(tiles.forall(_.getLong(1) === 0L),
      "all-distinct tokens never share a bag entry")
    // the clipped-overlap kernel rides the same registry: "a b a" vs
    // "a b" shares clipped 2 unigrams and 1 bigram
    val ov = spark.sql(
      "SELECT ngram_overlap(split('a b a', ' '), split('a b', ' '), 2)")
      .head().getStruct(0)
    assert(ov.getAs[Long]("cand_len") === 3L)
    assert(ov.getAs[Long]("ref_len") === 2L)
    assert(ov.getAs[Long]("m1") === 2L)
    assert(ov.getAs[Long]("m2") === 1L)
    assert(ov.getAs[Long]("tc2") === 2L)
    val badN = intercept[Exception] {
      spark.sql("SELECT ngram_overlap(split('a', ' '), split('a', ' '), n)" +
        " FROM (SELECT 2 AS n)").collect()
    }
    assert(badN.getMessage.contains("literal"), badN.getMessage)
  }
}
