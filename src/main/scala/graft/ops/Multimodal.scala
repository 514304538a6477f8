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
  * The actual media decoding is STUBBED (no image/audio libraries in this
  * build): [[Codec.decodeImage]] is a deterministic fake that derives
  * pixel statistics from the payload bytes. Everything around it — the
  * schema contract, partition-local execution, batch iteration, null
  * handling and the feature schema — is real and tested; swapping in a
  * real codec changes only the function body.
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

  /** STUB codec. Deterministic over payload bytes so tests are stable. */
  object Codec {
    /** Stand-in for a real JPEG/PNG decode + stats pass: derives a fake
      * luminance mean and a 64-bit perceptual-hash-like signature from
      * the bytes. Replace with an actual decoder off-container.
      */
    def decodeImage(payload: Array[Byte]): (Double, Long, Boolean) = {
      if (payload == null || payload.isEmpty) return (0.0, 0L, false)
      var acc = 0L
      var h = 1125899906842597L // FNV-ish rolling hash
      payload.foreach { b =>
        acc += (b & 0xff)
        h = h * 31 + (b & 0xff)
      }
      (acc.toDouble / payload.length / 255.0, h, true)
    }

    /** Stand-in resize: at scale this re-encodes the payload; the stub
      * truncates deterministically, preserving the plumbing contract
      * (binary in, binary out, metadata updated).
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
  def extractImageFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rows = media
      .filter(col("meta.modality") === "image")
      .select(col("media_id"), col("payload"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val (luma, phash, ok) = Codec.decodeImage(payload)
          Row(id, if (payload == null) 0 else payload.length, luma, phash, ok)
        }
      }
    spark.createDataFrame(rows, imageFeatureSchema)
  }

  /** Frame sampling for video rows: emits `n` pseudo-frames per video as
    * separate rows (payload slices in the stub; frame decodes for real),
    * the flatMap/explode shape a real sampler uses.
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
}
