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
    assert(f1.filter(!col("decode_ok")).count() === 0)
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
}
