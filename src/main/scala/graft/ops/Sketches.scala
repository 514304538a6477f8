package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable sketch aggregations — the cardinality/frequency pattern
  * that actually scales to 100 TB: sketch each shard (source, day,
  * partition) ONCE at ingest, persist the tiny sketch rows, and answer
  * corpus-wide questions later by MERGING sketches instead of
  * re-scanning the corpus. Exact distinct over a 100 TB column is a
  * full shuffle of every distinct value; the sketch path moves kilobytes.
  *
  * Both sketches ride Spark's codegen'd built-ins (Apache DataSketches
  * HLL and the classic count-min), so the per-shard pass is one
  * map-side-combining aggregate.
  *
  * The algebraic property the spec pins: HLL register-max union means
  * union-of-shard-sketches equals the sketch of the whole corpus — not
  * approximately, EXACTLY (same registers, same estimate). That is what
  * makes incremental maintenance sound: yesterday's sketches never need
  * recomputation when today's shard arrives.
  */
object Sketches {

  /** One HLL sketch + estimate per group (the per-shard ingest pass).
    * Output: (groupCol, sketch binary, n_distinct estimate).
    */
  def distinctPerGroup(df: DataFrame, groupCol: String, valueCol: String,
                       lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))
      .withColumn("n_distinct", hll_sketch_estimate(col("sketch")))

  /** Merge per-group sketches to ONE corpus-wide estimate — kilobytes
    * of input, no corpus rescan. `allowDifferentLgK` stays false: a
    * mixed-precision union silently degrades to the coarsest sketch,
    * which should be an explicit decision, not an accident.
    */
  def mergedDistinct(perGroup: DataFrame): DataFrame =
    perGroup.agg(
      hll_sketch_estimate(
        hll_union_agg(col("sketch"), lit(false))).as("n_distinct"))

  /** Whole-corpus sketch in one pass (the baseline the union must
    * match).
    */
  def distinctAll(df: DataFrame, valueCol: String, lgK: Int = 12): DataFrame =
    df.agg(hll_sketch_estimate(
      hll_sketch_agg(col(valueCol), lit(lgK))).as("n_distinct"))

  /** Count-min frequency sketch of a column, returned as the serialized
    * sketch bytes (one row). Point lookups deserialize driver-side via
    * [[frequencyOf]] — the heavy-hitter screening pattern: the sketch
    * never under-counts, so `frequencyOf(x) < threshold` definitively
    * clears x without a corpus group-by.
    */
  def cmSketch(df: DataFrame, valueCol: String, eps: Double = 0.0001,
               confidence: Double = 0.99, seed: Int = 42): Array[Byte] =
    df.agg(count_min_sketch(col(valueCol), lit(eps), lit(confidence),
      lit(seed)).as("cms"))
      .head().getAs[Array[Byte]]("cms")

  /** Estimated frequency of one value in a serialized count-min sketch
    * (never an under-count; over-counts bounded by eps·N at the chosen
    * confidence).
    */
  def frequencyOf(sketch: Array[Byte], value: String): Long = {
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketch))
    // the agg side adds StringType values as their UTF-8 bytes
    cms.estimateCount(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
