package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucket-decomposed interval join — points matched to every interval
  * containing them (`start <= pt <= end`, optionally per key).
  *
  * Spark plans a raw range predicate as a broadcast-nested-loop or
  * cartesian join: O(points × intervals) comparisons per key, which is
  * the first thing to die on a 100 TB event table. The standard fix
  * (Databricks' RANGE_JOIN bin hint, Flink's interval-join buckets) is
  * to decompose the value domain into fixed-width buckets: an interval
  * registers in each bucket it covers, a point lives in exactly ONE
  * bucket, and the join becomes an equi-join on (key, bucket) followed
  * by the exact range filter. Because the point's bucket is unique,
  * each qualifying (point, interval) pair meets in exactly one bucket —
  * no post-join dedup.
  *
  * Cost model: interval replication = len/bucketWidth + 1, so pick
  * `bucketWidth` near the TYPICAL interval length — replication stays
  * O(1) while each bucket's population stays bounded. The equi-join
  * shuffles on (key, bucket), so skew tooling (AQE skew split) applies
  * as on any equi-join. A pathological interval spanning more than
  * `maxBucketsPerInterval` buckets fails loudly instead of silently
  * exploding the build side.
  */
object RangeJoin {

  /** Exact floor(c / w) for any sign, in decimal so 64-bit inputs never
    * round through a double.
    */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")

  /** Join `points` to the `intervals` rows containing them.
    *
    * @param points    each row matched by `ptCol` (numeric — pass
    *                  unix_micros for timestamps)
    * @param intervals carries `startCol`/`endCol` (inclusive both ends)
    *                  plus payload columns; payload names must not
    *                  collide with point columns
    * @param keyCols   optional equi-keys shared by both sides
    * @param bucketWidth domain width per bucket, > 0
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      ptCol: String, startCol: String, endCol: String,
                      keyCols: Seq[String], bucketWidth: Long,
                      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    val payload = intervals.columns.toSeq.filterNot(keyCols.contains)
    val clash = payload.toSet
      .intersect(points.columns.toSet -- keyCols.toSet)
    require(clash.isEmpty,
      s"interval join: interval columns collide with point columns: " +
        s"$clash — rename one side first")

    val b0 = floorDiv(col(startCol), bucketWidth)
    val b1 = floorDiv(col(endCol), bucketWidth)
    // order matters: an INVERTED interval (end < start) must hit the
    // empty arm before the guard — b1-b0 is negative there, so the
    // size check alone would wave it through into sequence(), which
    // generates a DESCENDING bucket list of |b0-b1|+1 elements: the
    // silent explosion this guard exists to prevent. SQL BETWEEN with
    // start > end is an empty predicate, so the row matches nothing.
    val buckets = when(b1 < b0,
        array().cast("array<bigint>"))
      .when(b1 - b0 < lit(maxBucketsPerInterval.toLong),
        sequence(b0, b1))
      .otherwise(raise_error(concat(
        lit(s"interval spans >= $maxBucketsPerInterval buckets of width " +
          s"$bucketWidth at "), col(startCol).cast("string"),
        lit(".."), col(endCol).cast("string"),
        lit(" — widen bucketWidth or split the interval"))))
    val iv = intervals.withColumn("__b", explode(buckets))
    points.withColumn("__b", floorDiv(col(ptCol), bucketWidth))
      .join(iv, (keyCols :+ "__b").toSeq)
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__b")
  }
}
