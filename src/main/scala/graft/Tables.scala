package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata plus the canonical "record log" view.
  *
  * The `events` table plays the role of a schema-backed topic's record log
  * (TESTDATA.md): `event_id` is the broker-assigned offset, `user_id` the
  * record key, `props` the value (JSON), `ts` the append timestamp.
  * Partition assignment is deterministic (`event_id % nPartitions`) so the
  * same mapping is expressible in the DuckDB oracle SQL.
  *
  * At scale the log is a real table partitioned by (topic, partition) —
  * this view only exists so the driver-provided parquet can exercise the
  * log operators.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Older driver testdata stored events.ts as TIMESTAMP(NANOS), which
    // Spark's parquet reader rejects unless read as Long nanos; newer data
    // uses TIMESTAMP(MICROS). The conf is a no-op for micros files.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Number of synthetic log partitions derived from event_id. */
  val LogPartitions = 8

  /** events → record-log view (SURVEY §1.4 schema, minus wire-only fields).
    * Columns: topic, partition, offset, timestamp, key, value, val_len.
    */
  def log(spark: SparkSession, sfDir: String): DataFrame = {
    val events = load(spark, sfDir, "events")
    // ts arrives either as Long nanos (legacy TIMESTAMP(NANOS) files under
    // nanosAsLong) or as a native timestamp/timestamp_ntz (current files).
    // Session timezone is pinned to UTC by every entrypoint, so the NTZ
    // cast below keeps the same wall-clock micros DuckDB reads natively.
    val tsAsTimestamp = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts DIV 1000"))
      case _                                   => col("ts").cast("timestamp")
    }
    events
      .select(
        lit("events").as("topic"),
        (col("event_id") % LogPartitions).cast("int").as("partition"),
        col("event_id").as("offset"),
        tsAsTimestamp.as("timestamp"),
        col("user_id").as("key"),
        col("props").as("value"),
        col("event_type"),
        col("value").as("metric"),
        octet_length(col("props")).as("val_len"))
  }
}
