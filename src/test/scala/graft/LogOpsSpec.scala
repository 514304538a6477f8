package graft

import org.apache.spark.sql.functions._
import graft.operators.LogOps

class LogOpsSpec extends SparkSpec {

  private lazy val log = Tables.log(spark, sf).cache()

  test("watermarks: low <= high, counts sum to table size") {
    val wm = LogOps.watermarks(log).collect()
    assert(wm.length === Tables.LogPartitions)
    wm.foreach { r =>
      assert(r.getAs[Long]("low_watermark") < r.getAs[Long]("high_watermark"))
    }
    assert(wm.map(_.getAs[Long]("record_count")).sum === log.count())
  }

  test("fetchRange honours [fetchOffset, hw)") {
    val out = LogOps.fetchRange(log, 10, 20)
    val offs = out.select("offset").as[Long](spark.implicits.newLongEncoder).collect()
    assert(offs.forall(o => o >= 10 && o < 20))
    assert(offs.length === 10)
  }

  test("fetchWithByteBudget always returns at least one record per partition") {
    val out = LogOps.fetchWithByteBudget(log, 0, 1)
    val perPart = out.groupBy("partition").count().collect()
    assert(perPart.length === Tables.LogPartitions)
    perPart.foreach(r => assert(r.getAs[Long]("count") === 1))
  }

  test("compact keeps exactly one record per (partition,key), the latest") {
    val out = LogOps.compact(log).cache()
    val dupKeys = out.groupBy("partition", "key").count().filter(col("count") > 1)
    assert(dupKeys.count() === 0)
    // the kept offset is the max offset for that key
    val expect = log.groupBy("partition", "key").agg(max("offset").as("offset"))
    assert(out.select("partition", "key", "offset")
      .exceptAll(expect).count() === 0)
  }

  test("duplicateSequences flags only repeats") {
    val withProducer = log
      .withColumn("producer_id", col("key") % 4)
      .withColumn("producer_epoch", lit(0))
      .withColumn("base_sequence", (col("offset") % 97).cast("int"))
    val dups = LogOps.duplicateSequences(withProducer)
    assert(dups.filter(col("dup_rank") <= 1).count() === 0)
  }

  test("straddleStart finds the greatest batch start <= fetch offset (P3)") {
    val out = LogOps.straddleStart(log, 100).collect()
    out.foreach { r =>
      val p = r.getAs[Int]("partition")
      val start = r.getAs[Long]("batch_start")
      assert(start <= 100)
      // no offset in this partition lies strictly between start and 100
      assert(log.filter(col("partition") === p &&
        col("offset") > start && col("offset") <= 100).count() === 0)
    }
  }

  test("offsetForTimestamp returns the first offset at/after ts (J4)") {
    val ts = lit("2024-01-03 00:00:00").cast("timestamp")
    val out = LogOps.offsetForTimestamp(log, ts).collect()
    out.foreach { r =>
      val p = r.getAs[Int]("partition")
      val off = r.getAs[Long]("offset_for_ts")
      val row = log.filter(col("partition") === p && col("offset") === off).head()
      assert(!row.getAs[java.sql.Timestamp]("timestamp").before(
        java.sql.Timestamp.valueOf("2024-01-03 00:00:00")))
      assert(log.filter(col("partition") === p && col("offset") < off &&
        col("timestamp") >= ts).count() === 0)
    }
  }

  test("applyRetention keeps compact topics whole, trims delete topics (J5/T7)") {
    import spark.implicits._
    val cfg = Seq(("events", 1000L * 3600 * 24, "delete")) // 1 day retention
      .toDF("topic", "retention_ms", "cleanup_policy")
    val now = lit("2024-01-05 00:00:00").cast("timestamp")
    val kept = LogOps.applyRetention(log, cfg, now)
    assert(kept.count() < log.count()) // something was trimmed
    assert(kept.filter(col("timestamp") <
      lit("2024-01-04 00:00:00").cast("timestamp")).count() === 0)
    val cfgCompact = Seq(("events", 1000L, "compact"))
      .toDF("topic", "retention_ms", "cleanup_policy")
    assert(LogOps.applyRetention(log, cfgCompact, now).count() === log.count())
  }

  test("overlappingTxns selects aborted ranges intersecting the fetch window (J3)") {
    import spark.implicits._
    val txns = Seq(
      ("events", 0, 10L, 20L, "Aborted"),   // inside
      ("events", 0, 90L, 120L, "Aborted"),  // straddles end
      ("events", 0, 150L, 160L, "Aborted"), // beyond
      ("events", 0, 10L, 20L, "Committed")) // wrong state
      .toDF("topic", "partition", "offset_start", "offset_end", "state")
    val out = LogOps.overlappingTxns(txns, fetchOffset = 0L, lastStable = 100L)
      .select("offset_start").as[Long].collect().sorted
    assert(out.toSeq === Seq(10L, 90L))
  }

  test("readCommitted filters aborted ranges") {
    import spark.implicits._
    val txns = Seq(("events", 0, 0L, 100L, "Aborted"), ("events", 1, 0L, 50L, "Committed"))
      .toDF("topic", "partition", "offset_start", "offset_end", "state")
    val out = LogOps.readCommitted(log, txns)
    // partition 0 offsets <= 100 removed; partition 1 untouched
    assert(out.filter(col("partition") === 0 && col("offset") <= 100).count() === 0)
    assert(out.filter(col("partition") === 1).count() ===
      log.filter(col("partition") === 1).count())
  }

  test("readCommitted is producer-scoped: interleaved committed records survive") {
    import spark.implicits._
    // producer 7 aborted [10, 20]; producer 8's committed records sit
    // INSIDE that offset range — Kafka drops only the aborted producer's
    val rows = Seq(
      ("t", 0, 10L, 7L, "a-aborted"),
      ("t", 0, 12L, 8L, "b-committed"),
      ("t", 0, 15L, 7L, "a-aborted2"),
      ("t", 0, 18L, 8L, "b-committed2"),
      ("t", 0, 25L, 7L, "a-later"))
      .toDF("topic", "partition", "offset", "producer_id", "v")
    val txns = Seq(("t", 0, 10L, 20L, "Aborted", 7L))
      .toDF("topic", "partition", "offset_start", "offset_end", "state",
        "producer_id")
    val vis = LogOps.readCommitted(rows, txns)
      .select("v").as[String].collect().sorted.toSeq
    assert(vis === Seq("a-later", "b-committed", "b-committed2"))
  }

  test("readCommittedFromLog: non-transactional records are always visible") {
    import spark.implicits._
    val rows = Seq(
      // producer 5: one txn committed, one open (invisible)
      ("t", 0, 0L, 5L, false, null, "txn-committed"),
      ("t", 0, 1L, 5L, true, "commit", null),
      ("t", 0, 2L, 5L, false, null, "txn-open"),
      // plain producer: no markers ever — must stay visible
      ("t", 0, 3L, -1L, false, null, "plain-a"),
      ("t", 0, 4L, -1L, false, null, "plain-b"))
      .toDF("topic", "partition", "offset", "producer_id", "is_control",
        "control_type", "v")
    val vis = LogOps.readCommittedFromLog(rows,
      col("control_type") === "commit")
      .select("v").as[String].collect().sorted.toSeq
    assert(vis === Seq("plain-a", "plain-b", "txn-committed"))
  }
}
