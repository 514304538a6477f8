package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.model.Model.Topition
import graft.storage.ParquetStorage
import graft.streaming.Streaming

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("logIngest: file-source micro-batches land in the log with offsets (T1/T13)") {
    val src = java.nio.file.Files.createTempDirectory("graft-stream-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val root = java.nio.file.Files.createTempDirectory("graft-stream-log").toString
    val storage = new ParquetStorage(spark, root)
    storage.createTopic("s1", 2)

    val data = (0 until 20).map(i =>
      (java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${10 + i % 40}"), s"k$i", s"v$i"))
      .toDF("timestamp", "key", "value")
    data.write.parquet(s"$src/batch0")

    val q = Streaming.logIngest(spark, s"$src/*", data.schema, storage,
      "s1", 2, ckpt, Trigger.AvailableNow())
    q.awaitTermination(60000)

    val total = (0 until 2).map { p =>
      storage.fetch(Topition("s1", p), 0, Long.MaxValue).count()
    }.sum
    assert(total === 20)
    // offsets contiguous per partition
    (0 until 2).foreach { p =>
      val offs = storage.fetch(Topition("s1", p), 0, Long.MaxValue)
        .select("offset").as[Long].collect().sorted
      assert(offs.toSeq === (0L until offs.length))
    }
  }

  test("logIngest schedules a constant number of jobs per micro-batch") {
    val src = java.nio.file.Files.createTempDirectory("graft-jobs-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-jobs-ckpt").toString
    val root = java.nio.file.Files.createTempDirectory("graft-jobs-log").toString
    val storage = new ParquetStorage(spark, root)
    storage.createTopic("s8", 8)

    val data = (0 until 64).map(i =>
      (java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${10 + i % 40}"), s"k$i", s"v$i"))
      .toDF("timestamp", "key", "value")
    data.coalesce(1).write.parquet(s"$src/batch0") // one file -> one micro-batch

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val q = Streaming.logIngest(spark, s"$src/*", data.schema, storage,
        "s8", 8, ckpt, Trigger.AvailableNow())
      q.awaitTermination(60000)
      Thread.sleep(500) // let listener events drain
    } finally spark.sparkContext.removeSparkListener(listener)

    // the old per-partition loop cost ~2 jobs per partition (16+ here);
    // the single-pass path is 1 stats job + 1 write per micro-batch
    // (AQE materializes each shuffle stage as its own job, so the
    // scheduler count is a little higher — what matters is that it is
    // CONSTANT in the partition count)
    assert(jobs.get() <= 6, s"expected <=6 jobs per micro-batch, saw ${jobs.get()}")
    val total = (0 until 8).map { p =>
      storage.fetch(Topition("s8", p), 0, Long.MaxValue).count()
    }.sum
    assert(total === 64)
  }

  test("longPollFetch returns early once minBytes arrive (T2)") {
    val root = java.nio.file.Files.createTempDirectory("graft-poll").toString
    val storage = new ParquetStorage(spark, root)
    storage.createTopic("p1", 1)
    val tp = Topition("p1", 0)
    // empty: times out fast, returns empty
    val t0 = System.currentTimeMillis()
    val empty = Streaming.longPollFetch(storage, tp, 0, 1, 1 << 20, maxWaitMs = 300)
    assert(System.currentTimeMillis() - t0 >= 300)
    assert(empty.count() === 0)
    // produce in background; poll should return before the 10s deadline
    val producer = new Thread(() => {
      Thread.sleep(200)
      storage.produce(tp,
        Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "k", "hello"))
          .toDF("timestamp", "key", "value"))
      ()
    })
    producer.start()
    val t1 = System.currentTimeMillis()
    val got = Streaming.longPollFetch(storage, tp, 0, 1, 1 << 20, maxWaitMs = 10000)
    val waited = System.currentTimeMillis() - t1
    producer.join()
    assert(got.count() === 1)
    assert(waited < 9000, s"long poll should return early, waited ${waited}ms")
  }

  test("windowedCounts drops late data beyond the watermark") {
    val input = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val agg = Streaming.windowedCounts(
      input.toDF().toDF("ts", "key", "metric").withColumn("metric", col("metric")),
      "ts", "key", "10 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("wc")
      .outputMode("update").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((ts("2024-01-01 10:01:00"), "a", 1.0),
      (ts("2024-01-01 10:22:00"), "a", 2.0)) // advances watermark to 10:17
    q.processAllAvailable()
    input.addData((ts("2024-01-01 10:02:00"), "a", 100.0)) // late beyond watermark
    q.processAllAvailable()
    val rows = spark.table("wc")
      .select(col("window.start").cast("string"), col("n"), col("sum_metric"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    // the late row must NOT have bumped the 10:00 window to n=2
    assert(rows.contains(("2024-01-01 10:00:00", 1L, 1.0)))
    assert(rows.contains(("2024-01-01 10:20:00", 1L, 2.0)))
  }

  test("trendingTermsSink: only closed windows land; late-in-horizon text " +
    "merges; trendingTopK ranks per window") {
    val table = java.nio.file.Files
      .createTempDirectory("graft-tt-table").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-tt-ckpt").toString
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def runOnce(): Unit = {
      val q = Streaming.trendingTermsSink(
        input.toDF().toDF("ts", "text"),
        "ts", "text", windowDur = "10 minutes", watermarkDelay = "5 minutes",
        table = table, appId = "tt-app", checkpoint = ckpt,
        trigger = Trigger.AvailableNow())
      q.awaitTermination(60000)
    }
    input.addData(
      (ts("2024-01-01 10:01:00"), "buy pills now buy pills"),
      (ts("2024-01-01 10:03:00"), "buy now"),
      (ts("2024-01-01 10:16:00"), "calm normal text")) // watermark -> 10:11
    runOnce()
    val landed1 = graft.lake.TxLog.read(spark, table)
    assert(landed1.filter(col("window_start") >= ts("2024-01-01 10:10:00"))
      .count() === 0, "an OPEN window landed")
    // per-window rank: buy=3 tops; the n=2 tie (now, pills) breaks on
    // the term, so "now" takes rn=2
    val top = Streaming.trendingTopK(spark, table, k = 2)
      .filter(col("window_start") === ts("2024-01-01 10:00:00"))
      .orderBy("rn").collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("n"))).toSeq
    assert(top === Seq(("buy", 3L), ("now", 2L)))
    // a late doc INSIDE the horizon (10:12 >= watermark 10:11) merges
    // into the open 10:10 window before it closes
    input.addData((ts("2024-01-01 10:12:00"), "calm calm"),
      (ts("2024-01-01 10:31:00"), "tick")) // watermark -> 10:26
    runOnce()
    val w2 = graft.lake.TxLog.read(spark, table)
      .filter(col("window_start") === ts("2024-01-01 10:10:00"))
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("n")))
      .toMap
    assert(w2 === Map("calm" -> 3L, "normal" -> 1L, "text" -> 1L))
    assert(graft.lake.TxLog.read(spark, table)
      .filter(col("window_start") >= ts("2024-01-01 10:30:00"))
      .count() === 0, "the tick's own window is still open")
  }

  test("eventTimeAggSink: late-in-horizon merges, beyond-horizon drops, " +
      "exactly-once into TxLog across restarts") {
    val table = java.nio.file.Files
      .createTempDirectory("graft-evt-table").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-evt-ckpt").toString
    val input = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // each run is a fresh query over the SAME checkpoint — the restart
    // path: watermark + open-window state must come back from the
    // checkpoint, and no already-landed window may land twice
    def runOnce(): Unit = {
      val q = Streaming.eventTimeAggSink(
        input.toDF().toDF("ts", "key", "metric"),
        "ts", "key", windowDur = "5 minutes", watermarkDelay = "10 minutes",
        table = table, appId = "evt-app", checkpoint = ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(60000)
    }
    input.addData((ts("2024-01-01 10:00:30"), "a", 1.0),
      (ts("2024-01-01 10:03:00"), "a", 2.0),
      (ts("2024-01-01 10:22:00"), "a", 3.0)) // watermark -> 10:12
    runOnce()
    // RESTART 1: a late event INSIDE the horizon (10:21 >= 10:12) must
    // merge into the still-open 10:20 window; one BEYOND it (10:02 <
    // 10:12) must drop — and the restored watermark is what decides
    input.addData((ts("2024-01-01 10:21:00"), "a", 5.0),
      (ts("2024-01-01 10:02:00"), "a", 100.0), // beyond horizon: dropped
      (ts("2024-01-01 10:40:00"), "a", 7.0)) // watermark -> 10:30
    runOnce()
    // RESTART 2: close the 10:20 window (watermark 10:30 passed its end)
    input.addData((ts("2024-01-01 10:55:00"), "a", 9.0)) // watermark -> 10:45
    runOnce()
    // RESTART 3: close the 10:40 window
    input.addData((ts("2024-01-01 11:20:00"), "a", 1.0))
    runOnce()
    val rows = graft.lake.TxLog.read(spark, table)
      .select(col("window_start").cast("string"), col("key"), col("n"),
        col("sum_metric"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // exactly the four finalized windows, each landed ONCE across the
    // four runs; the dropped 10:02 event never bumped the 10:00 window.
    // (AvailableNow drains a final state-eviction batch, so the 10:55
    // window — closed by 11:20's watermark — lands in run 4 too; only
    // 11:20's own window is still open.)
    assert(rows.toSet === Set(
      ("2024-01-01 10:00:00", "a", 2L, 3.0),
      ("2024-01-01 10:20:00", "a", 2L, 8.0), // 10:22 + late-merged 10:21
      ("2024-01-01 10:40:00", "a", 1L, 7.0),
      ("2024-01-01 10:55:00", "a", 1L, 9.0)),
      s"unexpected landed windows: ${rows.toSeq.sorted}")
    assert(rows.length === 4,
      "a window landed more than once across restarts")
  }

  test("session windows land exactly-once in TxLog across a restart (the composed form)") {
    // the doc claims sessionWindowAgg composes with txLogSink exactly
    // like the tumbling form — drive it: a session extends across a
    // restart (state restored from the checkpoint), finalizes once the
    // watermark passes its end+gap, and lands in the table exactly once
    val table = java.nio.file.Files
      .createTempDirectory("graft-sess-table").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sess-ckpt").toString
    val input = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def runOnce(): Unit = {
      val q = Streaming.txLogSink(
        Streaming.sessionWindowAgg(
          input.toDF().toDF("ts", "key", "metric"),
          "ts", "key", gap = "5 minutes", watermarkDelay = "0 seconds")
          .select(col("session_window.start").as("s_start"), col("key"),
            col("n_events"), col("sum_metric")),
        table, "sess-app", ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(60000)
    }
    input.addData((ts("2024-01-01 10:00:00"), "a", 1.0),
      (ts("2024-01-01 10:03:00"), "a", 2.0)) // one session, still open
    runOnce()
    // RESTART: extend the SAME session from restored state, then close
    // it by advancing the watermark past end+gap
    input.addData((ts("2024-01-01 10:07:00"), "a", 4.0))
    runOnce()
    input.addData((ts("2024-01-01 11:00:00"), "a", 8.0))
    runOnce()
    runOnce() // idle restart: nothing new may land twice
    val rows = graft.lake.TxLog.read(spark, table)
      .select(col("s_start").cast("string"), col("key"), col("n_events"),
        col("sum_metric"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // ONE merged session (10:00 + 10:03 + the post-restart 10:07),
    // landed once; the 11:00 session is still open
    assert(rows.toSeq === Seq(("2024-01-01 10:00:00", "a", 3L, 7.0)),
      s"unexpected landed sessions: ${rows.toSeq.sorted}")
  }

  test("sessionWindowAgg merges within the gap, splits across it, finalizes on watermark") {
    val input = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val agg = Streaming.sessionWindowAgg(
      input.toDF().toDF("ts", "key", "metric"),
      "ts", "key", gap = "5 minutes", watermarkDelay = "0 seconds")
    val q = agg.writeStream.format("memory").queryName("sw")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // two events 3 min apart (one session), a third 20 min later (new
    // session), for key a; key b gets one singleton session
    input.addData(
      (ts("2024-01-01 10:00:00"), "a", 1.0),
      (ts("2024-01-01 10:03:00"), "a", 2.0),
      (ts("2024-01-01 10:23:00"), "a", 4.0),
      (ts("2024-01-01 10:01:00"), "b", 8.0))
    q.processAllAvailable()
    // advance the watermark far enough to close every session
    input.addData((ts("2024-01-01 11:00:00"), "z", 0.0))
    q.processAllAvailable()
    val rows = spark.table("sw")
      .select(col("key"), col("session_window.start").cast("string"),
        col("session_window.end").cast("string"),
        col("n_events"), col("sum_metric"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSet
    q.stop()
    // session end = last event + gap (the native semantics)
    assert(rows.contains(("a", "2024-01-01 10:00:00", "2024-01-01 10:08:00", 2L, 3.0)),
      s"rows: $rows")
    assert(rows.contains(("a", "2024-01-01 10:23:00", "2024-01-01 10:28:00", 1L, 4.0)))
    assert(rows.contains(("b", "2024-01-01 10:01:00", "2024-01-01 10:06:00", 1L, 8.0)))
  }

  test("intervalJoin pairs events within the bound; state evicts on watermark") {
    val reqs = MemoryStream[(java.sql.Timestamp, Long, String)](spark)
    val acks = MemoryStream[(java.sql.Timestamp, Long, String)](spark)
    val joined = Streaming.intervalJoin(
      reqs.toDF().toDF("req_ts", "rid", "req"),
      acks.toDF().toDF("ack_ts", "rid", "ack"),
      key = "rid", leftTsCol = "req_ts", rightTsCol = "ack_ts",
      within = "5 minutes", watermarkDelay = "1 minute")
      // by-name key reference must resolve (single key column survives)
      .select(col("rid"), col("req"), col("ack"))
      .drop("rid")
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    reqs.addData((ts("2024-01-01 10:00:00"), 1L, "r1"),
      (ts("2024-01-01 10:00:00"), 2L, "r2"))
    acks.addData((ts("2024-01-01 10:02:00"), 1L, "a1"), // within 5 min of r1
      (ts("2024-01-01 10:30:00"), 2L, "a2-late"))       // past r2's bound
    q.processAllAvailable()
    // different key never joins even inside the bound
    acks.addData((ts("2024-01-01 10:03:00"), 9L, "a9"))
    q.processAllAvailable()
    val pairs = spark.table("ij").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    q.stop()
    assert(pairs === Set(("r1", "a1")))
  }

  test("streamingDedup drops duplicate content within the watermark horizon") {
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    val deduped = Streaming.streamingDedup(
      input.toDF().toDF("ts", "text"), "ts", "text", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("sd")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(
      (ts("2024-01-01 10:00:00"), "doc A"),
      (ts("2024-01-01 10:01:00"), "doc A"), // duplicate content, same batch
      (ts("2024-01-01 10:02:00"), "doc B"))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 10:03:00"), "doc A")) // duplicate, later batch
    q.processAllAvailable()
    input.addData((ts("2024-01-01 10:30:00"), "doc C")) // advances watermark
    q.processAllAvailable()
    val texts = spark.table("sd").select("text").as[String].collect().sorted.toSeq
    q.stop()
    // each distinct content survives exactly once within the horizon
    assert(texts === Seq("doc A", "doc B", "doc C"))
  }

  test("streamingUrlFrontier: tracking-noise variants are one entry") {
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    val frontier = Streaming.streamingUrlFrontier(
      input.toDF().toDF("ts", "url"), "ts", "url", "10 minutes")
    val q = frontier.writeStream.format("memory").queryName("suf")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(
      (ts("2024-01-01 10:00:00"), "https://ex.com/p?utm_a=1"),
      (ts("2024-01-01 10:01:00"), "HTTPS://WWW.Ex.COM:443/p#frag"),
      (ts("2024-01-01 10:02:00"), "https://ex.com/q"))
    q.processAllAvailable()
    // a later-batch variant of the same page is still a dup
    input.addData((ts("2024-01-01 10:03:00"), "https://ex.com/p/"))
    q.processAllAvailable()
    val canon = spark.table("suf").select("canon_url").as[String]
      .collect().sorted.toSeq
    q.stop()
    assert(canon === Seq("https://ex.com/p", "https://ex.com/q"))
  }

  test("sessionize maintains per-user state across batches (mapGroupsWithState)") {
    val input = MemoryStream[Streaming.SessionInput](spark)
    val q = Streaming.sessionize(input.toDS(), idleGapMs = 60000,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("sess")
      .outputMode("update").start()
    input.addData(Streaming.SessionInput(1L, 1000L, 2.0),
      Streaming.SessionInput(1L, 2000L, 3.0),
      Streaming.SessionInput(2L, 1000L, 1.0))
    q.processAllAvailable()
    input.addData(Streaming.SessionInput(1L, 3000L, 5.0))
    q.processAllAvailable()
    val byUser = spark.table("sess").groupBy("userId")
      .agg(max("nEvents").as("n"), max("sumMetric").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    q.stop()
    assert(byUser(1L) === ((3L, 10.0))) // state accumulated across batches
    assert(byUser(2L) === ((1L, 1.0)))
  }

  test("streamingLshCandidates links near-dups across micro-batches") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val input = MemoryStream[(Long, String)](spark)
    val candidates = Streaming.streamingLshCandidates(
      input.toDF().toDF("doc_id", "text"))
    val q = candidates.writeStream.format("memory").queryName("lsh")
      .outputMode("append").start()
    // batch 1: two identical docs (same signature, every band collides)
    // and one unrelated doc
    input.addData((10L, base), (20L, base),
      (30L, "completely different words in this one nothing shared here ok"))
    q.processAllAvailable()
    val b1 = spark.table("lsh").as[Streaming.LshCandidate].collect()
    assert(b1.map(c => (c.docA, c.docB)).distinct.toSeq === Seq((10L, 20L)))

    // batch 2: another copy arrives later — links to the bucket anchor,
    // not to every member (state holds one id per bucket)
    input.addData((40L, base))
    q.processAllAvailable()
    val b2 = spark.table("lsh").as[Streaming.LshCandidate].collect()
    assert(b2.map(c => (c.docA, c.docB)).distinct.sorted.toSeq ===
      Seq((10L, 20L), (10L, 40L)))

    // batch 3: a smaller doc id still pairs (against the prior anchor)
    input.addData((5L, base))
    q.processAllAvailable()
    val b3 = spark.table("lsh").as[Streaming.LshCandidate].collect()
    q.stop()
    assert(b3.map(c => (c.docA, c.docB)).distinct.sorted.toSeq ===
      Seq((5L, 10L), (10L, 20L), (10L, 40L)))
  }

  test("streamingEmbCandidates pairs near vectors against the cell anchor") {
    val input = MemoryStream[(Long, Array[Float])](spark)
    val candidates = Streaming.streamingEmbCandidates(
      input.toDF().toDF("vec_id", "embedding"), minCosine = 0.9, bits = 1)
    val q = candidates.writeStream.format("memory").queryName("embnd")
      .outputMode("append").start()
    // batch 1: two near vectors in the positive cell, one far vector in
    // the same cell (below threshold), one in the other cell
    input.addData((10L, Array(1.0f, 0.0f)), (20L, Array(0.95f, 0.05f)),
      (50L, Array(0.1f, 0.99f)), (30L, Array(-1.0f, 0.0f)))
    q.processAllAvailable()
    val b1 = spark.table("embnd").as[Streaming.EmbCandidate].collect()
    assert(b1.map(c => (c.vecA, c.vecB)).toSeq === Seq((10L, 20L)))
    assert(b1.head.cosineR > 0.99 && b1.head.cosineR < 1.0)

    // batch 2: a later copy links to the cell anchor, not to member 20
    input.addData((40L, Array(0.9f, 0.1f)))
    q.processAllAvailable()
    val b2 = spark.table("embnd").as[Streaming.EmbCandidate].collect()
    assert(b2.map(c => (c.vecA, c.vecB)).sorted.toSeq ===
      Seq((10L, 20L), (10L, 40L)))

    // batch 3: a smaller id pairs against the PRIOR anchor, then takes over
    input.addData((5L, Array(1.0f, 0.0f)))
    q.processAllAvailable()
    val b3 = spark.table("embnd").as[Streaming.EmbCandidate].collect()
    q.stop()
    assert(b3.map(c => (c.vecA, c.vecB)).sorted.toSeq ===
      Seq((5L, 10L), (10L, 20L), (10L, 40L)))
  }

  test("txLogSink lands micro-batches exactly once, surviving a checkpoint-less replay") {
    import graft.lake.TxLog
    val table = java.nio.file.Files
      .createTempDirectory("graft-txsink").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-txsink-ckpt").toString
    val input = MemoryStream[(Long, String)](spark)
    val q = Streaming.txLogSink(input.toDF().toDF("id", "s"),
      table, appId = "sink1", checkpoint = ckpt)
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    assert(TxLog.read(spark, table).count() === 3)
    val hw = TxLog.lastCommittedBatch(table, "sink1").get
    // simulate the crash-after-commit-before-checkpoint replay: the
    // runtime re-delivers the LAST batch under the same batch id
    import spark.implicits._
    assert(TxLog.appendStream(Seq((3L, "c")).toDF("id", "s"),
      table, "sink1", hw) === None)
    assert(TxLog.read(spark, table).count() === 3) // not doubled
  }

  test("streamingAsofEnrich carries one latest-state row per key across batches") {
    import Streaming.AsofEvent
    val input = MemoryStream[AsofEvent](spark)
    val q = Streaming.streamingAsofEnrich(input.toDS())
      .writeStream.format("memory").queryName("asofe")
      .outputMode("append").start()
    def st(key: Long, ts: Long, id: Long, v: Double) =
      AsofEvent(key, ts, isProbe = false, id, v)
    def pr(key: Long, ts: Long, id: Long) =
      AsofEvent(key, ts, isProbe = true, id, 0d)

    // batch 1: out-of-order arrival inside the batch — replay is
    // ts-ordered, state-before-probe at equal ts
    input.addData(pr(1L, 25L, 100L), st(1L, 10L, 7L, 1.0),
      st(1L, 20L, 8L, 2.0), pr(1L, 20L, 101L), pr(1L, 5L, 102L),
      pr(2L, 50L, 103L))
    q.processAllAvailable()
    val b1 = spark.table("asofe").as[Streaming.AsofEnriched].collect()
      .map(e => e.id -> ((e.matchId, e.value, e.matched))).toMap
    assert(b1(100L) === ((8L, 2.0, true)))
    assert(b1(101L) === ((8L, 2.0, true))) // equal ts: state visible
    assert(b1(102L) === ((0L, 0.0, false))) // before any state
    assert(b1(103L) === ((0L, 0.0, false))) // key with no state

    // batch 2: the carried state survives; a stale state row (older
    // than the applied one) must not roll the book backward
    input.addData(pr(1L, 30L, 104L), st(1L, 15L, 9L, 9.0), pr(1L, 31L, 105L))
    q.processAllAvailable()
    val b2 = spark.table("asofe").as[Streaming.AsofEnriched].collect()
      .map(e => e.id -> ((e.matchId, e.value))).toMap
    q.stop()
    assert(b2(104L) === ((8L, 2.0))) // batch-1 state carried
    assert(b2(105L) === ((8L, 2.0))) // stale ts=15 row ignored
  }
}
