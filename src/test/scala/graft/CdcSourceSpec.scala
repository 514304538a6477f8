package graft

import org.apache.spark.sql.functions._
import graft.lake.TxLog

/** Streaming CDC source over the TxLog commit log: offsets are log
  * versions, the first batch is the initial snapshot, later batches are
  * exactly the change feed — the read side of the exactly-once loop
  * whose write side is Streaming.txLogSink.
  */
class CdcSourceSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String =
    java.nio.file.Files.createTempDirectory("graft-cdc").toString + "/t"

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-cdc-ckpt").toString

  test("initial snapshot as inserts, then incremental inserts and deletes") {
    val table = newTable()
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1), table) // v0
    TxLog.append(Seq((3L, "c")).toDF("id", "s").coalesce(1), table)            // v1

    val q = spark.readStream.format("txlog-cdc").option("table", table).load()
      .writeStream.format("memory").queryName("cdc_snap")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val snap = spark.table("cdc_snap").collect()
      assert(snap.length === 3)
      assert(snap.forall(_.getAs[String]("_change_type") == "insert"))
      assert(snap.forall(_.getAs[Long]("_commit_version") == 1L),
        "initial snapshot rows carry the snapshot version")

      TxLog.append(Seq((4L, "d")).toDF("id", "s").coalesce(1), table)          // v2
      TxLog.delete(spark, table, col("id") === 1L)                             // v3
      q.processAllAvailable()
      val rows = spark.table("cdc_snap").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type"),
          r.getAs[Long]("_commit_version"))).toSet
      assert(rows.contains((4L, "insert", 2L)), s"missing v2 insert: $rows")
      assert(rows.contains((1L, "delete", 3L)), s"missing v3 delete: $rows")
      // the delete's rewrite must NOT re-emit the surviving row of the
      // touched file as a change
      assert(!rows.contains((2L, "insert", 3L)) && !rows.contains((2L, "delete", 3L)),
        s"untouched row leaked into the feed: $rows")
    } finally q.stop()
  }

  test("startingVersion=latest skips history; maxVersionsPerBatch bounds catch-up") {
    val table = newTable()
    TxLog.append(Seq((1L, "a")).toDF("id", "s").coalesce(1), table) // v0
    TxLog.append(Seq((2L, "b")).toDF("id", "s").coalesce(1), table) // v1

    val q = spark.readStream.format("txlog-cdc")
      .option("table", table)
      .option("startingVersion", "latest")
      .option("maxVersionsPerBatch", "1")
      .load()
      .writeStream.format("memory").queryName("cdc_latest")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdc_latest").count() === 0,
        "history must be skipped with startingVersion=latest")

      TxLog.append(Seq((3L, "c")).toDF("id", "s").coalesce(1), table) // v2
      TxLog.append(Seq((4L, "d")).toDF("id", "s").coalesce(1), table) // v3
      q.processAllAvailable()
      val got = spark.table("cdc_latest").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("_commit_version"))).toSet
      assert(got === Set((3L, 2L), (4L, 3L)), s"got $got")
      // the 1-version cap forces the two commits into separate batches
      val batched = q.recentProgress.filter(_.numInputRows > 0)
      assert(batched.length >= 2,
        s"expected >=2 rate-limited batches, saw ${batched.length}")
    } finally q.stop()
  }

  test("end-to-end: txLogSink upstream -> CDC source -> exactly-once downstream table") {
    // the medallion chain: a streaming writer lands micro-batches in a
    // bronze TxLog table; a CDC reader streams its change feed into a
    // silver TxLog table through appendStream (its own appId), so BOTH
    // hops are exactly-once and the silver table is a faithful replica
    // of bronze's insert feed.
    val bronze = newTable()
    val silver = newTable()
    TxLog.append(Seq((1L, "a")).toDF("id", "s").coalesce(1), bronze) // v0 (pre-stream)

    val q = spark.readStream.format("txlog-cdc").option("table", bronze).load()
      .filter(col("_change_type") === "insert")
      .select(col("id"), col("s"), col("_commit_version").as("src_version"))
      .writeStream
      .option("checkpointLocation", tmp())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        TxLog.appendStream(b, silver, "silver-app", batchId)
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      TxLog.append(Seq((2L, "b")).toDF("id", "s").coalesce(1), bronze) // v1
      TxLog.append(Seq((3L, "c")).toDF("id", "s").coalesce(1), bronze) // v2
      q.processAllAvailable()
      val got = TxLog.read(spark, silver).orderBy("id").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("s"))).toSeq
      assert(got === Seq((1L, "a"), (2L, "b"), (3L, "c")),
        s"silver must replicate bronze's insert feed: $got")
      // exactly-once markers really rode the silver commits
      assert(TxLog.lastCommittedBatch(silver, "silver-app").nonEmpty)
    } finally q.stop()
  }

  test("CDC stream survives source-table optimize + vacuum mid-stream") {
    val table = newTable()
    TxLog.append(Seq((1L, "a")).toDF("id", "s").coalesce(1), table)  // v0
    TxLog.append(Seq((2L, "b")).toDF("id", "s").coalesce(1), table)  // v1
    val q = spark.readStream.format("txlog-cdc").option("table", table).load()
      .writeStream.format("memory").queryName("cdc_maint")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdc_maint").count() === 2)
      // the maintenance sweep: compaction rewrite + immediate purge of
      // replaced files + vacuum of old manifests. The optimize commit
      // must contribute NOTHING to the feed and the stream must keep
      // serving later commits.
      TxLog.optimize(spark, table, Nil, purgeReplaced = true)         // v2
      TxLog.vacuum(table, minAgeMs = 0L)
      TxLog.append(Seq((3L, "c")).toDF("id", "s").coalesce(1), table) // v3
      q.processAllAvailable()
      val rows = spark.table("cdc_maint").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type"),
          r.getAs[Long]("_commit_version"))).toSet
      assert(rows === Set((1L, "insert", 1L), (2L, "insert", 1L),
        (3L, "insert", 3L)),
        s"optimize must be invisible, later commits must flow: $rows")
    } finally q.stop()
  }

  test("incremental aggregate view tracks a full recompute; dead keys drop") {
    val source = newTable()
    val view = newTable()
    TxLog.append(Seq((1L, 10L), (1L, 5L), (2L, 7L)).toDF("k", "v").coalesce(1),
      source) // v0
    def expected(): Set[(Long, Long, Long)] =
      TxLog.read(spark, source).groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def got(): Set[(Long, Long, Long)] =
      TxLog.read(spark, view).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n"), r.getAs[Long]("v")))
        .toSet

    val q = graft.streaming.Streaming.incrementalAggView(
      spark, source, view, Seq("k"), Seq("v"), "mv-spec", tmp())
    try {
      q.processAllAvailable()
      assert(got() === expected(), "after initial snapshot")

      TxLog.append(Seq((2L, 3L), (3L, 1L)).toDF("k", "v").coalesce(1), source) // v1
      TxLog.delete(spark, source, col("k") === 1L)                             // v2
      q.processAllAvailable()
      assert(got() === expected(), "after incremental insert + delete")
      assert(!got().exists(_._1 == 1L), "key with zero count must be GONE")

      TxLog.append(Seq((1L, 100L)).toDF("k", "v").coalesce(1), source)         // v3: key reborn
      q.processAllAvailable()
      assert(got() === expected(), "after key rebirth")
    } finally q.stop()
  }

  test("incremental LSH index equals from-scratch banding across insert/update/delete") {
    import graft.ops.Dedup
    val source = newTable()
    val index = newTable()
    def scratch(): Set[(Int, Long, Long)] =
      Dedup.lshBands(Dedup.minhashSignatures(
        TxLog.read(spark, source), 8, 3), 8, 2)
        .collect().map(r => (r.getAs[Int]("band_idx"),
          r.getAs[Long]("band_key"), r.getAs[Long]("doc_id"))).toSet
    def got(): Set[(Int, Long, Long)] =
      TxLog.read(spark, index).collect()
        .map(r => (r.getAs[Int]("band_idx"),
          r.getAs[Long]("band_key"), r.getAs[Long]("doc_id"))).toSet
    TxLog.append(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "lazy dogs sleep all day in the warm sun"),
      (3L, "the quick brown fox leaps over the lazy dog"))
      .toDF("doc_id", "text").coalesce(1), source) // v0
    val q = graft.streaming.Streaming.incrementalLshIndex(
      spark, source, index, "lsh-spec", tmp())
    try {
      q.processAllAvailable()
      assert(got() === scratch(), "after initial snapshot")

      TxLog.append(Seq((4L, "the quick brown fox jumps over the lazy dog"))
        .toDF("doc_id", "text").coalesce(1), source) // v1: exact dup of 1
      q.processAllAvailable()
      assert(got() === scratch(), "after incremental insert")
      // a new batch finds its near-dups through the index with ONE join
      import spark.implicits._
      val probe = Seq((99L, "the quick brown fox jumps over the lazy dog"))
        .toDF("doc_id", "text")
      val hits = Dedup.lshIndexLookup(probe, TxLog.read(spark, index),
        8, 3, 2).collect().map(_.getAs[Long]("corpus_id")).toSet
      assert(hits.contains(1L) && hits.contains(4L),
        s"index lookup missed the planted dups: $hits")

      TxLog.update(spark, source, col("doc_id") === 2L,
        Map("text" -> lit("completely different words appear here now today"))) // v2
      TxLog.delete(spark, source, col("doc_id") === 3L) // v3
      q.processAllAvailable()
      assert(got() === scratch(), "after update + delete")
      assert(!got().exists(_._3 == 3L), "deleted doc must leave the index")
    } finally q.stop()
  }

  test("incremental phash index equals from-scratch banding; lookup " +
    "finds near-dup media") {
    import graft.ops.Multimodal
    val source = newTable()
    val index = newTable()
    def blob(seed: Char, edit: Int = -1): Array[Byte] = {
      val p = Array.fill(600)(seed.toByte)
      for (k <- 0 until 4) p((seed.toInt * 7 + k * 13) % 60 * 10) = '}'.toByte
      if (edit >= 0) p(edit * 10 + 3) = '~'.toByte
      p
    }
    def asMedia(rows: Seq[(Long, Array[Byte])]) =
      rows.toDF("media_id", "payload")
    def scratch(): Set[(Int, Long, Long, Long)] =
      Multimodal.phashBands(Multimodal.perceptualHash(
          Multimodal.asMediaTable(TxLog.read(spark, source),
            "media_id", "payload", "image", "png")), 4)
        .collect().map(r => (r.getAs[Int]("band"),
          r.getAs[Long]("band_val"), r.getAs[Long]("media_id"),
          r.getAs[Long]("phash"))).toSet
    def got(): Set[(Int, Long, Long, Long)] =
      TxLog.read(spark, index).collect()
        .map(r => (r.getAs[Int]("band"), r.getAs[Long]("band_val"),
          r.getAs[Long]("media_id"), r.getAs[Long]("phash"))).toSet
    TxLog.append(asMedia(Seq(1L -> blob('a'), 2L -> blob('b'),
      3L -> blob('c'))).coalesce(1), source) // v0
    val q = graft.streaming.Streaming.incrementalPhashIndex(
      spark, source, index, "phash-spec", tmp())
    try {
      q.processAllAvailable()
      assert(got() === scratch(), "after initial snapshot")

      TxLog.append(asMedia(Seq(4L -> blob('a', edit = 11))).coalesce(1),
        source) // v1: one-segment edit of blob 1
      q.processAllAvailable()
      assert(got() === scratch(), "after incremental insert")
      // a probe batch finds its near-dups through the index, one join
      val probe = Multimodal.asMediaTable(
        asMedia(Seq(99L -> blob('a'))), "media_id", "payload",
        "image", "png")
      val hits = Multimodal.phashIndexLookup(probe,
          TxLog.read(spark, index))
        .collect().map(_.getAs[Long]("corpus_id")).toSet
      assert(hits.contains(1L) && hits.contains(4L),
        s"lookup missed the planted near-dups: $hits")

      TxLog.update(spark, source, col("media_id") === 2L,
        Map("payload" -> lit(blob('z')))) // v2
      TxLog.delete(spark, source, col("media_id") === 3L) // v3
      q.processAllAvailable()
      assert(got() === scratch(), "after update + delete")
      assert(!got().exists(_._3 == 3L), "deleted blob must leave the index")
    } finally q.stop()
  }

  test("SCD2 upgrade: a pre-__open dimension still closes its legacy open rows") {
    val dim = newTable()
    // legacy layout: rows written before the __open partition column
    // existed — open row for k=1, closed row for k=2
    TxLog.append(Seq(
      (1L, "a", 0L, None: Option[Long]),
      (2L, "x", 0L, Some(0L)))
      .toDF("k", "v", "valid_from", "valid_to").coalesce(1), dim)
    // an upgraded-code batch updates k=1: the legacy open row must be
    // FOUND (no __open column to filter on) and closed
    val feed = Seq((1L, "b", "insert", 1L))
      .toDF("k", "v", "_change_type", "_commit_version")
    graft.streaming.Streaming.applyScd2Delta(feed, dim, Seq("k"),
      "upgrade-spec", 0L)
    val hist = TxLog.read(spark, dim).collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[String]("v"),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")).map(_.asInstanceOf[Long]))).toSet
    assert(hist === Set(
      (1L, "a", 0L, Some(1L)), (1L, "b", 1L, None), (2L, "x", 0L, Some(0L))),
      s"history was $hist")
  }

  test("incremental bloom view equals a from-scratch build; deletes are no-ops") {
    val source = newTable()
    val view = newTable()
    val m = 1 << 12
    val k = 3
    TxLog.append(Seq("alpha", "beta", "gamma").toDF("key").coalesce(1),
      source) // v0
    def viewWords(): Set[(Long, Long)] =
      TxLog.read(spark, view).collect()
        .map(r => (r.getAs[Long]("word"), r.getAs[Long]("bits"))).toSet
    def scratch(): Set[(Long, Long)] =
      graft.ops.Sketches.bloomBuild(
        TxLog.read(spark, source).select("key"), "key", m, k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val q = graft.streaming.Streaming.incrementalBloomView(
      spark, source, view, "key", "bloom-spec", tmp(), mBits = m, k = k)
    try {
      q.processAllAvailable()
      assert(viewWords() === scratch(), "after initial snapshot")

      TxLog.append(Seq("delta", "epsilon").toDF("key").coalesce(1), source) // v1
      q.processAllAvailable()
      assert(viewWords() === scratch(), "after incremental insert")

      // a delete must NOT clear bits: the view keeps remembering the key
      val before = viewWords()
      TxLog.delete(spark, source, col("key") === "alpha") // v2
      q.processAllAvailable()
      assert(viewWords() === before, "deletes are a bloom no-op")

      // the maintained view really answers membership: all live + the
      // deleted key read as maybe-present; a never-seen key as absent
      import spark.implicits._
      val probes = Seq((1L, "alpha"), (2L, "epsilon"), (3L, "zzz-never"))
        .toDF("id", "key")
      val verdicts = graft.ops.Sketches.bloomProbe(
        TxLog.read(spark, view), probes, "key", "id", m, k)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(verdicts(1L) && verdicts(2L), "inserted keys must hit")
      assert(!verdicts(3L), "an unseen key should miss (fpr ~1e-4 at this fill)")
    } finally q.stop()
    // offline REBUILD forgets the deleted key in one committed version:
    // the view equals a from-scratch build of the live table and the
    // deleted key finally probes false (stream stopped — single
    // maintainer)
    val v = graft.ops.Sketches.bloomRebuild(spark,
      TxLog.read(spark, source).select("key"), view, "key", m, k)
    assert(v >= 0)
    assert(viewWords() === scratch(), "rebuilt view == from-scratch build")
    import spark.implicits._
    val gone = graft.ops.Sketches.bloomProbe(TxLog.read(spark, view),
      Seq((1L, "alpha")).toDF("id", "key"), "key", "id", m, k)
      .head().getBoolean(1)
    assert(!gone, "the deleted key must probe false after rebuild")
  }

  test("SCD2 dimension history: inserts open, updates close+reopen, deletes close") {
    val source = newTable()
    val dim = newTable()
    TxLog.append(Seq((1L, "a"), (2L, "x")).toDF("k", "v").coalesce(1), source) // v0

    val q = graft.streaming.Streaming.scd2View(
      spark, source, dim, Seq("k"), "scd2-spec", tmp())
    def history(): Set[(Long, String, Long, Option[Long])] =
      TxLog.read(spark, dim).collect().map(r =>
        (r.getAs[Long]("k"), r.getAs[String]("v"),
          r.getAs[Long]("valid_from"),
          Option(r.getAs[Any]("valid_to")).map(_.asInstanceOf[Long]))).toSet
    try {
      q.processAllAvailable()
      assert(history() === Set((1L, "a", 0L, None), (2L, "x", 0L, None)),
        "initial snapshot opens a row per key")

      // update k=1 (delete+insert at one version), then delete k=2,
      // then re-create k=1 — three versions, possibly one batch
      TxLog.update(spark, source, col("k") === 1L, Map("v" -> lit("b"))) // v1
      TxLog.delete(spark, source, col("k") === 2L)                      // v2
      q.processAllAvailable()
      assert(history() === Set(
        (1L, "a", 0L, Some(1L)), (1L, "b", 1L, None),
        (2L, "x", 0L, Some(2L))),
        s"update closes+reopens, delete closes: ${history()}")

      TxLog.append(Seq((2L, "y")).toDF("k", "v").coalesce(1), source)   // v3
      q.processAllAvailable()
      assert(history().contains((2L, "y", 3L, None)),
        "a re-created key opens a fresh timeline row")
      assert(history().contains((2L, "x", 0L, Some(2L))),
        "closed history is immutable")
    } finally q.stop()
  }

  test("checkpoint restart resumes the feed without replaying the snapshot") {
    val table = newTable()
    val ckpt = tmp()
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1), table) // v0
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Long)]()

    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format("txlog-cdc").option("table", table).load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.collect().foreach(r => seen.add(
            (r.getAs[Long]("id"), r.getAs[Long]("_commit_version"))))
          ()
        }
        .start()

    val q1 = run()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(seen.size === 2, s"snapshot batch: $seen")

    TxLog.append(Seq((3L, "c")).toDF("id", "s").coalesce(1), table) // v1
    val before = Set((1L, 0L), (2L, 0L), (3L, 1L))
    val q2 = run()
    try { q2.processAllAvailable() } finally q2.stop()
    val got = {
      import scala.jdk.CollectionConverters._
      seen.asScala.toSet
    }
    assert(got === before,
      s"restart must deliver ONLY the new commit (no snapshot replay): $got")
  }

  test("incremental IVF-PQ coded index equals the frozen-model encode " +
    "across insert/update/delete") {
    import graft.ops.Similarity
    val source = newTable()
    val index = newTable()
    def vec(seed: Int): Seq[Float] =
      Seq.tabulate(4)(i => ((seed * 31 + i * 7) % 11) / 10.0f)
    TxLog.append(Seq((0L, vec(1)), (1L, vec(2)), (2L, vec(3)))
      .toDF("vec_id", "embedding").coalesce(1), source) // v0
    Similarity.ivfPqIndexWrite(TxLog.read(spark, source), index,
      nCells = 2, m = 2, ksub = 2, iters = 1, dims = 4)
    val model = Similarity.ivfPqModelRead(spark, index)
    def scratch(): Set[(Long, Long, Seq[Long])] =
      Similarity.ivfPqEncode(TxLog.read(spark, source), model)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Long](2).toSeq)).toSet
    def got(): Set[(Long, Long, Seq[Long])] =
      TxLog.read(spark, s"$index/coded")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Long](2).toSeq)).toSet
    assert(got() === scratch(), "static build must equal the encode")

    val q = graft.streaming.Streaming.incrementalIvfPqIndex(
      spark, source, index, "ivfpq-spec", tmp())
    try {
      q.processAllAvailable() // replays the v0 snapshot as a no-op merge
      assert(got() === scratch(), "after initial snapshot")

      TxLog.append(Seq((3L, vec(4)), (4L, vec(7)))
        .toDF("vec_id", "embedding").coalesce(1), source) // v1
      q.processAllAvailable()
      assert(got() === scratch(), "after incremental insert")
      assert(got().exists(_._1 == 3L), "new vector must be coded")

      TxLog.update(spark, source, col("vec_id") === 1L,
        Map("embedding" -> typedLit(vec(9)))) // v2
      TxLog.delete(spark, source, col("vec_id") === 2L) // v3
      q.processAllAvailable()
      assert(got() === scratch(), "after update + delete")
      assert(!got().exists(_._1 == 2L), "deleted vector must leave the index")

      // the index still SERVES correctly after churn: top-k over the
      // maintained coded table equals a fresh encode-and-search
      val qe = Similarity.quantize(typedLit(vec(1)))
      val probe = TxLog.read(spark, source).filter(col("vec_id") === 0L)
        .select(qe.as("qe")).head().getSeq[Long](0)
      val served = Similarity.ivfPqTopKOverIndex(spark, index, probe,
        k = 3, nProbe = 2, excludeId = 0L)
        .collect().map(_.getLong(0)).toSeq
      assert(served.nonEmpty && !served.contains(0L))
    } finally q.stop()
  }

  test("incremental segmented BM25: insert-only serve is bit-identical " +
    "to bm25Rank; update/delete flip the live set; rebuild restores " +
    "exactness") {
    import graft.ops.TextAnalysis
    val source = newTable()
    val index = newTable()
    val terms = Seq("spark", "merge", "fox")
    def fromScratch(): Seq[(Long, Long, Long)] =
      TextAnalysis.bm25Rank(TxLog.read(spark, source), terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def served(): Seq[(Long, Long, Long)] =
      TextAnalysis.bm25TopKOverSegments(spark, index, terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    TxLog.append(Seq(
      (1L, "spark streams merge windows over spark logs"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "merge sort beats bubble sort on big inputs"),
      (4L, "plain filler text with no query words at all"))
      .toDF("doc_id", "text").coalesce(1), source) // v0
    // the stream OWNS the index end to end: segment 0 is the initial
    // snapshot batch (no pre-built static index to double-count)
    val q = graft.streaming.Streaming.incrementalBm25Segments(
      spark, source, index, "bm25-spec", tmp())
    try {
      q.processAllAvailable()
      assert(served() === fromScratch(), "insert-only snapshot must be exact")

      TxLog.append(Seq(
        (5L, "spark merge spark merge spark"),
        (6L, "another fox in another window"))
        .toDF("doc_id", "text").coalesce(1), source) // v1
      q.processAllAvailable()
      assert(served() === fromScratch(),
        "insert-only increments must stay exact (segment stats sum)")

      TxLog.update(spark, source, col("doc_id") === 1L,
        Map("text" -> lit("completely unrelated replacement now"))) // v2
      TxLog.delete(spark, source, col("doc_id") === 5L) // v3
      q.processAllAvailable()
      val hits = served().map(_._1)
      // live-set correctness under churn (scores may carry stale df
      // until a rebuild — the Lucene contract): the deleted doc and the
      // updated-away doc must vanish, the untouched hits must remain
      assert(!hits.contains(5L), "deleted doc served")
      assert(!hits.contains(1L), "updated doc served under its OLD terms")
      assert(hits.contains(3L) && hits.contains(2L) && hits.contains(6L),
        s"untouched matches lost: $hits")

      // rebuild (the optimize/merge analogue): compacted from the INDEX
      // ITSELF — no corpus access, no re-tokenizing — and restores
      // from-scratch-exact scores (stats staleness resets to zero)
      val rebuilt = newTable()
      TextAnalysis.bm25SegmentsRebuild(spark, index, rebuilt)
      val rb = TextAnalysis.bm25TopKOverSegments(spark, rebuilt, terms, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rb === fromScratch(), "rebuild must restore exact stats")
    } finally q.stop()
  }

  test("incremental LM index: serve is EXACT under insert/update/delete " +
    "(counts are a commutative group — no staleness, no rebuild)") {
    import graft.ops.TextAnalysis
    val source = newTable()
    val index = newTable()
    // the heldout batch exercises every OOV branch: seen bigrams, seen
    // words in unseen bigrams, and fully novel words
    val heldout = Seq(
      (100L, "spark streams merge quick fox unseen"),
      (101L, "totally novel words zzz yyy xxx"))
      .toDF("doc_id", "text")
    def score(idx: String): Seq[(Long, Long, String)] =
      TextAnalysis.lmScoreOverIndex(spark, idx, heldout)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString))
        .toSeq.sortBy(_._1)
    var scratchN = 0
    def fromScratch(): Seq[(Long, Long, String)] = {
      scratchN += 1
      val idx2 = s"${newTable()}-scratch$scratchN"
      TextAnalysis.lmIndexWrite(TxLog.read(spark, source), idx2)
      score(idx2)
    }
    TxLog.append(Seq(
      (1L, "spark streams merge windows over spark logs"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "merge sort beats bubble sort on big inputs"),
      (4L, "plain filler text with no query words at all"))
      .toDF("doc_id", "text").coalesce(1), source) // v0
    val q = graft.streaming.Streaming.incrementalLmIndex(
      spark, source, index, "lmidx-spec", tmp())
    try {
      q.processAllAvailable()
      assert(score(index) === fromScratch(), "snapshot batch must be exact")

      TxLog.append(Seq(
        (5L, "spark merge spark merge spark"),
        (6L, "another fox in another window"))
        .toDF("doc_id", "text").coalesce(1), source) // v1
      q.processAllAvailable()
      assert(score(index) === fromScratch(), "insert increments must be exact")

      TxLog.update(spark, source, col("doc_id") === 1L,
        Map("text" -> lit("completely unrelated replacement now"))) // v2
      TxLog.delete(spark, source, col("doc_id") === 5L) // v3
      q.processAllAvailable()
      // THE contract this index exists for: churn stays exact — the
      // update's delete+insert pair and the delete's retraction
      // telescope in the count sums (vs the BM25 index's stale df)
      assert(score(index) === fromScratch(),
        "update/delete must leave the served counts exactly current")
    } finally q.stop()
  }
}
