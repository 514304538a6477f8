package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Lake materialization: schema-backed topic records → typed analytic
  * tables, Spark-first.
  *
  * Reference: `nisshi-schema/src/lake.rs:135-150` (`LakeHouse` trait with
  * Delta/Iceberg/Parquet impls). Here the Parquet path is fully native;
  * Delta/Iceberg become `df.write.format(...)` plugs when those jars are
  * on the classpath (format is a parameter, nothing else changes).
  *
  * Scale notes: tables are written `partitionBy(partitionCols)` so scans
  * prune directories; `zorderBy` gives multi-column data clustering via
  * bit-interleaving so min/max row-group stats skip files on either key;
  * maintenance compaction bin-packs small files (the OPTIMIZE Compact
  * analog, reference `lake/delta.rs:577-622`).
  */
object Lake {

  /** Meta struct injected next to key/value (reference
    * `nisshi-schema/src/meta.avsc`, injected `avro.rs:83-104`): partition,
    * timestamp, year, month, day.
    */
  def withMeta(df: DataFrame, partition: Column, ts: Column): DataFrame =
    df.withColumn("meta", struct(
      partition.cast("int").as("partition"),
      ts.as("timestamp"),
      year(ts).as("year"),
      month(ts).as("month"),
      dayofmonth(ts).as("day")))

  /** Struct flatten ("normalize", reference Arrow
    * `RecordBatch::normalize` via `tansu.lake.normalize=true`,
    * `lake/delta.rs:274-291`): `a.b.c` → `a<sep>b<sep>c`, recursive.
    */
  def normalize(df: DataFrame, sep: String = "."): DataFrame = {
    def expand(schema: StructType, prefix: Seq[String]): Seq[Column] =
      schema.fields.toSeq.flatMap { f =>
        val path = prefix :+ f.name
        f.dataType match {
          case s: StructType => expand(s, path)
          case _ =>
            Seq(col(path.map(p => s"`$p`").mkString(".")).as(path.mkString(sep)))
        }
      }
    df.select(expand(df.schema, Nil): _*)
  }

  /** Generated columns from SQL expressions (reference
    * `tansu.lake.param.generated.<col>` evaluated by DataFusion,
    * `lake/delta.rs:385-455`). Catalyst parses the same expressions
    * natively — `expr(sql)` — including struct dot-access, so the
    * reference's dot→bracket rewrite (`delta.rs:393-401`) is unneeded.
    */
  def withGenerated(df: DataFrame, generated: Map[String, String]): DataFrame =
    generated.toSeq.sortBy(_._1).foldLeft(df) { case (d, (name, sql)) =>
      d.withColumn(name, expr(sql))
    }

  /** Additive schema migration (reference `migrate_schema`,
    * `lake/delta.rs:624-668` and SO3 column diff): columns the table has
    * but the batch lacks are added as nulls; brand-new batch columns are
    * kept (parquet mergeSchema reconciles on read). Returns the aligned
    * batch.
    */
  def alignSchema(batch: DataFrame, tableSchema: StructType): DataFrame = {
    val have = batch.schema.fieldNames.toSet
    val missing: Seq[StructField] = tableSchema.fields.toSeq.filterNot(f => have.contains(f.name))
    missing.foldLeft(batch) { (d, f) =>
      d.withColumn(f.name, lit(null).cast(f.dataType))
    }
  }

  /** Quantile-bucket assignment as a pure map-side expression: a balanced
    * when-tree over the (tiny, driver-computed) bin edges. Evaluation
    * walks one root-to-leaf path — O(log buckets) comparisons per row —
    * with no window, no shuffle, no single-partition funnel.
    */
  private def bucketOf(c: Column, edges: Array[Double]): Column = {
    // edges are ascending; bucket = number of edges <= value, in [0, len]
    def go(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo)
      else {
        val mid = (lo + hi + 1) / 2 // first bucket of the upper half
        when(c >= lit(edges(mid - 1)), go(mid, hi)).otherwise(go(lo, mid - 1))
      }
    go(0, edges.length)
  }

  /** Z-order clustering key: interleave the bits of each column's
    * quantile-bucket index. Sorting by the interleaved key co-locates
    * rows close in ALL dimensions, so parquet min/max stats prune on any
    * of the z-order columns — the OPTIMIZE ZORDER analog (reference
    * `lake/delta.rs:577-622`, `tansu.lake.z_order`).
    *
    * Bin edges come from one driver-side approxQuantile pass (2^bits - 1
    * doubles per column); bucket assignment is then map-side arithmetic.
    * The previous form — `ntile().over(Window.orderBy(c))` — funnelled
    * the whole table through a single partition to rank it, which is
    * exactly the job OPTIMIZE runs over the full table; this one keeps
    * every stage parallel at any scale.
    */
  def zorderKey(df: DataFrame, colNames: Seq[String], bitsPerCol: Int = 8): Column = {
    val n = colNames.length
    // the interleaved key must fit 63 bits (bit 63 is the sign — using
    // it would invert the ordering for high buckets, and positions >= 64
    // wrap around mod 64, silently breaking monotonicity): shrink the
    // per-column width for wide column sets rather than corrupting keys
    val bits = math.max(1, math.min(bitsPerCol, 63 / math.max(n, 1)))
    val buckets = 1 << bits
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // ONE multi-column quantile pass — per-column calls would scan the
    // full table once per z-order column
    val cast = colNames.zipWithIndex.map { case (name, i) =>
      col(name).cast("double").as(s"__q$i")
    }
    val allEdges = df.select(cast: _*)
      .stat.approxQuantile((0 until n).map(i => s"__q$i").toArray,
        probs, 1.0 / (4 * buckets))
    colNames.zipWithIndex.map { case (name, i) =>
      val b = bucketOf(col(name).cast("double"), allEdges(i))
      (0 until bits).map { j =>
        (shiftright(b, j).bitwiseAND(lit(1))).cast("long") * lit(1L << (j * n + i))
      }.reduce(_ + _)
    }.reduce(_ + _)
  }

  /** Per-table records/second write cap — the reference's optional
    * governor on the Delta sink (`tansu.lake.records.per.second`,
    * `nisshi-schema/src/lake/delta.rs:85-91, 488-509`: each lake write
    * of N rows blocks until N tokens are available). The point at
    * scale: the lake sink is the elastic consumer of the produce path —
    * without a cap a produce burst becomes an object-store write burst
    * (request-rate throttling, compaction debt); the token bucket
    * converts bursts into bounded, smooth sink pressure.
    *
    * Plain monitor-based token bucket: tokens refill continuously at
    * `recordsPerSecond`, capacity one second's worth, `acquire(n)`
    * blocks until n tokens drain (n may exceed capacity — a huge batch
    * waits multiple refill periods, exactly like the reference's
    * `until_n_ready`).
    */
  final class RateLimiter(val recordsPerSecond: Long) {
    require(recordsPerSecond > 0, s"rate must be positive: $recordsPerSecond")
    private var tokens: Double = recordsPerSecond.toDouble
    private var lastNanos: Long = System.nanoTime()
    def acquire(n: Long): Unit = synchronized {
      var need = n.toDouble
      while (need > 0) {
        val now = System.nanoTime()
        tokens = math.min(recordsPerSecond.toDouble,
          tokens + (now - lastNanos) / 1e9 * recordsPerSecond)
        lastNanos = now
        val take = math.min(tokens, need)
        tokens -= take
        need -= take
        if (need > 0) {
          val waitMs = math.max(1L,
            (need / recordsPerSecond * 1000).toLong min 1000L)
          Thread.sleep(waitMs)
        }
      }
    }
  }

  private val rateLimiters =
    new java.util.concurrent.ConcurrentHashMap[String, RateLimiter]()

  /** Block until `rows` tokens are available for `path` at
    * `recordsPerSecond` (a changed rate replaces the bucket). Call
    * BEFORE the write, once per batch — the sink-side backpressure
    * point.
    */
  def rateLimit(path: String, rows: Long, recordsPerSecond: Long): Unit = {
    if (rows <= 0) return
    val rl = rateLimiters.compute(path, (_, old) =>
      if (old != null && old.recordsPerSecond == recordsPerSecond) old
      else new RateLimiter(recordsPerSecond))
    rl.acquire(rows)
  }

  /** Per-table-path monitor: appends and the optimize swap must not
    * interleave (an append landing between optimize's rename-aside and
    * publish would be deleted with the old directory). Intra-process
    * only — multi-writer deployments need a transactional table format
    * (the S7/S8 Delta/Iceberg plugs).
    */
  private val pathLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(path: String): Object =
    pathLocks.computeIfAbsent(path, _ => new Object)

  /** Write a typed table partitioned by `partitionCols`
    * (reference `tansu.lake.partition`, `delta.rs:228-230,315-340`).
    *
    * This is the PLAIN (non-transactional) table API — single-process
    * writers guarded by the in-JVM path lock below. The broker's lake
    * sink uses [[TxLog]] instead (manifest CAS commits, snapshot
    * reads); this path stays for format plugs (delta/iceberg jars) and
    * library users who don't want a manifest log.
    */
  def writeTable(df: DataFrame, path: String, partitionCols: Seq[String],
                 format: String = "parquet", mode: String = "append"): Unit =
    lockFor(path).synchronized {
      val w = df.write.format(format).mode(mode)
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .save(path)
    }

  /** Write a catalog table hash-bucketed (and optionally sorted) on
    * the join key — the co-located-join layout: two tables bucketed on
    * the same key with the same bucket count join with ZERO Exchange,
    * because each task reads the matching bucket file from both sides.
    * At 100 TB this converts the recurring fact-fact shuffle — the
    * single most expensive stage of a repeated pipeline — into a
    * one-time layout cost at write, which is why warehouse fact tables
    * bucket on their primary join key. Spark persists bucketing
    * metadata in the catalog, so readers must use `spark.table(name)`
    * (a plain directory read sees data files but not the bucket spec).
    *
    * `sortCols` keeps each bucket file internally sorted (faster
    * range/min-max pruning within the file). Spark ≥ 3.0 still plans a
    * per-bucket Sort under a sort-merge join even then (SPARK-28595
    * stopped trusting file order by default; the opt-back-in is
    * `spark.sql.legacy.bucketedTableScan.outputOrdering`) — that sort
    * is per-bucket and spill-free, the eliminated Exchange is the
    * scale item.
    */
  def writeBucketed(df: DataFrame, tableName: String,
                    bucketCols: Seq[String], nBuckets: Int,
                    sortCols: Seq[String] = Nil,
                    path: Option[String] = None,
                    mode: String = "overwrite"): Unit = {
    require(bucketCols.nonEmpty && nBuckets > 0,
      s"bucketed write needs cols + buckets, got $bucketCols/$nBuckets")
    // one writer task per bucket (repartition uses the same murmur3
    // hash as the bucket spec): otherwise every writer task emits its
    // own file per bucket and Spark distrusts the per-file sortBy
    // metadata — the join re-sorts and the zero-sort layout win is lost
    val data = df.repartition(nBuckets, bucketCols.map(col): _*)
    var w = data.write.format("parquet").mode(mode)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(tableName)
  }

  /** Maintenance: OPTIMIZE-compact analog — rewrite a table directory
    * bin-packing to ~targetFileMB files, optionally Z-ordering within
    * partitions (reference `maintain`, `lake.rs:228-253`).
    */
  def optimize(spark: SparkSession, path: String, partitionCols: Seq[String],
               zorderCols: Seq[String] = Nil, targetFileMB: Int = 128): Unit = {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    val sized = {
      // REAL bytes of exactly the files this rewrite reads, not
      // files×constant guesswork (over-partitions many-tiny-files
      // tables) and not a whole-directory getContentSummary (counts
      // _graft_log manifests, sidecars, and replaced-but-unvacuumed
      // files the read skips) — the same discipline TxLog.optimize uses
      val conf = spark.sparkContext.hadoopConfiguration
      val bytes = df.inputFiles.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        try p.getFileSystem(conf).getFileStatus(p).getLen
        catch { case _: java.io.FileNotFoundException => 0L }
      }.sum
      math.max(1, (bytes / (targetFileMB.toLong * 1024 * 1024)).toInt)
    }
    val clustered =
      if (zorderCols.nonEmpty)
        df.withColumn("__z", zorderKey(df, zorderCols))
          .repartitionByRange(sized, col("__z")).drop("__z")
      else df.repartition(sized)
    // snapshot of the files the rewrite READ: anything that appears in
    // the directory afterwards was appended concurrently and must be
    // salvaged into the published table, not deleted with the old copy
    val snapshotRel = {
      val prefix = new org.apache.hadoop.fs.Path(path).toUri.getPath
      df.inputFiles.map { f =>
        val p = new org.apache.hadoop.fs.Path(f).toUri.getPath
        p.stripPrefix(prefix).stripPrefix("/")
      }.toSet
    }
    val tmp = path + "__optimizing"
    writeTable(clustered, tmp, partitionCols, mode = "overwrite")
    val dst = new org.apache.hadoop.fs.Path(path)
    // the PATH's filesystem, not the default one — optimize on an
    // s3a:// table with an hdfs:// default FS would otherwise operate
    // on the wrong store entirely
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the swap holds the same monitor as writeTable(path): an append can
    // complete before the stage-aside (salvaged below) or start after
    // publish, but never straddle the rename window
    lockFor(path).synchronized {
      // rename-aside, never delete-then-rename: every failure point
      // leaves a complete copy on disk (old table at __old until the
      // new one is live), and HDFS signals rename failure by RETURN
      // VALUE — ignoring it would report success after losing the table
      val old = new org.apache.hadoop.fs.Path(path + "__old")
      fs.delete(old, true)
      if (fs.exists(dst)) {
        if (!fs.rename(dst, old))
          throw new java.io.IOException(s"optimize: could not stage $path aside")
      } // a missing dst (readable-but-unmaterialized path) publishes directly
      if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)) {
        fs.rename(old, dst) // restore the original before failing
        throw new java.io.IOException(s"optimize: could not publish $tmp")
      }
      // salvage concurrent appends: data files under __old that the
      // rewrite never read move into the published table (unique
      // part-file names make collisions impossible)
      if (fs.exists(old)) {
        val oldPrefix = old.toUri.getPath
        val it = fs.listFiles(old, true)
        while (it.hasNext) {
          val st = it.next()
          val rel = st.getPath.toUri.getPath
            .stripPrefix(oldPrefix).stripPrefix("/")
          if (rel.endsWith(".parquet") && !snapshotRel.contains(rel)) {
            val target = new org.apache.hadoop.fs.Path(dst, rel)
            fs.mkdirs(target.getParent)
            if (!fs.rename(st.getPath, target))
              throw new java.io.IOException(
                s"optimize: could not salvage concurrent append $rel")
          }
        }
        fs.delete(old, true)
      }
    }
    ()
  }
}
