package graft.storage

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Model._
import graft.operators.LogOps
import graft.schema.SchemaRegistry
import graft.lake.Lake

/** Object-store-style storage engine over Parquet, mirroring the
  * reference's dynostore layout (`nisshi-storage/src/dynostore.rs`):
  *
  *  - one batch object per produce at
  *    `log/<topic>/<partition %010d>/<baseOffset %020d>.parquet`
  *    (reference key scheme `dynostore.rs:992-995`)
  *  - `watermark.json` per partition updated by compare-and-swap via
  *    atomic rename (the OptiCon conditional-PUT analog,
  *    `dynostore/opticon.rs:232-320`) — offsets are assigned exactly once
  *    even with concurrent producers
  *  - schema-backed topics are additionally materialized to
  *    `lake/<topic>/` with meta columns, generated columns, and partition
  *    dirs (reference `dynostore.rs:805-822`)
  *
  * On a real cluster the same layout runs against S3/HDFS paths and the
  * watermark CAS becomes a Delta/Iceberg commit; file-per-batch keeps
  * offset-range fetches prunable by filename without reading data.
  */
final class ParquetStorage(spark: SparkSession, root: String,
                           registry: Option[SchemaRegistry] = None,
                           txnTimeoutMs: Long = 60000,
                           clock: () => Long = () => System.currentTimeMillis())
    extends Storage {

  private val topicsMap = TrieMap.empty[String, (Int, Map[String, String])]
  private val watermarks = TrieMap.empty[Topition, AtomicLong]
  private val producerSeqs = TrieMap.empty[(Long, Int, Topition), Int]
  private val groups = TrieMap.empty[String, (String, Long)]
  private val producerIds = new AtomicLong(1000)
  private val txns = TrieMap.empty[Long, TrieMap[Topition, (Long, Long)]] // pid -> tp -> (start, lastEnd)
  private val txnStates = TrieMap.empty[Long, TxnState.Value]
  private val txnStartTimes = TrieMap.empty[Long, Long]
  private val abortedRanges = TrieMap.empty[Topition, Vector[TxnRange]]

  private def partDir(tp: Topition) =
    f"$root/log/${tp.topic}/${tp.partition}%010d"

  // ---------------------------------------------------------------- topics

  override def createTopic(topic: String, partitions: Int,
                           config: Map[String, String]): Unit = {
    require(!topicsMap.contains(topic), s"topic exists: $topic")
    topicsMap.put(topic, (partitions, config))
    (0 until partitions).foreach { p =>
      Files.createDirectories(Paths.get(partDir(Topition(topic, p))))
    }
  }

  override def deleteTopic(topic: String): Unit = {
    topicsMap.remove(topic)
    val dir = Paths.get(s"$root/log/$topic")
    if (Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  override def topics: Seq[String] = topicsMap.keys.toSeq.sorted
  override def topicConfig(topic: String): Map[String, String] =
    topicsMap.get(topic).map(_._2).getOrElse(Map.empty)

  // -------------------------------------------------------------- watermark

  /** Watermark CAS: read current, bump by n, atomic-rename publish.
    * Single-JVM AtomicLong guards the in-process race; the file is the
    * durable value (re-read on restart), as in dynostore's watermark.json.
    */
  private def reserveOffsets(tp: Topition, n: Long): Long = {
    val wm = watermarks.getOrElseUpdate(tp, new AtomicLong(readWatermarkFile(tp)))
    val base = wm.getAndAdd(n)
    val p = Paths.get(partDir(tp), "watermark.json")
    val tmp = Paths.get(partDir(tp), s"watermark.json.tmp${base}")
    Files.writeString(tmp, s"""{"high":${base + n}}""")
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    base
  }

  private def readWatermarkFile(tp: Topition): Long = {
    val p = Paths.get(partDir(tp), "watermark.json")
    if (Files.exists(p))
      """"high":(\d+)""".r.findFirstMatchIn(Files.readString(p))
        .map(_.group(1).toLong).getOrElse(0L)
    else 0L
  }

  // ---------------------------------------------------------------- produce

  override def produce(tp: Topition, batch: DataFrame,
                       producerId: Long, producerEpoch: Int,
                       baseSequence: Int): Either[Int, Long] = {
    if (!topicsMap.contains(tp.topic)) return Left(ErrorCode.UnknownTopicOrPartition)

    // idempotence: per (producer, epoch, topition) sequence check
    // (reference dynostore.rs:826-880)
    if (producerId >= 0) {
      val k = (producerId, producerEpoch, tp)
      val expected = producerSeqs.get(k)
      expected match {
        case Some(e) if baseSequence == e => // ok, next in order
        case Some(e) if baseSequence < e => return Left(ErrorCode.DuplicateSequenceNumber)
        case Some(_) => return Left(ErrorCode.OutOfOrderSequenceNumber)
        case None if baseSequence > 0 => return Left(ErrorCode.OutOfOrderSequenceNumber)
        case None => // first batch
      }
    }

    // schema validation (reference dynostore.rs:885-898): reject the whole
    // batch with INVALID_RECORD if any record fails
    val schema = registry.flatMap(_.lookup(tp.topic))
    schema.foreach {
      case a: SchemaRegistry.AvroTopic =>
        // binary Avro payloads: undecodable -> null -> INVALID_RECORD
        val decoded = graft.schema.AvroDecoder.decodeColumn(
          batch.withColumn("__bin", col("value").cast("binary")),
          "__bin", a.avsc, "__decoded")
        if (decoded.filter(col("__decoded").isNull).limit(1).count() > 0)
          return Left(ErrorCode.InvalidRecord)
      case ts =>
        val invalid = batch.filter(!ts.isValid(col("value"))).limit(1).count()
        if (invalid > 0) return Left(ErrorCode.InvalidRecord)
    }

    val n = batch.count()
    val base = reserveOffsets(tp, n)

    // assign offsets: row_number within the batch (single partition write)
    val w = org.apache.spark.sql.expressions.Window.orderBy(monotonically_increasing_id())
    val withOffsets = batch
      .withColumn("offset", row_number().over(w).cast("long") + base - 1)
      .withColumn("topic", lit(tp.topic))
      .withColumn("partition", lit(tp.partition))

    // write to a temp dir, then atomic-rename to publish — readers never
    // see a half-written batch (the PutMode::Create analog,
    // dynostore.rs:992-1014)
    val tmpDir = f"${partDir(tp)}/.tmp_$base%020d"
    withOffsets.coalesce(1).write.mode("overwrite").parquet(tmpDir)
    Files.move(Paths.get(tmpDir), Paths.get(f"${partDir(tp)}/$base%020d.parquet"),
      StandardCopyOption.ATOMIC_MOVE)

    // track open-txn range for read_committed (reference txn_produce_offset)
    if (producerId >= 0 && txnStates.get(producerId).contains(TxnState.Begin)) {
      val m = txns.getOrElseUpdate(producerId, TrieMap.empty)
      val (start, _) = m.getOrElse(tp, (base, base))
      m.put(tp, (start, base + n - 1))
    }
    if (producerId >= 0)
      producerSeqs.put((producerId, producerEpoch, tp), math.max(baseSequence, 0) + n.toInt)

    // lake sink for schema-backed topics (reference dynostore.rs:805-822)
    schema.foreach { ts =>
      val cfg = topicConfig(tp.topic)
      val structed = ts match {
        case a: SchemaRegistry.AvroTopic =>
          graft.schema.AvroDecoder.decodeColumn(
            withOffsets.withColumn("__bin", col("value").cast("binary")),
            "__bin", a.avsc, "value_struct").drop("__bin")
        case _ =>
          withOffsets.withColumn("value_struct",
            from_json(col("value").cast("string"), ts.valueType))
      }
      val typed = Lake.withMeta(structed, col("partition"), col("timestamp"))
      val generated = cfg.collect {
        case (k, v) if k.startsWith(ConfigKey.GeneratedPrefix) =>
          k.stripPrefix(ConfigKey.GeneratedPrefix) -> v
      }
      val withGen = Lake.withGenerated(typed, generated)
      val partitionCols = cfg.get(ConfigKey.LakePartition)
        .map(_.split(",").toSeq.map(_.trim)).getOrElse(Nil)
      Lake.writeTable(withGen, s"$root/lake/${tp.topic}", partitionCols)
    }

    Right(base)
  }

  // ------------------------------------------------------------------ fetch

  private def logDf(tp: Topition): DataFrame = {
    val dir = partDir(tp)
    import scala.jdk.CollectionConverters._
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("."))
      .map(_.toString).toSeq
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.model.Model.logSchema)
    else spark.read.parquet(files: _*)
  }

  override def fetch(tp: Topition, fetchOffset: Long, maxBytes: Long,
                     readCommitted: Boolean): DataFrame = {
    val stage = offsetStage(tp)
    val end = if (readCommitted) stage.lastStable else stage.highWatermark
    val ranged = logDf(tp)
      .filter(col("offset") >= fetchOffset && col("offset") < end)
      .withColumn("val_len",
        coalesce(octet_length(col("value").cast("binary")), lit(0)))
    LogOps.fetchWithByteBudget(
      ranged.withColumn("topic", lit(tp.topic))
        .withColumn("partition", lit(tp.partition)),
      fetchOffset, maxBytes).drop("running_bytes", "val_len")
  }

  // ---------------------------------------------------------------- offsets

  override def offsetStage(tp: Topition): OffsetStage = {
    val high = watermarks.getOrElseUpdate(tp,
      new AtomicLong(readWatermarkFile(tp))).get()
    val openStarts = txns.collect {
      case (pid, m) if txnStates.get(pid).contains(TxnState.Begin) && m.contains(tp) =>
        m(tp)._1
    }
    val lastStable = if (openStarts.isEmpty) high else openStarts.min
    OffsetStage(logStart = 0L, lastStable = lastStable, highWatermark = high)
  }

  override def listEarliestOffset(tp: Topition): Long = 0L
  override def listLatestOffset(tp: Topition): Long = offsetStage(tp).highWatermark

  override def offsetForTimestamp(tp: Topition, tsMillis: Long): Option[Long] = {
    val r = logDf(tp)
      .filter(col("timestamp") >= timestamp_millis(lit(tsMillis)))
      .agg(min("offset")).head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  // ----------------------------------------------------------------- groups

  override def offsetCommit(group: String, tp: Topition, offset: Long): Unit =
    groups.put(s"$group/${tp.topic}/${tp.partition}", (offset.toString, 0L))

  override def offsetFetch(group: String, tp: Topition): Option[Long] =
    groups.get(s"$group/${tp.topic}/${tp.partition}").map(_._1.toLong)

  override def updateGroup(group: String, state: String,
                           expectedVersion: Long): Option[Long] = {
    val cur = groups.get(group)
    cur match {
      case None if expectedVersion == -1 =>
        if (groups.putIfAbsent(group, (state, 0L)).isEmpty) Some(0L) else None
      case Some((old, v)) if v == expectedVersion =>
        if (groups.replace(group, (old, v), (state, v + 1))) Some(v + 1) else None
      case _ => None
    }
  }

  override def groupState(group: String): Option[(String, Long)] = groups.get(group)

  // ------------------------------------------------------------ transactions

  override def initProducer(txnId: String): (Long, Int) =
    (producerIds.incrementAndGet(), 0)

  override def txnBegin(producerId: Long, tp: Topition): Unit = {
    txnStates.put(producerId, TxnState.Begin)
    txnStartTimes.putIfAbsent(producerId, clock())
    txns.getOrElseUpdate(producerId, TrieMap.empty)
  }

  override def txnEnd(producerId: Long, commit: Boolean): Unit = {
    val next = if (commit) TxnState.Committed else TxnState.Aborted
    txnStates.put(producerId, next)
    if (!commit) {
      txns.get(producerId).foreach(_.foreach { case (tp, (start, end)) =>
        abortedRanges.updateWith(tp) {
          case Some(v) => Some(v :+ TxnRange(producerId, tp.topic, tp.partition,
            start, end, TxnState.Aborted))
          case None => Some(Vector(TxnRange(producerId, tp.topic, tp.partition,
            start, end, TxnState.Aborted)))
        }
      })
    }
    txns.remove(producerId)
  }

  override def abortedTxns(tp: Topition, fromOffset: Long,
                           toOffset: Long): Seq[TxnRange] =
    abortedRanges.getOrElse(tp, Vector.empty)
      .filter(r => r.offsetStart < toOffset && r.offsetEnd >= fromOffset)

  // ------------------------------------------------------------- maintenance

  /** T6 — abort transactions whose timeout elapsed, releasing the pinned
    * last-stable offset (reference `Storage::maintain_transactions`,
    * `pg.rs:3662`).
    */
  def maintainTransactions(): Seq[Long] = {
    val now = clock()
    val expired = txnStartTimes.collect {
      case (pid, t0) if txnStates.get(pid).contains(TxnState.Begin) &&
        now - t0 > txnTimeoutMs => pid
    }.toSeq
    expired.foreach { pid =>
      txnEnd(pid, commit = false)
      txnStartTimes.remove(pid)
    }
    expired
  }

  /** Retention (policy_delete.sql) + compaction (policy_compact.sql):
    * rewrite each partition dir applying the topic's cleanup policy;
    * then abort expired transactions (T6).
    */
  override def maintain(): Unit = {
    maintainTransactions()
    topicsMap.foreach { case (topic, (partitions, cfg)) =>
      val policy = cfg.getOrElse(ConfigKey.CleanupPolicy, "delete")
      val retentionMs = cfg.get(ConfigKey.RetentionMs).map(_.toLong)
      (0 until partitions).foreach { p =>
        val tp = Topition(topic, p)
        val df0 = logDf(tp)
        if (!df0.isEmpty) {
          var df = df0
          if (policy.contains("delete")) retentionMs.foreach { r =>
            df = df.filter(col("timestamp") >=
              timestamp_millis(lit(System.currentTimeMillis() - r)))
          }
          if (policy.contains("compact")) df = LogOps.compact(df)
          val tmp = partDir(tp) + "__compacting"
          df.coalesce(1).write.mode("overwrite").parquet(tmp)
          import scala.jdk.CollectionConverters._
          Files.list(Paths.get(partDir(tp))).iterator().asScala
            .filter(_.toString.endsWith(".parquet")).foreach { f =>
              Files.walk(f).iterator().asScala.toSeq.reverse.foreach(Files.delete)
            }
          Files.move(Paths.get(tmp), Paths.get(partDir(tp),
            f"${0L}%020d.parquet"))
        }
      }
    }
  }
}
