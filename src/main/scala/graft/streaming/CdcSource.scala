package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import graft.lake.TxLog

/** Structured-Streaming CDC SOURCE over a [[TxLog]] table — the read
  * side of the exactly-once loop whose write side is
  * [[Streaming.txLogSink]] (together they are the Delta streaming
  * source/sink pair, reference `nisshi-schema/src/lake/delta.rs`
  * commit log + the Delta change-data-feed reader).
  *
  * {{{
  * spark.readStream.format("txlog-cdc")
  *   .option("table", "/data/events_typed")
  *   .option("maxVersionsPerBatch", "8")     // optional rate limit
  *   .option("startingVersion", "latest")    // optional: skip history
  *   .load()
  * }}}
  *
  * Offsets ARE log versions: `getOffset` is one directory listing of
  * `_graft_log` (zero Spark jobs on an idle tick — the long-poll
  * discipline), and batch (start, end] is exactly
  * [[TxLog.changes]](start, end) — the table's columns plus
  * `_change_type` ('insert' | 'delete') and `_commit_version`. The
  * first batch is the full current snapshot as inserts (Delta's
  * initial-snapshot semantics) unless `startingVersion` says otherwise:
  * `latest` starts from the version current at stream start (new
  * changes only); a number `v` starts the feed at versions > v.
  *
  * `maxVersionsPerBatch` caps how many LOG VERSIONS one micro-batch
  * folds — the backpressure knob (Delta's maxFilesPerTrigger analog):
  * a stream recovering from a long pause catches up in bounded steps
  * instead of one giant batch.
  *
  * Failure posture: replaying a checkpointed batch needs its manifest
  * window (and for the initial snapshot, its file set) to still exist;
  * a vacuum that crossed it fails the stream LOUDLY — never a silently
  * short feed. Keep the vacuum age fence longer than the longest
  * expected stream outage, exactly as with Delta's
  * `delta.deletedFileRetentionDuration`.
  *
  * The schema is fixed at stream start (the manifest schema then);
  * columns added by later commits are dropped until the stream
  * restarts, and a column removed mid-stream reads as NULL — the
  * stream never crashes on evolution, it degrades to the declared
  * schema (restart to pick up the new one).
  */
object TxLogCdc {
  val Format = "txlog-cdc"

  /** Deep nullability widening: the declared stream schema must accept
    * every version's batch, and commits legitimately disagree on
    * NULLABILITY inside nested types (an encoder-written append has
    * `array<float> containsNull=false`, a DML rewrite read back through
    * parquet has `true`). A projection cast to the NARROW variant is
    * unresolvable (cannot cast away containsNull), so the declared
    * schema takes the wide form — every variant widens into it.
    */
  private def widenNullability(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = widenNullability(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      org.apache.spark.sql.types.ArrayType(
        widenNullability(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      org.apache.spark.sql.types.MapType(m.keyType,
        widenNullability(m.valueType), valueContainsNull = true)
    case other => other
  }

  private[streaming] def changeSchema(table: String): StructType = {
    val snap = TxLog.currentSnapshot(table).getOrElse(
      throw new IllegalArgumentException(
        s"$table has no _graft_log — the CDC source reads TxLog tables"))
    val base = widenNullability(DataType.fromJson(snap.schemaJson)
      .asInstanceOf[StructType]).asInstanceOf[StructType]
    require(!base.fieldNames.contains("_change_type") &&
      !base.fieldNames.contains("_commit_version"),
      s"$table schema collides with the CDC columns _change_type/_commit_version")
    StructType(base.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
  }
}

class TxLogCdcSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = TxLogCdc.Format

  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("table", throw new IllegalArgumentException(
      s"${TxLogCdc.Format} requires .option(\"table\", <TxLog table path>)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (TxLogCdc.Format, TxLogCdc.changeSchema(tableOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val table = tableOf(parameters)
    val maxVersions = parameters.get("maxVersionsPerBatch").map(_.toLong)
    maxVersions.foreach(m => require(m > 0,
      s"maxVersionsPerBatch must be positive: $m"))
    val starting = parameters.get("startingVersion").map {
      case "latest" => TxLog.latestVersion(table)
        .getOrElse(throw new IllegalArgumentException(
          s"$table has no _graft_log"))
      case n => n.toLong
    }
    new TxLogCdcSource(sqlContext, table, maxVersions, starting, metadataPath)
  }
}

/** @param base the log version already accounted for before the stream:
  *   None → the first batch is the full snapshot as inserts; Some(v) →
  *   the feed starts at versions > v.
  */
class TxLogCdcSource(sqlContext: SQLContext, table: String,
                     maxVersions: Option[Long], base: Option[Long],
                     metadataPath: String)
    extends Source {

  private val spark = sqlContext.sparkSession
  override val schema: StructType = TxLogCdc.changeSchema(table)

  /** Highest version already handed out as an end offset — the rate
    * limit's floor. Re-seeded by getBatch on restart recovery (Spark
    * replays the checkpointed batch through getBatch before polling
    * getOffset again).
    */
  private var lastOffered: Option[Long] = None

  /** Durable record of the highest end offset whose batch the ENGINE
    * committed (written from [[commit]], read on restart). Spark
    * re-invokes getBatch for the last committed batch at restart just
    * to re-seed the source; its data will never be re-executed, so a
    * vacuum having aged that batch's history out must NOT brick the
    * stream — getBatch returns an empty re-seed batch instead. An
    * UNCOMMITTED batch gets no such tolerance: its rows would really
    * be lost, so missing history stays a loud failure.
    */
  private val hwPath: java.nio.file.Path = {
    val p = if (metadataPath.startsWith("file:"))
      java.nio.file.Paths.get(java.net.URI.create(
        // file:/p and file:///p both appear in practice
        if (metadataPath.startsWith("file:///")) metadataPath
        else "file://" + metadataPath.stripPrefix("file:")))
    else java.nio.file.Paths.get(metadataPath)
    p.resolve("graft-committed-hw")
  }

  private def committedHighWater: Option[Long] =
    try {
      if (java.nio.file.Files.exists(hwPath))
        Some(java.nio.file.Files.readString(hwPath).trim.toLong)
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  override def commit(end: Offset): Unit = synchronized {
    val endV = v(end)
    if (!committedHighWater.exists(_ >= endV))
      try {
        java.nio.file.Files.createDirectories(hwPath.getParent)
        val tmp = hwPath.resolveSibling(s".hw-${java.util.UUID.randomUUID()}")
        java.nio.file.Files.writeString(tmp, endV.toString)
        java.nio.file.Files.move(tmp, hwPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch {
        // the marker is an availability optimization (restart re-seed
        // tolerance), never correctness — don't fail the batch over it
        case scala.util.control.NonFatal(_) => ()
      }
  }

  /** Works for live LongOffset and checkpoint-recovered SerializedOffset
    * alike: LongOffset.json is the plain number.
    */
  private def v(o: Offset): Long = o.json.toLong

  override def getOffset: Option[Offset] = synchronized {
    // one directory listing, no manifest parse — the idle-tick cost
    val latest = TxLog.latestVersion(table)
    latest.map { l =>
      // floor: everything at or before it is already offered/accounted.
      // With neither a prior batch nor startingVersion (initial-snapshot
      // mode) the first offer is the CURRENT version uncapped — the
      // snapshot is one batch by construction.
      val floor = lastOffered.orElse(base)
      val offered = (floor, maxVersions) match {
        case (Some(f), Some(m)) => math.min(l, f + m)
        case _                  => l
      }
      val end = math.max(offered, floor.getOrElse(offered))
      lastOffered = Some(end)
      LongOffset(end)
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = v(end)
    synchronized {
      lastOffered = Some(math.max(endV, lastOffered.getOrElse(endV)))
    }
    def build(): DataFrame = start.map(v).orElse(base) match {
      case Some(s) =>
        if (s >= endV) emptyBatch()
        else TxLog.changes(spark, table, s, endV)
      case None =>
        // initial snapshot: every current row as an insert at endV
        TxLog.readAt(spark, table, endV)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(endV))
    }
    val df =
      try build()
      catch {
        // restart re-seed of an already-committed batch: its history
        // may legitimately have aged out (vacuum), and its rows will
        // never be re-executed — an empty frame re-seeds the source.
        // For anything not yet committed the error stays loud.
        case e @ (_: IllegalStateException | _: IllegalArgumentException)
            if committedHighWater.exists(_ >= endV) => emptyBatch()
      }
    // project to the DECLARED schema: evolution after stream start must
    // not change the batch shape (added columns dropped, removed read
    // as typed NULL); order and types pinned
    val projected = df.select(schema.fields.map { f =>
      (if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)
    }.toSeq: _*)
    // getBatch's contract: leaf plan nodes must be streaming-flagged
    org.apache.spark.sql.graftshim.StreamingBatch.asStreaming(projected)
  }

  private def emptyBatch(): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  override def stop(): Unit = ()
  override def toString: String = s"TxLogCdcSource[$table]"
}
