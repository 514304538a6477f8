package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}
import scala.jdk.CollectionConverters._

/** Minimal transactional manifest log for Parquet tables — the native
  * stand-in for the Delta/Iceberg commit protocol while those jars are
  * absent (reference `nisshi-schema/src/lake/delta.rs:673-720` commit
  * semantics; the S7/S8 plugs delegate to the real formats when
  * available).
  *
  * Layout: `<table>/_graft_log/v%020d.manifest`, each a FULL snapshot —
  * line 1 is the Spark schema JSON, every further line one data-file
  * path relative to the table root. Commits are optimistic CAS:
  *  1. write the candidate manifest to a dot-prefixed staging file;
  *  2. `Files.createLink(v{N+1}, staging)` — hard-link creation is
  *     atomic and FAILS if the target exists, which is the compare-and-
  *     swap (a plain rename silently REPLACES on POSIX and cannot CAS);
  *  3. a lost race re-reads the winner's snapshot, recomputes the file
  *     list, and retries.
  * Data files are written to a dot-prefixed staging dir (invisible to
  * readers) and hard-renamed into the table's partition layout under
  * unique names BEFORE the manifest commit — a reader either sees the
  * manifest that references them or doesn't see them at all.
  *
  * Scale: a manifest is O(files) text; reads list one directory and
  * read one file before handing Spark the exact file set (no recursive
  * listing of the table — at object-store scale the listing, not the
  * data, is what kills naive readers).
  */
object TxLog {

  final case class Snapshot(version: Long, schemaJson: String,
                            files: Seq[String])

  private def logDir(table: String): Path = Paths.get(table, "_graft_log")

  private def manifestPath(table: String, v: Long): Path =
    logDir(table).resolve(f"v$v%020d.manifest")

  /** Latest committed snapshot, if the table has a log. */
  def currentSnapshot(table: String): Option[Snapshot] = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) return None
    val latest = {
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.matches("v\\d{20}\\.manifest"))
        .map(_.stripPrefix("v").stripSuffix(".manifest").toLong)
        .foldLeft(-1L)(math.max)
      finally s.close()
    }
    if (latest < 0) None
    else {
      val lines = Files.readString(manifestPath(table, latest)).split("\n", -1)
      Some(Snapshot(latest, lines.head,
        lines.tail.filter(_.nonEmpty).toSeq))
    }
  }

  /** One CAS attempt: returns false when version `next` already exists
    * (someone else committed first).
    */
  private def tryCommit(table: String, next: Long, schemaJson: String,
                        files: Seq[String]): Boolean = {
    val dir = logDir(table)
    Files.createDirectories(dir)
    val stage = dir.resolve(s".stage-${java.util.UUID.randomUUID()}")
    Files.writeString(stage, (schemaJson +: files).mkString("\n"))
    try {
      Files.createLink(manifestPath(table, next), stage)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.delete(stage)
  }

  /** Write `df`'s output files into the table's partition layout under
    * unique names (via a dot-prefixed staging dir readers never see) and
    * return their table-relative paths. Nothing is visible to TxLog
    * readers until a manifest referencing them commits.
    */
  private def stageDataFiles(df: DataFrame, table: String,
                             partitionCols: Seq[String]): Seq[String] = {
    val stageDir = Paths.get(table, s".commit-${java.util.UUID.randomUUID()}")
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(stageDir.toString)
    val staged = {
      val s = Files.walk(stageDir)
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") &&
          !p.getFileName.toString.startsWith("."))
        .toList
      finally s.close()
    }
    val rel = staged.map { p =>
      val relInStage = stageDir.relativize(p) // <partition dirs>/part-x.parquet
      val unique = s"part-${java.util.UUID.randomUUID()}.parquet"
      val target =
        if (relInStage.getParent == null) Paths.get(table, unique)
        else Paths.get(table).resolve(relInStage.getParent).resolve(unique)
      Files.createDirectories(target.getParent)
      Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
      Paths.get(table).relativize(target).toString
    }
    deleteTree(stageDir)
    rel
  }

  /** Transactional append: stages the data files, then CAS-commits
    * latest-snapshot + new files. Concurrent appenders all land —
    * losers re-read the winner's list and retry with their files.
    */
  def append(df: DataFrame, table: String,
             partitionCols: Seq[String] = Nil, maxRetries: Int = 64): Long = {
    val newFiles = stageDataFiles(df, table, partitionCols)
    val schemaJson = df.schema.json
    var attempt = 0
    while (attempt < maxRetries) {
      val snap = currentSnapshot(table)
      val base = snap.map(_.files).getOrElse(Nil)
      val next = snap.map(_.version + 1).getOrElse(0L)
      if (tryCommit(table, next, schemaJson, base ++ newFiles)) return next
      attempt += 1
    }
    throw new IllegalStateException(s"append($table): commit contention")
  }

  /** Snapshot-isolated read: exactly the latest manifest's files, typed
    * by the manifest schema when the file set is empty. ignoreMissingFiles
    * tolerates a vacuum racing a long-lived plan.
    */
  def read(spark: SparkSession, table: String): DataFrame =
    currentSnapshot(table) match {
      case None =>
        throw new IllegalArgumentException(s"$table has no _graft_log")
      case Some(s) if s.files.isEmpty =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          DataType.fromJson(s.schemaJson).asInstanceOf[StructType])
      case Some(s) =>
        spark.read
          .option("ignoreMissingFiles", "true")
          .option("mergeSchema", "true") // mixed-schema manifests read whole
          .option("basePath", table)
          .parquet(s.files.map(f => s"$table/$f"): _*)
    }

  /** Transactional OPTIMIZE: rewrite the SNAPSHOT compacted (optionally
    * z-ordered), then CAS-commit (latest − snapshot) + rewritten — files
    * appended concurrently with the rewrite survive in the committed
    * list. Replaced files stay on disk for older readers until
    * [[vacuum]].
    */
  /** `purgeReplaced`: delete the rewritten snapshot's files right after
    * the winning commit. The replaced set is exactly known (never an
    * appender's staged-but-uncommitted files, which are NOT in the
    * snapshot), so this is race-free against writers; it trades away
    * pre-optimize snapshot readers (ignoreMissingFiles -> short read,
    * the storage-wide retry discipline) to keep PLAIN directory readers
    * from double-counting replaced + rewritten data.
    */
  def optimize(spark: SparkSession, table: String,
               partitionCols: Seq[String], zorderCols: Seq[String] = Nil,
               targetFileMB: Int = 128, maxRetries: Int = 64,
               purgeReplaced: Boolean = false): Long = {
    val snap = currentSnapshot(table).getOrElse(
      throw new IllegalArgumentException(s"$table has no _graft_log"))
    if (snap.files.isEmpty) return snap.version
    // mergeSchema: schema-evolved appends carry extra columns; a
    // compaction that read one representative footer would REWRITE THE
    // TABLE WITHOUT THEM and the next vacuum would delete the originals
    val df = spark.read
      .option("mergeSchema", "true")
      .option("basePath", table)
      .parquet(snap.files.map(f => s"$table/$f"): _*)
    val sized = math.max(1,
      (totalBytes(table, snap.files) /
        (targetFileMB.toLong * 1024 * 1024)).toInt)
    val clustered =
      if (zorderCols.nonEmpty)
        df.withColumn("__z", Lake.zorderKey(df, zorderCols))
          .repartitionByRange(sized, org.apache.spark.sql.functions.col("__z"))
          .drop("__z")
      else df.repartition(sized)
    val rewritten = stageDataFiles(clustered, table, partitionCols)
    val replaced = snap.files.toSet
    var attempt = 0
    while (attempt < maxRetries) {
      val latest = currentSnapshot(table).get
      // another optimize already replaced our whole snapshot: committing
      // our rewrite on top would DOUBLE the data (their output + ours
      // both referenced). Abandon: drop our staged rewrite and yield.
      // (An optimize always replaces the full snapshot, so a racing one
      // leaves zero of our files in the latest manifest — appends only
      // ever ADD files, so a nonempty intersection means no one beat us.)
      if (latest.files.forall(f => !replaced.contains(f))) {
        rewritten.foreach { f =>
          val p = Paths.get(table, f)
          if (Files.exists(p)) Files.delete(p)
        }
        return latest.version
      }
      val kept = latest.files.filterNot(replaced.contains)
      if (tryCommit(table, latest.version + 1, latest.schemaJson,
        kept ++ rewritten)) {
        if (purgeReplaced)
          replaced.foreach { f =>
            val p = Paths.get(table, f)
            if (Files.exists(p)) Files.delete(p)
          }
        return latest.version + 1
      }
      attempt += 1
    }
    throw new IllegalStateException(s"optimize($table): commit contention")
  }

  /** Total data bytes the snapshot references (the compaction trigger's
    * input — file COUNT alone would re-rewrite a large healthy table
    * every maintenance tick).
    */
  def snapshotBytes(table: String, snap: Snapshot): Long =
    totalBytes(table, snap.files)

  /** Sum of the snapshot's file sizes (missing files count 0 — a
    * concurrent vacuum may have removed one under an old manifest).
    */
  private def totalBytes(table: String, files: Seq[String]): Long =
    files.map { f =>
      val p = Paths.get(table, f)
      if (Files.exists(p)) Files.size(p) else 0L
    }.sum

  /** Remove data files no manifest ≤ the latest references, and all
    * manifests before the latest.
    *
    * Two guards make this safe against concurrent writers:
    *  - files under dot-prefixed dirs are NEVER touched (an appender's
    *    in-progress Spark write lives there);
    *  - only files older than `minAgeMs` are deleted — an appender that
    *    has MOVED its files into the layout but not yet won its manifest
    *    CAS is indistinguishable from garbage by membership alone, so
    *    age is the fence (Delta's VACUUM retention, same reasoning).
    * The age window doubles as the grace period for snapshot readers
    * older than the latest manifest.
    */
  def vacuum(table: String, minAgeMs: Long = 3600000L): Unit = {
    val snap = currentSnapshot(table).getOrElse(return)
    val live = snap.files.toSet
    val root = Paths.get(table)
    val cutoff = System.currentTimeMillis() - minAgeMs
    val dead = {
      val s = Files.walk(root)
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .filterNot(p => p.startsWith(logDir(table)))
        .filterNot(p => root.relativize(p).iterator().asScala
          .exists(_.toString.startsWith(".")))
        .filter(p => !live.contains(root.relativize(p).toString))
        .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
        .toList
      finally s.close()
    }
    dead.foreach(Files.delete)
    val dir = logDir(table)
    val s = Files.list(dir)
    try s.iterator().asScala
      .filter(_.getFileName.toString.matches("v\\d{20}\\.manifest"))
      .filter(_ != manifestPath(table, snap.version))
      .toList.foreach(Files.delete)
    finally s.close()
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      val all = try s.iterator().asScala.toList finally s.close()
      all.reverse.foreach(Files.delete)
    }
}
