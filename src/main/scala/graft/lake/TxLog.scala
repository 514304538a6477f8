package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, input_file_name, lit, not}
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import scala.jdk.CollectionConverters._

/** Minimal transactional manifest log for Parquet tables — the native
  * stand-in for the Delta/Iceberg commit protocol while those jars are
  * absent (reference `nisshi-schema/src/lake/delta.rs:673-720` commit
  * semantics; the S7/S8 plugs delegate to the real formats when
  * available).
  *
  * Layout: `<table>/_graft_log/v%020d.manifest`. Two manifest kinds
  * (the Delta log's action-file + checkpoint split):
  *  - CHECKPOINT — line 1 is the Spark schema JSON, every further line
  *    one data-file path relative to the table root (every pre-v2
  *    manifest parses as this kind, so old logs keep reading);
  *  - DELTA — line 1 is the literal `@delta`, line 2 the schema JSON,
  *    every further line `+path` (add) or `-path` (remove), relative to
  *    the PREVIOUS version.
  * An append writes O(its own files) bytes — a delta — and a full
  * checkpoint only every [[CheckpointInterval]] versions, so commit
  * cost no longer grows with table file count (the pre-round-8 full
  * snapshot per commit made a hot topic's cumulative commit cost
  * quadratic in file count). [[currentSnapshot]] folds the latest
  * manifest chain back to its nearest checkpoint — a bounded ≤
  * [[CheckpointInterval]] small local reads.
  *
  * Commits are optimistic CAS:
  *  1. write the candidate manifest to a dot-prefixed staging file;
  *  2. `Files.createLink(v{N+1}, staging)` — hard-link creation is
  *     atomic and FAILS if the target exists, which is the compare-and-
  *     swap (a plain rename silently REPLACES on POSIX and cannot CAS);
  *  3. a lost race re-reads the winner's snapshot, recomputes, retries.
  * The hard-link CAS is POSIX-only: object stores (s3a/gs/abfs) have no
  * atomic link, so any scheme other than `file:` is REFUSED up front
  * (use the Delta/Iceberg format plug there) rather than silently
  * degrading to a racy rename.
  *
  * Data files are written to a dot-prefixed staging dir (invisible to
  * readers) and hard-renamed into the table's partition layout under
  * unique names BEFORE the manifest commit — a TxLog reader either sees
  * the manifest that references them or doesn't see them at all. A
  * PLAIN directory reader (`spark.read.parquet` over the table) can see
  * a not-yet-committed file in that window; on commit failure the
  * staged files are deleted rather than left as permanent orphans.
  *
  * Scale: a read lists one directory and reads ≤ CheckpointInterval+1
  * manifest files before handing Spark the exact file set (no recursive
  * listing of the table — at object-store scale the listing, not the
  * data, is what kills naive readers).
  */
object TxLog {

  /** Checkpoint cadence: a delta chain never exceeds this many
    * manifests, bounding both snapshot-fold reads and the worst-case
    * recovery walk (Delta checkpoints every 10 commits for the same
    * reason).
    */
  val CheckpointInterval = 16

  /** `checkpointVersion` is the version the latest chain folds from —
    * vacuum must keep manifests ≥ it for the fold to stay replayable.
    * `stats` carries per-file column min/max JSON (the Delta
    * data-skipping stats) for files whose footers were harvested at
    * commit time; files without an entry are simply never pruned.
    */
  final case class Snapshot(version: Long, schemaJson: String,
                            files: Seq[String], checkpointVersion: Long,
                            stats: Map[String, String] = Map.empty,
                            unionSchema: Boolean = true)

  /** Refuse non-POSIX table paths: the CAS below is `Files.createLink`,
    * which object-store filesystems cannot honor — a silent fallback
    * would turn every commit into a racy rename and lose writes. All
    * `file:` spellings are normalized (`file:/p`, `file:///p` — the
    * Hadoop and URI forms — both mean local `/p`); a `file://host/p`
    * with a real remote authority is refused like any other scheme.
    */
  private def posixTable(table: String): String = {
    val scheme = "^([a-zA-Z][a-zA-Z0-9+.-]*):".r
    scheme.findFirstMatchIn(table) match {
      case None => table
      case Some(m) if m.group(1) != "file" =>
        throw new IllegalArgumentException(
          s"TxLog requires a POSIX filesystem (hard-link CAS); got scheme " +
            s"'${m.group(1)}:' for $table — use the Delta/Iceberg format " +
            "plug (Lake.writeTable with format=delta/iceberg) on object stores")
      case Some(_) =>
        val uri = java.net.URI.create(table)
        val remote = Option(uri.getHost).exists(h =>
          h.nonEmpty && h != "localhost")
        if (remote || uri.getPath == null || uri.getPath.isEmpty)
          throw new IllegalArgumentException(
            s"TxLog requires a LOCAL file: path; cannot use $table")
        uri.getPath
    }
  }

  private def logDir(table: String): Path = Paths.get(table, "_graft_log")

  private def manifestPath(table: String, v: Long): Path =
    logDir(table).resolve(f"v$v%020d.manifest")

  private def listVersions(table: String): Seq[Long] = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("v\\d{20}\\.manifest"))
      .map(_.stripPrefix("v").stripSuffix(".manifest").toLong)
      .toList.sorted
    finally s.close()
  }

  /** `op` records WHAT the commit did (append / optimize / delete /
    * merge) — [[changes]] uses it to skip physical-only rewrites. Legacy
    * manifests (no tag) default to "append"/"checkpoint", for which
    * [[changes]] falls back to the generic row diff (still correct —
    * a rewrite's diff is empty by construction).
    */
  /** `unionSchema`: this manifest's schemaJson is the commit-time UNION
    * of every append's schema (written by current code, marked `#u`).
    * Manifests without the mark predate the union — their schema is just
    * the last append's, so reads must fall back to mergeSchema and the
    * next append/optimize heals the union in.
    */
  private sealed trait Manifest {
    def schemaJson: String; def op: String; def unionSchema: Boolean
  }
  private final case class Checkpoint(schemaJson: String, files: Seq[String],
                                      op: String = "append",
                                      stats: Map[String, String] = Map.empty,
                                      unionSchema: Boolean = true)
      extends Manifest
  private final case class Delta(schemaJson: String, adds: Seq[String],
                                 removes: Seq[String],
                                 op: String = "append",
                                 addStats: Map[String, String] = Map.empty,
                                 unionSchema: Boolean = true)
      extends Manifest

  // per-file stats line: "#s\t<path>\t<json>" — hash-prefixed so file
  // parsing below (and any older reader) skips it structurally
  private def parseStats(lines: Array[String]): Map[String, String] =
    lines.filter(_.startsWith("#s\t")).flatMap { l =>
      l.split("\t", 3) match {
        case Array(_, p, j) => Some(p -> j)
        case _ => None
      }
    }.toMap

  private def readManifest(table: String, v: Long): Manifest = {
    val lines = Files.readString(manifestPath(table, v)).split("\n", -1)
    val head = lines.head
    val body = lines.drop(2).filter(l => l.nonEmpty && !l.startsWith("#"))
    val union = lines.contains("#u")
    if (head.startsWith("@delta")) {
      val op = head.split(" ", 2).lift(1).getOrElse("append")
      val (adds, removes) = body.partition(_.startsWith("+"))
      Delta(lines(1), adds.map(_.drop(1)).toSeq,
        removes.map(_.drop(1)).toSeq, op, parseStats(lines), union)
    } else if (head.startsWith("@checkpoint")) {
      val op = head.split(" ", 2).lift(1).getOrElse("checkpoint")
      Checkpoint(lines(1), body.toSeq, op, parseStats(lines), union)
    } else
      // pre-v2 format: line 1 is the schema JSON — an untagged checkpoint
      Checkpoint(head, lines.tail.filter(l => l.nonEmpty && !l.startsWith("#"))
        .toSeq, "checkpoint", parseStats(lines), union)
  }

  private def statsLines(stats: Map[String, String]): Seq[String] =
    stats.toSeq.sortBy(_._1).map { case (p, j) => s"#s\t$p\t$j" }

  // "#u" marks a union-schema manifest; hash-prefixed, so older readers
  // skip it structurally just like the stats lines. A DML rewrite on a
  // legacy (pre-union) snapshot deliberately writes WITHOUT the mark —
  // its schemaJson is still the narrow legacy one, and claiming union
  // would make later reads drop the very columns the rewrite preserved.
  private def render(m: Manifest): String = {
    val mark = if (m.unionSchema) Seq("#u") else Nil
    m match {
      case Checkpoint(schema, files, op, stats, _) =>
        (Seq(s"@checkpoint $op", schema) ++ files ++ statsLines(stats) ++ mark)
          .mkString("\n")
      case Delta(schema, adds, removes, op, stats, _) =>
        (Seq(s"@delta $op", schema) ++ adds.map("+" + _) ++
          removes.map("-" + _) ++ statsLines(stats) ++ mark).mkString("\n")
    }
  }

  /** Latest committed snapshot, if the table has a log: walk back from
    * the latest manifest to its nearest checkpoint, then fold the delta
    * chain forward. Removes filter, adds append — order is preserved so
    * a checkpoint rewrite is byte-stable.
    */
  def currentSnapshot(table: String): Option[Snapshot] = {
    val t = posixTable(table)
    val versions = listVersions(t)
    if (versions.isEmpty) None else Some(foldTo(t, versions.last))
  }

  /** The committed snapshot AS OF `version` (time travel). Throws when
    * the version was never committed or its manifest chain has been
    * vacuumed away (vacuum keeps manifests ≥ the latest checkpoint).
    */
  def snapshotAt(table: String, version: Long): Snapshot = {
    val t = posixTable(table)
    val versions = listVersions(t)
    if (!versions.contains(version))
      throw new IllegalArgumentException(
        s"$t: version $version not available " +
          s"(have ${versions.headOption.getOrElse("-")}..${versions.lastOption.getOrElse("-")}; " +
          "earlier manifests may have been vacuumed)")
    foldTo(t, version)
  }

  /** Fold the manifest chain ending at `version`: walk back to the
    * nearest checkpoint ≤ version, then replay the deltas forward.
    * `t` is already posix-normalized.
    */
  private def foldTo(t: String, version: Long): Snapshot = {
    var v = version
    var chain = List.empty[(Long, Manifest)]
    var cp: Option[(Long, Checkpoint)] = None
    while (cp.isEmpty) {
      readManifest(t, v) match {
        case c: Checkpoint => cp = Some((v, c))
        case d: Delta =>
          if (v == 0) throw new IllegalStateException(
            s"$t: delta manifest v0 has no checkpoint to fold from")
          chain = (v, d) :: chain
          v -= 1
      }
    }
    val (cpVersion, checkpoint) = cp.get
    val (folded, foldedStats) =
      chain.foldLeft((checkpoint.files, checkpoint.stats)) {
        case ((fs, st), (_, Delta(_, adds, removes, _, addStats, _))) =>
          val dead = removes.toSet
          ((if (dead.isEmpty) fs else fs.filterNot(dead)) ++ adds,
            (if (dead.isEmpty) st else st -- dead) ++ addStats)
        case (acc, _) => acc
      }
    // dedup (order-preserving): two appenders racing on a BRAND-NEW
    // table can both bootstrap the same pre-log file into their commits
    // (the loser's staged files are indistinguishable from legacy data
    // during the winner's pre-log walk), and a doubled path here would
    // double-count its rows in every read
    val files = folded.distinct
    val last: Manifest = chain.lastOption.map(_._2).getOrElse(checkpoint)
    Snapshot(version, last.schemaJson, files, cpVersion, foldedStats,
      last.unionSchema)
  }

  /** Latest committed version, if any — ONE directory listing, no
    * manifest parse or chain fold (the change-feed poll / CDC trigger
    * primitive: an idle tick must cost a listing, nothing more).
    */
  def latestVersion(table: String): Option[Long] =
    listVersions(posixTable(table)).lastOption

  /** One CAS attempt: returns false when version `next` already exists
    * (someone else committed first).
    */
  private def tryCommit(table: String, next: Long, m: Manifest): Boolean = {
    val dir = logDir(table)
    Files.createDirectories(dir)
    val stage = dir.resolve(s".stage-${java.util.UUID.randomUUID()}")
    Files.writeString(stage, render(m))
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
      // the txc- prefix marks TxLog-staged files: preLogDataFiles
      // EXCLUDES them, so a racing appender's bootstrap can never fold
      // another appender's in-flight (possibly about-to-be-unstaged)
      // files into its v0 checkpoint — legacy files (the only thing
      // bootstrap should capture) come from the plain sink's part-*
      // naming and are never txc-
      val unique = s"txc-${java.util.UUID.randomUUID()}.parquet"
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

  /** Staged-but-uncommitted files must not linger when a commit gives
    * up: plain directory readers would double-count them forever (a
    * vacuum only removes them past the age fence).
    */
  private def unstage(table: String, files: Seq[String]): Unit =
    files.foreach { f =>
      val p = Paths.get(table, f)
      if (Files.exists(p)) Files.delete(p)
    }

  /** [[unstage]] minus any file the LATEST COMMITTED manifest already
    * references. The PRIMARY defense against the bootstrap race is the
    * txc- staging prefix (`preLogDataFiles` never captures another
    * appender's in-flight files at all); this check is the second
    * belt — if a manifest somehow references a file we staged, the
    * give-up path must not delete it out from under committed readers
    * (reads run ignoreMissingFiles, so the loss would be silent).
    */
  private[graft] def unstageUncommitted(table: String, files: Seq[String]): Unit = {
    val committed = currentSnapshot(table).map(_.files.toSet)
      .getOrElse(Set.empty[String])
    unstage(table, files.filterNot(committed))
  }

  /** Data files already in the table directory but predating the log —
    * a table written by the plain (pre-TxLog) lake sink. They join the
    * v0 commit so the upgrade keeps them live; otherwise the first
    * TxLog read would silently drop them and the next vacuum would
    * delete them.
    */
  private def preLogDataFiles(table: String): Seq[String] = {
    val root = Paths.get(table)
    if (!Files.isDirectory(root)) return Nil
    val s = Files.walk(root)
    try s.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .filterNot(p => root.relativize(p).iterator().asScala
        .exists(seg => seg.toString.startsWith(".") ||
          seg.toString.startsWith("_")))
      // never capture another appender's TxLog-staged files (txc-): a
      // racer that loses its commit will unstage them, and a bootstrap
      // checkpoint referencing them would then silently lose rows
      .filterNot(p => p.getFileName.toString.startsWith("txc-"))
      .map(p => root.relativize(p).toString)
      .toList.sorted
    finally s.close()
  }

  /** Transactional append: stages the data files, then CAS-commits a
    * delta manifest (or a checkpoint when one is due). Concurrent
    * appenders all land — losers re-read the winner's snapshot and
    * retry with their files. The first-ever commit bootstraps any
    * pre-log data files already in the directory (plain-sink upgrade).
    */
  def append(df: DataFrame, table: String,
             partitionCols: Seq[String] = Nil, maxRetries: Int = 64): Long =
    appendInternal(df, table, partitionCols, maxRetries, txn = None)
      .getOrElse(throw new IllegalStateException(
        s"append($table): unreachable — only txn appends skip"))

  /** Reserved stats key carrying each streaming app's committed batch
    * high-water mark ("@" never begins a file path). Riding the stats
    * map means the marker folds through delta chains and checkpoints
    * with zero extra format surface, and vacuum can never strand it
    * (the surviving checkpoint carries the folded map).
    */
  private val TxnKeyPrefix = "@txn:"

  /** Exactly-once streaming append — the Delta txn app-id pattern: the
    * commit durably records (appId → batchId), and a replayed
    * micro-batch (same appId, batchId ≤ the recorded high-water) is
    * dropped WITHOUT committing, so a foreachBatch sink that crashed
    * after committing but before checkpointing cannot double-write.
    * Returns the committed version, or None for a replay. Batch ids
    * must be monotonically increasing per app — Structured Streaming's
    * contract for foreachBatch.
    */
  def appendStream(df: DataFrame, table: String, appId: String,
                   batchId: Long, partitionCols: Seq[String] = Nil,
                   maxRetries: Int = 64): Option[Long] = {
    require(appId.nonEmpty && !appId.exists(c => c == '\n' || c == '\t'),
      s"appId must be nonempty without tab/newline: '$appId'")
    appendInternal(df, table, partitionCols, maxRetries,
      txn = Some((appId, batchId)))
  }

  /** The committed batch high-water mark for a streaming app, if any. */
  def lastCommittedBatch(table: String, appId: String): Option[Long] =
    currentSnapshot(posixTable(table))
      .flatMap(_.stats.get(TxnKeyPrefix + appId)).map(_.toLong)

  private def appendInternal(df: DataFrame, table: String,
                             partitionCols: Seq[String], maxRetries: Int,
                             txn: Option[(String, Long)]): Option[Long] = {
    val t = posixTable(table)
    // ONE snapshot read seeds both the bootstrap decision and the first
    // CAS attempt (this is the produce hot path — a second listing+fold
    // per call is pure waste); pre-log files are captured BEFORE staging
    // ours into the same layout
    var snap = currentSnapshot(t)
    def isReplay(s: Option[Snapshot]): Boolean = txn.exists {
      case (appId, batchId) =>
        s.flatMap(_.stats.get(TxnKeyPrefix + appId)).exists(_.toLong >= batchId)
    }
    // replay fast path BEFORE staging: the common crash-recovery case
    // must not write (and then delete) the whole micro-batch just to
    // discover the commit already happened
    if (isReplay(snap)) return None
    val preLog = if (snap.isEmpty) preLogDataFiles(t) else Nil
    // bootstrap only: the legacy files' columns must join the schema
    // union or the first explicit-schema read would drop them. One
    // mergeSchema planning pass over the pre-log files, paid once per
    // table lifetime.
    val preLogSchema: Option[StructType] =
      if (preLog.isEmpty) None
      else Some(df.sparkSession.read
        .option("mergeSchema", "true").option("basePath", t)
        .parquet(preLog.map(f => s"$t/$f"): _*).schema)
    val newFiles = stageDataFiles(df, t, partitionCols)
    val newStats = footerStats(t, newFiles)
    // ANY non-success exit must unstage: the files are already in the
    // visible layout, and an exception escaping the loop (not just
    // contention) would otherwise leave plain-reader-visible orphans
    try {
      var attempt = 0
      while (attempt < maxRetries) {
        // exactly-once gate re-checked per attempt: a CAS loser whose
        // winner already covered this batch unstages and reports
        // "already committed". (Plain conditional, not a closure — a
        // non-local return from a lambda rides an exception the
        // catch-all below would intercept.)
        if (isReplay(snap)) {
          unstageUncommitted(t, newFiles)
          return None
        }
        val base = snap.map(_.files).getOrElse(preLog)
        val next = snap.map(_.version + 1).getOrElse(0L)
        // per attempt: a CAS loser's union must fold the WINNER's
        // schema, not the stale snapshot's (schema conflicts throw here
        // and the catch-all below unstages). Bootstrap merges lenient —
        // the pre-log side's partition types are directory-inferred
        // guesses, the appending df is the authoritative writer.
        val schemaJson = snap match {
          case None =>
            preLogSchema.map(mergeSchemas(_, df.schema, lenient = true))
              .getOrElse(df.schema).json
          case Some(s) =>
            mergeSchemas(appendSchemaBase(df.sparkSession, t, s),
              df.schema).json
        }
        val txnStats = txn
          .map { case (a, b) => Map(TxnKeyPrefix + a -> b.toString) }
          .getOrElse(Map.empty)
        // a delta chain never exceeds the interval (forall on None is
        // true, so a first commit is always a checkpoint)
        val checkpointDue =
          snap.forall(s => next - s.checkpointVersion >= CheckpointInterval)
        // distinct: a lost-bootstrap retry's base may already carry our
        // preLog view of a racer's files (see currentSnapshot's dedup)
        val m =
          if (checkpointDue)
            Checkpoint(schemaJson, (base ++ newFiles).distinct,
              stats = snap.map(_.stats).getOrElse(Map.empty) ++ newStats ++
                txnStats)
          else Delta(schemaJson, newFiles, Nil,
            addStats = newStats ++ txnStats)
        if (tryCommit(t, next, m)) return Some(next)
        attempt += 1
        snap = currentSnapshot(t)
      }
    } catch {
      case e: Throwable => unstageUncommitted(t, newFiles); throw e
    }
    unstageUncommitted(t, newFiles)
    throw new IllegalStateException(s"append($t): commit contention")
  }

  /** Snapshot-isolated read: exactly the latest manifest's files, typed
    * by the manifest schema when the file set is empty. ignoreMissingFiles
    * tolerates a vacuum racing a long-lived plan.
    */
  def read(spark: SparkSession, table: String): DataFrame =
    currentSnapshot(table) match {
      case None =>
        throw new IllegalArgumentException(s"$table has no _graft_log")
      case Some(s) => readSnapshot(spark, posixTable(table), s)
    }

  /** Time-travel read: the table exactly as of `version`. Files replaced
    * since then remain readable until [[vacuum]]'s age fence passes —
    * the window in which historical reads are exact; after a vacuum the
    * read fails loudly (no ignoreMissingFiles here: a silently short
    * historical read would be wrong data, not a degraded one).
    * CAVEAT: [[optimize]] with `purgeReplaced = true` — the broker's
    * maintenance sweep uses it to keep PLAIN directory readers honest —
    * deletes the replaced files immediately, so on maintained tables
    * history is retained only back to the last purging optimize; the
    * failure mode is still loud, never a short read.
    */
  def readAt(spark: SparkSession, table: String, version: Long): DataFrame =
    readSnapshot(spark, posixTable(table), snapshotAt(table, version),
      ignoreMissing = false)

  private def readSnapshot(spark: SparkSession, t: String, s: Snapshot,
                           ignoreMissing: Boolean = true): DataFrame =
    if (s.unionSchema)
      readFiles(spark, t, s.files, s.schemaJson, ignoreMissing)
    else legacyMergeRead(spark, t, s, ignoreMissing)

  /** Pre-union manifests carry only the LAST append's schema — columns
    * that exist only in older files would silently vanish under an
    * explicit-schema read (and a DML rewrite would then destroy them).
    * Until the next append/optimize folds the true union into the
    * manifest (see [[appendInternal]]'s heal), such tables keep the
    * old O(files) mergeSchema read: slower planning, never lost data.
    */
  private def legacyMergeRead(spark: SparkSession, t: String, s: Snapshot,
                              ignoreMissing: Boolean): DataFrame =
    legacyMergeReadFiles(spark, t, s.files, s.schemaJson, ignoreMissing)

  private def legacyMergeReadFiles(spark: SparkSession, t: String,
                                   files: Seq[String], schemaJson: String,
                                   ignoreMissing: Boolean = true): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        DataType.fromJson(schemaJson).asInstanceOf[StructType])
    else
      spark.read
        .option("ignoreMissingFiles", ignoreMissing.toString)
        .option("mergeSchema", "true")
        .option("basePath", t)
        .parquet(files.map(f => s"$t/$f"): _*)

  /** The manifest schema is AUTHORITATIVE (it is the commit-time union
    * of every append's schema — see [[mergeSchemas]]), so reads pass it
    * explicitly instead of `mergeSchema=true`. This is the difference
    * between O(1) and O(files) query PLANNING: schema merging opens
    * every file's footer before the first task launches, which at
    * object-store scale turns each read into a million-GET listing
    * storm (Delta reads with the log schema for the same reason).
    * A file column absent from the manifest schema is ignored; a
    * manifest column absent from a file reads as typed NULL.
    */
  private def readFiles(spark: SparkSession, t: String, files: Seq[String],
                        schemaJson: String,
                        ignoreMissing: Boolean = true): DataFrame = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read
        .option("ignoreMissingFiles", ignoreMissing.toString)
        .option("basePath", t)
        .schema(schema)
        .parquet(files.map(f => s"$t/$f"): _*)
  }

  /** Additive schema union, computed ONCE per commit and persisted in
    * the manifest (the Delta schema-evolution contract): existing
    * columns keep their position and must keep their exact type —
    * a type change is refused loudly at COMMIT time, not discovered as
    * a corrupt read later — new columns append at the end. A column
    * missing from either side becomes nullable (files without it read
    * NULL). Nested struct fields merge by the same rule.
    */
  /** `lenient`: on a type conflict take the NEW side instead of
    * refusing — ONLY for the pre-log bootstrap merge, where the old
    * side's types come from directory-value partition inference
    * (`region=01` infers IntegerType) and the appending DataFrame is
    * the authoritative writer. Every schema-evolution path stays
    * strict.
    */
  private[graft] def mergeSchemas(oldSchema: StructType,
                                  newSchema: StructType,
                                  lenient: Boolean = false): StructType = {
    def mergeType(path: String, a: DataType, b: DataType): DataType =
      (a, b) match {
        case (x: StructType, y: StructType) => mergeStruct(path, x, y)
        case (x, y) if x == y => x
        case (_, y) if lenient => y
        case (x, y) => throw new IllegalArgumentException(
          s"schema evolution cannot change column '$path' from $x to $y " +
            "(additive evolution only — write the new column under a new name)")
      }
    def mergeStruct(path: String, a: StructType, b: StructType): StructType = {
      val bByName = b.fields.map(f => f.name -> f).toMap
      val aNames = a.fieldNames.toSet
      val merged = a.fields.map { fa =>
        bByName.get(fa.name) match {
          case Some(fb) => StructField(fa.name,
            mergeType(s"$path${fa.name}", fa.dataType, fb.dataType),
            nullable = fa.nullable || fb.nullable, fa.metadata)
          case None => fa.copy(nullable = true)
        }
      }
      val added = b.fields.filterNot(f => aNames.contains(f.name))
        .map(_.copy(nullable = true))
      StructType(merged ++ added)
    }
    mergeStruct("", oldSchema, newSchema)
  }

  /** The schema base an append's union builds on. For a legacy
    * (pre-union) snapshot the manifest schema is just the last append's
    * — the true base is the mergeSchema fold of the actual files
    * (ONE O(files) planning pass, paid once: this commit writes the
    * healed union and every later read/append is O(1) again). The
    * manifest's types win over directory-inferred partition types
    * (lenient merge, file-union side yielding).
    */
  private def appendSchemaBase(spark: SparkSession, t: String,
                               s: Snapshot): StructType = {
    val manifest = DataType.fromJson(s.schemaJson).asInstanceOf[StructType]
    if (s.unionSchema || s.files.isEmpty) manifest
    else mergeSchemas(
      spark.read.option("mergeSchema", "true").option("basePath", t)
        .parquet(s.files.map(f => s"$t/$f"): _*).schema,
      manifest, lenient = true)
  }

  // -------------------------------------------------------- data skipping

  private val statsMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Per-file column min/max harvested from the parquet FOOTERS of
    * just-staged files — the Delta data-skipping stats, paid once at
    * commit (the footer is local and already hot from the write) and
    * persisted in the manifest so reads prune files without opening
    * them. Covered types: int32/int64 (raw long, incl. date days),
    * float/double, UTF8 strings. Decimals, int96, nested and
    * logical-heavy columns get NO stats — absent stats mean "never
    * pruned", so coverage gaps cost performance, not correctness.
    */
  private def footerStats(table: String, files: Seq[String])
      : Map[String, String] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = new org.apache.hadoop.conf.Configuration()
    files.flatMap { f =>
      try {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(s"$table/$f"), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val footer = r.getFooter.getBlocks.asScala
          var rows = 0L
          // (min, max) per column, merged across row groups; None once a
          // chunk lacks usable stats (partial stats must not under-range)
          val agg = scala.collection.mutable.LinkedHashMap
            .empty[String, Option[(Any, Any)]]
          // per-column null counts (None once any chunk lacks them):
          // rows − nulls is what lets a range COUNT skip fully-contained
          // files without reading them (see countWhere)
          val nullAgg = scala.collection.mutable.LinkedHashMap
            .empty[String, Option[Long]]
          footer.foreach { b =>
            rows += b.getRowCount
            b.getColumns.asScala.foreach { cc =>
              if (cc.getPath.size() == 1) {
                val name = cc.getPath.toDotString
                val pt = cc.getPrimitiveType
                val logical = pt.getLogicalTypeAnnotation
                val supported = pt.getPrimitiveTypeName match {
                  case INT32 | INT64 =>
                    logical == null ||
                      logical.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation] ||
                      logical.isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation]
                  case FLOAT | DOUBLE => true
                  case BINARY =>
                    logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
                  case _ => false
                }
                val st = cc.getStatistics
                // NaN poisons parquet float/double stats (parquet-mr's
                // Math.min/max folds NaN unpredictably): a chunk whose
                // min or max is NaN must mark the column unusable or
                // countWhere would classify files wrongly in BOTH
                // directions and statsMinMax would hide a NaN max
                def statNaN: Boolean = pt.getPrimitiveTypeName match {
                  case FLOAT =>
                    st.genericGetMin.asInstanceOf[java.lang.Float].isNaN ||
                      st.genericGetMax.asInstanceOf[java.lang.Float].isNaN
                  case DOUBLE =>
                    st.genericGetMin.asInstanceOf[java.lang.Double].isNaN ||
                      st.genericGetMax.asInstanceOf[java.lang.Double].isNaN
                  case _ => false
                }
                val usable = supported && st != null && !st.isEmpty &&
                  st.hasNonNullValue && !statNaN
                val nullsKnown = st != null && !st.isEmpty &&
                  st.isNumNullsSet
                nullAgg(name) =
                  (nullAgg.getOrElse(name, Some(0L)), nullsKnown) match {
                    case (Some(acc), true) => Some(acc + st.getNumNulls)
                    case _ => None
                  }
                val cur = agg.getOrElse(name, Some((null, null)))
                agg(name) =
                  if (!usable) None
                  else cur.map { case (lo, hi) =>
                    val (nlo, nhi) = pt.getPrimitiveTypeName match {
                      case INT32 =>
                        (st.genericGetMin.asInstanceOf[Integer].longValue(),
                          st.genericGetMax.asInstanceOf[Integer].longValue())
                      case INT64 =>
                        (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                          st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
                      case FLOAT =>
                        (st.genericGetMin.asInstanceOf[java.lang.Float].doubleValue(),
                          st.genericGetMax.asInstanceOf[java.lang.Float].doubleValue())
                      case DOUBLE =>
                        (st.genericGetMin.asInstanceOf[java.lang.Double].doubleValue(),
                          st.genericGetMax.asInstanceOf[java.lang.Double].doubleValue())
                      case _ =>
                        (st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
                          .toStringUsingUTF8,
                          st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
                            .toStringUsingUTF8)
                    }
                    def lt(a: Any, b: Any): Boolean = (a, b) match {
                      case (x: Long, y: Long) => x < y
                      case (x: Double, y: Double) => x < y
                      case (x: String, y: String) => utf8Lt(x, y)
                      case _ => false
                    }
                    (if (lo == null || lt(nlo, lo)) nlo else lo,
                      if (hi == null || lt(hi, nhi)) nhi else hi)
                  }
              }
            }
          }
          val root = statsMapper.createObjectNode()
          root.put("rows", rows)
          val nullsNode = root.putObject("nulls")
          nullAgg.foreach {
            case (name, Some(n)) => nullsNode.put(name, n); ()
            case _ => ()
          }
          val cols = root.putObject("cols")
          agg.foreach {
            case (name, Some((lo, hi))) if lo != null =>
              val arr = cols.putArray(name)
              Seq(lo, hi).foreach {
                case v: Long => arr.add(v); ()
                case v: Double => arr.add(v); ()
                case v: String => arr.add(v); ()
                case _ => ()
              }
            case _ => ()
          }
          Some(f -> statsMapper.writeValueAsString(root))
        } finally r.close()
      } catch {
        // stats are an optimization: a footer that cannot be read must
        // not fail the commit that references it
        case scala.util.control.NonFatal(_) => None
      }
    }.toMap
  }

  /** Unsigned UTF-8 byte ordering — what parquet binary stats and
    * Spark's UTF8String comparisons both use. Java String `<` compares
    * UTF-16 code units, which DISAGREES for supplementary characters
    * (surrogates 0xD800+ sort above U+E000 there but their UTF-8 bytes
    * 0xF0.. sort above everything) — comparing with it would wrongly
    * prune files whose strings carry emoji.
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Files of `snap` whose stats CANNOT exclude `[lo, hi]` on `colName`
    * — the data-skipping core. Files without stats for the column are
    * kept (conservative).
    */
  private[graft] def pruneFiles(snap: Snapshot, colName: String,
                                lo: Any, hi: Any): Seq[String] = {
    def big(a: Any): Option[BigDecimal] = a match {
      case v: Long => Some(BigDecimal(v))
      case v: Int => Some(BigDecimal(v))
      case v: Double => Some(BigDecimal(v))
      case v: Float => Some(BigDecimal(v.toDouble))
      case _ => None
    }
    snap.files.filter { f =>
      snap.stats.get(f).forall { json =>
        try {
          val node = statsMapper.readTree(json).path("cols").path(colName)
          if (!node.isArray || node.size() != 2) true
          else {
            val (mn, mx) = (node.get(0), node.get(1))
            if (mn.isTextual) {
              (lo, hi) match {
                case (l: String, h: String) =>
                  !(utf8Lt(mx.asText(), l) || utf8Lt(h, mn.asText()))
                case _ => true
              }
            } else (for {
              l <- big(lo); h <- big(hi)
            } yield !(BigDecimal(mx.asText()) < l ||
              BigDecimal(mn.asText()) > h)).getOrElse(true)
          }
        } catch { case scala.util.control.NonFatal(_) => true }
      }
    }
  }

  /** Spark escapes Hive-special chars in partition directory values as
    * %XX — decode exactly that (NOT URLDecoder, whose '+'→space rule
    * would corrupt literal plus signs).
    */
  private def unescapePathName(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // a '%' not followed by two hex digits is a literal '%' (external
      // writers produce e.g. `p=50%off`) — mirror Spark's unescapePathName
      // and append it as-is instead of throwing NumberFormatException
      val hex =
        if (c == '%' && i + 2 < s.length) {
          val hi = Character.digit(s.charAt(i + 1), 16)
          val lo = Character.digit(s.charAt(i + 2), 16)
          if (hi >= 0 && lo >= 0) hi * 16 + lo else -1
        } else -1
      if (hex >= 0) { sb.append(hex.toChar); i += 3 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Hive-style `k=v` partition values carried in a manifest file path. */
  private[graft] def partitionValues(file: String): Map[String, String] =
    file.split('/').dropRight(1).iterator.flatMap { seg =>
      val i = seg.indexOf('=')
      if (i > 0) Some(seg.substring(0, i) -> unescapePathName(seg.substring(i + 1)))
      else None
    }.toMap

  /** Files of `snap` whose partition-DIRECTORY values can match every
    * `filters` entry — the `tansu.lake.partition` read path
    * (`nisshi-schema/src/lake/delta.rs:228-340` partitions the Delta
    * table on configured columns for exactly this listing cut). A file
    * whose layout lacks a filtered column is kept (conservative — the
    * exact predicate still runs on the survivors).
    */
  private[graft] def prunePartitions(snap: Snapshot,
                                     filters: Map[String, String]): Seq[String] =
    snap.files.filter { f =>
      val pv = partitionValues(f)
      filters.forall { case (k, v) => pv.get(k).forall(_ == v) }
    }

  /** Partition-pruned read: list ONLY the files under matching `k=v`
    * directories, then apply the exact equality predicates. At 100 TB a
    * date/tenant-partitioned table turns a full-table listing+scan into
    * a single-directory one — the partition analogue of [[readRange]]'s
    * stats skipping, and like it never TRUSTED for correctness: the
    * filter still runs on every surviving row. Null filter values are
    * refused (Hive's null-partition sentinel is not modeled).
    */
  def readPartition(spark: SparkSession, table: String,
                    filters: Map[String, Any]): DataFrame = {
    require(filters.nonEmpty, "readPartition: empty filter map")
    require(filters.values.forall(_ != null),
      "readPartition: null partition filter value")
    val t = posixTable(table)
    val snap = currentSnapshot(t).getOrElse(
      throw new IllegalArgumentException(s"$t has no _graft_log"))
    val strFilters = filters.map { case (k, v) => k -> v.toString }
    val df = readFiles(spark, t, prunePartitions(snap, strFilters),
      snap.schemaJson)
    filters.foldLeft(df) { case (d, (k, v)) => d.filter(col(k) === lit(v)) }
  }

  /** Data-skipping read: scan only the files whose manifest stats can
    * overlap `[lo, hi]` on `colName` (inclusive), then apply the exact
    * predicate — at 100 TB this is the difference between opening every
    * object and opening the few whose range matters, without trusting
    * the prune for correctness (the filter still runs). Supported
    * domains: integral and floating columns with numeric bounds,
    * string columns with string bounds; anything else scans everything.
    */
  def readRange(spark: SparkSession, table: String, colName: String,
                lo: Any, hi: Any): DataFrame = {
    val t = posixTable(table)
    val snap = currentSnapshot(t).getOrElse(
      throw new IllegalArgumentException(s"$t has no _graft_log"))
    readFiles(spark, t, pruneFiles(snap, colName, lo, hi), snap.schemaJson)
      .filter(col(colName) >= lit(lo) && col(colName) <= lit(hi))
  }

  /** Exact COUNT(*) with ZERO data IO: sum the manifest's per-file row
    * counts; a file whose stats line is missing (pre-stats manifests,
    * unreadable footer at commit) falls back to ONE footer read —
    * still no data pages. The aggregation-pushdown fast path every
    * lakehouse query engine special-cases.
    */
  def countRows(table: String): Long = {
    val t = posixTable(table)
    val snap = currentSnapshot(t).getOrElse(
      throw new IllegalArgumentException(s"$t has no _graft_log"))
    val conf = new org.apache.hadoop.conf.Configuration()
    snap.files.map { f =>
      statsRows(snap, f).getOrElse {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(s"$t/$f"), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally r.close()
      }
    }.sum
  }

  /** Exact COUNT of rows with `lo <= colName <= hi`, scanning only the
    * files the manifest cannot decide: disjoint files contribute 0,
    * files whose [min,max] is CONTAINED in the range contribute
    * `rows − nulls(col)` straight from the stats line (every non-null
    * value matches; the null count is harvested with the min/max), and
    * only straddling or stats-less files are read. On a range-sorted
    * (z-ordered / ingest-ordered) 100 TB table the straddle set is the
    * two boundary files.
    */
  def countWhere(spark: SparkSession, table: String, colName: String,
                 lo: Any, hi: Any): Long =
    countWhereDetail(spark, table, colName, lo, hi)._1

  private[graft] def countWhereDetail(spark: SparkSession, table: String,
                                      colName: String, lo: Any, hi: Any)
      : (Long, Seq[String]) = {
    val t = posixTable(table)
    val snap = currentSnapshot(t).getOrElse(
      throw new IllegalArgumentException(s"$t has no _graft_log"))
    def big(a: Any): Option[BigDecimal] = a match {
      case v: Long => Some(BigDecimal(v))
      case v: Int => Some(BigDecimal(v))
      case v: Double => Some(BigDecimal(v))
      case v: Float => Some(BigDecimal(v.toDouble))
      case _ => None
    }
    // Some(true)=contained, Some(false)=disjoint, None=must scan
    def classify(f: String): Option[Boolean] =
      snap.stats.get(f).flatMap { json =>
        try {
          val node = statsMapper.readTree(json).path("cols").path(colName)
          if (!node.isArray || node.size() != 2) None
          else {
            val (mn, mx) = (node.get(0), node.get(1))
            if (mn.isTextual) (lo, hi) match {
              case (l: String, h: String) =>
                if (utf8Lt(mx.asText(), l) || utf8Lt(h, mn.asText()))
                  Some(false)
                else if (!utf8Lt(mn.asText(), l) && !utf8Lt(h, mx.asText()))
                  Some(true)
                else None
              case _ => None
            } else (for { l <- big(lo); h <- big(hi) } yield {
              val (fmn, fmx) =
                (BigDecimal(mn.asText()), BigDecimal(mx.asText()))
              if (fmx < l || fmn > h) Some(false)
              else if (fmn >= l && fmx <= h) Some(true)
              else None
            }).flatten
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    var fromStats = 0L
    val toScan = scala.collection.mutable.ArrayBuffer.empty[String]
    snap.files.foreach { f =>
      classify(f) match {
        case Some(false) => ()
        case Some(true) =>
          (statsRows(snap, f), statsNulls(snap, f, colName)) match {
            case (Some(r), Some(n)) => fromStats += r - n
            case _ => toScan += f
          }
        case None => toScan += f
      }
    }
    val scanned =
      if (toScan.isEmpty) 0L
      else readFiles(spark, t, toScan.toSeq, snap.schemaJson)
        .filter(col(colName) >= lit(lo) && col(colName) <= lit(hi))
        .count()
    (fromStats + scanned, toScan.toSeq)
  }

  /** MIN/MAX of a column with zero data IO when every file carries
    * stats for it: the table min is the min of file minima (parquet
    * stats cover non-null values only, matching SQL MIN/MAX's null
    * skipping). Returns None when ANY file lacks usable stats — a
    * partial answer could under/over-range, so the caller falls back
    * to a scan, never to a wrong answer. Values come back as (Long |
    * Double | String) matching the harvested domain.
    */
  def statsMinMax(table: String, colName: String): Option[(Any, Any)] = {
    val t = posixTable(table)
    val snap = currentSnapshot(t).getOrElse(
      throw new IllegalArgumentException(s"$t has no _graft_log"))
    def fileMm(f: String): Option[(Any, Any)] =
      snap.stats.get(f).flatMap { json =>
        try {
          val node = statsMapper.readTree(json).path("cols").path(colName)
          if (!node.isArray || node.size() != 2) None
          else {
            val (mn, mx) = (node.get(0), node.get(1))
            if (mn.isTextual) Some((mn.asText(), mx.asText()))
            else if (mn.isIntegralNumber) Some((mn.asLong, mx.asLong))
            else Some((mn.asDouble, mx.asDouble))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Long, y: Long) => x < y
      case (x: Double, y: Double) => x < y
      case (x: String, y: String) => utf8Lt(x, y)
      case _ => false
    }
    val per = snap.files.map(fileMm)
    if (per.isEmpty || per.exists(_.isEmpty)) None
    else Some(per.flatten.reduce { (a, b) =>
      (if (lt(b._1, a._1)) b._1 else a._1,
        if (lt(a._2, b._2)) b._2 else a._2)
    })
  }

  private def statsRows(snap: Snapshot, f: String): Option[Long] =
    snap.stats.get(f).flatMap { json =>
      try {
        val n = statsMapper.readTree(json).path("rows")
        if (n.isIntegralNumber) Some(n.asLong) else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  private def statsNulls(snap: Snapshot, f: String,
                         colName: String): Option[Long] =
    snap.stats.get(f).flatMap { json =>
      try {
        val n = statsMapper.readTree(json).path("nulls").path(colName)
        if (n.isIntegralNumber) Some(n.asLong) else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Transactional OPTIMIZE: rewrite the SNAPSHOT compacted (optionally
    * z-ordered), then CAS-commit (latest − snapshot) + rewritten — files
    * appended concurrently with the rewrite survive in the committed
    * list. Replaced files stay on disk for older readers until
    * [[vacuum]]. Always commits a CHECKPOINT: the commit body is
    * O(table) either way, and resetting the delta chain keeps later
    * appends' folds short.
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
    val t = posixTable(table)
    val snap = currentSnapshot(t).getOrElse(
      throw new IllegalArgumentException(s"$t has no _graft_log"))
    if (snap.files.isEmpty) return snap.version
    // mergeSchema here ON PURPOSE (everywhere else reads the manifest
    // schema): a table whose manifests predate the commit-time schema
    // union can hold columns only its OLDER files carry; a compaction
    // reading the (narrow) manifest schema would rewrite the table
    // without them and the next vacuum would delete the originals.
    // Optimize is rare maintenance — the O(files) footer pass is fine
    // here — and the commit below folds this union INTO the manifest,
    // healing the legacy table for all later O(1)-planned reads.
    val df = spark.read
      .option("mergeSchema", "true")
      .option("basePath", t)
      .parquet(snap.files.map(f => s"$t/$f"): _*)
    // lenient, manifest winning: the file-union side's partition types
    // are directory-inferred guesses; legacy-only columns still survive
    // from the file side
    val healed = mergeSchemas(df.schema,
      DataType.fromJson(snap.schemaJson).asInstanceOf[StructType],
      lenient = true)
    val sized = math.max(1,
      (totalBytes(t, snap.files) /
        (targetFileMB.toLong * 1024 * 1024)).toInt)
    val clustered =
      if (zorderCols.nonEmpty)
        df.withColumn("__z", Lake.zorderKey(df, zorderCols))
          .repartitionByRange(sized, org.apache.spark.sql.functions.col("__z"))
          .drop("__z")
      else df.repartition(sized)
    val rewritten = stageDataFiles(clustered, t, partitionCols)
    // ANY non-success exit below must unstage — the rewrite already sits
    // in the visible layout and an escaping exception (a schema-merge
    // refusal, an I/O error) would otherwise leave plain-reader-visible
    // doubled data until a vacuum's age fence passes
    try {
    // once: the rewritten set never changes across CAS retries
    val rewrittenStats = footerStats(t, rewritten)
    val replaced = snap.files.toSet
    var attempt = 0
    while (attempt < maxRetries) {
      val latest = currentSnapshot(t).get
      // a racing optimize may have replaced PART of our snapshot: it
      // could have read an OLDER snapshot than ours (ours ⊇ theirs plus
      // later appends), so "every replaced file gone" is not the only
      // losing shape. If ANY file we rewrote is missing from latest,
      // some racer already committed a rewrite containing that file's
      // rows — committing ours too would double them. Abandon: drop our
      // staged rewrite and yield. (Appends only ever ADD files, so all
      // replaced files still present ⇒ no optimize beat us and the
      // CAS-serialized commit below removes them atomically.)
      val latestSet = latest.files.toSet
      if (!replaced.forall(latestSet.contains)) {
        unstage(t, rewritten)
        return latest.version
      }
      val kept = latest.files.filterNot(replaced.contains)
      // keep @txn: markers through the rewrite — dropping them would
      // re-open the exactly-once window for every streaming app
      val keptKeys = kept.toSet
      if (tryCommit(t, latest.version + 1,
        Checkpoint(mergeSchemas(healed,
          DataType.fromJson(latest.schemaJson).asInstanceOf[StructType],
          lenient = true).json,
          kept ++ rewritten, "optimize",
          latest.stats.view.filterKeys(k =>
            keptKeys.contains(k) || k.startsWith(TxnKeyPrefix)).toMap ++
            rewrittenStats))) {
        if (purgeReplaced) unstage(t, replaced.toSeq)
        return latest.version + 1
      }
      attempt += 1
    }
    throw new IllegalStateException(s"optimize($t): commit contention")
    } catch {
      // idempotent (skips already-deleted and committed files), so the
      // abandon path above having unstaged already is fine
      case e: Throwable => unstageUncommitted(t, rewritten); throw e
    }
  }

  /** Total data bytes the snapshot references (the compaction trigger's
    * input — file COUNT alone would re-rewrite a large healthy table
    * every maintenance tick).
    */
  def snapshotBytes(table: String, snap: Snapshot): Long =
    totalBytes(posixTable(table), snap.files)

  /** Sum of the snapshot's file sizes (missing files count 0 — a
    * concurrent vacuum may have removed one under an old manifest).
    */
  private def totalBytes(table: String, files: Seq[String]): Long =
    files.map { f =>
      val p = Paths.get(table, f)
      if (Files.exists(p)) Files.size(p) else 0L
    }.sum

  /** Remove data files the latest snapshot doesn't reference, and all
    * manifests before the latest chain's checkpoint (older manifests
    * can't serve any fold the latest version needs).
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
    val t = posixTable(table)
    val snap = currentSnapshot(t).getOrElse(return)
    val live = snap.files.toSet
    val root = Paths.get(t)
    val cutoff = System.currentTimeMillis() - minAgeMs
    val dead = {
      val s = Files.walk(root)
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .filterNot(p => p.startsWith(logDir(t)))
        .filterNot(p => root.relativize(p).iterator().asScala
          .exists(_.toString.startsWith(".")))
        .filter(p => !live.contains(root.relativize(p).toString))
        .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
        .toList
      finally s.close()
    }
    dead.foreach(Files.delete)
    // manifests below the latest chain's checkpoint serve no FOLD — but
    // they still serve the CHANGE FEED: the age fence applies to them
    // exactly as to data files, so a CDC consumer down for less than
    // the retention window can always resume (and one down longer gets
    // changes()'s loud contiguity failure, never a silent gap)
    listVersions(t).filter(_ < snap.checkpointVersion)
      .filter(v =>
        Files.getLastModifiedTime(manifestPath(t, v)).toMillis < cutoff)
      .foreach(v => Files.delete(manifestPath(t, v)))
  }

  // ------------------------------------------------------------------
  // Row-level table operations (Delta DML semantics on the native log:
  // reference `nisshi-schema/src/lake/delta.rs` — delete/merge rewrite
  // only the files that contain affected rows and commit the swap as
  // one atomic version).
  // ------------------------------------------------------------------

  /** `input_file_name()` → table-relative path (the manifest's unit). */
  private def relOf(root: Path, fileUri: String): String = {
    val p =
      if (fileUri.startsWith("file:")) Paths.get(java.net.URI.create(fileUri))
      else Paths.get(fileUri)
    root.relativize(p.toAbsolutePath).toString
  }

  /** Partition columns inferred from the snapshot's file layout
    * (`k=v` directory segments of the first file). DML rewrites must
    * preserve the table's layout even when the caller doesn't pass
    * `partitionCols` — a root-level rewrite under partitioned leaves
    * would give Spark's partition discovery conflicting depths and
    * brick every later read.
    */
  private def detectPartitionCols(snap: Snapshot): Seq[String] =
    snap.files.headOption.toSeq.flatMap { f =>
      f.split('/').dropRight(1).toSeq.flatMap { seg =>
        val i = seg.indexOf('=')
        if (i > 0) Some(seg.substring(0, i)) else None
      }
    }

  /** Shared commit loop for the DML rewrites: CAS a delta that removes
    * `touched` and adds `rewritten`, starting from the `base` snapshot
    * the rewrite was computed against (no re-fold before the first
    * attempt). Returns Some(version) on success, None when the rewrite
    * went stale — a racing rewrite replaced one of our touched files,
    * or (with `strictVersion`) ANY commit landed after `base`: merge's
    * key-uniqueness invariant breaks if a concurrent append inserts a
    * key the scan never saw (Delta's ConcurrentAppendException), so
    * merge recomputes; delete/update keep snapshot-predicate semantics
    * where a concurrent append simply escapes the predicate.
    */
  private def commitRewrite(t: String, base: Snapshot, touched: Seq[String],
                            rewritten: Seq[String], schemaJson: String,
                            op: String, maxRetries: Int,
                            strictVersion: Boolean,
                            extraStats: Map[String, String] = Map.empty)
      : Option[Long] = {
    val touchedSet = touched.toSet
    // once: the rewritten set never changes across CAS retries
    val rewrittenStats = footerStats(t, rewritten)
    var latest = base
    var attempt = 0
    while (attempt < maxRetries) {
      if ((strictVersion && latest.version != base.version) ||
          !touchedSet.subsetOf(latest.files.toSet)) {
        unstage(t, rewritten)
        return None
      }
      if (tryCommit(t, latest.version + 1,
        Delta(schemaJson, rewritten, touched, op,
          addStats = rewrittenStats ++ extraStats,
          unionSchema = base.unionSchema)))
        return Some(latest.version + 1)
      attempt += 1
      latest = currentSnapshot(t).get
    }
    unstage(t, rewritten)
    throw new IllegalStateException(s"$op($t): commit contention")
  }

  /** Shared DML skeleton: fold the snapshot once, hand `compute` the
    * snapshot, the file-tagged target rows, and a touched-files reader
    * (absolute `__file` names → a scan of EXACTLY those files — the
    * rewrite pass must never rescan the snapshot with a filename filter;
    * at scale the discovery scan reads the table once, the rewrite scan
    * only the files being replaced). Stages the rewrite in the table's
    * (detected or given) partition layout, CAS-commits, and recomputes
    * from a fresh snapshot when the commit reports staleness. `compute`
    * returns None when there is nothing to do (no commit).
    */
  private def dmlRewrite(spark: SparkSession, table: String, op: String,
                         partitionCols: Seq[String], maxRetries: Int,
                         strictVersion: Boolean,
                         extraStats: Map[String, String] = Map.empty)(
      compute: (Snapshot, DataFrame, Array[String] => DataFrame) =>
        Option[(Array[String], DataFrame, String)]): Long = {
    val t = posixTable(table)
    val root = Paths.get(t).toAbsolutePath
    var attempt = 0
    while (attempt < maxRetries) {
      val snap = currentSnapshot(t).getOrElse(
        throw new IllegalArgumentException(s"$t has no _graft_log"))
      val target = readSnapshot(spark, t, snap)
        .withColumn("__file", input_file_name())
      // legacy (pre-union) snapshots keep the mergeSchema read here too:
      // a rewrite through the narrow manifest schema would permanently
      // drop columns only the touched files carry
      val touchedReader = (abs: Array[String]) =>
        if (snap.unionSchema)
          readFiles(spark, t, abs.map(relOf(root, _)).toSeq.sorted,
            snap.schemaJson)
        else legacyMergeReadFiles(spark, t,
          abs.map(relOf(root, _)).toSeq.sorted, snap.schemaJson)
      compute(snap, target, touchedReader) match {
        case None => return snap.version
        case Some((touchedAbs, rows, schemaJson)) =>
          val touched = touchedAbs.map(relOf(root, _)).toSeq.sorted
          val parts =
            if (partitionCols.nonEmpty) partitionCols
            else detectPartitionCols(snap)
          val rewritten = stageDataFiles(rows, t, parts)
          commitRewrite(t, snap, touched, rewritten, schemaJson, op,
            maxRetries, strictVersion, extraStats) match {
            case Some(v) => return v
            case None    => attempt += 1 // stale rewrite — recompute
          }
      }
    }
    throw new IllegalStateException(s"$op($t): rewrite contention")
  }

  /** Transactional DELETE WHERE: rewrites ONLY the files that contain a
    * matching row (file-pruned, like Delta's DML — untouched files are
    * carried by reference), then CAS-commits the swap as one version.
    * Rows where the predicate is NULL are kept (SQL DELETE semantics).
    * Returns the committed version — or the current one when nothing
    * matched (no empty commits). The predicate applies to THIS call's
    * snapshot: rows appended concurrently escape it (Delta's
    * WriteSerializable reading of DELETE).
    */
  def delete(spark: SparkSession, table: String, predicate: Column,
             partitionCols: Seq[String] = Nil, maxRetries: Int = 64): Long =
    dmlRewrite(spark, table, "delete", partitionCols, maxRetries,
      strictVersion = false) { (snap, target, touchedFiles) =>
      if (snap.files.isEmpty) None
      else {
        val touchedAbs = target.filter(predicate)
          .select("__file").distinct().collect().map(_.getString(0))
        if (touchedAbs.isEmpty) None
        else {
          val kept = touchedFiles(touchedAbs)
            .filter(not(coalesce(predicate, lit(false))))
          Some((touchedAbs, kept, snap.schemaJson))
        }
      }
    }

  /** Transactional UPDATE ... SET: rewrites only the files containing a
    * matching row; within them, matched rows get `set`'s expressions
    * (evaluated against the OLD row — standard SQL UPDATE: a SET that
    * references an updated column reads its pre-update value) and
    * unmatched rows pass through unchanged. NULL-predicate rows are
    * unmatched. One committed version; returns the current version when
    * nothing matched.
    */
  def update(spark: SparkSession, table: String, predicate: Column,
             set: Map[String, Column], partitionCols: Seq[String] = Nil,
             maxRetries: Int = 64): Long = {
    require(set.nonEmpty, "update requires at least one SET column")
    dmlRewrite(spark, table, "update", partitionCols, maxRetries,
      strictVersion = false) { (snap, target, touchedFiles) =>
      val dataCols = target.columns.toSeq.filterNot(_ == "__file")
      val missing = set.keySet -- dataCols.toSet
      require(missing.isEmpty,
        s"update SET references columns not in the table: $missing")
      if (snap.files.isEmpty) None
      else {
        val touchedAbs = target.filter(predicate)
          .select("__file").distinct().collect().map(_.getString(0))
        if (touchedAbs.isEmpty) None
        else {
          val matched = coalesce(predicate, lit(false))
          // ONE projection over the original row: every SET expression
          // sees pre-update values even when it reads another updated
          // column
          val rewrittenRows = touchedFiles(touchedAbs)
            .select(dataCols.map { c =>
              set.get(c) match {
                // cast to the column's existing type (Delta UPDATE
                // semantics) so a SET can never fork the table schema
                case Some(e) => org.apache.spark.sql.functions
                  .when(matched, e.cast(target.schema(c).dataType))
                  .otherwise(col(c)).as(c)
                case None => col(c)
              }
            }: _*)
          Some((touchedAbs, rewrittenRows, snap.schemaJson))
        }
      }
    }
  }

  /** Transactional MERGE (upsert): source rows REPLACE target rows with
    * the same key (whole-row update) and INSERT when the key is new —
    * in one committed version. Only files containing a matched key are
    * rewritten. The source must carry every table column and at most
    * one row per key (enforced like Delta: multiple matches would make
    * the result order-dependent). Any commit landing between the key
    * scan and the CAS — even a plain append, which could insert a key
    * this scan never saw — makes the rewrite stale; it is recomputed
    * against the fresh snapshot (Delta's ConcurrentAppendException,
    * resolved by retrying instead of surfacing).
    */
  def merge(spark: SparkSession, table: String, source: DataFrame,
            keyCols: Seq[String], partitionCols: Seq[String] = Nil,
            maxRetries: Int = 64): Long =
    mergeApply(spark, table, source, keyCols, partitionCols, maxRetries)

  /** Full MERGE with matched-DELETE and an exactly-once marker — the
    * general form behind [[merge]] and the incremental-view maintainer
    * ([[graft.streaming.Streaming.incrementalAggView]]):
    *
    *  - `deleteCol`: name of a BOOLEAN column on `source` marking rows
    *    whose KEY should be deleted when matched (Delta's WHEN MATCHED
    *    DELETE). Delete-marked rows that match nothing are a no-op;
    *    the column itself never reaches the table.
    *  - `txn`: the (appId, batchId) exactly-once marker, the SAME fence
    *    [[appendStream]] uses — it commits atomically with the rewrite,
    *    so a crash-replayed micro-batch (batchId ≤ the recorded
    *    high-water) is recognized and dropped without touching the
    *    table. A replayed batch whose original application was a no-op
    *    leaves no marker, which is still exactly-once: re-applying a
    *    no-op is a no-op.
    *
    * Everything else matches [[merge]]: one row per key in the source,
    * only files containing a matched key are rewritten, one committed
    * version, concurrent commits force a recompute.
    */
  def mergeApply(spark: SparkSession, table: String, source: DataFrame,
                 keyCols: Seq[String], partitionCols: Seq[String] = Nil,
                 maxRetries: Int = 64, deleteCol: Option[String] = None,
                 txn: Option[(String, Long)] = None): Long = {
    require(keyCols.nonEmpty, "merge requires at least one key column")
    deleteCol.foreach(dc => require(source.columns.contains(dc),
      s"merge deleteCol '$dc' is not a column of the source"))
    val txnStats = txn
      .map { case (a, b) => Map(TxnKeyPrefix + a -> b.toString) }
      .getOrElse(Map.empty[String, String])
    dmlRewrite(spark, table, "merge", partitionCols, maxRetries,
      strictVersion = true, extraStats = txnStats) { (snap, target, touchedFiles) =>
      // exactly-once gate, re-checked on every stale-rewrite recompute:
      // the fresh snapshot may carry a marker a racer (or the crashed
      // first run of this very batch) committed
      val replay = txn.exists { case (a, b) =>
        snap.stats.get(TxnKeyPrefix + a).exists(_.toLong >= b)
      }
      if (replay) None
      else {
        val dataCols = target.columns.toSeq.filterNot(_ == "__file")
        val dupKeys = source.groupBy(keyCols.map(col): _*).count()
          .filter(col("count") > 1).limit(1).count()
        require(dupKeys == 0,
          s"merge source has multiple rows for one (${keyCols.mkString(",")})")
        // ALL source keys touch files (a delete-marked key must find its
        // file); only non-delete rows contribute replacement/insert rows.
        // The select aligns the source to the table's column order and
        // fails loudly when a table column is missing from the source.
        val srcKeys = source.select(keyCols.map(col): _*).distinct()
        val srcLive = (deleteCol match {
          case Some(dc) => source.filter(not(coalesce(col(dc), lit(false))))
          case None => source
        }).select(dataCols.map(col): _*)
        val touchedAbs =
          if (snap.files.isEmpty) Array.empty[String]
          else target.join(srcKeys, keyCols, "left_semi")
            .select("__file").distinct().collect().map(_.getString(0))
        val upserted =
          if (touchedAbs.isEmpty) srcLive
          else touchedFiles(touchedAbs)
            .join(srcKeys, keyCols, "left_anti")
            .unionByName(srcLive)
        if (touchedAbs.isEmpty && srcLive.isEmpty) None
        else Some((touchedAbs, upserted, upserted.schema.json))
      }
    }
  }

  /** One log entry as [[history]] reports it. */
  final case class Commit(version: Long, op: String, isCheckpoint: Boolean,
                          adds: Int, removes: Int)

  /** The table's commit log, oldest first (Delta's DESCRIBE HISTORY).
    * Checkpoint entries report their full file count as `adds`.
    */
  def history(table: String): Seq[Commit] = {
    val t = posixTable(table)
    listVersions(t).map { v =>
      readManifest(t, v) match {
        case Checkpoint(_, files, op, _, _) => Commit(v, op, isCheckpoint = true,
          files.size, 0)
        case Delta(_, a, r, op, _, _) => Commit(v, op, isCheckpoint = false,
          a.size, r.size)
      }
    }
  }

  /** Row-level change feed for versions in (fromVersion, toVersion] —
    * the Delta CDF shape: the table's columns plus `_change_type`
    * ('insert' | 'delete'; an update appears as delete+insert) and
    * `_commit_version`. OPTIMIZE commits are skipped by their op tag;
    * untagged (legacy) rewrites fall back to the generic row diff,
    * which is empty for a pure rewrite by construction. Requires the
    * window's files and manifests to still exist — run before a vacuum
    * crosses it; missing history fails loudly rather than returning a
    * silently short feed.
    */
  def changes(spark: SparkSession, table: String,
              fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion > toVersion $toVersion")
    val t = posixTable(table)
    val cur = currentSnapshot(t).getOrElse(
      throw new IllegalArgumentException(s"$t has no _graft_log"))
    val window = listVersions(t).filter(v => v > fromVersion && v <= toVersion)
    // CONTIGUITY: every version in (from, to] must still have its
    // manifest. A vacuumed gap would otherwise just not appear in the
    // window and its rows would silently vanish from the feed — a
    // lagging consumer resuming across an optimize+vacuum would
    // permanently diverge with no failure signal. Loud beats short.
    val missing = ((fromVersion + 1) to toVersion).filterNot(window.contains)
    if (missing.nonEmpty) throw new IllegalStateException(
      s"$t: change feed ($fromVersion, $toVersion] is missing manifests " +
        s"${missing.mkString(",")} — history was vacuumed past this " +
        "consumer; re-seed it from a fresh snapshot (or lengthen the " +
        "vacuum age fence beyond the longest consumer outage)")
    val empty = readFiles(spark, t, Nil, cur.schemaJson)
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(0L))
    window.foldLeft(empty) { (acc, v) =>
      val m = readManifest(t, v)
      // op check FIRST: a skippable optimize checkpoint must not fold
      // v-1 — right after a maintenance optimize+vacuum, v-1's manifest
      // is gone and the fold would crash a CDC consumer resuming from
      // exactly the checkpoint boundary
      if (m.op == "optimize") acc
      else {
      val (adds, removes) = m match {
        case Delta(_, a, r, _, _, _) => (a, r)
        case Checkpoint(_, files, _, _, _) =>
          if (v == 0) (files, Seq.empty[String])
          else {
            val prev = foldTo(t, v - 1)
            (files.diff(prev.files), prev.files.diff(files))
          }
      }
      if (adds.isEmpty && removes.isEmpty) acc
      else {
        val addedRows = readFiles(spark, t, adds, m.schemaJson,
          ignoreMissing = false)
        val removedRows = readFiles(spark, t, removes, m.schemaJson,
          ignoreMissing = false)
        // schema-evolution-tolerant alignment: both sides projected to
        // the union of their columns (absent -> NULL) so exceptAll is
        // well-typed across an evolving window
        val allCols = (addedRows.columns ++ removedRows.columns)
          .distinct.sorted.toSeq
        def aligned(df: DataFrame) = df.select(allCols.map(c =>
          (if (df.columns.contains(c)) col(c) else lit(null)).as(c)): _*)
        val a = aligned(addedRows)
        val r = aligned(removedRows)
        val ins = (if (removes.isEmpty) a else a.exceptAll(r))
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(v))
        val del = (if (adds.isEmpty) r else r.exceptAll(a))
          .withColumn("_change_type", lit("delete"))
          .withColumn("_commit_version", lit(v))
        acc.unionByName(ins.unionByName(del),
          allowMissingColumns = true)
      }
      }
    }
  }

  /** Incremental change-feed poll — the consumer loop primitive over
    * [[changes]]: given the last version a consumer has applied,
    * returns (latest committed version, the row-level feed for
    * everything after it). A caller persists the returned version as
    * its checkpoint and calls again on its trigger interval; no new
    * commits → (same version, empty feed) with ZERO Spark jobs (the
    * version probe is a directory listing). This is the micro-batch CDC
    * source shape — at scale the poll cost is the log listing, never a
    * table scan.
    */
  def changesSince(spark: SparkSession, table: String,
                   lastVersion: Long): (Long, DataFrame) = {
    val cur = currentSnapshot(table).getOrElse(
      throw new IllegalArgumentException(s"$table has no _graft_log"))
    if (cur.version <= lastVersion)
      (lastVersion,
        readFiles(spark, posixTable(table), Nil, cur.schemaJson)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(0L)))
    else (cur.version, changes(spark, table, lastVersion, cur.version))
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      val all = try s.iterator().asScala.toList finally s.close()
      all.reverse.foreach(Files.delete)
    }
}
