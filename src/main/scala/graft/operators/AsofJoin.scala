package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** General as-of join — each probe row matched to the temporally
  * nearest state row for the same key (backward: latest state at or
  * before the probe's timestamp; forward: earliest at or after).
  *
  * The classic engines (kdb+ `aj`, QuestDB/DuckDB `ASOF JOIN`, pandas
  * `merge_asof`) ship this as a primitive; Spark does not, and the
  * naive range-join spelling (`s.ts <= p.ts` + keep-max) explodes to
  * O(probe × state-history) intermediate rows per key. This operator
  * uses the union-and-carry shape instead: tag both sides, union them,
  * and run ONE per-key ordered window where `last(_, ignoreNulls)`
  * carries the most recent state payload forward onto each probe row.
  *
  * Scale shape (the reason this form wins at 100 TB): exactly one
  * shuffle — both sides hash-partition on the key — and one per-key
  * sort; no join explosion, no broadcast requirement on either side,
  * and AQE coalesces the post-union partitions. A hot key serializes
  * into one task (inherent: as-of needs that key's full ordered
  * history), which matches the keyed-window cost model of every other
  * per-key operator here.
  *
  * Semantics pinned by spec + the q_asof_join oracle (DuckDB ASOF
  * LEFT JOIN):
  *   - left-outer: probe rows with no qualifying state row keep NULL
  *     state columns;
  *   - `allowEqual=false` excludes state rows at exactly the probe
  *     timestamp (strict `<` / `>`);
  *   - `toleranceMs` (timestamp columns only) voids matches farther
  *     than the tolerance from the probe — the pandas `tolerance`
  *     contract;
  *   - state rows must be unique per (key, ts): with duplicates the
  *     carried payload is sort-order-dependent. Callers aggregate
  *     first (as q_asof_join does with max_by).
  */
object AsofJoin {

  /** Latest state at-or-before each probe row (kdb+ `aj` direction).
    *
    * @param probe     left side; every column is kept in the output
    * @param state     right side; its non-key, non-ts columns are
    *                  appended (NULL when no state qualifies)
    * @param keyCols   equi-key shared by both sides
    * @param probeTs   probe timestamp column name
    * @param stateTs   state timestamp column name (may equal probeTs)
    */
  def asofBackward(probe: DataFrame, state: DataFrame, keyCols: Seq[String],
                   probeTs: String, stateTs: String,
                   allowEqual: Boolean = true,
                   toleranceMs: Option[Long] = None): DataFrame =
    asof(probe, state, keyCols, probeTs, stateTs, allowEqual, toleranceMs,
      forward = false)

  /** Earliest state at-or-after each probe row (pandas
    * `direction="forward"`).
    */
  def asofForward(probe: DataFrame, state: DataFrame, keyCols: Seq[String],
                  probeTs: String, stateTs: String,
                  allowEqual: Boolean = true,
                  toleranceMs: Option[Long] = None): DataFrame =
    asof(probe, state, keyCols, probeTs, stateTs, allowEqual, toleranceMs,
      forward = true)

  private def asof(probe: DataFrame, state: DataFrame, keyCols: Seq[String],
                   probeTs: String, stateTs: String, allowEqual: Boolean,
                   toleranceMs: Option[Long], forward: Boolean): DataFrame = {
    val stateVals = state.columns.toSeq
      .filterNot(c => keyCols.contains(c) || c == stateTs)
    val clash = stateVals.toSet.intersect(probe.columns.toSet)
    require(clash.isEmpty,
      s"asof join: state payload columns collide with probe columns: " +
        s"$clash — rename one side first")
    require(keyCols.nonEmpty, "asof join requires at least one key column")

    // probe rows ride the union as one struct so the state side needs
    // no knowledge of the probe schema (and vice versa). The state side
    // ALSO rides as one struct: the carry must be atomic — per-column
    // last(ignoreNulls) would stitch values from DIFFERENT state rows
    // whenever a payload value is NULL (the matched row's NULL would be
    // "filled" from an older row), diverging from the row-wise ASOF
    // contract. A struct is non-null whenever the state row exists, so
    // one last() carries the whole matched row, NULL fields included.
    val probeStruct = StructType(probe.schema.fields)
    val stateStruct = StructType(
      state.schema(stateTs).copy(name = "__mts") +:
        stateVals.map(c => state.schema(c)).toArray[
          org.apache.spark.sql.types.StructField])
    // at equal timestamps the state row must sort BEFORE the probe row
    // for the carry to see it (allowEqual), AFTER it to be invisible
    // (strict). The probe side is fixed at 1; backward scans ascending
    // (before = smaller side), forward scans descending (before =
    // larger side), so the state's side key flips with the direction.
    val stateOrd = if (allowEqual ^ forward) 0 else 2
    val pRows = probe.select(
      keyCols.map(col) ++ Seq(
        col(probeTs).as("__ts"), lit(1).as("__side"),
        struct(probe.columns.map(col).toSeq: _*).as("__p"),
        lit(null).cast(stateStruct).as("__sv")): _*)
    // a NULL-ts state row can never satisfy the ordering inequality
    // (SQL comparison semantics — DuckDB ASOF drops it too)
    val sRows = state.filter(col(stateTs).isNotNull).select(
      keyCols.map(col) ++ Seq(
        col(stateTs).as("__ts"), lit(stateOrd).as("__side"),
        lit(null).cast(probeStruct).as("__p"),
        struct(col(stateTs).as("__mts") +: stateVals.map(col): _*)
          .as("__sv")): _*)

    val ord =
      if (forward) Seq(col("__ts").desc, col("__side").desc)
      else Seq(col("__ts").asc, col("__side").asc)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = pRows.unionByName(sRows)
      .withColumn("__m", last(col("__sv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    // a tolerance voids the match but keeps the probe row (left-outer
    // with NULL state — pandas merge_asof semantics)
    val within = toleranceMs match {
      case None => lit(true)
      case Some(ms) =>
        val gapUs =
          if (forward) unix_micros(col("__m.__mts")) - unix_micros(col("__ts"))
          else unix_micros(col("__ts")) - unix_micros(col("__m.__mts"))
        gapUs <= lit(ms) * 1000L
    }
    // a NULL-ts probe can satisfy no ordering inequality either
    val matched = col("__m").isNotNull && col("__ts").isNotNull && within
    carried.select(
      col("__p.*") +:
        stateVals.map(c => when(matched, col(s"__m.$c")).as(c)): _*)
  }
}
