package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the salting pattern: a handful of
  * keys carrying most of the rows turn one reducer into the stage's
  * straggler, because a hash shuffle sends EVERY row of a key to one
  * task. Salting splits each key into `salts` sub-keys for a first
  * partial aggregate, then re-aggregates the tiny per-salt results by
  * the real key — the straggler's work fans out `salts`-ways while the
  * second stage only touches |keys|·salts rows.
  *
  * The salt must be DETERMINISTIC per row (here: a hash of the whole
  * row's disambiguating column, not rand()) so reruns and retried
  * tasks land rows on the same salt — nondeterministic salts break
  * Spark's task-retry exactly-once contract for shuffles.
  *
  * Only algebraic aggregates decompose this way (count/sum/min/max —
  * two-level reassembly is exact); the results are bit-identical to
  * the unsalted aggregate, which is what the oracle checks.
  */
object Skew {

  /** Per-key count + sum over `valueCol`, salted `salts`-ways on a
    * deterministic hash of `saltBy`. Returns (keyCol, n, total).
    */
  def saltedAggregate(df: DataFrame, keyCol: String, valueCol: String,
                      saltBy: String, salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    df.withColumn("__salt", pmod(hash(col(saltBy)), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
  }

  /** Skew-safe equi-join of a hot-keyed fact table against a small(ish)
    * dimension: the fact side salts `salts`-ways on a deterministic
    * row hash, the dim side REPLICATES each row once per salt, and the
    * join runs on (key, salt) — a hot key's rows spread over `salts`
    * tasks instead of one straggler, at the cost of `salts`× the dim
    * (which is why the dim side must be the small one; for a dim small
    * enough to broadcast outright, `broadcast()` beats salting — this
    * is the tool for the awkward middle where the dim exceeds the
    * broadcast ceiling but the fact key is hot). Row-identical to the
    * plain join: every fact row still meets every dim row of its key
    * exactly once (the oracle checks the joined aggregate bit-for-bit;
    * the spec checks row multiset equality). AQE's runtime skew-join
    * handles SORT-MERGE skew the same way adaptively; the explicit
    * form covers hash joins, deterministic tests, and engines/plans
    * AQE does not reach.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBy: String, salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val saltedFact = fact
      .withColumn("__salt", pmod(hash(col(saltBy)), lit(salts)))
    val replicatedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe per-key top-k — the window analogue of [[saltedAggregate]]:
    * `row_number().over(Window.partitionBy(key))` sends EVERY row of a
    * key to one task and sorts it there, so a hot key (the operator's own
    * premise in quota sampling) is a single straggler sorting billions of
    * rows to keep k. Two phases instead: rank within the
    * `(key, pmod(hash(saltBy), salts))` cell and keep k per cell (the
    * true top-k rows each rank ≤ k inside their own cell, so all of them
    * survive), then rank the ≤ salts·k survivors per key with the SAME
    * total order. The final window sees a bounded relation regardless of
    * key skew, and the emitted rank is bit-identical to the one-window
    * form because `ordering` is a total order within a key.
    *
    * `ordering` MUST be total per key (e.g. deterministic hash + id
    * tie-break) — a partial order would make both forms nondeterministic.
    */
  def saltedTopK(df: DataFrame, keyCol: Column, ordering: Seq[Column],
                 k: Int, saltBy: Column, salts: Int = 16,
                 rankCol: String = "rank"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(salts > 0, s"salts must be positive: $salts")
    val cellW = Window.partitionBy(keyCol, col("__salt"))
      .orderBy(ordering: _*)
    val keyW = Window.partitionBy(keyCol).orderBy(ordering: _*)
    df.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
      .withColumn("__cell_rank", row_number().over(cellW))
      .filter(col("__cell_rank") <= k)
      .drop("__salt", "__cell_rank")
      .withColumn(rankCol, row_number().over(keyW))
      .filter(col(rankCol) <= k)
  }
}
