package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
