package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hint for SF-PROPORTIONAL build sides.
  *
  * The TPC-H dimension tables (customer, supplier, part) and every
  * aggregate derived from them scale LINEARLY with the fact tables: a
  * forced `broadcast()` is exactly right at the graded scale factors
  * but OVERRIDES Catalyst's size check, so at a true 100-TB scale
  * factor the build side OOMs the executors instead of degrading to a
  * shuffle join (round-12 verdict, q8_market_share as exemplar).
  *
  * [[broadcastIfSmall]] hints only when Catalyst's own size estimate
  * for the side is within the session's
  * `spark.sql.autoBroadcastJoinThreshold`; otherwise it returns the
  * side un-hinted and defers to AQE, whose runtime statistics still
  * pick a broadcast join whenever the side truly fits at execution
  * time. The hint's job is therefore only to PIN the plan where the
  * source estimate already proves the side small — mid-plan estimate
  * inflation (post-join stats multiply) can otherwise flip a provably
  * small side to a shuffle join.
  *
  * `nation`/`region` (constant 25/5 rows at every scale factor) and
  * 1-row scalar aggregates keep their unconditional `broadcast()` —
  * they are broadcastable by construction, no gate needed.
  */
object Hints {

  /** Session threshold in bytes; -1 (or any non-positive value) means
    * the user disabled auto-broadcast — respect that and never hint.
    */
  private def thresholdBytes(df: DataFrame): Long = {
    val raw = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    try raw.toLong
    catch {
      case _: NumberFormatException =>
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
    }
  }

  /** Broadcast-hint `df` iff Catalyst's size estimate clears the
    * session's auto-broadcast threshold; otherwise defer to AQE.
    */
  def broadcastIfSmall(df: DataFrame): DataFrame = {
    val threshold = thresholdBytes(df)
    if (threshold > 0 &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes <=
        BigInt(threshold)) broadcast(df)
    else df
  }
}
