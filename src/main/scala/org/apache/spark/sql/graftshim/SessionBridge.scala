package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{classic, DataFrame, SparkSession}

/** Re-root a DataFrame onto a sibling SparkSession of the same
  * SparkContext — the `private[sql]` hop an op needs to run an
  * iterative loop under ITS OWN SQL conf (shuffle width, AQE) without
  * mutating the caller's session (the r15 verdict's concurrency
  * finding: `conf.set` inside an op leaks the pin to every query
  * another thread compiles on the shared session during the loop).
  *
  * Semantics: the logical plan moves verbatim; execution (analysis,
  * planning, conf lookups) happens on the TARGET session. Cached data
  * is unaffected — the CacheManager lives in SharedState, which
  * sibling sessions share, so plan-keyed cache hits survive the hop in
  * both directions.
  */
object SessionBridge {

  def transplant(df: DataFrame, to: SparkSession): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    classic.Dataset.ofRows(to.asInstanceOf[classic.SparkSession],
      cdf.queryExecution.logical)
  }

  /** A child session that STARTS AS the parent (every runtime SQL conf
    * copied — newSession alone resets runtime-set keys like the
    * parquet nanos flag back to builder defaults) and can then be
    * pinned privately. Keys a given build rejects (static confs) are
    * skipped — they cannot differ between siblings anyway.
    */
  def childSessionLike(parent: SparkSession): SparkSession = {
    val s = parent.newSession()
    parent.conf.getAll.foreach { case (k, v) =>
      try s.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => }
    }
    s
  }
}
