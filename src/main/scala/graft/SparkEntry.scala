package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.LogOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY §2 (or a
  * training-data op) exercised over the driver testdata; [[oracleSql]] holds
  * the equivalent DuckDB SQL over the same parquet tables. Column names are
  * aligned on both sides (the driver sorts columns by name before hashing).
  *
  * Numeric policy: money aggregates are computed in DECIMAL (deterministic,
  * order-independent — a float sum would depend on Spark's partition
  * ordering) and emitted as DOUBLE, which both engines round identically.
  * Timestamps are emitted as epoch microseconds (unix_micros / epoch_us) to
  * avoid ns/µs unit skew between Spark and DuckDB parquet readers.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** Silence the expected single-partition warnings from the DELIBERATE
    * tiny-table global windows (cell/bucket/domain tables in
    * tokenBudget, shuffleRank, mixtureWeights, epochSchedule,
    * curriculumOrder offsets): correct by construction there, and
    * hundreds of copies train readers to ignore the one instance that
    * would matter. Shared by the Verify and Bench mains so the two
    * entry points cannot drift; PlanSpec still pins that no
    * CORPUS-scale window is global.
    */
  def silenceExpectedWindowWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  // ---------------------------------------------------------------- helpers

  /** Log view over events: topic/partition/offset/timestamp/key/value. */
  private def log(s: SparkSession, dir: String): DataFrame = Tables.log(s, dir)

  private[graft] def dec(c: String) = col(c).cast("decimal(18,2)")

  // ---------------------------------------------------------------- queries

  /** TPC-H Q1-style pricing summary — A-series aggregate baseline
    * (SURVEY §2.4; exercises partial aggregation + decimal arithmetic). */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum((dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("decimal(28,4)")).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** P1+P2+A4/W1 — offset-range fetch with running byte budget per
    * partition (reference `pg/record_fetch.sql:26,47`). */
  def qFetchBudget(s: SparkSession, dir: String): DataFrame =
    LogOps.fetchWithByteBudget(log(s, dir), fetchOffset = 100L, maxBytes = 200L)
      .select(col("partition"), col("offset"), col("val_len"), col("running_bytes"))

  /** A1 — per-partition watermarks (reference `sql/watermark_select.sql`). */
  def qWatermarks(s: SparkSession, dir: String): DataFrame =
    LogOps.watermarks(log(s, dir))
      .select(col("partition"), col("low_watermark"), col("high_watermark"),
        col("record_count"))

  /** A5/O1 — earliest/latest offset + timestamp per partition. */
  def qEarliestLatest(s: SparkSession, dir: String): DataFrame =
    LogOps.earliestLatest(log(s, dir))
      .select(col("partition"), col("earliest_offset"),
        unix_micros(col("earliest_ts")).as("earliest_us"),
        col("latest_offset"),
        unix_micros(col("latest_ts")).as("latest_us"))

  /** J4 — as-of timestamp → first offset lookup. */
  def qOffsetForTimestamp(s: SparkSession, dir: String): DataFrame =
    LogOps.offsetForTimestamp(log(s, dir), lit("2024-01-05 00:00:00").cast("timestamp"))
      .select(col("partition"), col("offset_for_ts"))

  /** P3 — batch-straddle: greatest offset <= fetch position per partition. */
  def qStraddle(s: SparkSession, dir: String): DataFrame =
    LogOps.straddleStart(log(s, dir), fetchOffset = 5000L)
      .select(col("partition"), col("batch_start"))

  /** A3/J2/T8 — log compaction: keep latest record per key per partition. */
  def qCompact(s: SparkSession, dir: String): DataFrame =
    LogOps.compact(log(s, dir))
      .select(col("partition"), col("key"), col("offset"), col("value"))

  /** J1 — catalog-style equi-join + top-k: revenue per order over
    * customer⋈orders⋈lineitem, deterministic tie-break on orderkey.
    *
    * Join ORDER is the 100x story: thin orders through the
    * segment-filtered customer join FIRST, then touch the fact once on
    * orderkey — the (l⋈o)⋈c order shuffles the fact on orderkey, then
    * custkey, then orderkey again for the groupBy once the dims outgrow
    * the broadcast gate (measured exp 1.20/decade at 100x-sf0.1; this
    * order keeps the fact to its one orderkey shuffle, which the
    * groupBy reuses). At test scale both orders plan the same
    * all-broadcast shape.
    */
  def q3TopRevenue(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.load(s, dir, "orders")
    val l = Tables.load(s, dir, "lineitem")
    val oc = o.join(graft.ops.Hints.broadcastIfSmall(c),
      o("o_custkey") === c("c_custkey"))
    l.join(oc, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum((dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .cast("decimal(28,4)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** J1 — multi-way broadcast join: revenue by nation (TPC-H Q5 style).
    * Same join-order rule as q3: orders thin through the customer join
    * first, so past the broadcast gate the FACT shuffles once
    * (orderkey) instead of twice (orderkey then custkey); supplier —
    * region-constant per-SF share, far under the gate even at 100x —
    * broadcasts onto the joined rows.
    */
  def q5NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = Tables.load(s, dir, "nation")
    val cst = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    val l = Tables.load(s, dir, "lineitem")
    val sup = Tables.load(s, dir, "supplier")
    val oc = o.join(graft.ops.Hints.broadcastIfSmall(cst),
      o("o_custkey") === cst("c_custkey"))
    l.join(oc, l("l_orderkey") === o("o_orderkey"))
      .join(graft.ops.Hints.broadcastIfSmall(sup), l("l_suppkey") === sup("s_suppkey") &&
        cst("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum((dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .cast("decimal(28,4)")).cast("double").as("revenue"))
  }

  /** A6/T4 — idempotent-producer duplicate-sequence detection over a
    * synthesized (producer_id, base_sequence) assignment. */
  def qDupSequences(s: SparkSession, dir: String): DataFrame = {
    val withProducer = log(s, dir)
      .withColumn("producer_id", col("key") % 4)
      .withColumn("producer_epoch", lit(0))
      .withColumn("base_sequence", (col("offset") % 97).cast("int"))
    LogOps.duplicateSequences(withProducer)
      .select(col("partition"), col("producer_id"), col("base_sequence"),
        col("offset"), col("dup_rank"))
  }

  // ------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q_fetch_budget" -> (qFetchBudget _),
    "q_watermarks" -> (qWatermarks _),
    "q_earliest_latest" -> (qEarliestLatest _),
    "q_offset_for_ts" -> (qOffsetForTimestamp _),
    "q_straddle" -> (qStraddle _),
    "q_compact" -> (qCompact _),
    "q3_top_revenue" -> (q3TopRevenue _),
    "q5_nation_revenue" -> (q5NationRevenue _),
    "q_dup_sequences" -> (qDupSequences _)
  ) ++ TrainingQueries.queries ++ SchemaQueries.queries ++
    RelationalQueries.queries ++ TpchQueries.queries

  /** DuckDB oracle SQL. The log view is inlined as a CTE:
    * partition = event_id % 8, offset = event_id, key = user_id,
    * value = props, timestamp = events.ts truncated to µs.
    */
  private val logCte =
    """WITH log AS (
      |  SELECT event_id % 8 AS "partition", event_id AS "offset",
      |         CAST(ts AS TIMESTAMP) AS "timestamp", user_id AS "key",
      |         props AS "value", strlen(props) AS val_len
      |  FROM events)
      |""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_fetch_budget" -> (logCte +
      """SELECT "partition", "offset", val_len, running_bytes FROM (
        |  SELECT "partition", "offset", val_len,
        |    CAST(SUM(val_len) OVER (PARTITION BY "partition" ORDER BY "offset"
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_bytes
        |  FROM log WHERE "offset" >= 100)
        |WHERE running_bytes - val_len < 200""".stripMargin),

    "q_watermarks" -> (logCte +
      """SELECT "partition", MIN("offset") AS low_watermark,
        |  MAX("offset") + 1 AS high_watermark, COUNT(*) AS record_count
        |FROM log GROUP BY "partition"""".stripMargin),

    "q_earliest_latest" -> (logCte +
      """SELECT "partition",
        |  MIN("offset") AS earliest_offset,
        |  epoch_us(arg_min("timestamp", "offset")) AS earliest_us,
        |  MAX("offset") AS latest_offset,
        |  epoch_us(arg_max("timestamp", "offset")) AS latest_us
        |FROM log GROUP BY "partition"""".stripMargin),

    "q_offset_for_ts" -> (logCte +
      """SELECT "partition", MIN("offset") AS offset_for_ts
        |FROM log WHERE "timestamp" >= TIMESTAMP '2024-01-05 00:00:00'
        |GROUP BY "partition"""".stripMargin),

    "q_straddle" -> (logCte +
      """SELECT "partition", MAX("offset") AS batch_start
        |FROM log WHERE "offset" <= 5000 GROUP BY "partition"""".stripMargin),

    "q_compact" -> (logCte +
      """SELECT "partition", "key", "offset", "value" FROM (
        |  SELECT "partition", "key", "offset", "value",
        |    ROW_NUMBER() OVER (PARTITION BY "partition", "key"
        |      ORDER BY "offset" DESC) AS rn
        |  FROM log) WHERE rn = 1 OR "key" IS NULL""".stripMargin),

    "q3_top_revenue" ->
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    "q_dup_sequences" -> (logCte +
      // the WHERE "key" IS NOT NULL mirrors the operator's
      // producer_id >= 0 eligibility filter (NULL-excluding in Spark):
      // non-idempotent rows are out of scope for the duplicate check
      """SELECT "partition", producer_id, base_sequence, "offset", dup_rank FROM (
        |  SELECT "partition", "key" % 4 AS producer_id,
        |    CAST("offset" % 97 AS INT) AS base_sequence, "offset",
        |    ROW_NUMBER() OVER (PARTITION BY "partition", "key" % 4, "offset" % 97
        |      ORDER BY "offset") AS dup_rank
        |  FROM log WHERE "key" IS NOT NULL) WHERE dup_rank > 1""".stripMargin)
  ) ++ TrainingQueries.oracleSql ++ SchemaQueries.oracleSql ++
    RelationalQueries.oracleSql ++ TpchQueries.oracleSql
}
