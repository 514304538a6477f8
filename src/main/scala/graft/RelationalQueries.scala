package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, LogOps, RangeJoin}
import graft.ops.Similarity

/** Set-operation / join-breadth / offset-semantics queries
  * (SURVEY §2.3 J-series edge shapes, §2.5 O/SO-series, A2).
  */
object RelationalQueries {

  /** Semi-join (EXISTS): customers having at least one open order. */
  def qExists(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
  }

  /** Anti-join (NOT EXISTS): customers with no high-value order. */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 150000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_acctbal")
  }

  /** SO1 — distinct key-set per partition (compaction head cardinality). */
  def qDistinctKeys(s: SparkSession, dir: String): DataFrame =
    Tables.log(s, dir)
      .groupBy(col("partition"))
      .agg(countDistinct(col("key")).as("n_keys"),
        count(lit(1)).as("n_records"))

  /** O1 — global order-by-offset limit (earliest-100 scan). */
  def qOrderLimit(s: SparkSession, dir: String): DataFrame =
    Tables.log(s, dir)
      .orderBy(col("offset"))
      .select(col("offset"), col("partition"), col("event_type"))
      .limit(100)

  /** SO2/SO3 — set difference over per-partition offset residues (the
    * key-set diff shape used by schema-evolution column diffs and
    * subscription unions).
    */
  def qSetDiff(s: SparkSession, dir: String): DataFrame = {
    val log = Tables.log(s, dir)
    val p0 = log.filter(col("partition") === 0)
      .select((col("offset") % 1000).as("residue")).distinct()
    val p1 = log.filter(col("partition") === 1)
      .select((col("offset") % 1000).as("residue")).distinct()
    p0.exceptAll(p1)
  }

  /** A2 — last stable offset: min open-txn start caps the high watermark
    * per partition (reference `sql/watermark_select_stable.sql:16-40`).
    */
  def qLastStable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val txns = Seq(
      (0, 100L, 900L, "Begin"), (0, 400L, 800L, "Committed"),
      (1, 2000L, 2500L, "Begin"), (2, 3000L, 3100L, "Aborted"),
      (3, 50L, 60L, "Begin"), (3, 40L, 45L, "Begin"))
      .toDF("partition", "offset_start", "offset_end", "state")
    val wm = Tables.log(s, dir).groupBy(col("partition"))
      .agg((max(col("offset")) + 1).as("high_watermark"))
    val open = txns.filter(col("state") === "Begin")
      .groupBy(col("partition"))
      .agg(min(col("offset_start")).as("min_open_start"))
    wm.join(open, Seq("partition"), "left")
      .withColumn("last_stable",
        least(coalesce(col("min_open_start"), col("high_watermark")),
          col("high_watermark")))
      .select("partition", "high_watermark", "last_stable")
  }

  /** P4+P8/T5 — read-committed visibility replayed purely from the log:
    * synthesize transactional producers and commit/abort control markers
    * over the event log (pid = key%4, every 50th offset per the raw
    * stream is a marker, every third marker aborts), then a record is
    * visible iff its producer's NEXT marker in the partition is a commit
    * — exactly [[LogOps.readCommittedFromLog]], the operator the storage
    * engine uses to recover aborted ranges after restart.
    */
  def qReadCommitted(s: SparkSession, dir: String): DataFrame = {
    val log = Tables.log(s, dir)
      .withColumn("producer_id", col("key") % 4)
      .withColumn("is_control", col("offset") % 50 === 49)
      .withColumn("control_type",
        when(col("offset") % 50 === 49,
          when(expr("(offset DIV 50) % 3 = 0"), "abort").otherwise("commit")))
    LogOps.readCommittedFromLog(log, col("control_type") === "commit")
      .groupBy(col("partition"), col("producer_id"))
      .agg(count(lit(1)).as("n_visible"),
        min(col("offset")).as("min_off"),
        max(col("offset")).as("max_off"),
        expr("bit_xor(offset)").as("xor_off"))
  }

  /** Embedding near-dup pairs: cosine >= 0.4 within sign-bit cells
    * (the corpus has no true duplicates; 0.4 selects the ~0.1% closest
    * pairs, exercising the full blocked-join + threshold path).
    */
  def qNearDupVectors(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(Tables.load(s, dir, "embeddings"),
      minCosine = 0.4, bits = 2)

  /** Hierarchical rollup over document corpus stats (lang -> source):
    * one pass, Spark expands grouping sets without re-scanning.
    */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))

  /** Top-3 most expensive orders per market segment (window top-k —
    * partial TakeOrdered per group, no global sort).
    */
  def qTopKPerGroup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.join(graft.ops.Hints.broadcastIfSmall(c), o("o_custkey") === c("c_custkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("rn"), col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").cast("double").as("price"))
  }

  /** As-of join: each click matched to the user's latest view at or
    * before it (kdb+ `aj` / DuckDB ASOF JOIN semantics, left-outer).
    * Views are pre-aggregated to one row per (user, ts) — the as-of
    * contract for deterministic carries; max_by pins which event wins
    * a hypothetical tie. One hash shuffle on user_id, no range join.
    */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"),
        expr("max_by(value, event_id)").as("view_value"))
    AsofJoin.asofBackward(clicks, views, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("user_id"), col("view_id"),
        col("view_value"))
  }

  /** Interval join: every click within 6 hours AFTER an error by the
    * same user — bucket-decomposed ([[RangeJoin]]), so the range
    * predicate runs as an equi-join on (user, time bucket), never a
    * nested-loop. Bucket width = the interval length (6 h), so each
    * interval lands in at most 2 buckets.
    */
  def qIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val win = 21600000000L // 6 h in micros
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts0"))
      .withColumn("ts1", col("ts0") + win)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("tc"))
    RangeJoin.pointInInterval(clicks, errs, "tc", "ts0", "ts1",
        keyCols = Seq("user_id"), bucketWidth = win)
      .select(col("error_id"), col("click_id"), col("user_id"))
  }

  /** FORWARD as-of: each click matched to the user's EARLIEST view at
    * or after it. The oracle reuses DuckDB's (backward-only) ASOF JOIN
    * by negating the time axis — the same trick proves both scan
    * directions of the operator against one native primitive.
    */
  def qAsofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"))
    AsofJoin.asofForward(clicks, views, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("user_id"), col("view_id"))
  }

  /** One-pass column profiler — the ANALYZE TABLE shape a lake
    * maintenance sweep runs to keep optimizer/skipping stats fresh:
    * per column (rows, nulls, exact distinct, min, max) in ONE
    * aggregate over the table (multi-countDistinct plans as a single
    * Expand + aggregate, not one scan per column), unpivoted to a row
    * per column.
    */
  def qProfile(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val one = l.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(
      lit(c).as("col_name"), col("n_rows"),
      col(s"${c}__nulls").as("n_null"),
      col(s"${c}__distinct").as("n_distinct"),
      col(s"${c}__min").as("min_v"), col(s"${c}__max").as("max_v")))
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** TPC-H Q7 volume-shipping shape: bidirectional nation-pair trade
    * revenue by year — a 6-table join graph with THREE broadcast dims
    * and a conditional pair filter, grouped on derived columns.
    */
  def q7Volume(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val sup = Tables.load(s, dir, "supplier")
    val n1 = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val pair = (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
      (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1")
    // orders thin through the customer join FIRST (the q3/q5 join-order
    // rule): past the broadcast gate the fact shuffles once on orderkey
    // instead of orderkey-then-custkey
    val oc = o.join(graft.ops.Hints.broadcastIfSmall(c),
      o("o_custkey") === c("c_custkey"))
    l.join(oc, l("l_orderkey") === o("o_orderkey"))
      .join(graft.ops.Hints.broadcastIfSmall(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n1), sup("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), c("c_nationkey") === col("c_nk"))
      .filter(pair)
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("o_orderdate")).as("l_year"))
      .agg(sum((SparkEntry.dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - SparkEntry.dec("l_discount")))
        .cast("decimal(28,4)")).cast("double").as("revenue"))
  }

  /** TPC-H Q17 small-quantity-order shape: the correlated scalar
    * subquery (per-part average quantity threshold) DECORRELATED by
    * hand into one aggregate + join — the form that scales: the
    * per-part thresholds are a part-sized table, broadcast back, never
    * a re-scan per row.
    */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val p = Tables.load(s, dir, "part")
      .filter(col("p_brand").isin("Brand#1", "Brand#2"))
    // semi-filter FIRST: the correlated average only matters for parts
    // that survive the brand filter, so the threshold aggregate runs
    // over the filtered slice, not the whole fact table — and its
    // result is a filtered-part-sized table, broadcast back. Exact
    // decimal sum / count, THEN one double division (deterministic and
    // oracle-mirrorable, unlike a decimal avg's precision ladder).
    val lp = l.join(graft.ops.Hints.broadcastIfSmall(p.select(col("p_partkey"))),
      l("l_partkey") === col("p_partkey"), "left_semi")
    val thresholds = lp.groupBy(col("l_partkey").as("t_partkey"))
      .agg((sum(SparkEntry.dec("l_quantity")).cast("double") /
        count(col("l_quantity")) * lit(0.2)).as("qty_threshold"))
    lp.join(graft.ops.Hints.broadcastIfSmall(p), lp("l_partkey") === p("p_partkey"))
      .join(graft.ops.Hints.broadcastIfSmall(thresholds), lp("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity").cast("double") < col("qty_threshold"))
      .groupBy(col("p_brand"))
      .agg((sum(SparkEntry.dec("l_extendedprice")).cast("double") / lit(7.0))
        .as("avg_yearly"))
  }

  /** TPC-H Q6 forecast-revenue shape: a pure scan-filter-aggregate —
    * THE predicate-pushdown showcase: every filter (shipdate range,
    * discount band, quantity cap) must reach the parquet scan so row
    * groups outside the year never leave disk, and the aggregate is one
    * map-side-combining pass with no shuffle beyond the final reduce.
    */
  def q6Forecast(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1996-01-01" &&
        col("l_shipdate") < "1997-01-01" &&
        col("l_discount").between(0.02, 0.06) &&
        col("l_quantity") < 24)
      .agg(sum((SparkEntry.dec("l_extendedprice") *
        SparkEntry.dec("l_discount")).cast("decimal(28,4)"))
        .cast("double").as("revenue"))

  /** TPC-H Q14 promo-revenue shape: a conditional-aggregate RATIO over
    * one shipdate month — the fact table thins at the scan, the part
    * dimension broadcasts, and both numerator and denominator resolve
    * in ONE aggregate pass (never two scans).
    */
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1996-03-01" &&
        col("l_shipdate") < "1996-04-01")
    val p = Tables.load(s, dir, "part")
    val rev = (SparkEntry.dec("l_extendedprice") *
      (lit(1).cast("decimal(18,2)") - SparkEntry.dec("l_discount")))
      .cast("decimal(28,4)")
    l.join(graft.ops.Hints.broadcastIfSmall(p), l("l_partkey") === p("p_partkey"))
      .agg((lit(100.0) *
        sum(when(col("p_type") === "PROMO", rev)
          .otherwise(lit(0).cast("decimal(28,4)"))).cast("double") /
        sum(rev).cast("double")).as("promo_revenue_pct"))
  }

  /** TPC-H Q18 large-volume-order shape: the HAVING subquery reused as
    * a SEMI filter — the per-order quantity aggregate runs ONCE over
    * the fact table, its survivors (a threshold-thinned orders subset)
    * broadcast back as the probe filter, and the detail re-aggregation
    * touches only surviving orders. At scale the first aggregate is the
    * only full-fact shuffle; everything after is survivor-sized.
    */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val big = l.groupBy(col("l_orderkey").as("b_orderkey"))
      .agg(sum(SparkEntry.dec("l_quantity")).cast("double").as("total_qty"))
      .filter(col("total_qty") > 250.0)
      .select(col("b_orderkey"))
    l.join(graft.ops.Hints.broadcastIfSmall(big), l("l_orderkey") === col("b_orderkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(graft.ops.Hints.broadcastIfSmall(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_totalprice"))
      .agg(sum(SparkEntry.dec("l_quantity")).cast("double").as("sum_qty"))
  }

  /** TPC-H Q10 returned-item shape: revenue lost to returns per
    * customer, top 20 — a fact-filter-first join (the returnflag
    * predicate pushes to the scan and thins the fact table BEFORE any
    * join), broadcast dims, and the top-k via TakeOrdered, never a
    * global sort. Ties break on the key so the cut is deterministic.
    */
  def q10Returned(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(graft.ops.Hints.broadcastIfSmall(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(sum((SparkEntry.dec("l_extendedprice") *
        (lit(1).cast("decimal(18,2)") - SparkEntry.dec("l_discount")))
        .cast("decimal(28,4)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile" -> (qProfile _),
    "q7_volume" -> (q7Volume _),
    "q17_small_qty" -> (q17SmallQty _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q10_returned" -> (q10Returned _),
    "q6_forecast" -> (q6Forecast _),
    "q14_promo" -> (q14Promo _),
    "q_asof_join" -> (qAsofJoin _),
    "q_asof_forward" -> (qAsofForward _),
    "q_interval_join" -> (qIntervalJoin _),
    "q_rollup" -> (qRollup _),
    "q_topk_per_group" -> (qTopKPerGroup _),
    "q_exists" -> (qExists _),
    "q_anti_join" -> (qAntiJoin _),
    "q_distinct_keys" -> (qDistinctKeys _),
    "q_order_limit" -> (qOrderLimit _),
    "q_set_diff" -> (qSetDiff _),
    "q_last_stable" -> (qLastStable _),
    "q_read_committed" -> (qReadCommitted _),
    "q_near_dup_vectors" -> (qNearDupVectors _)
  )

  private val quantQ =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT))"

  val oracleSql: Map[String, String] = Map(
    "q_profile" ->
      """WITH base AS (SELECT count(*) AS n_rows FROM lineitem)
        |SELECT 'l_quantity' AS col_name, n_rows,
        |  (SELECT count(*) FROM lineitem WHERE l_quantity IS NULL) AS n_null,
        |  (SELECT count(DISTINCT l_quantity) FROM lineitem) AS n_distinct,
        |  (SELECT CAST(min(l_quantity) AS DOUBLE) FROM lineitem) AS min_v,
        |  (SELECT CAST(max(l_quantity) AS DOUBLE) FROM lineitem) AS max_v
        |FROM base
        |UNION ALL
        |SELECT 'l_extendedprice', n_rows,
        |  (SELECT count(*) FROM lineitem WHERE l_extendedprice IS NULL),
        |  (SELECT count(DISTINCT l_extendedprice) FROM lineitem),
        |  (SELECT CAST(min(l_extendedprice) AS DOUBLE) FROM lineitem),
        |  (SELECT CAST(max(l_extendedprice) AS DOUBLE) FROM lineitem)
        |FROM base
        |UNION ALL
        |SELECT 'l_discount', n_rows,
        |  (SELECT count(*) FROM lineitem WHERE l_discount IS NULL),
        |  (SELECT count(DISTINCT l_discount) FROM lineitem),
        |  (SELECT CAST(min(l_discount) AS DOUBLE) FROM lineitem),
        |  (SELECT CAST(max(l_discount) AS DOUBLE) FROM lineitem)
        |FROM base""".stripMargin,

    "q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  EXTRACT(year FROM o_orderdate) AS l_year,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3""".stripMargin,

    "q17_small_qty" ->
      """WITH p AS (
        |  SELECT p_partkey, p_brand FROM part
        |  WHERE p_brand IN ('Brand#1', 'Brand#2')),
        |lp AS (
        |  SELECT l.* FROM lineitem l
        |  WHERE EXISTS (SELECT 1 FROM p WHERE p.p_partkey = l.l_partkey)),
        |thr AS (
        |  SELECT l_partkey AS t_partkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(l_quantity) * 0.2 AS qty_threshold
        |  FROM lp GROUP BY 1)
        |SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |    AS avg_yearly
        |FROM lp
        |JOIN p ON lp.l_partkey = p.p_partkey
        |JOIN thr ON lp.l_partkey = thr.t_partkey
        |WHERE CAST(l_quantity AS DOUBLE) < qty_threshold
        |GROUP BY p_brand""".stripMargin,

    "q_asof_forward" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, -epoch_us(ts) AS nts FROM events
        |  WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, -epoch_us(ts) AS nts, max(event_id) AS view_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, v.view_id
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.nts >= v.nts""".stripMargin,

    "q_interval_join" ->
      """WITH err AS (
        |  SELECT event_id AS error_id, user_id, epoch_us(ts) AS ts0
        |  FROM events WHERE event_type = 'error'),
        |clk AS (
        |  SELECT event_id AS click_id, user_id AS cu, epoch_us(ts) AS tc
        |  FROM events WHERE event_type = 'click')
        |SELECT error_id, click_id, user_id
        |FROM err JOIN clk ON user_id = cu
        |  AND tc BETWEEN ts0 AND ts0 + 21600000000""".stripMargin,

    "q6_forecast" ->
      """SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06
        |  AND l_quantity < 24""".stripMargin,

    "q14_promo" ->
      """SELECT 100.0 *
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))
        |    ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE)
        |  AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY 1
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250.0)
        |SELECT c_name, c_custkey, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |JOIN big USING (l_orderkey)
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2, 3, 4""".stripMargin,

    "q10_returned" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, ts, max(event_id) AS view_id,
        |         arg_max(value, event_id) AS view_value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, v.view_id, v.view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts""".stripMargin,

    "q_rollup" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin,

    "q_topk_per_group" ->
      """SELECT c_mktsegment, rn, o_orderkey, price FROM (
        |  SELECT c_mktsegment,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |    o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rn <= 3""".stripMargin,
    "q_exists" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 150000)""".stripMargin,

    "q_distinct_keys" ->
      """SELECT event_id % 8 AS "partition",
        |  count(DISTINCT user_id) AS n_keys, count(*) AS n_records
        |FROM events GROUP BY 1""".stripMargin,

    "q_order_limit" ->
      """SELECT event_id AS "offset", event_id % 8 AS "partition", event_type
        |FROM events ORDER BY event_id LIMIT 100""".stripMargin,

    "q_set_diff" ->
      """SELECT DISTINCT event_id % 1000 AS residue FROM events
        |  WHERE event_id % 8 = 0
        |EXCEPT
        |SELECT DISTINCT event_id % 1000 AS residue FROM events
        |  WHERE event_id % 8 = 1""".stripMargin,

    "q_last_stable" ->
      """WITH txns AS (
        |  SELECT * FROM (VALUES
        |    (0, 100, 900, 'Begin'), (0, 400, 800, 'Committed'),
        |    (1, 2000, 2500, 'Begin'), (2, 3000, 3100, 'Aborted'),
        |    (3, 50, 60, 'Begin'), (3, 40, 45, 'Begin'))
        |    AS t("partition", offset_start, offset_end, state)),
        |wm AS (
        |  SELECT event_id % 8 AS "partition", max(event_id) + 1 AS high_watermark
        |  FROM events GROUP BY 1),
        |open AS (
        |  SELECT "partition", CAST(min(offset_start) AS BIGINT) AS min_open_start
        |  FROM txns WHERE state = 'Begin' GROUP BY "partition")
        |SELECT wm."partition", high_watermark,
        |  least(coalesce(min_open_start, high_watermark), high_watermark) AS last_stable
        |FROM wm LEFT JOIN open ON wm."partition" = open."partition"""".stripMargin,

    "q_read_committed" ->
      """WITH log AS (
        |  SELECT event_id % 8 AS "partition", event_id AS "offset",
        |         user_id AS "key"
        |  FROM events),
        |t AS (
        |  SELECT "partition", "offset", "key" % 4 AS producer_id,
        |    ("offset" % 50 = 49) AS is_control,
        |    CASE WHEN "offset" % 50 = 49 THEN
        |      CASE WHEN ("offset" // 50) % 3 = 0 THEN 'abort' ELSE 'commit' END
        |    END AS control_type
        |  FROM log),
        |v AS (
        |  SELECT *,
        |    FIRST_VALUE(CASE WHEN is_control THEN control_type = 'commit' END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY "partition", producer_id ORDER BY "offset"
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_commit
        |  FROM t)
        |SELECT "partition", producer_id, COUNT(*) AS n_visible,
        |  MIN("offset") AS min_off, MAX("offset") AS max_off,
        |  bit_xor("offset") AS xor_off
        |FROM v WHERE NOT is_control AND next_commit
        |GROUP BY 1, 2""".stripMargin,

    "q_near_dup_vectors" -> {
      val cell = (0 until 2)
        .map(i => s"(CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
      def dot(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(64), i -> $a[i+1] * $b[i+1])) AS BIGINT)"
      s"""WITH e AS (
         |  SELECT vec_id, $quantQ AS qe, CAST($cell AS BIGINT) AS cell
         |  FROM embeddings),
         |p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cell,
         |    ${dot("a.qe", "b.qe")} AS dot,
         |    ${dot("a.qe", "a.qe")} AS na,
         |    ${dot("b.qe", "b.qe")} AS nb
         |  FROM e a JOIN e b ON a.cell = b.cell AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cell,
         |  round(CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS cosine_r
         |FROM p
         |WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) >= 0.4""".stripMargin
    }
  )
}
