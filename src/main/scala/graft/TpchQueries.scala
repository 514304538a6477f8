package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining TPC-H query SHAPES (Q2/4/8/9/11/12/13/15/16/19/20/21/22),
  * mapped onto the driver's TPC-H-ish star schema (no partsupp table, no
  * commit/receipt dates, no phone/comment columns — each query keeps its
  * defining plan shape and swaps the missing column for an available one).
  *
  * Together with q1/3/5/6/7/10/14/17/18 (SparkEntry/RelationalQueries)
  * this closes the full 22-query TPC-H shape matrix: every decorrelation
  * pattern a relational engine must handle — correlated scalar subqueries
  * (min per group, avg per group, fraction-of-total), EXISTS/NOT-EXISTS
  * self-joins, left-outer distribution aggregates, disjunctive join
  * residuals, nested IN — expressed in the form that scales: aggregates
  * computed once and joined back, never a re-scan per outer row.
  *
  * Numeric policy follows SparkEntry: exact DECIMAL sums (order-
  * independent under Spark's partition-order nondeterminism) emitted as
  * DOUBLE; scalar "subquery" values ride a 1-row broadcast joined on a
  * constant key, so the board plan-lint sees a BroadcastHashJoin, not a
  * nested-loop cross.
  */
object TpchQueries {

  import SparkEntry.dec

  private def rev = (dec("l_extendedprice") *
    (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(28,4)")

  /** Join a 1-row aggregate onto every row as a broadcast equi-join on a
    * constant key — the decorrelated scalar-subquery shape that stays a
    * BroadcastHashJoin (never a nested-loop) in the plan.
    */
  private def withScalar(df: DataFrame, scalar: DataFrame): DataFrame =
    df.withColumn("jk", lit(1))
      .join(broadcast(scalar.withColumn("jk", lit(1))), "jk")
      .drop("jk")

  /** Q2 shape — correlated MIN subquery: for each filtered part, the
    * region's supplier(s) achieving the minimum supply cost. No partsupp
    * table, so cost(part, supplier) := MIN(l_extendedprice) over their
    * lineitems. Decorrelated: the per-part min is ONE aggregate over the
    * (region-thinned) cost table, joined back on (partkey, cost) —
    * never a re-scan per part.
    */
  def q2MinCost(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region").filter(col("r_name") === "EUROPE")
    val sup = Tables.load(s, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val p = Tables.load(s, dir, "part")
      .filter(col("p_size") === 15 && col("p_type") === "LARGE")
      .select(col("p_partkey"))
    // cost table: region-thinned suppliers x filtered parts only — both
    // thin sides broadcast; the fact scan is the single heavy pass
    val cost = Tables.load(s, dir, "lineitem")
      .join(graft.ops.Hints.broadcastIfSmall(p), col("l_partkey") === col("p_partkey"))
      .join(graft.ops.Hints.broadcastIfSmall(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("s_suppkey"), col("s_name"), col("n_name"))
      .agg(min(dec("l_extendedprice")).as("cost"))
    val minCost = cost.groupBy(col("p_partkey").as("m_partkey"))
      .agg(min(col("cost")).as("min_cost"))
    cost.join(graft.ops.Hints.broadcastIfSmall(minCost), col("p_partkey") === col("m_partkey") &&
        col("cost") === col("min_cost"))
      .select(col("p_partkey"), col("s_name"), col("n_name"),
        col("cost").cast("double").as("supply_cost"))
  }

  /** Q4 shape — EXISTS semi-join + priority count: orders in one quarter
    * having at least one returned lineitem. The date filter pushes to the
    * orders scan; the semi-join is the only fact-fact shuffle.
    */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= "1996-01-01" &&
        col("o_orderdate") < "1996-04-01")
    val l = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** Q8 shape — market share: one nation's fraction of regional import
    * revenue per year. Conditional-aggregate ratio over a 7-table join
    * graph; every dimension broadcasts, numerator and denominator resolve
    * in ONE aggregate pass.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val sup = Tables.load(s, dir, "supplier")
    val p = Tables.load(s, dir, "part").filter(col("p_type") === "ECONOMY")
    val n1 = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
    val n2 = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val r = Tables.load(s, dir, "region").filter(col("r_name") === "AMERICA")
    l.join(graft.ops.Hints.broadcastIfSmall(p), l("l_partkey") === p("p_partkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(graft.ops.Hints.broadcastIfSmall(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), c("c_nationkey") === col("c_nk"))
      .join(broadcast(r), col("n_regionkey") === r("r_regionkey"))
      .join(graft.ops.Hints.broadcastIfSmall(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n2), sup("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_4", rev)
          .otherwise(lit(0).cast("decimal(28,4)"))).cast("double") /
        sum(rev).cast("double")).as("mkt_share"))
  }

  /** Q9 shape — profit by nation and year. No partsupp.ps_supplycost, so
    * cost := p_retailprice * l_quantity * 0.1. Numerator and cost ride as
    * two exact decimal sums; the subtraction happens once on the
    * aggregated doubles (deterministic; a per-row double sum would be
    * partition-order-dependent).
    */
  def q9Profit(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    val sup = Tables.load(s, dir, "supplier")
    val p = Tables.load(s, dir, "part").filter(col("p_name").like("red%"))
    val n = Tables.load(s, dir, "nation")
    val cost = (dec("p_retailprice") * dec("l_quantity")).cast("decimal(28,4)")
    l.join(graft.ops.Hints.broadcastIfSmall(p), l("l_partkey") === p("p_partkey"))
      .join(graft.ops.Hints.broadcastIfSmall(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg((sum(rev).cast("double") - sum(cost).cast("double") * 0.1)
        .as("sum_profit"))
  }

  /** Q11 shape — fraction-of-total HAVING: parts whose shipped value
    * exceeds 0.05% of the corpus total. Both the per-part values and the
    * total are exact decimal sums; the total joins back as a 1-row
    * broadcast (the decorrelated scalar subquery).
    */
  def q11ValueShare(s: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(dec("l_extendedprice")).as("val_dec"))
    val total = perPart.agg(sum(col("val_dec")).cast("double").as("total_val"))
    withScalar(perPart, total)
      .filter(col("val_dec").cast("double") > col("total_val") * 0.0005)
      .select(col("l_partkey"), col("val_dec").cast("double").as("part_value"))
  }

  /** Q12 shape — two-way conditional count over a fact-fact join: per
    * linestatus, lineitems shipped in 1996 split by order priority class.
    * One aggregate pass; the date filter pushes to the lineitem scan.
    */
  def q12PriorityClass(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1996-01-01" &&
        col("l_shipdate") < "1997-01-01")
    val o = Tables.load(s, dir, "orders")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** Q13 shape — left-outer distribution: customers by order count
    * INCLUDING zero-order customers (the outer join is the semantics),
    * orders thinned by a priority predicate. The join output is already
    * hash-partitioned on the key, so the per-customer count reuses the
    * join's partitioning — one shuffle, then a tiny distribution agg.
    */
  def q13CustDist(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
    val perCust = c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** Q15 shape — scalar MAX subquery: the top supplier(s) by one
    * quarter's revenue. The max rides back as a 1-row broadcast; the
    * equality is on doubles both engines derive from the same exact
    * decimal sums.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1996-01-01" &&
        col("l_shipdate") < "1996-04-01")
      .groupBy(col("l_suppkey"))
      .agg(sum(rev).cast("double").as("total_revenue"))
    val mx = perSupp.agg(max(col("total_revenue")).as("max_rev"))
    val sup = Tables.load(s, dir, "supplier")
    withScalar(perSupp, mx)
      .filter(col("total_revenue") === col("max_rev"))
      .join(graft.ops.Hints.broadcastIfSmall(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** Q16 shape — NOT-IN exclusion + distinct count: suppliers per
    * (brand, type, size) bucket, excluding a blocklisted supplier set
    * (negative balance stands in for the missing comment filter). The
    * exclusion is a broadcast anti-join; the distinct count is one
    * two-phase aggregate.
    */
  def q16SupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    val excl = Tables.load(s, dir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.load(s, dir, "lineitem")
      .join(graft.ops.Hints.broadcastIfSmall(p), col("l_partkey") === col("p_partkey"))
      .join(graft.ops.Hints.broadcastIfSmall(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Q19 shape — disjunctive join residual: revenue from three
    * brand/size/quantity bands. The join stays an equi-join on partkey;
    * the OR-of-conjunctions is a post-join filter (pushing any single
    * band to the scan would change results).
    */
  def q19Disjunctive(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val p = Tables.load(s, dir, "part")
    val bands =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
        col("l_quantity").between(1, 15)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
        col("l_quantity").between(10, 25)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 30) &&
        col("l_quantity").between(20, 35))
    l.join(graft.ops.Hints.broadcastIfSmall(p), l("l_partkey") === p("p_partkey"))
      .filter(bands)
      .agg(sum(rev).cast("double").as("revenue"))
  }

  /** Q20 shape — nested IN: suppliers in one nation who shipped more
    * than 500 units of 'red' parts. The inner IN collapses to a
    * grouped HAVING aggregate whose survivors semi-filter the supplier
    * table — aggregate once, join back, never a subquery per supplier.
    */
  def q20PartSupply(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").filter(col("p_name").like("red%"))
      .select(col("p_partkey"))
    val shipped = Tables.load(s, dir, "lineitem")
      .join(graft.ops.Hints.broadcastIfSmall(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec("l_quantity")).cast("double").as("red_qty"))
      .filter(col("red_qty") > 500.0)
    val n = Tables.load(s, dir, "nation").filter(col("n_name") === "NATION_2")
    Tables.load(s, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      // shipped is supplier-bounded (one row per qualifying supplier) —
      // broadcast the semi-filter instead of sort-merging the dimension
      .join(graft.ops.Hints.broadcastIfSmall(shipped), col("s_suppkey") === col("l_suppkey"),
        "left_semi")
      .select(col("s_suppkey"), col("s_name"))
  }

  /** Q21 shape — EXISTS + NOT-EXISTS self-joins, DECORRELATED: suppliers
    * in one nation who were the ONLY returning supplier on a
    * multi-supplier finished order. Both correlated subqueries collapse
    * into ONE per-order aggregate (distinct suppliers / distinct
    * returning suppliers): "another supplier exists" = n_supp >= 2,
    * "no other returning supplier" = n_ret_supp == 1 (the outer row is
    * itself returning). One aggregate + one join replaces two
    * fact-fact self-shuffles — the form that survives 100x.
    */
  def q21Waiting(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val orderStats = l.groupBy(col("l_orderkey").as("st_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("n_ret_supp"))
      .filter(col("n_supp") >= 2 && col("n_ret_supp") === 1)
      .select(col("st_orderkey"))
    val o = Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val n = Tables.load(s, dir, "nation").filter(col("n_name") === "NATION_1")
    val sup = Tables.load(s, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    l.filter(col("l_returnflag") === "R")
      .join(graft.ops.Hints.broadcastIfSmall(sup), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(orderStats, col("l_orderkey") === col("st_orderkey"), "left_semi")
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  /** Q22 shape — scalar AVG subquery + anti-join: rich-but-inactive
    * customers per nation. The positive-balance average rides back as a
    * 1-row broadcast (computed as exact-decimal sum / count — a double
    * AVG would be partition-order-dependent); the inactivity predicate
    * ("never placed an urgent order" — the driver's generator gives
    * every customer SOME order, so plain no-orders is vacuously empty)
    * is an anti-join thinned by the priority filter at the scan.
    */
  def q22Acctbal(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg((sum(dec("c_acctbal")).cast("double") / count(lit(1)))
        .as("avg_bal"))
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    withScalar(c.filter(col("c_nationkey").isin(0, 1, 2)), avgBal)
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec("c_acctbal")).cast("double").as("totacctbal"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost" -> (q2MinCost _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q8_market_share" -> (q8MarketShare _),
    "q9_profit" -> (q9Profit _),
    "q11_value_share" -> (q11ValueShare _),
    "q12_priority_class" -> (q12PriorityClass _),
    "q13_custdist" -> (q13CustDist _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q16_supplier_cnt" -> (q16SupplierCnt _),
    "q19_disjunctive" -> (q19Disjunctive _),
    "q20_part_supply" -> (q20PartSupply _),
    "q21_waiting" -> (q21Waiting _),
    "q22_acctbal" -> (q22Acctbal _)
  )

  private val revSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))"

  val oracleSql: Map[String, String] = Map(
    "q2_min_cost" ->
      """WITH sup AS (
        |  SELECT s_suppkey, s_name, n_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |p AS (SELECT p_partkey FROM part
        |      WHERE p_size = 15 AND p_type = 'LARGE'),
        |cost AS (
        |  SELECT p_partkey, s_suppkey, s_name, n_name,
        |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        |  FROM lineitem
        |  JOIN p ON l_partkey = p_partkey
        |  JOIN sup ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2, 3, 4),
        |mc AS (SELECT p_partkey AS m_partkey, MIN(cost) AS min_cost
        |       FROM cost GROUP BY 1)
        |SELECT p_partkey, s_name, n_name, CAST(cost AS DOUBLE) AS supply_cost
        |FROM cost JOIN mc ON p_partkey = m_partkey AND cost = min_cost""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin,

    "q8_market_share" -> (
      s"""SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_4' THEN $revSql
         |    ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) /
         |  CAST(SUM($revSql) AS DOUBLE) AS mkt_share
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
         |GROUP BY 1""".stripMargin),

    "q9_profit" -> (
      s"""SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
         |  CAST(SUM($revSql) AS DOUBLE) -
         |  CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(18,2)) *
         |    CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE)
         |    * 0.1 AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE 'red%'
         |GROUP BY 1, 2""".stripMargin),

    "q11_value_share" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val_dec
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(SUM(val_dec) AS DOUBLE) AS total_val FROM v)
        |SELECT l_partkey, CAST(val_dec AS DOUBLE) AS part_value
        |FROM v, t
        |WHERE CAST(val_dec AS DOUBLE) > total_val * 0.0005""".stripMargin,

    "q12_priority_class" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,

    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,

    "q15_top_supplier" -> (
      s"""WITH r AS (
         |  SELECT l_suppkey, CAST(SUM($revSql) AS DOUBLE) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM r JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue = (SELECT MAX(total_revenue) FROM r)""".stripMargin),

    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,

    "q19_disjunctive" -> (
      s"""SELECT CAST(SUM($revSql) AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 1 AND 15)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
         |       AND l_quantity BETWEEN 10 AND 25)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
         |       AND l_quantity BETWEEN 20 AND 35)""".stripMargin),

    "q20_part_supply" ->
      """SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_2' AND s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'red%'
        |  GROUP BY l_suppkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    > 500.0)""".stripMargin,

    // the oracle keeps the CORRELATED EXISTS/NOT-EXISTS form — proving
    // the Spark decorrelation (per-order distinct-supplier counts) is
    // semantically identical, not just a paraphrase
    "q21_waiting" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |WHERE n_name = 'NATION_1' AND l1.l_returnflag = 'R'
        |  AND o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name""".stripMargin,

    "q22_acctbal" ->
      """SELECT c_nationkey, count(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_nationkey IN (0, 1, 2)
        |  AND c_acctbal > (
        |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(*)
        |    FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin
  )
}
