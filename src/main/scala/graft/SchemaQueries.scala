package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lake.Lake
import graft.operators.LogOps
import graft.schema.JsonSchema

/** Schema-validation, lake-materialization and window/streaming-analog
  * queries with DuckDB oracles (SURVEY §2: P6, F4, F5, F6, W-series,
  * J5/J6, T7 analog).
  */
object SchemaQueries {

  /** Inline JSON Schema for events.props ({"k": int}), with max 90 so a
    * fraction of records fails (exercises the reject path).
    */
  private val propsSchema =
    """{"type":"object","properties":{
      |  "k":{"type":"integer","minimum":0,"maximum":90}},
      |"required":["k"]}""".stripMargin

  /** P6 — schema-validation predicate over the value column, counts per
    * event_type (reference `nisshi-schema/src/json.rs:59-128`).
    */
  def qValidateJson(s: SparkSession, dir: String): DataFrame = {
    val compiled = JsonSchema.compile(propsSchema)
    Tables.log(s, dir)
      .withColumn("ok", compiled.isValid(col("value")))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_valid"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_invalid"))
  }

  /** F4 — meta columns (partition/year/month/day) + per-day counts. */
  def qMetaColumns(s: SparkSession, dir: String): DataFrame = {
    val log = Tables.log(s, dir)
    Lake.withMeta(log, col("partition"), col("timestamp"))
      .groupBy(col("meta.year").as("y"), col("meta.month").as("m"),
        col("meta.day").as("d"))
      .agg(count(lit(1)).as("n"))
  }

  /** F5 — generated columns from SQL exprs (struct dot access included). */
  def qGeneratedCols(s: SparkSession, dir: String): DataFrame = {
    val log = Tables.log(s, dir)
    val withMeta = Lake.withMeta(log, col("partition"), col("timestamp"))
    Lake.withGenerated(withMeta, Map(
      "event_date" -> "cast(cast(meta.timestamp as date) as string)",
      "metric_bucket" -> "cast(floor(metric / 50) as long)"))
      .groupBy(col("event_date"), col("metric_bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** F6 — normalize/flatten: JSON value -> struct -> flat columns. */
  def qFlatten(s: SparkSession, dir: String): DataFrame = {
    val log = Tables.log(s, dir)
    val parsed = log.select(col("offset"),
      from_json(col("value"), StructType(Seq(StructField("k", LongType)))).as("v"))
    Lake.normalize(parsed, "_")
      .select(col("offset"), col("v_k"))
  }

  /** W — rank/dense_rank/lag over suppliers per nation (total order on
    * (acctbal desc, suppkey) so lag is deterministic).
    */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.load(s, dir, "supplier")
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    sup.select(
      col("s_suppkey"), col("s_nationkey"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      lag(col("s_suppkey"), 1).over(w).as("prev_suppkey"))
  }

  /** T-analog — tumbling 1-hour event-time windows per event_type (the
    * batch shape of the streaming windowed aggregation).
    */
  def qTumblingHourly(s: SparkSession, dir: String): DataFrame =
    Tables.log(s, dir)
      .groupBy(date_trunc("hour", col("timestamp")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("metric").cast("decimal(18,2)")).cast("double").as("sum_metric"))
      .select(unix_micros(col("h")).as("hour_us"), col("event_type"),
        col("n"), col("sum_metric"))

  /** Skew-salted aggregate: per-event_type count + value sum computed
    * through a deterministic 16-way salt split and reassembled — the
    * hot-key mitigation the brief names. The oracle is the PLAIN
    * aggregate: salting must be invisible in the results (exact
    * two-level reassembly of algebraic aggregates), which is exactly
    * what makes it safe to deploy on a skewed 100 TB key.
    */
  def qSaltedAgg(s: SparkSession, dir: String): DataFrame =
    graft.ops.Skew.saltedAggregate(
      Tables.load(s, dir, "events")
        .withColumn("v", col("value").cast("decimal(18,2)")),
      keyCol = "event_type", valueCol = "v", saltBy = "event_id")
      .select(col("event_type"), col("n"),
        col("total").cast("double").as("total"))

  /** Salted skew JOIN over a deliberately hot-keyed lineitem
    * derivation (3 of every 4 rows land on key 0): the fact side salts
    * 8 ways, the tiny dim replicates — and the joined aggregate must
    * equal the PLAIN join's, which is what the oracle computes.
    */
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.load(s, dir, "lineitem")
      .select(
        when(col("l_orderkey") % 4 =!= 0, lit(0L))
          .otherwise(col("l_orderkey") % 97).as("k"),
        col("l_orderkey"), col("l_quantity"))
    val dim = fact.select(col("k")).distinct()
      .withColumn("label", concat(lit("grp-"), col("k").cast("string")))
    graft.ops.Skew.saltedJoin(fact, dim, key = "k",
        saltBy = "l_orderkey", salts = 8)
      .groupBy(col("k"), col("label"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("total_qty"))
  }

  /** J5/T7 — retention sweep vs per-"topic" config (event_type plays the
    * topic role; fixed `now` for determinism).
    */
  def qRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cfg = Seq(
      ("click", 30L * 24 * 3600 * 1000, "delete"),
      ("purchase", 365L * 24 * 3600 * 1000, "delete"),
      ("signup", 365L * 24 * 3600 * 1000, "compact"),
      ("error", 7L * 24 * 3600 * 1000, "delete"),
      ("view", 14L * 24 * 3600 * 1000, "delete"))
      .toDF("topic", "retention_ms", "cleanup_policy")
    val log = Tables.log(s, dir).withColumn("topic", col("event_type"))
    val now = lit("2024-03-01 00:00:00").cast("timestamp")
    LogOps.applyRetention(log, cfg, now)
      .groupBy(col("topic"))
      .agg(count(lit(1)).as("n_kept"), max(col("offset")).as("max_offset"))
  }

  /** J6 — consumer lag: committed offsets joined with live watermarks. */
  def qGroupLag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val offsets = (0 until Tables.LogPartitions)
      .map(p => ("events", p, 500L + p * 100L)).toDF("topic", "partition", "committed_offset")
    LogOps.groupLag(Tables.log(s, dir), offsets)
      .select(col("partition"), col("committed_offset"),
        col("high_watermark"), col("lag"))
  }

  /** Gap-based sessionization in batch (30-min idle gap): the window
    * lag/cumulative-sum rewrite of the streaming mapGroupsWithState
    * sessionizer — one shuffle on user, two window passes.
    */
  def qSessions(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("key")).orderBy(col("offset"))
    Tables.log(s, dir)
      .withColumn("ts_us", unix_micros(col("timestamp")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("key").as("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
  }

  /** A7 — exact percentile metrics per event type (linear interpolation,
    * identical in both engines; rounded to 6dp for float-repr safety).
    */
  def qPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.log(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(metric, 0.5)"), 6).as("p50"),
        round(expr("percentile(metric, 0.95)"), 6).as("p95"))

  /** Instance-driven schema inference (reference
    * `nisshi-schema/src/json/arrow.rs:87-148`, `common_data_type`):
    * synthesize a schemaless stream with THREE record shapes — {k,tag},
    * {k,extra:{a}}, {k,f} — infer the unified schema from the instances
    * (cross-record type unification: optional string, nested struct,
    * long ⊔ double), parse typed, and aggregate every inferred field.
    * The inferred field list itself is emitted and oracle-checked
    * against the expected union.
    */
  def qInferSchema(s: SparkSession, dir: String): DataFrame = {
    val log = Tables.log(s, dir)
    val doc = when(col("offset") % 3 === 0,
        format_string("""{"k":%d,"tag":"t%d"}""",
          col("offset") % 97, col("key") % 5))
      .when(col("offset") % 3 === 1,
        format_string("""{"k":%d,"extra":{"a":%d}}""",
          col("offset") % 97, col("offset") % 13))
      .otherwise(
        format_string("""{"k":%d,"f":%d.5}""",
          col("offset") % 97, col("offset") % 7))
    val synth = log.select(col("partition"), doc.as("doc"))
    val schema = JsonSchema.inferSchema(synth, "doc")
    synth.withColumn("typed", from_json(col("doc"), schema))
      .groupBy(col("partition"))
      .agg(
        count(col("typed.k")).as("n_k"),
        sum(col("typed.k")).as("sum_k"),
        count(col("typed.tag")).as("n_tag"),
        count(col("typed.extra.a")).as("n_extra_a"),
        max(col("typed.extra.a")).as("max_extra_a"),
        // f values are exact binary fractions (x.5), so the double sum
        // is order-independent across partitions
        sum(col("typed.f")).as("sum_f"))
      .withColumn("inferred_fields",
        lit(schema.fieldNames.sorted.mkString(",")))
  }

  /** F8/§1.3 — Avro logical-type fidelity, end to end and distributed:
    * lineitem prices (decimal 12,2) and ship dates go THROUGH the Avro
    * binary codec — encodeColumn writes decimal unscaled bytes + epoch
    * days per row, decodeColumn reads them back — then aggregate; the
    * oracle computes the same decimal sums straight from parquet, so any
    * scale/precision/sign loss in the codec breaks the hash (reference
    * `nisshi-schema/src/avro/arrow.rs:205-247`).
    */
  def qAvroDecimal(s: SparkSession, dir: String): DataFrame = {
    val avsc =
      """{"type":"record","name":"li","fields":[
        |  {"name":"flag","type":"string"},
        |  {"name":"price","type":{"type":"bytes","logicalType":"decimal",
        |    "precision":12,"scale":2}},
        |  {"name":"ship","type":{"type":"int","logicalType":"date"}}]}"""
        .stripMargin
    val l = Tables.load(s, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        col("l_extendedprice").cast("decimal(12,2)").as("price"),
        col("l_shipdate").cast("date").as("ship"))
    val encoded = graft.schema.AvroDecoder
      .encodeColumn(l, avsc, "payload").select("payload")
    val decoded = graft.schema.AvroDecoder
      .decodeColumn(encoded, "payload", avsc, "rec")
    decoded.select(col("rec.flag").as("flag"), col("rec.price").as("price"),
        col("rec.ship").as("ship"))
      .groupBy(col("flag"))
      .agg(
        sum(col("price")).cast("decimal(18,2)").cast("double").as("sum_price"),
        min(col("price")).cast("double").as("min_price"),
        max(col("ship")).as("max_ship"),
        count(lit(1)).as("n_items"))
  }

  /** Avro GENERAL union (more than one non-null member) through the
    * tagged-struct mapping (AvroSchemas.scala: union → struct<tag,
    * member0.., memberN..>, the reference's dense-union stand-in,
    * `nisshi-schema/src/avro/arrow.rs:111-247`), ROUND-TRIPPED on the
    * wire: build union values from lineitem (even keys carry a long
    * quantity, odd keys a string flag, every 5th is null), encode to
    * Avro binary, decode back, and aggregate per tag. Any drift in tag
    * resolution, member slotting, or null handling in either codec
    * direction breaks the hash.
    */
  def qAvroUnion(s: SparkSession, dir: String): DataFrame = {
    val avsc =
      """{"type":"record","name":"uni","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"u","type":["null","long","string"]}]}""".stripMargin
    val l = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("id"),
        when(col("l_orderkey") % 5 === 0, lit(null))
          .otherwise(struct(
            (col("l_orderkey") % 2).cast("int").as("tag"),
            when(col("l_orderkey") % 2 === 0,
              col("l_quantity").cast("long")).as("member0"),
            when(col("l_orderkey") % 2 === 1,
              col("l_returnflag")).as("member1")))
          .as("u"))
    val encoded = graft.schema.AvroDecoder
      .encodeColumn(l, avsc, "payload").select("payload")
    val decoded = graft.schema.AvroDecoder
      .decodeColumn(encoded, "payload", avsc, "rec")
    decoded
      .groupBy(col("rec.u.tag").as("tag"))
      .agg(count(lit(1)).as("n"),
        sum(col("rec.u.member0")).as("sum_long"),
        min(col("rec.u.member1")).as("min_str"),
        max(col("rec.u.member1")).as("max_str"))
  }

  /** The `tansu.lake.partition` path end-to-end: write documents as a
    * TxLog table PARTITIONED on lang (Hive-style `lang=v` directories,
    * `nisshi-schema/src/lake/delta.rs:228-340`), then read ONE
    * partition back through the manifest's partition prune
    * ([[graft.lake.TxLog.readPartition]] — only the matching
    * directory's files are listed, TxLogSpec pins that) and aggregate.
    * The oracle computes the same aggregate straight off the source
    * table, so a prune that drops or leaks rows breaks the hash.
    */
  def qLakePartition(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("graft-lakepart")
    val table = root.toString + "/docs"
    // the scratch table must not outlive the query: repeated bench/verify
    // runs would otherwise accumulate a full documents copy per run in
    // /tmp — materialize the aggregate, then delete the tree
    try {
      graft.lake.TxLog.append(docs, table, partitionCols = Seq("lang"))
      val agg = graft.lake.TxLog.readPartition(s, table, Map("lang" -> "de"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("sum_len"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
      val rows = agg.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), agg.schema)
    } finally {
      import java.nio.file.Files
      import scala.jdk.CollectionConverters._
      // Files.walk holds an open directory handle until closed — Using
      // closes it even when a delete throws (FD leak across bench runs)
      Fs.deleteRecursively(root)
    }
  }

  /** Manifest-stats COUNT pushdown end-to-end: documents land in a
    * TxLog table as five id-ranged files, then three range counts are
    * answered by [[graft.lake.TxLog.countWhere]] — contained files from
    * stats alone, straddlers scanned — and the oracle recomputes each
    * count straight off the source table.
    */
  def qStatsCount(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("graft-statscnt")
    val table = root.toString + "/docs"
    try {
      // five files with disjoint id RANGES (doc_id DIV chunk, not mod —
      // mod interleaves ids so every file would span the whole domain
      // and the contained/disjoint stats paths would never run)
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val chunk = maxId / 5 + 1
      (0L until 5L).foreach { b =>
        graft.lake.TxLog.append(
          docs.filter(expr(s"doc_id DIV ${chunk}L") === b).coalesce(1),
          table)
      }
      val ranges = Seq((0L, 249L), (100L, 199L), (50L, 450L))
      val rows = ranges.map { case (lo, hi) =>
        org.apache.spark.sql.Row(lo, hi,
          graft.lake.TxLog.countWhere(s, table, "doc_id", lo, hi))
      }
      s.createDataFrame(java.util.Arrays.asList(rows: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("lo",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("hi",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType, nullable = false))))
    } finally {
      Fs.deleteRecursively(root)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_avro_decimal" -> (qAvroDecimal _),
    "q_avro_union" -> (qAvroUnion _),
    "q_lake_partition" -> (qLakePartition _),
    "q_stats_count" -> (qStatsCount _),
    "q_infer_schema" -> (qInferSchema _),
    "q_percentiles" -> (qPercentiles _),
    "q_sessions" -> (qSessions _),
    "q_validate_json" -> (qValidateJson _),
    "q_meta_columns" -> (qMetaColumns _),
    "q_generated_cols" -> (qGeneratedCols _),
    "q_flatten" -> (qFlatten _),
    "q_window_rank" -> (qWindowRank _),
    "q_tumbling_hourly" -> (qTumblingHourly _),
    "q_salted_agg" -> (qSaltedAgg _),
    "q_salted_join" -> (qSaltedJoin _),
    "q_retention" -> (qRetention _),
    "q_group_lag" -> (qGroupLag _)
  )

  val oracleSql: Map[String, String] = Map(
    // each range recounted straight off the source table
    "q_stats_count" ->
      """SELECT CAST(0 AS BIGINT) AS lo, CAST(249 AS BIGINT) AS hi,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM documents WHERE doc_id BETWEEN 0 AND 249
        |UNION ALL
        |SELECT 100, 199, CAST(count(*) AS BIGINT)
        |FROM documents WHERE doc_id BETWEEN 100 AND 199
        |UNION ALL
        |SELECT 50, 450, CAST(count(*) AS BIGINT)
        |FROM documents WHERE doc_id BETWEEN 50 AND 450""".stripMargin,

    "q_lake_partition" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_len,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents WHERE lang = 'de' GROUP BY 1""".stripMargin,

    "q_avro_union" ->
      """SELECT CASE WHEN l_orderkey % 5 = 0 THEN NULL
        |    ELSE CAST(l_orderkey % 2 AS INT) END AS tag,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN l_orderkey % 5 <> 0 AND l_orderkey % 2 = 0
        |    THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS sum_long,
        |  min(CASE WHEN l_orderkey % 5 <> 0 AND l_orderkey % 2 = 1
        |    THEN l_returnflag END) AS min_str,
        |  max(CASE WHEN l_orderkey % 5 <> 0 AND l_orderkey % 2 = 1
        |    THEN l_returnflag END) AS max_str
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q_avro_decimal" ->
      """SELECT l_returnflag AS flag,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
        |    AS DECIMAL(18,2)) AS DOUBLE) AS sum_price,
        |  CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS min_price,
        |  MAX(CAST(l_shipdate AS DATE)) AS max_ship,
        |  COUNT(*) AS n_items
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q_infer_schema" ->
      """WITH log AS (
        |  SELECT event_id % 8 AS "partition", event_id AS "offset",
        |         user_id AS "key"
        |  FROM events)
        |SELECT "partition",
        |  COUNT(*) AS n_k,
        |  CAST(SUM("offset" % 97) AS BIGINT) AS sum_k,
        |  COUNT(*) FILTER (WHERE "offset" % 3 = 0) AS n_tag,
        |  COUNT(*) FILTER (WHERE "offset" % 3 = 1) AS n_extra_a,
        |  MAX("offset" % 13) FILTER (WHERE "offset" % 3 = 1) AS max_extra_a,
        |  CAST(SUM(0.5 + ("offset" % 7)) FILTER (WHERE "offset" % 3 = 2)
        |    AS DOUBLE) AS sum_f,
        |  'extra,f,k,tag' AS inferred_fields
        |FROM log GROUP BY 1""".stripMargin,

    "q_percentiles" ->
      """SELECT event_type, count(*) AS n,
        |  round(quantile_cont("value", 0.5), 6) AS p50,
        |  round(quantile_cont("value", 0.95), 6) AS p95
        |FROM events GROUP BY event_type""".stripMargin,

    "q_sessions" ->
      """WITH log AS (
        |  SELECT user_id, event_id AS "offset",
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events),
        |marked AS (
        |  SELECT user_id, "offset", ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > 1800 * 1000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM log
        |  WINDOW w AS (PARTITION BY user_id ORDER BY "offset")),
        |sess AS (
        |  SELECT user_id, ts_us,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY "offset"
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
        |  FROM marked)
        |SELECT user_id, sess_id, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM sess GROUP BY 1, 2""".stripMargin,
    "q_validate_json" ->
      """WITH v AS (
        |  SELECT event_type,
        |    (json_extract_string(props, '$.k') IS NOT NULL
        |     AND regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+$')
        |     AND CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 0
        |     AND CAST(json_extract_string(props, '$.k') AS DOUBLE) <= 90) AS ok
        |  FROM events)
        |SELECT event_type,
        |  CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
        |  CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid
        |FROM v GROUP BY event_type""".stripMargin,

    "q_meta_columns" ->
      """SELECT year(CAST(ts AS TIMESTAMP)) AS y,
        |  month(CAST(ts AS TIMESTAMP)) AS m,
        |  day(CAST(ts AS TIMESTAMP)) AS d, count(*) AS n
        |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "q_generated_cols" ->
      """SELECT CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS VARCHAR) AS event_date,
        |  CAST(floor("value" / 50) AS BIGINT) AS metric_bucket, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_flatten" ->
      """SELECT event_id AS "offset",
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS v_k
        |FROM events""".stripMargin,

    "q_window_rank" ->
      """SELECT s_suppkey, s_nationkey,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  lag(s_suppkey, 1) OVER w AS prev_suppkey
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey
        |  ORDER BY s_acctbal DESC, s_suppkey)""".stripMargin,

    "q_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1""".stripMargin,

    // the PLAIN join+aggregate: salting must be invisible in results
    "q_salted_join" ->
      """WITH fact AS (
        |  SELECT CASE WHEN l_orderkey % 4 != 0 THEN 0
        |    ELSE l_orderkey % 97 END AS k, l_quantity
        |  FROM lineitem),
        |dim AS (
        |  SELECT DISTINCT k, 'grp-' || CAST(k AS VARCHAR) AS label
        |  FROM fact)
        |SELECT f.k, d.label, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_qty
        |FROM fact f JOIN dim d ON d.k = f.k
        |GROUP BY 1, 2""".stripMargin,

    "q_tumbling_hourly" ->
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_metric
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_retention" ->
      """WITH cfg AS (
        |  SELECT * FROM (VALUES
        |    ('click', 2592000000, 'delete'),
        |    ('purchase', 31536000000, 'delete'),
        |    ('signup', 31536000000, 'compact'),
        |    ('error', 604800000, 'delete'),
        |    ('view', 1209600000, 'delete'))
        |    AS t(topic, retention_ms, cleanup_policy)),
        |log AS (
        |  SELECT event_type AS topic, event_id AS "offset",
        |    CAST(ts AS TIMESTAMP) AS "timestamp" FROM events)
        |SELECT l.topic, count(*) AS n_kept, max("offset") AS max_offset
        |FROM log l LEFT JOIN cfg c ON l.topic = c.topic
        |WHERE NOT contains(coalesce(c.cleanup_policy, 'delete'), 'delete')
        |   OR c.retention_ms IS NULL
        |   OR epoch_us("timestamp") >= epoch_us(TIMESTAMP '2024-03-01 00:00:00')
        |      - c.retention_ms * 1000
        |GROUP BY l.topic""".stripMargin,

    "q_group_lag" ->
      """WITH offs AS (
        |  SELECT * FROM (VALUES (0, 500), (1, 600), (2, 700), (3, 800),
        |    (4, 900), (5, 1000), (6, 1100), (7, 1200))
        |    AS t("partition", committed_offset)),
        |wm AS (
        |  SELECT event_id % 8 AS "partition",
        |    max(event_id) + 1 AS high_watermark
        |  FROM events GROUP BY 1)
        |SELECT wm."partition", CAST(committed_offset AS BIGINT) AS committed_offset,
        |  high_watermark, high_watermark - committed_offset AS lag
        |FROM wm JOIN offs ON wm."partition" = offs."partition"""".stripMargin
  )
}
