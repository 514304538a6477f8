package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.NgramOverlapExpressions.ngramOverlap

/** Integer-exact evaluation metrics over generation / sampling output —
  * the scoring half of an eval harness, distributed and rerun-stable.
  *
  * Every score is an e6-scaled integer built from exact counts with SQL
  * DIV truncation, so Spark and the DuckDB oracle agree bit for bit and
  * reruns at any partitioning replay the same numbers (no float
  * reduction order anywhere).
  *
  * Reference spec: the reference engine ships eval aggregation over its
  * log tables (tansu's SQL surface); the metric definitions are the
  * published ones — ROUGE-N (Lin 2004), BLEU modified precision
  * (Papineni et al. 2002), pass@k's unbiased estimator (Chen et al.
  * 2021, eq. 1), Bradley-Terry strengths via the MM algorithm
  * (Hunter 2004).
  */
object EvalMetrics {

  private def tokensOf(c: Column): Column =
    filter(split(c, " "), t => t =!= lit(""))

  /** ROUGE-N per (candidate, reference) pair: clipped n-gram matches,
    * both gram totals, and e6-scaled precision / recall / F1.
    *
    * Scale shape: ONE narrow map — the clipped counting runs inside the
    * per-pair [[graft.functions.NgramOverlapCounts]] kernel, so the
    * pairs table is never exploded into gram rows and nothing shuffles.
    *
    * `pairs` needs (pairIdCol, candCol, refCol) text columns.
    */
  def rougeN(pairs: DataFrame, n: Int, pairIdCol: String = "pair_id",
             candCol: String = "cand", refCol: String = "ref"): DataFrame = {
    val o = ngramOverlap(tokensOf(col(candCol)), tokensOf(col(refCol)), n)
    val m = col("__o")(s"m$n")
    val tc = col("__o")(s"tc$n")
    val tr = col("__o")(s"tr$n")
    val p = when(tc > 0, expr(s"__o.m$n * 1000000L DIV __o.tc$n"))
      .otherwise(0L)
    val r = when(tr > 0, expr(s"__o.m$n * 1000000L DIV __o.tr$n"))
      .otherwise(0L)
    pairs.withColumn("__o", o)
      .select(col(pairIdCol), m.as("m"), tc.as("t_cand"), tr.as("t_ref"),
        p.as("p_e6"), r.as("r_e6"))
      .withColumn("f1_e6",
        when(col("p_e6") + col("r_e6") > 0,
          expr("2L * p_e6 * r_e6 DIV (p_e6 + r_e6)")).otherwise(0L))
  }

  /** BLEU components per pair, integer-exact: clipped matches `m1..m4`
    * and candidate gram totals `t1..t4`, token lengths, the brevity
    * deficit max(0, ref_len - cand_len) (zero exactly when BP = 1), and
    * `bleu_prod_e6` = e6·(p1·p2·p3·p4) — the 4th power of BLEU's
    * geometric mean sans root, monotone in BLEU wherever BP = 1. The
    * root and exp(1 - r/c) are transcendental, so the score a trainer
    * thresholds on ships as these exact integers instead of a
    * libm-dependent double (products run in DECIMAL(38): t^4·1e6 can
    * pass 2^63).
    */
  def bleuCounts(pairs: DataFrame, pairIdCol: String = "pair_id",
                 candCol: String = "cand", refCol: String = "ref"): DataFrame = {
    val o = ngramOverlap(tokensOf(col(candCol)), tokensOf(col(refCol)), 4)
    val withO = pairs.withColumn("__o", o)
    val cols = Seq(col(pairIdCol)) ++
      (1 to 4).flatMap(n => Seq(
        col("__o")(s"m$n").as(s"m$n"), col("__o")(s"tc$n").as(s"t$n"))) ++
      Seq(col("__o")("cand_len").as("cand_len"),
        col("__o")("ref_len").as("ref_len"),
        greatest(col("__o")("ref_len") - col("__o")("cand_len"), lit(0L))
          .as("bp_deficit"))
    withO.select(cols: _*)
      .withColumn("bleu_prod_e6",
        when(col("t1") > 0 && col("t2") > 0 && col("t3") > 0 && col("t4") > 0,
          expr("""CAST(
            CAST(m1 AS DECIMAL(38,0)) * m2 * m3 * m4 * 1000000 DIV
            (CAST(t1 AS DECIMAL(38,0)) * t2 * t3 * t4) AS BIGINT)"""))
          .otherwise(0L))
  }

  /** pass@k per problem from per-sample correctness — the unbiased
    * estimator 1 - C(n-c, k)/C(n, k) (Chen et al. 2021), EXACT as an
    * e6 integer: the k! cancels, so the ratio is the falling-factorial
    * quotient ff_k(n-c)/ff_k(n), computed with longs (any factor <= 0
    * zeroes ff, which is C's own boundary behavior).
    *
    * Problems with n < k carry no estimate and are dropped (the
    * estimator is undefined there); `samples` needs (problemIdCol,
    * correctCol boolean).
    *
    * Scale shape: one hash aggregate over samples, then arithmetic on
    * the per-problem row — nothing else.
    */
  def passAtK(samples: DataFrame, k: Int,
              problemIdCol: String = "problem_id",
              correctCol: String = "correct"): DataFrame = {
    require(k >= 1, s"passAtK: k must be positive (got $k)")
    def ff(a: Column): Column =
      aggregate(sequence(lit(0), lit(k - 1)), lit(1L),
        (acc, i) => acc * greatest(a - i, lit(0L)))
    samples
      .groupBy(col(problemIdCol))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col(correctCol).cast("long")), lit(0L)).as("c"))
      .filter(col("n") >= k)
      .withColumn("__ffnc", ff(col("n") - col("c")))
      .withColumn("__ffn", ff(col("n")))
      .select(col(problemIdCol), col("n"), col("c"),
        (lit(1000000L) - expr("1000000L * __ffnc DIV __ffn"))
          .as("pass_at_k_e6"))
  }

  /** Tie-aware AUC, EXACT: the Mann-Whitney pair formulation
    * AUC = (#(pos > neg) + ½·#(pos = neg)) / (n_pos·n_neg), computed in
    * halves so the ½ never leaves the integers —
    * auc_e6 = (2·gt + eq)·1e6 DIV (2·n_pos·n_neg).
    *
    * Scale shape: the corpus collapses to one row PER DISTINCT SCORE in
    * a single hash aggregate (a trained quality scorer emits bounded
    * integer scores); the rank-style cumulative runs over that tiny
    * table, never over documents. Returns one row:
    * (n_pos, n_neg, auc_e6).
    */
  def aucExact(scored: DataFrame, scoreCol: String = "score",
               labelCol: String = "label"): DataFrame = {
    val perScore = scored
      .groupBy(col(scoreCol).as("__s"))
      .agg(sum(col(labelCol).cast("long")).as("__p"),
        sum(lit(1L) - col(labelCol).cast("long")).as("__q"))
    val w = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("__cq", coalesce(sum(col("__q")).over(w), lit(0L)))
      .agg(sum(expr("__p * __cq")).as("__gt"),
        sum(expr("__p * __q")).as("__eq"),
        sum(col("__p")).as("n_pos"), sum(col("__q")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("(2L * __gt + __eq) * 1000000L DIV (2L * n_pos * n_neg)"))
          .otherwise(lit(null).cast("long")).as("auc_e6"))
  }

  /** Reliability diagram + ECE, EXACT: per confidence bin the count,
    * correct count, e6 accuracy and mean confidence (DIV truncation),
    * and the bin's |Σcorrect·1e6 − Σconf_e6| gap mass; the global
    * `ece_e6` = Σ_b gap_mass_b DIV N rides every row (the n_b-weighted
    * |acc − conf| definition, kept in un-divided sums so nothing is
    * rounded before the final DIV).
    *
    * `scored` needs an e6 confidence column and a boolean/0-1
    * correctness column. bin = min(conf·B DIV 1e6, B−1). One hash
    * aggregate to B rows, then arithmetic.
    */
  def calibrationBins(scored: DataFrame, bins: Int = 10,
                      confCol: String = "conf_e6",
                      correctCol: String = "correct"): DataFrame = {
    require(bins >= 1, s"calibrationBins: bins must be positive ($bins)")
    val binned = scored.select(
      least(expr(s"($confCol * ${bins}L) DIV 1000000"), lit(bins - 1L))
        .as("bin"),
      col(confCol).cast("long").as("__conf"),
      col(correctCol).cast("long").as("__ok"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("__ok").as("n_correct"),
        sum("__conf").as("sum_conf_e6"))
      .withColumn("gap_mass",
        abs(col("n_correct") * 1000000L - col("sum_conf_e6")))
    val tot = binned.agg(sum("n").as("__nn"),
      sum("gap_mass").as("__gm"))
    binned.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("n_correct"),
        expr("n_correct * 1000000L DIV n").as("acc_e6"),
        expr("sum_conf_e6 DIV n").as("avg_conf_e6"),
        expr("gap_mass DIV n").as("gap_e6"),
        expr("__gm DIV __nn").as("ece_e6"))
  }

  /** Kendall tau-a rank correlation between two integer score columns,
    * EXACT: concordant/discordant pair counts and
    * tau_a_e6 = (C − D)·1e6 DIV (n(n−1)/2) — the two-scorer agreement
    * audit (negative numerators are safe: Spark DIV and the oracle's
    * // both truncate toward zero).
    *
    * Scale shape: the corpus collapses to one CELL per distinct
    * (x, y) score pair in a single aggregate (bounded-domain scores —
    * quality models emit e2/e6 integers); pair counting is a cell×cell
    * self-join over that bounded table, never over rows. Returns one
    * row: (n, concordant, discordant, tau_a_e6).
    */
  def kendallTauA(scored: DataFrame, xCol: String = "x",
                  yCol: String = "y"): DataFrame = {
    val cells = scored.groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__c"))
    val a = cells.select(col("__x").as("xa"), col("__y").as("ya"),
      col("__c").as("ca"))
    val b = cells.select(col("__x").as("xb"), col("__y").as("yb"),
      col("__c").as("cb"))
    val pairs = a.join(broadcast(b), col("xb") > col("xa"))
      .select(
        when(col("yb") > col("ya"), expr("ca * cb")).otherwise(0L)
          .as("__con"),
        when(col("yb") < col("ya"), expr("ca * cb")).otherwise(0L)
          .as("__dis"))
      .agg(coalesce(sum("__con"), lit(0L)).as("concordant"),
        coalesce(sum("__dis"), lit(0L)).as("discordant"))
    val n = cells.agg(sum("__c").as("n"))
    n.crossJoin(pairs)
      .select(col("n"), col("concordant"), col("discordant"),
        when(col("n") >= 2,
          expr("(concordant - discordant) * 1000000L DIV " +
            "((n * (n - 1L)) DIV 2L)"))
          .otherwise(lit(null).cast("long")).as("tau_a_e6"))
  }

  /** Cohen's kappa between two raters over a shared label column pair,
    * EXACT in e6: po and pe stay integer (pe over n²), and
    * kappa_e6 = (po_e6 − pe_e6)·1e6 DIV (1e6 − pe_e6). One aggregate
    * to the k×k confusion matrix (labels are categories — bounded),
    * arithmetic after. Returns one row:
    * (n, n_agree, po_e6, pe_e6, kappa_e6); NULL kappa when pe = 1
    * (both raters constant — undefined).
    */
  def cohenKappa(rated: DataFrame, aCol: String = "a",
                 bCol: String = "b"): DataFrame = {
    val conf = rated.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val ma = conf.groupBy("__a").agg(sum("__c").as("__na"))
    val mb = conf.groupBy("__b").agg(sum("__c").as("__nb"))
    val pe = ma.join(mb, col("__a") === col("__b"))
      .agg(coalesce(sum(expr("__na * __nb")), lit(0L)).as("__pe_num"))
    val agg = conf.agg(sum("__c").as("n"),
      coalesce(sum(when(col("__a") === col("__b"), col("__c"))), lit(0L))
        .as("n_agree"))
    agg.crossJoin(broadcast(pe))
      .select(col("n"), col("n_agree"),
        expr("n_agree * 1000000L DIV n").as("po_e6"),
        expr("__pe_num * 1000000L DIV (n * n)").as("pe_e6"))
      .withColumn("kappa_e6",
        when(col("pe_e6") < 1000000L,
          expr("(po_e6 - pe_e6) * 1000000L DIV (1000000L - pe_e6)"))
          .otherwise(lit(null).cast("long")))
  }

  /** Bradley-Terry strengths from pairwise game outcomes via `iters`
    * MM rounds (Hunter 2004: p_i <- W_i / sum_j n_ij/(p_i+p_j)),
    * e6 fixed-point with DIV truncation at every step — deterministic
    * under any partitioning, bit-replayable by the oracle's CTE chain.
    *
    * `games` needs one row per unordered player pair (iCol < jCol by
    * convention) with total games `nCol` and i's wins `wiCol`. Players
    * appearing only in zero-game rows are excluded (their MM update is
    * 0/0). Strengths normalize to sum = |players|·1e6 each round.
    *
    * Scale shape: the corpus-scale work is the caller's WINS
    * aggregation; the matrix itself is |players|²-bounded (league
    * tables are small by nature), so it collapses to ONE row and the
    * MM rounds run IN-ROW over arrays with higher-order functions —
    * zero joins, zero broadcasts, zero per-round jobs. The first cut
    * ran the rounds as distributed tiny-table joins: each round
    * embedded the previous round's plan twice (a 38k-line physical
    * plan, 2.7k exchanges) and even cached+broadcast+checkpointed the
    * loop paid ~2 s/round in near-empty-task scheduling — 8.1 s at
    * sf0.1 for a FOUR-player matrix vs ~1 s for this shape. Long
    * addition is commutative/associative exactly, so folding the sums
    * with `aggregate` replays the distributed sums bit for bit.
    */
  def bradleyTerry(games: DataFrame, iters: Int = 3,
                   iCol: String = "i", jCol: String = "j",
                   nCol: String = "n", wiCol: String = "wi"): DataFrame = {
    require(iters >= 1, s"bradleyTerry: iters must be positive (got $iters)")
    val pm = games.filter(col(nCol) > 0)
      .select(col(iCol).as("i"), col(jCol).as("j"),
        col(nCol).cast("long").as("n"), col(wiCol).cast("long").as("wi"))
    // ONE row carries the whole matrix (the k-bounded collect
    // discipline: |players|² structs, never corpus rows). The bound is
    // ENFORCED, not just documented: a caller passing an unbounded
    // player set would funnel the whole matrix into a single task row
    // (executor OOM) — the guard makes that misuse fail loudly with a
    // named limit instead. 250k pair rows ≈ a 700-player full league
    // (~10 MB of structs in the one row), far above any real
    // league-table use and far below task-memory trouble.
    val maxPairRows = 250000
    val m = pm.agg(collect_list(struct(col("i"), col("j"), col("n"),
      col("wi"))).as("ms"))
      // assert_true returns NULL on success, so the filter keeps the
      // row; a column-riding guard would be pruned as unused
      .filter(coalesce(expr(
        s"assert_true(size(ms) <= $maxPairRows, 'bradleyTerry: more " +
          s"than $maxPairRows pair rows — the in-row MM shape assumes " +
          "a bounded player set; use a distributed formulation for " +
          "leagues this large')"), lit(true)))
    // players sorted (a deterministic array order so every transform
    // below is order-pinned), per-player wins/games folded from the
    // matrix — identical terms to the union-groupBy formulation
    val prep = m.select(
      col("ms"),
      array_sort(array_distinct(flatten(transform(col("ms"),
        x => array(x("i"), x("j")))))).as("ps"))
      .withColumn("ws", expr(
        """transform(ps, pl -> aggregate(ms, 0L, (acc, x) ->
          |  acc + CASE WHEN x.i = pl THEN x.wi
          |             WHEN x.j = pl THEN x.n - x.wi
          |             ELSE 0L END))""".stripMargin))
      .withColumn("gs", expr(
        """transform(ps, pl -> aggregate(ms, 0L, (acc, x) ->
          |  acc + IF(x.i = pl OR x.j = pl, x.n, 0L)))""".stripMargin))
    // MM rounds as column-to-column array arithmetic; each round is a
    // separate projection so the lineage stays linear in `iters`
    var cur = prep.withColumn("p", expr("transform(ps, pl -> 1000000L)"))
    for (_ <- 1 to iters) {
      cur = cur
        .withColumn("__pm", map_from_arrays(col("ps"), col("p")))
        .withColumn("__den", expr(
          """transform(ps, pl -> aggregate(ms, 0L, (acc, x) ->
            |  acc + CASE
            |    WHEN x.i = pl THEN
            |      x.n * 1000000000000L DIV (element_at(__pm, pl) +
            |        element_at(__pm, x.j))
            |    WHEN x.j = pl THEN
            |      x.n * 1000000000000L DIV (element_at(__pm, pl) +
            |        element_at(__pm, x.i))
            |    ELSE 0L END))""".stripMargin))
        .withColumn("__praw", expr(
          "zip_with(ws, __den, (w, d) -> w * 1000000000000L DIV d)"))
        .withColumn("__sp", expr(
          "aggregate(__praw, 0L, (acc, v) -> acc + v)"))
        .withColumn("p", expr(
          "transform(__praw, v -> v * (size(ps) * 1000000L) DIV __sp)"))
        .drop("__pm", "__den", "__praw", "__sp")
    }
    cur.select(explode(arrays_zip(col("ps"), col("ws"), col("gs"),
        col("p"))).as("z"))
      .select(col("z.ps").as("player"), col("z.ws").as("wins"),
        col("z.gs").as("games"), col("z.p").as("strength_e6"))
  }
}
