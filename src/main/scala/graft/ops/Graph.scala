package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge tables — the web-graph side of
  * corpus curation (a page's link centrality is a classic quality prior
  * for crawl data, used alongside content filters like
  * [[TextAnalysis.gopherFilter]]).
  */
object Graph {

  /** Integer-exact PageRank over a directed edge list `(src, dst)`.
    *
    * Ranks live in the e12 fixed-point domain: every node starts at
    * `1e12 DIV N`, and one round is
    * {{{ r'(v) = (base·(100−damp)) DIV 100
    *           + ((Σ_{u→v} r(u) DIV outdeg(u) + dangling DIV N)·damp) DIV 100 }}}
    * — all BIGINT multiply/DIV (damp is an integer percentage), so the
    * trajectory is bit-for-bit reproducible in any truncating-division
    * engine and across any partitioning: no float summation order
    * anywhere. Dangling mass (nodes with no out-edges) redistributes
    * uniformly, the standard fix. Truncation loses at most N·(iters+2)
    * e-12 units of mass — at N=1e9 that is 0.7% of one unit of rank.
    *
    * Scale shape (the Pregel loop): `edges ⋈ outdeg` materializes ONCE
    * (cached, partitioned by src); each round shuffles only the rank
    * table — |V| rows — for the join and the |V|-row contribution
    * aggregate, never the edge list again. The dangling total is a
    * 1-row aggregate cross-joined back (broadcast, no driver collect);
    * per-round lineage is cut by a localCheckpoint and the previous
    * round's checkpoint is unpersisted (bounded memory at any iteration
    * count — the CC loop's pattern).
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
               damp: Int = 85): DataFrame =
    pageRankPinned(edges, iters, damp, weighted = false)

  /** WEIGHTED PageRank over `(src, dst, m)` — bit-identical to running
    * [[pageRank]] over m duplicated instances of each edge (the
    * per-instance contribution `r DIV d` is constant across an edge's
    * duplicates, so summing m instances IS `m·(r DIV d)`; outdeg
    * becomes `Σm`). The point is the compression: a co-occurrence
    * graph's edge INSTANCES grow with the corpus token count, its edge
    * TYPES only with the bigram vocabulary — at 100 TB the rounds join
    * the type table, orders of magnitude smaller, for the same exact
    * integers.
    */
  def pageRankWeighted(edges: DataFrame, iters: Int = 5,
                       damp: Int = 85): DataFrame =
    pageRankPinned(edges, iters, damp, weighted = true)

  private def pageRankPinned(edges: DataFrame, iters: Int, damp: Int,
                             weighted: Boolean): DataFrame = {
    require(damp >= 0 && damp <= 100, s"damp must be a percentage: $damp")
    val sc = edges.sparkSession.sparkContext
    // Pin the loop's shuffles to the core count: the per-round tables
    // are |V| rows, and under a wide-start AQE regime (a high
    // coalescePartitions.initialPartitionNum, the gram-family
    // robustness setting) every round's joins, aggregates and the
    // localCheckpoint would otherwise carry hundreds of near-empty
    // buckets × iters × stages — measured 2× on the whole query. The
    // loop materializes eagerly (next.count per round), so the pin
    // covers exactly the rounds and is restored before the caller
    // evaluates the returned plan.
    // CONCURRENCY NOTE: the pin mutates SESSION-scoped conf — queries
    // COMPILED on this session by other threads during the rounds plan
    // under the pinned value, and two overlapping pageRank calls could
    // cross their restores. Fine for this engine's one-query-at-a-time
    // execution model (Bench/Verify/streams all serialize per session);
    // a multi-tenant caller should run pageRank on its own session
    // (SparkSession.newSession shares the context, not the conf).
    val conf = edges.sparkSession.conf
    val ipnKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val aqeKey = "spark.sql.adaptive.enabled"
    val spKey = "spark.sql.shuffle.partitions"
    val prevIpn = conf.getOption(ipnKey)
    val prevAqe = conf.getOption(aqeKey)
    val prevSp = conf.getOption(spKey)
    conf.set(ipnKey, sc.defaultParallelism.toString)
    // AQE off for the rounds: with it on, every exchange of every round
    // materializes as its own query-stage job (~7 jobs/round — measured
    // 36 jobs for 5 rounds, ~0.1 s apiece of pure scheduling on the
    // |V|-row tables), and it buys nothing here: the loop's shuffles
    // are already pinned to the core count, the rank table is
    // uniform-hash partitioned (no coalescing or skew work to do), and
    // per-round stats never change a join strategy mid-loop. Restored
    // before the caller's plan evaluates.
    conf.set(aqeKey, "false")
    try pageRankLoop(edges, iters, damp, weighted)
    finally {
      prevIpn match {
        case Some(v) => conf.set(ipnKey, v)
        case None => conf.unset(ipnKey)
      }
      prevAqe match {
        case Some(v) => conf.set(aqeKey, v)
        case None => conf.unset(aqeKey)
      }
      prevSp match {
        case Some(v) => conf.set(spKey, v)
        case None => conf.unset(spKey)
      }
    }
  }

  private def pageRankLoop(edges: DataFrame, iters: Int,
                           damp: Int, weighted: Boolean): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    // cache the EDGE EXPRESSION first: nodes reads it twice (both union
    // sides), outdeg and dedges once each — an uncached caller
    // expression (an explode chain for a co-occurrence graph, a
    // generator join for a link graph) would re-evaluate 4x before the
    // first round even starts (measured 2.5x on q_textrank). A caller
    // that already cached its edges keeps OWNERSHIP of that cache: we
    // must neither re-cache nor unpersist it out from under them.
    val preCached =
      edges.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val e = if (preCached) edges else edges.cache()
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct().cache()
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge list")
    val base = 1000000000000L / n
    // scale-adaptive round width (the ccPartitionsFor rule): the rounds
    // shuffle |V|-row tables, and a fixed core-count width charges every
    // stage of every round 32 near-empty tasks whose fixed overhead
    // dominates small graphs (measured ~0.1 s/task on a 5k-node graph —
    // 650 tasks/run of pure launch cost); a big graph still gets up to
    // 4x the cluster's parallelism. Set BEFORE the caches below so
    // outdeg/dedges materialize at the loop's width; AQE is off inside
    // the loop, so spark.sql.shuffle.partitions is what binds.
    edges.sparkSession.conf.set("spark.sql.shuffle.partitions",
      graft.ops.Dedup.ccPartitionsFor(n, sc.defaultParallelism).toString)
    // outdeg caches too: the per-round dangling anti-join reads it, and
    // uncached it would re-scan + re-aggregate the edge list every
    // round (the exact cost the dedges cache exists to avoid)
    val outdeg = (if (weighted)
        e.groupBy(col("src")).agg(sum(col("m")).as("d"))
      else e.groupBy(col("src")).agg(count(lit(1)).as("d")))
      .cache()
    val dedges = e.join(outdeg, "src").cache()
    dedges.count() // materializes the outdeg cache through the join too
    if (!preCached) e.unpersist() // derivations materialized; drop OUR cache
    val contrib = if (weighted) "m * (r DIV d)" else "r DIV d"
    // The dangling flag is STATIC per node, so it rides INSIDE the
    // checkpointed rank table: the per-round dangling total is then a
    // 1-row aggregate over the (cached) ranks instead of a |V|-vs-|V|
    // anti-join, and the zero-contribution nodes are restored by a
    // self-union into the contribution aggregate instead of a nodes
    // re-join — two |V| joins fewer per round, same integer trajectory
    // bit for bit (s was NULL-coalesced to 0 before; the self-union's
    // 0-row makes the sum 0 directly).
    var prevIds: scala.collection.Set[Int] = Set.empty
    // ONE action per round: materializing the round's checkpoint and
    // summing the NEXT round's dangling mass ride the same aggregate,
    // so neither a broadcast-subquery job nor a second pass exists.
    // The 1-row result is driver-side by construction (k-bounded
    // collect discipline); the dangling sum is <= the 1e12 total rank
    // mass, so the Long holds it and `dt / n` (both non-negative)
    // equals the SQL DIV the oracle replays.
    def materializeWithDangling(df: DataFrame): Long =
      df.agg(coalesce(sum(when(col("__dang"), col("r"))), lit(0L)))
        .head().getLong(0)
    val beforeInit = sc.getPersistentRDDs.keySet
    val init = nodes.join(outdeg, nodes("v") === outdeg("src"), "left")
      .select(nodes("v"), lit(base).as("r"), col("src").isNull.as("__dang"))
      .localCheckpoint(false)
    var dt = materializeWithDangling(init)
    prevIds = sc.getPersistentRDDs.keySet -- beforeInit
    var ranks = init
    for (_ <- 1 to iters) {
      val share = dt / n
      val contribs = dedges
        .join(ranks, col("src") === col("v"))
        .select(col("dst").as("v"), expr(contrib).as("x"),
          lit(null).cast("boolean").as("__dang"))
      // the checkpoint RDD registers as persistent at the
      // localCheckpoint CALL (not at materialization), so the id diff
      // must open BEFORE the definition or every round leaks its table
      val beforeIds = sc.getPersistentRDDs.keySet
      val next = contribs
        .unionByName(ranks.select(col("v"), lit(0L).as("x"), col("__dang")))
        .groupBy(col("v"))
        // max ignores the contrib rows' nulls; the self-row (exactly
        // one per node) always carries the real flag
        .agg(sum(col("x")).as("s"), max(col("__dang")).as("__dang"))
        .select(col("v"),
          (lit(base * (100 - damp) / 100) +
            expr(s"((s + ${share}L) * $damp) DIV 100"))
            .as("r"),
          col("__dang"))
        .localCheckpoint(false)
      dt = materializeWithDangling(next)
      val thisIds = sc.getPersistentRDDs.keySet -- beforeIds
      prevIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      prevIds = thisIds
      ranks = next
    }
    nodes.unpersist()
    outdeg.unpersist()
    dedges.unpersist()
    ranks.drop("__dang")
  }
}
