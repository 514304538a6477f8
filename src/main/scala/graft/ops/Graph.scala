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
    val caller = edges.sparkSession
    val sc = caller.sparkContext
    // ALL of the op's work runs on a PRIVATE child session, so no
    // session-global conf mutation exists (the r15 shape pinned the
    // SHARED session conf for the op's duration — safe only under a
    // one-query-at-a-time execution model; a concurrent caller compiled
    // other queries under the pin). The child starts as a conf copy of
    // the caller and is pinned in two steps.
    //
    // Phase 1 — AQE stays ON (the corpus-scale edge expression — an
    // explode chain for a co-occurrence graph, a generator join for a
    // link graph — keeps adaptive join strategies and skew handling)
    // but initialPartitionNum/shuffle.partitions drop to the core
    // count: CACHED plans get AQE "without partition-changing rules"
    // (canChangeCachedPlanOutputPartitioning=false, the default), so
    // under the session's wide-start robustness regime (ipn=256) the
    // nodes/e caches materialized as 256-partition relations and every
    // loop-side scan of them paid 256 near-empty tasks — measured
    // 1312 tasks/run (q_pagerank 1.60 s → 3.02 s) before this pin, 159
    // after.
    val loopSess = org.apache.spark.sql.graftshim.SessionBridge
      .childSessionLike(caller)
    val dp = math.max(sc.defaultParallelism, 1)
    loopSess.conf.set("spark.sql.shuffle.partitions", dp.toString)
    loopSess.conf.set(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      dp.toString)
    // cache the EDGE EXPRESSION first: nodes reads it twice (both union
    // sides), outdeg and dedges once each — uncached it would
    // re-evaluate 4x before the first round even starts (measured 2.5x
    // on q_textrank). A caller that already cached its edges keeps
    // OWNERSHIP of that cache: we must neither re-cache nor unpersist
    // it out from under them.
    val preCached =
      edges.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val e0 = org.apache.spark.sql.graftshim.SessionBridge
      .transplant(edges, loopSess)
    val e = if (preCached) e0 else e0.cache()
    val nE = e.count() // materializes the edge cache (phase-1 conf)
    // the nodes distinct shuffles 2|E| rows — size ITS build from the
    // edge count (the ccPartitionsFor rule), now known, instead of
    // paying dp near-empty buckets on a small graph or starving a
    // billion-edge distinct at the core count
    val buildW = graft.ops.Dedup.ccPartitionsFor(2L * nE,
      sc.defaultParallelism)
    loopSess.conf.set("spark.sql.shuffle.partitions", buildW.toString)
    loopSess.conf.set(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      buildW.toString)
    // AQE's usefulness ends with the edge-expression materialization
    // above (adaptive join strategy / skew handling for the corpus
    // stage); everything from here on shuffles uniform-hash graph
    // tables at explicitly sized widths, where AQE only adds one
    // query-stage scheduling job per exchange (~0.1 s apiece on |V|-row
    // tables — measured +0.5 s on q_pagerank when the distinct and the
    // loop ran with it on).
    loopSess.conf.set("spark.sql.adaptive.enabled", "false")
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct().cache()
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge list")
    // Phase 2 — pin the loop. Scale-adaptive round width (the
    // ccPartitionsFor rule): the rounds shuffle |V|-row tables, and a
    // fixed core-count width charges every stage of every round 32
    // near-empty tasks whose fixed overhead dominates small graphs
    // (measured ~0.1 s/task on a 5k-node graph — 650 tasks/run of pure
    // launch cost); a big graph still gets up to 4x the cluster's
    // parallelism.
    //
    // Edge rows get a separate, much larger per-partition budget than
    // the ccPartitionsFor shuffle rule: the contribution join STREAMS
    // dedges from a co-partitioned cache (a few longs per row, no
    // exchange), so an edge row costs far less than a shuffled corpus
    // row. Sizing the width by max(|V|, |E|) under the 50k-row shuffle
    // rule re-widened the loop at sf0.1 (width 31 on a 1.5M
    // bigram-type graph — q_textrank 2.67 s → 5.47 s measured); |E|/2M
    // keeps small graphs at width 1-2 while a dense 100-TB
    // co-occurrence graph (|V|=5k vocab, |E|~1e9 types) still fans its
    // per-round edge work out to the 4x-parallelism cap instead of
    // packing it into a |V|-derived handful of partitions.
    //
    // AQE off for the loop: with it on, every exchange of every round
    // materializes as its own query-stage job (~7 jobs/round — measured
    // 36 jobs for 5 rounds, ~0.1 s apiece of pure scheduling on the
    // |V|-row tables), and it buys nothing here — the loop's shuffles
    // are width-pinned, the rank table is uniform-hash partitioned (no
    // coalescing or skew work to do), and per-round stats never change
    // a join strategy mid-loop.
    val width = math.min(4 * dp,
      math.max(graft.ops.Dedup.ccPartitionsFor(n, sc.defaultParallelism),
        (nE / 2000000L + 1L).toInt))
    loopSess.conf.set("spark.sql.shuffle.partitions", width.toString)
    loopSess.conf.set(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      width.toString)
    loopSess.conf.set("spark.sql.adaptive.enabled", "false")
    if (sys.env.contains("GRAFT_PR_DEBUG"))
      println(s"[prdbg] n=$n nE=$nE width=$width " +
        s"childSp=${loopSess.conf.get("spark.sql.shuffle.partitions")} " +
        s"childAqe=${loopSess.conf.get("spark.sql.adaptive.enabled")}")
    val ranks = pageRankLoop(e, nodes,
      n, iters, damp, weighted, dropECache = !preCached)
    // hand the result back on the CALLER's session: downstream operators
    // (top-k sorts, joins with caller tables) must plan under the
    // caller's conf, not the loop pins
    org.apache.spark.sql.graftshim.SessionBridge.transplant(ranks, caller)
  }

  private def pageRankLoop(e: DataFrame, nodes: DataFrame, n: Long,
                           iters: Int, damp: Int, weighted: Boolean,
                           dropECache: Boolean): DataFrame = {
    val sc = e.sparkSession.sparkContext
    val base = 1000000000000L / n
    // outdeg/dedges build ON THE LOOP SESSION: the e ⋈ outdeg exchange
    // lands directly at the loop width keyed on src, so the per-round
    // contribution join reads the cache co-partitioned with the round's
    // rank exchange — no per-round re-shuffle of the edge table. The
    // input e is already materialized (cache shared via SharedState),
    // so only the |E|→|V| aggregate and one |E| join run at the pinned
    // width.
    // outdeg caches too: the per-round dangling anti-join reads it, and
    // uncached it would re-scan + re-aggregate the edge list every
    // round (the exact cost the dedges cache exists to avoid)
    val outdeg = (if (weighted)
        e.groupBy(col("src")).agg(sum(col("m")).as("d"))
      else e.groupBy(col("src")).agg(count(lit(1)).as("d")))
      .cache()
    val dedges = e.join(outdeg, "src").cache()
    dedges.count() // materializes the outdeg cache through the join too
    if (dropECache) e.unpersist() // derivations materialized; drop OUR cache
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
