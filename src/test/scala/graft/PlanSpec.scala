package graft

/** Plan-quality regression guards — the "is this still the plan you'd
  * want at 100 TB" checks run as tests, not by eye:
  *
  *  - dimension joins stay broadcast (no SortMergeJoin creep when a
  *    stats change flips a join strategy)
  *  - the offset-range scan pushes its predicate into the parquet scan
  *    (file/row-group pruning at the source, reference dynostore's
  *    key-prefix pruning `dynostore.rs:1046-1078`)
  *  - the byte-budget window runs per partition, never "move all data
  *    to a single partition"
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // AQE finalizes the plan only after execution
    df.queryExecution.executedPlan.toString
  }

  test("q3/q5 dimension joins broadcast - no SortMergeJoin in the plan") {
    Seq("q3_top_revenue", "q5_nation_revenue").foreach { q =>
      val plan = executedPlan(q)
      assert(!plan.contains("SortMergeJoin"), s"$q fell back to SMJ")
      assert(plan.contains("BroadcastHashJoin"), s"$q lost its broadcasts")
    }
  }

  test("q7's six-table graph keeps every dimension broadcast") {
    val plan = executedPlan("q7_volume")
    assert(!plan.contains("SortMergeJoin"), "q7 fell back to SMJ")
    assert(!plan.contains("CartesianProduct"), "q7 planned a cartesian")
    assert(plan.contains("BroadcastHashJoin"), "q7 lost its broadcasts")
  }

  test("q17's decorrelated threshold is a broadcast, never a re-scan per row") {
    val plan = executedPlan("q17_small_qty")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "q17's correlation must stay an equi-join")
    assert(plan.contains("BroadcastHashJoin"),
      "q17's part filter and thresholds should broadcast")
  }

  test("q_profile is ONE aggregate pass (Expand for multi-distinct, no join)") {
    val plan = executedPlan("q_profile")
    assert(!plan.contains("Join"), "profiler must not self-join per column")
    assert(plan.contains("Expand"),
      "multi-column countDistinct should plan as one Expand+aggregate")
  }

  test("q_knn_join broadcasts the query set; its top-k window partitions per query") {
    val plan = executedPlan("q_knn_join")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "the query side must broadcast — a shuffled |q|x|corpus| join " +
        "explodes at scale")
    assert(!plan.contains("CartesianProduct"),
      "fan-out must ride the broadcast, never a shuffled cartesian")
    assert("Window \\[[^\\]]*\\], \\[q_id".r.findFirstIn(plan).isDefined,
      s"the top-k window must partition by the query id, never globally")
  }

  test("q_hard_negatives: query set broadcasts; both rank windows partition per query") {
    val plan = executedPlan("q_hard_negatives")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "the query side must broadcast — a shuffled |q|x|corpus| join " +
        "explodes at scale")
    assert(!plan.contains("CartesianProduct"),
      "fan-out must ride the broadcast, never a shuffled cartesian")
    assert("Window \\[[^\\]]*\\], \\[q_id".r.findFirstIn(plan).isDefined,
      "the shortlist/re-rank windows must partition by the query id")
    // the re-rank window reuses the shortlist window's q_id partitioning
    // — exactly one q_id exchange in the FINAL plan (AQE's toString
    // appends an "== Initial Plan ==" section that would double-count)
    val exchanges = "Exchange hashpartitioning\\(q_id".r
      .findAllIn(plan.split("== Initial Plan ==").head).size
    assert(exchanges <= 1,
      s"re-rank must reuse the shortlist partitioning, saw $exchanges q_id exchanges")
  }

  test("q_zipf is a combining aggregate + TakeOrdered (no corpus sort)") {
    val plan = executedPlan("q_zipf")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-vocab cut must TakeOrdered, never sort the vocabulary globally")
    assert(!plan.contains("Join"), "rank-frequency needs no join")
  }

  test("q_lm_index serve joins the at-rest count tables on hashes " +
    "(no cartesian; the only NL join is the 1-row total broadcast)") {
    val plan = executedPlan("q_lm_index")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"),
      "index serve must stay equi-join + aggregate work")
    // count in the FINAL plan only (AQE toString doubles nodes in its
    // "== Initial Plan ==" section)
    val nl = "BroadcastNestedLoopJoin".r
      .findAllIn(plan.split("== Initial Plan ==").head).size
    assert(nl <= 1, s"only the 1-row total may NL-join, saw $nl")
  }

  test("trained lang-id: profile join broadcasts; windows stay keyed") {
    val plan = executedPlan("q_langid_trained")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastHashJoin"),
      "the langs x topN profile table must broadcast to the gram join")
    assert("Window \\[[^\\]]*\\], \\[(lang|doc_id)".r
      .findFirstIn(plan).isDefined,
      "ranking windows must partition by lang/doc")
    // and NO window may be global: an empty partition spec funnels the
    // corpus through one partition
    assert("Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(plan).isEmpty,
      "found an unpartitioned window in the lang-id plan")
  }

  test("q6 pushes every filter to the scan; q14's ratio is one aggregate pass") {
    val p6 = executedPlan("q6_forecast")
    // the plan STRING truncates long filter lists, so pin the scan-level
    // pushdown marker + the leading predicate rather than every filter
    assert(p6.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      (p6.contains("PushedFilters:") && p6.contains("l_shipdate")),
      "Q6's filters must reach the parquet scan for row-group pruning: " +
        p6.take(600))
    assert(!p6.contains("Exchange hashpartitioning"),
      "a global scalar aggregate needs no hash shuffle")
    val p14 = executedPlan("q14_promo")
    assert(p14.contains("BroadcastHashJoin"),
      "the part dimension must broadcast")
    // numerator and denominator share ONE aggregate node: the partial
    // HashAggregate line carries BOTH sums (conditional + plain)
    assert("partial_sum\\(CASE WHEN[^\\n]*partial_sum\\(cast".r
      .findFirstIn(p14).isDefined,
      "the ratio must compute both sums in one pass, never two scans")
  }

  test("q18's HAVING survivors broadcast back; q10 takes top-20 without a global sort") {
    val p18 = executedPlan("q18_large_orders")
    assert(p18.contains("BroadcastHashJoin"),
      "the threshold-thinned order set must broadcast as the semi filter")
    assert(!p18.contains("CartesianProduct"))
    val p10 = executedPlan("q10_returned")
    assert(p10.contains("TakeOrderedAndProject"),
      "top-20 must plan as TakeOrdered, never a corpus-wide Sort")
    assert(p10.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]")
      || p10.contains("EqualTo(l_returnflag,R)"),
      "the returnflag predicate must reach the parquet scan")
  }

  test("q_bloom_dedup broadcasts the bloom; bit-fold aggregates map-side") {
    val plan = executedPlan("q_bloom_dedup")
    assert(plan.contains("BroadcastHashJoin"),
      "the bloom words (m/32 rows) must broadcast to the probe side — " +
        "shuffling the probe corpus on word ids defeats the sketch")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      "probe must be an equi-join on the word id")
    assert("partial_bit_or|partial_bitor|bit_or".r.findFirstIn(plan).isDefined
      && plan.contains("HashAggregate"),
      "the build must fold bits in a map-side-combining hash aggregate")
  }

  test("offset-range scan pushes the offset predicate into the parquet scan") {
    // read from a COPIED path: the cache manager swaps any plan that
    // matches a relation another suite cached (InMemoryTableScan has no
    // PushedFilters) — P1 as a source-level prune: the filter must
    // reach the parquet scan, not run post-scan only
    val tmp = java.nio.file.Files.createTempDirectory("graft-planspec")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      tmp.resolve("documents.parquet"))
    val df = spark.read.parquet(tmp.resolve("documents.parquet").toString)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 100)
      .select("doc_id", "source")
    val scan = df.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(doc_id,100\\)".r
      .findFirstIn(scan).isDefined, scan.take(800))
    // and column pruning: the 2-column projection reads a 2-column schema
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      scan.take(800))
  }

  test("byte-budget running sum windows per partition (no global window)") {
    val plan = executedPlan("q_fetch_budget")
    // a missing partitionBy would plan a single-partition window - the
    // scale-killer WindowExec warns about
    assert(plan.contains("Window"), plan.take(400))
    assert(!plan.matches("(?s).*Window.*SinglePartition.*"),
      "byte-budget window lost its partitioning")
  }

  test("pair-generating dedup joins stay equi-joins (no cartesian)") {
    Seq("q_dedup_minhash", "q_dedup_simhash", "q_near_dup_vectors").foreach { q =>
      val plan = executedPlan(q)
      assert(!plan.contains("CartesianProduct"), s"$q planned a cartesian")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q planned a NL join")
    }
  }

  test("packing/shuffle document windows stay partitioned (no global window)") {
    // the corpus-sized window in each op must be keyed (stream / bucket);
    // only the tiny bucket-offset table may be a single-partition window
    Seq("q_pack_sequences" -> "stream", "q_shuffle_rank" -> "__bkt")
      .foreach { case (q, key) =>
        val plan = executedPlan(q)
        val docWindows = "Window \\[sum|Window \\[row_number".r
          .findAllIn(plan).size
        assert(plan.contains("Window"), s"$q lost its window")
        // every corpus-side window names its partition key
        assert(plan.contains(key), s"$q window lost its $key partitioning")
      }
    // shuffleRank's bucket-offset side must broadcast, not shuffle-join
    assert(executedPlan("q_shuffle_rank").contains("BroadcastHashJoin"),
      "shuffleRank bucket offsets lost their broadcast")
  }

  test("topBigrams plans a partial aggregate and TakeOrdered, not a global sort") {
    val plan = executedPlan("q_vocab_bigrams")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k lost its TakeOrdered: " + plan.take(400))
    // map-side combine: a partial_count before the exchange
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      "pair counting lost map-side partial aggregation")
  }

  test("bm25 plans broadcast stat joins and a TakeOrdered top-k") {
    val plan = executedPlan("q_bm25")
    assert(plan.contains("TakeOrderedAndProject"),
      "bm25 top-k lost its TakeOrdered: " + plan.take(400))
    // the term-df and corpus-stats sides are query-sized: both joins
    // must broadcast, never shuffle the corpus side
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("BroadcastNestedLoopJoin"),
      "bm25 stat joins lost their broadcasts: " + plan.take(600))
    assert(!plan.contains("SortMergeJoin"),
      "bm25 shuffled a stat join: " + plan.take(600))
    // the query-term prefilter reaches the scan side before the explode
    // aggregate (an isin over a literal set stays in the narrow map)
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      "bm25 tf aggregate lost map-side partials")
  }

  test("quantizeInt8 is a narrow per-row transform (no shuffle at all)") {
    val plan = executedPlan("q_quantize_embed")
    assert(!plan.contains("Exchange"),
      "int8 quantization introduced a shuffle: " + plan.take(400))
  }

  test("substring-dup counts per window (equi-join, never per doc-pair)") {
    val plan = executedPlan("q_substring_dup")
    assert(!plan.contains("CartesianProduct"), "substring dup planned a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "substring dup planned a NL join")
    // window-hash counting must combine map-side before the exchange
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      "window counting lost map-side partial aggregation")
  }

  test("winnowing's min-window is partitioned by doc (no global funnel)") {
    val plan = executedPlan("q_winnow")
    assert(plan.contains("Window"), plan.take(400))
    assert(!plan.matches("(?s).*Window.*SinglePartition.*"),
      "winnow window lost its per-doc partitioning")
  }

  test("label centroids reduce to the label x dim grid (one aggregate)") {
    val plan = executedPlan("q_label_centroids")
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      "centroid sum lost map-side partial aggregation")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"),
      "centroids should be a plain two-phase aggregate: " + plan.take(400))
  }

  test("bigram LM score joins count tables on hashes (no cartesian, no window)") {
    val plan = executedPlan("q_lm_score")
    assert(!plan.contains("CartesianProduct"), "lmScore planned a cartesian")
    assert(!plan.contains("Window"), "lmScore grew a window: " + plan.take(400))
    assert(plan.contains("partial_sum") || plan.contains("partial sum"),
      "count tables lost map-side partial aggregation")
  }

  test("interpolated LM / source report / reservoir keep their scale shapes") {
    val pi = executedPlan("q_lm_interp")
    assert(!pi.contains("CartesianProduct") && !pi.contains("Window"),
      "lm_interp must stay equi-join + aggregate work")
    val ps = executedPlan("q_source_report")
    assert(!ps.contains("CartesianProduct") && !ps.contains("Window"),
      "source report must stay aggregate + hash-join work")
    val pr = executedPlan("q_reservoir")
    assert(pr.contains("TakeOrderedAndProject"),
      "reservoir must TakeOrdered, never sort the corpus")
    val pu = executedPlan("q_unigram_seed")
    assert(pu.contains("TakeOrderedAndProject") &&
      !pu.contains("CartesianProduct"),
      "seed top-k must TakeOrdered over the piece aggregate")
  }

  test("OOV rate's only non-equi join is the broadcast one-row total") {
    val plan = executedPlan("q_oov_rate")
    assert(!plan.contains("CartesianProduct"), "oovRate planned a cartesian")
    // the corpus total is a single row: a BroadcastNestedLoopJoin over
    // one row is the cheap, correct plan; anything else joining non-equi
    // would be a scale bug
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "one-row total should broadcast: " + plan.take(400))
    assert(!plan.contains("Window"), plan.take(400))
  }

  test("span trimming stays equi-join work (no cartesian, no NL join)") {
    val plan = executedPlan("q_dedup_trim")
    assert(!plan.contains("CartesianProduct"), "trim planned a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "trim planned a nested-loop join: " + plan.take(400))
    assert(!plan.contains("Window"), plan.take(400))
  }

  test("line dedup is hash-keyed equi-join work (no cartesian, no window)") {
    val plan = executedPlan("q_line_dedup")
    assert(!plan.contains("CartesianProduct"), "line dedup planned a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
    assert(!plan.contains("Window"), plan.take(400))
  }

  test("curation pipeline composes without cartesians or global windows") {
    val plan = executedPlan("q_curate_pipeline")
    assert(!plan.contains("CartesianProduct"), "pipeline planned a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
    assert(!plan.contains("Window"), plan.take(400))
  }

  test("featureHash is explode + one combining aggregate (no join, no window)") {
    val plan = executedPlan("q_feature_hash")
    assert(!plan.contains("Join"), "featureHash grew a join: " + plan.take(400))
    assert(!plan.contains("Window"), plan.take(400))
    assert(plan.contains("partial_sum") || plan.contains("partial sum"),
      "bucket sums lost map-side partial aggregation")
  }

  test("dupNgramCoverage joins stay equi and doc-keyed (no cartesian/NLJ/window)") {
    val plan = executedPlan("q_dup_ngram_cov")
    assert(!plan.contains("CartesianProduct"), "dup coverage planned a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "dup coverage planned a nested-loop join: " + plan.take(400))
    assert(!plan.contains("Window"), plan.take(400))
  }

  test("weightedSample is a pure map-side filter (zero exchanges)") {
    val plan = executedPlan("q_weighted_sample")
    assert(!plan.contains("Exchange"),
      "weighted sampling must not shuffle: " + plan.take(400))
    assert(!plan.contains("Join") && !plan.contains("Window"), plan.take(400))
  }

  test("ngramDiversity is a two-level combining aggregate (no join, no window)") {
    val plan = executedPlan("q_ngram_diversity")
    assert(!plan.contains("Join"), "diversity grew a join: " + plan.take(400))
    assert(!plan.contains("Window"), plan.take(400))
    assert(plan.contains("partial_count") || plan.contains("partial_sum") ||
      plan.contains("partial sum"),
      "gram counts lost map-side partial aggregation")
  }

  test("lshVerifiedPairs stays equi-join work bounded by the candidates") {
    val plan = executedPlan("q_minhash_verified")
    assert(!plan.contains("CartesianProduct"),
      "verified pairs planned a cartesian")
    assert(!plan.contains("Window"), plan.take(400))
  }

  test("luhnRedact is pure per-row work (zero exchanges, zero joins)") {
    val plan = executedPlan("q_luhn_redact")
    assert(!plan.contains("Exchange"),
      "card redaction must not shuffle: " + plan.take(400))
    assert(!plan.contains("Join"), plan.take(400))
  }

  test("blocklist anti-join broadcasts the list, never shuffles the corpus") {
    val plan = executedPlan("q_blocklist")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      "blocklist lost its broadcast anti-join: " + plan.take(400))
    assert(!plan.contains("SortMergeJoin"), plan.take(400))
  }

  test("qualityEnsemble joins its four signals on the id (no cartesian/window)") {
    val plan = executedPlan("q_quality_ensemble")
    assert(!plan.contains("CartesianProduct"), "ensemble planned a cartesian")
    assert(!plan.contains("Window"), plan.take(400))
    // the only nested-loop join allowed is oovRate's one-row corpus
    // total; count in the FINAL plan only (the toString repeats the
    // tree under "== Initial Plan ==")
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.split("BroadcastNestedLoopJoin").length - 1 <= 1,
      "ensemble grew a second nested-loop join: " + plan.take(400))
  }

  test("vocabCoverage takes top-N without a global sort or window") {
    val plan = executedPlan("q_vocab_coverage")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-N lost its TakeOrdered plan: " + plan.take(400))
    assert(!plan.contains("Window"), plan.take(400))
    assert(!plan.contains("CartesianProduct"), plan.take(400))
  }

  test("kmeansAssign's final assignment is a shuffle-free narrow map") {
    val plan = executedPlan("q_kmeans_assign")
    assert(!plan.contains("Join"), "assignment grew a join: " + plan.take(400))
    assert(!plan.contains("Exchange"),
      "assignment grew a shuffle: " + plan.take(400))
  }

  test("semDedup pairs join on the cluster id, never cartesian") {
    val plan = executedPlan("q_semdedup")
    assert(!plan.contains("CartesianProduct"), plan.take(400))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(400))
    assert(!plan.contains("Window"), plan.take(400))
  }

  test("clusterBalancedSample windows per cluster, never globally") {
    val plan = executedPlan("q_cluster_balance")
    assert(plan.contains("Window"), plan.take(400))
    assert(!plan.matches("(?s).*Window.*SinglePartition.*"),
      "cluster-balance window lost its cid partitioning")
    assert(!plan.contains("Join"), "cluster balance grew a join: " + plan.take(400))
  }

  test("importanceWeight joins on token hashes, windows nothing") {
    val plan = executedPlan("q_importance_weight")
    assert(!plan.contains("Window"), plan.take(400))
    assert(!plan.contains("CartesianProduct"), plan.take(400))
    // the two corpus-total cross joins ride in as 1-row broadcasts —
    // BroadcastNestedLoopJoin over a single row is the intended shape,
    // so only the cartesian (shuffle-both-sides) form is banned
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      "vocabulary aggregates lost map-side partials")
  }

  test("embDecontaminate joins corpus x benchmark on the cell, never cartesian") {
    val plan = executedPlan("q_emb_decontaminate")
    assert(!plan.contains("CartesianProduct"), plan.take(400))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
    assert(!plan.contains("Window"), plan.take(400))
  }

  test("embedCurationPipeline windows per cluster, drop join never cartesian") {
    val plan = executedPlan("q_embed_pipeline")
    assert(!plan.contains("CartesianProduct"), plan.take(400))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(400))
    assert(plan.contains("Window"), plan.take(400))
    assert(!plan.matches("(?s).*Window.*SinglePartition.*"),
      "pipeline quota window lost its cid partitioning")
  }

  test("curriculumOrder windows per (stage, bucket), offsets broadcast") {
    val plan = executedPlan("q_curriculum")
    // the corpus-side window must keep its composite partitioning; only
    // the tiny (stage, bucket) offset table may be a global window
    assert(plan.contains("__bkt"), "bucket decomposition lost: " + plan.take(400))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "offset table stopped broadcasting: " + plan.take(400))
    assert(!plan.contains("CartesianProduct"), plan.take(400))
  }

  test("sourceDivergence joins on token hashes, no cartesian or window") {
    val plan = executedPlan("q_source_divergence")
    assert(!plan.contains("CartesianProduct"), plan.take(400))
    assert(!plan.contains("Window"), plan.take(400))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "tf aggregate lost map-side partials")
  }

  test("epochSchedule windows only the tiny source table") {
    val plan = executedPlan("q_epoch_schedule")
    assert(!plan.contains("Join"), "epoch schedule grew a join: " + plan.take(400))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "source aggregate lost map-side partials")
  }

  test("temperatureMixture windows only the tiny domain table") {
    val plan = executedPlan("q_temperature_mix")
    assert(!plan.contains("Join"), "temperature mix grew a join: " + plan.take(400))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "domain aggregate lost map-side partials")
    // the over-() window is deliberate and runs on the post-aggregate
    // domains-sized table (see Curation.temperatureMixture scaladoc)
    assert(plan.contains("Window"), plan.take(400))
  }

  test("wordpiece encode is a shuffle-free narrow map (scan speed)") {
    val plan = executedPlan("q_wordpiece")
    assert(!plan.contains("Exchange"),
      "wordpiece encode introduced a shuffle: " + plan.take(400))
  }

  test("stripHtml stays inside whole-stage codegen with no shuffle") {
    val plan = executedPlan("q_strip_html")
    assert(!plan.contains("Exchange"),
      "stripHtml introduced a shuffle: " + plan.take(400))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("Invoke udf"),
      "stripHtml fell out of builtin expressions: " + plan.take(400))
  }

  test("prioritySample plans a TakeOrdered, never a global sort") {
    val plan = executedPlan("q_priority_sample")
    assert(plan.contains("TakeOrderedAndProject"),
      "priority sample lost its TakeOrdered: " + plan.take(400))
    assert(!plan.contains("Exchange rangepartitioning"),
      "priority sample planned a global range sort: " + plan.take(400))
  }

  test("hammingTopK: broadcast query, TakeOrdered, no shuffle, no UDF") {
    val plan = executedPlan("q_hamming_topk")
    assert(plan.contains("TakeOrderedAndProject"),
      "hamming top-k lost its TakeOrdered: " + plan.take(400))
    assert(plan.contains("BroadcastExchange"),
      "the 1-row query side must broadcast: " + plan.take(400))
    // the only Exchange allowed is the query-side broadcast — the
    // corpus scan itself must stay shuffle-free
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      "hamming scan shuffled the corpus: " + plan.take(600))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("Invoke udf"),
      "bit packing fell out of builtin expressions: " + plan.take(400))
  }

  test("phraseBlocklist: shuffle-free narrow map, automaton broadcast") {
    val plan = executedPlan("q_phrase_blocklist")
    assert(!plan.contains("Exchange"),
      "phrase scan introduced a shuffle: " + plan.take(400))
    assert(plan.contains("phrase_count"),
      "the native AC kernel fell out of the plan: " + plan.take(400))
  }

  test("signatures at rest: hamming scan prunes to (vec_id, sig) only") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sigtab")
    try {
      Tables.load(spark, dir, "embeddings")
        .withColumn("sig", graft.ops.Similarity.packSignBits(
          org.apache.spark.sql.functions.col("embedding"), dims = 64))
        .write.mode("overwrite").parquet(tmp.toString)
      val t = spark.read.parquet(tmp.toString)
      val df = graft.ops.Similarity.hammingTopKPacked(
        t, queryId = 0L, k = 10, nWords = 2)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // the 256-byte float vectors must never leave disk: every scan's
      // ReadSchema carries only the id and the 16-byte signature
      assert(plan.contains("ReadSchema"), plan.take(300))
      assert(!plan.contains("embedding"),
        "the scan read the float vectors alongside the signatures: " +
          plan.take(800))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }

  test("urlCanon: one aggregation shuffle, codegen'd regex chain") {
    // count only the final AQE tree (the same Exchange prints again
    // under "== Initial Plan ==")
    val plan = executedPlan("q_url_canon").split("== Initial Plan ==").head
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(shuffles <= 1,
      s"url canon needs at most the groupBy shuffle, got $shuffles: " +
        plan.take(600))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("Invoke udf"),
      "url canonicalization fell out of builtin expressions: " +
        plan.take(400))
  }

  test("the round-11 narrow maps stay shuffle-free and builtin-only") {
    // gopher rules, span corruption, FIM: one pass over the scan, no
    // Exchange of any kind, nothing falls out of codegen'd builtins
    for (q <- Seq("q_gopher_filter", "q_span_corrupt", "q_fim")) {
      val plan = executedPlan(q)
      assert(!plan.contains("Exchange"),
        s"$q introduced a shuffle: " + plan.take(400))
      assert(!plan.contains("BatchEvalPython") && !plan.contains("Invoke udf"),
        s"$q fell out of builtin expressions: " + plan.take(400))
    }
  }

  test("BMP/WAV decode queries run as shuffle-free native kernel maps") {
    for (q <- Seq("q_bmp_decode", "q_wav_decode")) {
      val plan = executedPlan(q)
      assert(!plan.contains("Exchange"),
        s"$q introduced a shuffle: " + plan.take(400))
      assert(plan.contains("bmp_") || plan.contains("wav_"),
        s"$q lost its native codec kernel: " + plan.take(400))
      // the stats array must be computed once and fanned out, not
      // re-decoded per output column
      assert("(bmp|wav)_decode_stats".r.findAllIn(
        plan.split("== Initial Plan ==").head).size <= 2,
        s"$q re-decodes the payload per column: " + plan.take(600))
    }
  }

  test("rand_proj runs as the native kernel with no shuffle") {
    val plan = executedPlan("q_rand_proj")
    assert(!plan.contains("Exchange"),
      "projection introduced a shuffle: " + plan.take(400))
    assert(plan.contains("rand_proj"),
      "the native projection kernel fell out of the plan: " +
        plan.take(400))
    // the interpreted HOF regression: no aggregate/zip_with lambdas
    assert(!plan.contains("zip_with") && !plan.contains("aggregate("),
      "projection regressed to interpreted HOF lambdas: " + plan.take(600))
  }

  test("phash pairs: hash+band build is narrow; only the join shuffles") {
    val plan = executedPlan("q_phash_pairs").split("== Initial Plan ==").head
    assert(plan.contains("block_mean_hash"),
      "the native hash kernel fell out of the plan: " + plan.take(400))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "phash pairing planned an all-pairs join: " + plan.take(600))
  }

  // ------------------------------------------------------------------
  // Board-wide plan lint — every registered query, one regression gate.
  // The per-query pins above catch shape regressions in the operators
  // they name; this sweep catches the ones nobody wrote a pin for: a
  // stats change flipping a join to CartesianProduct, a refactor
  // dropping a window's partition spec, a new query shipping with an
  // all-pairs join.
  // ------------------------------------------------------------------

  /** Queries where BroadcastNestedLoopJoin IS the intended shape: a
    * provably bounded side (1-row corpus totals, a k-row query set, a
    * constant threshold) rides in as a broadcast, and the non-equi
    * predicate is the operator's semantics. Every entry must say why.
    */
  private val bnljAllowed: Map[String, String] = Map(
    "q_knn_brute" -> "1-row query vector broadcast x corpus scan is brute-force kNN's definition (Similarity.scala:73)",
    "q_knn_join" -> "bounded query set broadcast; fan-out rides the broadcast by design",
    "q_hard_negatives" -> "bounded query set broadcast (the knnJoin fan-out); the label filter and re-rank run after it (Similarity.hardNegatives)",
    "q_lm_index" -> "1-row summed count-total broadcast onto the heldout bigram table (TextAnalysis.lmScoreOverIndex)",
    "q_bootstrap_ci" -> "1-row percentile-bound broadcasts (lo/hi replicate means) cross onto the 1-row point estimate (Curation.bootstrapCI)",
    "q_bitext_mine" -> "bits=0 exact path: Catalyst folds the constant cell key to a trivially-true BNLJ over the broadcast source half; bits>0 keeps a real equi-join at scale (Similarity.bitextMine)",
    "q_knn_ivf_trained" -> "1-row quantized query broadcast over the probed cells (Similarity.scala:322)",
    "q_ivfpq_rerank" -> "1-row query broadcast over the ADC-shortlisted candidates (Similarity.scala:350)",
    "q_hamming_topk" -> "1-row packed query signature broadcast (Similarity.scala:238)",
    "q11_value_share" -> "1-row corpus-total broadcast onto the per-part values (TpchQueries.withScalar — Catalyst folds the constant join key to a trivially-true BNLJ)",
    "q22_acctbal" -> "1-row average-balance broadcast onto the filtered customers (TpchQueries.withScalar)",
    "q_rrf_fusion" -> "1-row query broadcasts feeding both fused rankers",
    "q_importance_weight" -> "1-row corpus-total broadcasts cross-join onto the vocab (Curation.scala:853)",
    "q_quality_ensemble" -> "same importance-ratio 1-row totals inside the ensemble",
    "q_pagerank" -> "1-row dangling-mass broadcast cross-joins onto the rank table per round (Graph.scala:67)",
    "q_semdedup" -> "1-row threshold broadcast over the bounded per-cluster pair set",
    "q_bm25" -> "1-row (n_docs, total_dl) stats broadcast onto the postings (TextAnalysis.scala:280)",
    "q_bm25_segmented" -> "1-row summed segment-stats broadcast onto the term-pruned postings (TextAnalysis.bm25TopKOverSegments)",
    "q_kmv_overlap" -> "group-pair seed: |groups|-row broadcast cross with the a<b filter; every sketch-row join after it is equi (Sketches.kmvPairOverlap)",
    "q_pmi" -> "1-row bigram-total broadcast onto the |vocab|-sized pair table (TextAnalysis.scala:802)",
    "q_lm_interp" -> "1-row corpus-total broadcast onto the bigram table (TextAnalysis.scala:978)",
    "q_lm_kn" -> "1-row continuation-type-total broadcast (TextAnalysis.scala:1033)",
    "q_lm_backoff" -> "1-row train-token-total broadcast onto the scored trigrams (TextAnalysis.lmBackoff)",
    "q_oov_rate" -> "1-row vocab-total broadcast onto the per-doc table (TextAnalysis.scala:1103)",
    "q_vocab_coverage" -> "1-row token-total broadcast onto the 3-row coverage table (TextAnalysis.scala:1210)",
    "q_vocab_growth" -> "1-row max-id broadcast onto the corpus (the withScalar pattern)",
    "q_mrl_retention" -> "1-row probe-vector broadcast scores every width in one corpus pass (Similarity.matryoshkaRetention)",
    "q_calibration" -> "1-row (N, gap-mass) totals broadcast cross onto the B-row bin table (EvalMetrics.calibrationBins)",
    "q_cohen_kappa" -> "1-row pe-numerator broadcast cross onto the 1-row po aggregate (EvalMetrics.cohenKappa)",
    "q_rank_corr" -> "cell x cell inequality join over the bounded distinct-(x,y)-score table (never rows) + the 1-row n cross (EvalMetrics.kendallTauA)",
    "q_bradley_terry" -> "1-row games-matrix aggregate (the MM rounds run IN-ROW since 8a77979); any BNLJ is a 1-row bounded-side cross in the wins build, never corpus-scale (EvalMetrics.bradleyTerry)"
  )

  /** Queries where an UNPARTITIONED window is safe: the windowed
    * relation is k-bounded (not corpus-scale) by construction. Every
    * entry must say why.
    */
  private val globalWindowAllowed: Map[String, String] = Map(
    "q_mix_weights" -> "windows the per-source mixture table: |sources| rows",
    "q_temperature_mix" -> "windows the per-source mixture table: |sources| rows",
    "q_epoch_schedule" -> "windows the per-source epoch table: |sources| rows",
    "q_curriculum" -> "global window only over the (stage,bucket) offset table: k rows",
    "q_vocab_growth" -> "cumulative sums window over the nBuckets=16 slice table",
    "q_zipf" -> "rank window over the TakeOrdered top-256 vocabulary rows",
    "q_bootstrap_ci" -> "index window over the FIXED-SIZE eval slice (doc_id < 200 — benchmark slices are bounded by construction) and the percentile window over the nBoot replicate means"
  )

  test("bitextMine evaluates the pair-cosine join once (ReusedExchange)") {
    val df = TrainingQueries.queries("q_bitext_mine")(spark, dir)
    df.collect() // AQE finalizes reuse only after execution
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      "the backward aggregate must reuse the forward window stack's " +
        "exchange — without it the expensive dot-product join runs twice:\n" +
        plan.take(4000))
  }

  test("board lint: no cartesian, no stray BNLJ, no global corpus window") {
    val failures = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // AQE finalizes join strategies only after execution
      val plan = df.queryExecution.executedPlan.toString
      val globalWindow =
        "Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(plan).isDefined
      Seq(
        (plan.contains("CartesianProduct"),
          s"$name: CartesianProduct (shuffle-both-sides all-pairs)"),
        (plan.contains("BroadcastNestedLoopJoin") &&
          !bnljAllowed.contains(name),
          s"$name: BroadcastNestedLoopJoin outside the bounded-side allowlist"),
        (globalWindow && !globalWindowAllowed.contains(name),
          s"$name: unpartitioned Window over a corpus-scale relation")
      ).collect { case (true, msg) => msg }
    }
    assert(failures.isEmpty,
      "plan lint failures:\n" + failures.mkString("\n"))
  }

  test("q_text_tiles is a narrow kernel map: one guard exchange, no join, no window") {
    val plan = executedPlan("q_text_tiles")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"),
      "textTiles must not join - the kernel computes per doc")
    assert(!plan.contains("Window"),
      "textTiles must not window - depths come from the kernel")
    // exactly the single parallelism-guard repartition
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      "textTiles grew extra exchanges beyond the fan-out guard")
  }

  test("q_ivfpq_index serves from the at-rest index: no embeddings scan") {
    val plan = executedPlan("q_ivfpq_index")
    assert(!plan.contains("embeddings.parquet"),
      "index serve must not rescan the corpus - codes + codebooks only")
    assert(plan.contains("graft-ivfpq"),
      "expected the at-rest index paths in the scan")
  }
}
