package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs after dedup:
  * benchmark decontamination, per-domain quota sampling, and
  * within-document repetition scoring.
  *
  * Shares [[Dedup]]'s deterministic 60-bit hashing and shingle machinery
  * so every result is reproducible in the DuckDB oracle. Scale shapes:
  * decontamination is an inverted-index equi-join against a broadcast
  * benchmark gram set (benchmarks are tiny relative to the corpus);
  * quota sampling is one window per domain (shuffle keyed on the domain,
  * rank by deterministic hash — rerun-stable, no RNG state); repetition
  * is a two-level hash aggregate.
  */
object Curation {

  /** Benchmark decontamination: count each training document's distinct
    * word n-grams that also occur in the benchmark set, and flag docs at
    * or past `minOverlap` — the standard test-set-leakage sweep run
    * before training. The benchmark gram set is broadcast by default
    * (eval sets are MBs against a TB corpus); pass
    * `broadcastBenchmark = false` for a giant benchmark and the join
    * falls back to a shuffle equi-join on the gram.
    */
  /** Deterministic training-shard export manifest — the dataset-release
    * step after curation: every doc lands in shard
    * `h60(salt‖id) mod nShards` (rerun-stable, no RNG, no sort — the
    * assignment IS the shuffle key, so writing shards is one hash
    * exchange), and the manifest row per shard carries the audit
    * fields a consumer re-verifies on read: doc count, token count,
    * and an order-insensitive xor checksum over (id, n_chars) — any
    * dropped/duplicated/truncated doc flips it. Manifest size is
    * nShards rows regardless of corpus size.
    */
  def shardManifest(docs: DataFrame, nShards: Int, salt: String = "shard",
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    docs
      .withColumn("shard",
        Dedup.h60(concat(lit(s"$salt|"), col(idCol).cast("string")))
          % nShards)
      .withColumn("__h", Dedup.h60(concat(col(idCol).cast("string"),
        lit("|"), length(col(textCol)).cast("string"))))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " "))).cast("long").as("n_tokens"),
        expr("bit_xor(__h)").cast("long").as("checksum"))
  }

  /** Rendezvous (highest-random-weight) shard assignment — the
    * RESHARDING-STABLE alternative to [[shardManifest]]'s mod
    * assignment (Thaler & Ravishankar 1998, the scheme behind
    * consistent cache/shard routing): each doc goes to the shard with
    * the highest h60(shard‖salt‖id). Adding a shard moves ONLY the
    * docs that now score highest on the new shard (≈1/(n+1) of the
    * corpus); no doc ever moves BETWEEN surviving shards — so growing
    * a 100 TB corpus's shard set re-writes one new shard's worth of
    * data, not the whole layout. Ties break on the shard name, so the
    * argmax is total and both engines agree. Shuffle-free narrow map:
    * the shard list is a plan literal, |shards| hashes per row.
    */
  def rendezvousAssign(docs: DataFrame, shards: Seq[String],
                       salt: String = "hrw",
                       idCol: String = "doc_id"): DataFrame = {
    require(shards.nonEmpty && shards.toSet.size == shards.size,
      "shards must be non-empty and distinct")
    val cand = shards.map { s =>
      struct(
        Dedup.h60(concat(lit(s"$s|$salt|"), col(idCol).cast("string")))
          .as("h"),
        lit(s).as("n"))
    }
    docs.withColumn("shard",
      array_max(array(cand: _*)).getField("n"))
  }

  def contamination(docs: DataFrame, benchmark: DataFrame, n: Int = 3,
                    minOverlap: Int = 1, textCol: String = "text",
                    idCol: String = "doc_id",
                    broadcastBenchmark: Boolean = true): DataFrame = {
    val docGrams = Dedup.explodedShingles(docs, n, textCol, idCol).distinct()
    val benchGrams = Dedup.explodedShingles(benchmark, n, textCol, idCol)
      .select(col("sh")).distinct()
    val bg = if (broadcastBenchmark) broadcast(benchGrams) else benchGrams
    val hits = docGrams.join(bg, "sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bench_grams"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bench_grams"), lit(0L)).as("n_bench_grams"),
        (coalesce(col("n_bench_grams"), lit(0L)) >= minOverlap)
          .cast("int").as("contaminated"))
  }

  /** Multi-benchmark decontamination in ONE corpus scan: real pipelines
    * screen against dozens of eval sets, and running [[contamination]]
    * once per benchmark re-shingles the whole corpus N times. Here every
    * benchmark's distinct gram set is tagged with its name, unioned
    * (eval sets are MBs — the union still broadcasts), and joined against
    * the corpus grams ONCE; hit counts aggregate per (doc, benchmark).
    * Output is long-format — one row per (doc, benchmark) including
    * zero-hit pairs (the [[contamination]] every-doc contract, fanned by
    * the k-element benchmark-name literal array, a narrow explode).
    * Per-benchmark semantics are EXACTLY [[contamination]]'s: distinct
    * doc grams hitting that benchmark's distinct gram set.
    */
  def contaminationMulti(docs: DataFrame,
                         benchmarks: Seq[(String, DataFrame)], n: Int = 3,
                         minOverlap: Int = 1, textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    require(benchmarks.nonEmpty &&
      benchmarks.map(_._1).toSet.size == benchmarks.size,
      "benchmarks must be non-empty with distinct names")
    val docGrams = Dedup.explodedShingles(docs, n, textCol, idCol).distinct()
    val tagged = benchmarks.map { case (name, b) =>
      Dedup.explodedShingles(b, n, textCol, idCol)
        .select(col("sh")).distinct()
        .select(col("sh"), lit(name).as("bench"))
    }.reduce(_ unionByName _)
    val hits = docGrams.join(broadcast(tagged), "sh")
      .groupBy(col(idCol), col("bench"))
      .agg(count(lit(1)).as("n_bench_grams"))
    docs.select(col(idCol))
      .withColumn("bench",
        explode(array(benchmarks.map(b => lit(b._1)): _*)))
      .join(hits, Seq(idCol, "bench"), "left")
      .select(col(idCol), col("bench"),
        coalesce(col("n_bench_grams"), lit(0L)).as("n_bench_grams"),
        (coalesce(col("n_bench_grams"), lit(0L)) >= minOverlap)
          .cast("int").as("contaminated"))
  }

  /** Per-domain quota sampling: keep at most `maxPerDomain` documents per
    * domain, chosen by deterministic hash rank (ties broken by id) — the
    * domain-balancing step that stops a handful of giant crawl domains
    * from dominating the mixture. Rerun-stable: same corpus in, same
    * sample out, no RNG state to coordinate across executors.
    *
    * Scale: the operator's own premise is skew — a few giant crawl
    * domains dominate — so a single per-domain window would funnel a hot
    * domain's every row into one sorting task. Runs as
    * [[Skew.saltedTopK]] instead: rank per (domain, salt) cell, keep the
    * quota per cell, final rank over the ≤ salts·quota survivors —
    * bit-identical output (same (hash, id) total order), straggler fans
    * out `salts`-ways.
    */
  def domainCapSample(docs: DataFrame, domainCol: String, maxPerDomain: Int,
                      idCol: String = "doc_id",
                      seed: String = "cap",
                      salts: Int = 16): DataFrame = {
    val rankHash =
      Dedup.h60(concat(lit(seed + "|"), col(idCol).cast("string")))
    Skew.saltedTopK(docs, col(domainCol),
      Seq(rankHash.asc, col(idCol).asc), maxPerDomain,
      saltBy = col(idCol), salts = salts, rankCol = "sample_rank")
  }

  /** The one-window reference form of [[domainCapSample]] — kept for the
    * equality spec that pins the salted rewrite bit-identical; not for
    * production use (hot-domain straggler).
    */
  private[graft] def domainCapSampleOneWindow(
      docs: DataFrame, domainCol: String, maxPerDomain: Int,
      idCol: String = "doc_id", seed: String = "cap"): DataFrame = {
    val rankHash =
      Dedup.h60(concat(lit(seed + "|"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(domainCol))
      .orderBy(rankHash.asc, col(idCol).asc)
    docs.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= maxPerDomain)
  }

  /** Within-document repetition: type-token ratio (scaled 1e4, integer)
    * and the dominant token's frequency — the cheap boilerplate /
    * degenerate-text signal (a page of one repeated word scores
    * ttr_e4 ≈ 0, top_token_freq ≈ n_tokens). Two hash aggregates, both
    * with map-side partial aggregation.
    */
  def repetitionStats(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_distinct_tokens"),
        max(col("tf")).as("top_token_freq"))
      .withColumn("ttr_e4", expr("n_distinct_tokens * 10000 div n_tokens"))

  /** Within-document duplicated-n-gram coverage — the Gopher repetition
    * rule family (Rae et al. 2021 §A1.1: "fraction of characters in
    * duplicated n-grams"), in token-position form: for each document,
    * the fraction of token positions covered by an n-gram that occurs
    * MORE THAN ONCE in that same document, plus the dominant n-gram's
    * frequency. Complements [[repetitionStats]] (token-level TTR) with
    * the phrase-level signal that catches looped boilerplate a healthy
    * TTR hides.
    *
    * Scale: every shuffle is keyed by (doc, gram-hash) or doc — per-doc
    * micro-groups, never a corpus-wide funnel; the gram join is a
    * co-partitioned self-join on the same key the aggregate just
    * shuffled on, so AQE reuses the exchange. Grams travel as 8-byte
    * h60 hashes, not strings. Docs shorter than n tokens report zero
    * grams and zero coverage.
    */
  def dupNgramCoverage(docs: DataFrame, n: Int = 3,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame =
    dupNgramCoverageOfTokens(
      docs.select(col(idCol), Dedup.tokens(col(textCol)).as("__w")),
      n, idCol, "__w")

  /** [[dupNgramCoverage]] over a PRE-MATERIALIZED token-array column —
    * the fused ensemble pass tokenizes once for all four signals; the
    * n_tokens projection and the gram explode read the same array, so
    * the second corpus tokenization of the standalone shape is gone.
    * Identical counts and arithmetic.
    */
  private[ops] def dupNgramCoverageOfTokens(tok: DataFrame, n: Int,
                                            idCol: String,
                                            tokCol: String): DataFrame = {
    val grams = tok
      .select(col(idCol),
        posexplode(Dedup.shinglesOfTokens(col(tokCol), n))
          .as(Seq("pos", "sh")))
      .select(col(idCol), col("pos"), Dedup.h60(col("sh")).as("h"))
    val counts = grams.groupBy(col(idCol), col("h"))
      .agg(count(lit(1)).as("c"))
    val perDoc = counts.groupBy(col(idCol))
      .agg(sum(col("c")).as("n_grams"), max(col("c")).as("top_gram_freq"))
    // positions covered by any within-doc duplicated gram, counted once
    val covered = grams
      .join(counts.filter(col("c") > 1).select(col(idCol), col("h")),
        Seq(idCol, "h"))
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("t"))
      .distinct()
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_dup_positions"))
    tok
      .select(col(idCol), size(col(tokCol)).as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("top_gram_freq"), lit(0L)).as("top_gram_freq"),
        expr("coalesce(n_dup_positions, 0) * 10000 div n_tokens")
          .as("dup_cov_e4"))
  }

  /** Hash-weighted Bernoulli sampling: keep a row iff its deterministic
    * salted draw (h60 mod 1e4, uniform) lands under the row's weight
    * (1e4-scaled acceptance probability) — the standard quality-weighted
    * downsampling step (keep high-quality docs with high probability,
    * low-quality with low), made rerun-stable by replacing the RNG with
    * the same salted-hash discipline as [[splitLabel]] /
    * [[domainCapSample]]. Pure map-side filter: no shuffle, no state,
    * embarrassingly parallel at any corpus size.
    *
    * `weightE4` is clamped to [0, 10000]; 0 drops always, 10000 keeps
    * always.
    */
  def weightedSample(scored: DataFrame, weightE4: Column,
                     idCol: String = "doc_id",
                     salt: String = "wsample"): DataFrame =
    scored
      .withColumn("draw_e4",
        pmod(Dedup.h60(concat(lit(s"$salt|"), col(idCol).cast("string"))),
          lit(10000L)))
      .filter(col("draw_e4") <
        least(greatest(weightE4, lit(0L)), lit(10000L)))

  /** Temperature-scaled mixture weights (alpha = 0.5): per-domain
    * sampling weight proportional to sqrt(domain token count) — the
    * standard multilingual/multi-source rebalancing that upweights
    * small sources relative to their raw share without letting them
    * dominate (XLM-R's alpha-sampling at alpha = 1/2). Integer-exact in
    * both engines: IEEE-754 sqrt is correctly rounded, so
    * floor(sqrt(bigint)) is deterministic cross-engine, and the share
    * division runs in DECIMAL (LONG would overflow past ~9.2e12 tokens).
    *
    * Scale: one corpus-wide hash aggregate (map-side partial) down to a
    * domains-sized table; the unpartitioned window runs over that tiny
    * table, never the corpus.
    */
  def temperatureMixture(docs: DataFrame, domainCol: String,
                         textCol: String = "text"): DataFrame =
    docs
      .select(col(domainCol), size(Dedup.tokens(col(textCol))).as("n_toks"))
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .withColumn("isqrt_tokens",
        expr("cast(floor(sqrt(cast(n_tokens as double))) as bigint)"))
      .withColumn("share_e6",
        expr("cast(n_tokens as decimal(38,0)) * 1000000" +
          " div sum(cast(n_tokens as decimal(38,0))) over ()"))
      .withColumn("weight_e6",
        expr("cast(isqrt_tokens as decimal(38,0)) * 1000000" +
          " div sum(cast(isqrt_tokens as decimal(38,0))) over ()"))

  /** Quality-filter ensemble — the keep/reject AUDIT TABLE a curation
    * pipeline actually ships: every document scored by four independent
    * verified signals (rule-based quality, corpus-LM fluency, rare-token
    * rate, within-doc repetition coverage) and labeled with the FIRST
    * failing rule in a fixed precedence order, so corpus reports can
    * answer "how much did each filter cost us" and spot-checks can pull
    * the rejects per reason. keep = 1 iff every rule passes.
    *
    * Scale: four doc-keyed aggregates joined back on the id — every
    * shuffle is doc- or vocab-keyed (see each op's own scaladoc); the
    * ensemble adds three equi-joins on the 8-byte id and pure map-side
    * CASE logic. The LM join is LEFT: a 1-token document has no bigrams
    * and scores 0 (rejected by the lm rule, deliberately).
    */
  def qualityEnsemble(docs: DataFrame, minQuality: Int = 3,
                      minLmE6: Long = 34000L, maxRareE6: Long = 20000L,
                      maxDupCovE4: Long = 500L,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    // FUSED per-doc pass (guide §2.3/§2.4): the four signals all start
    // from the same tokenization, and lm + oov hash every token
    // instance identically — so the corpus is scanned, split and
    // token-hashed ONCE and the shared (id, text, tokens, hashes) table
    // persists for the four consumers. The standalone shape paid five
    // corpus scans + five splits + two token-md5 passes (measured
    // 2.85 s cold at sf0.1; the fused pass targets the split/hash
    // duplication, not the per-signal aggregates, which are untouched
    // and oracle-identical). Repartition BEFORE the fan-outs — the
    // bigramHashInst discipline — so a single-row-group source does not
    // serialize the explodes on one task. LIFETIME: lazy plans, so the
    // persist lives until session end (the prunedGramIntersections
    // caveat); each bench/verify run rebuilds it cold.
    val base = docs.select(col(idCol), col(textCol))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .withColumn("__w", Dedup.tokens(col(textCol)))
      .withColumn("__hs", transform(col("__w"), w => Dedup.h60(w)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = TextAnalysis.qualityScoreOfTokens(base, textCol, "__w")
      .select(col(idCol), col("quality"))
    val lm = TextAnalysis.lmScoreOfInst(
      TextAnalysis.bigramInstOfHashes(base, idCol, "__hs"), idCol)
      .select(col(idCol), col("lm_score_e6"))
    val ov = TextAnalysis.oovRateOfInst(
      base.select(col(idCol), explode(col("__hs")).as("tw")), 100L, idCol)
      .select(col(idCol), col("rare_rate_e6"))
    val rep = dupNgramCoverageOfTokens(base, 3, idCol, "__w")
      .select(col(idCol), col("dup_cov_e4"))
    q.join(lm, Seq(idCol), "left")
      .join(ov, Seq(idCol))
      .join(rep, Seq(idCol))
      .withColumn("lm_score_e6", coalesce(col("lm_score_e6"), lit(0L)))
      .withColumn("reject_reason",
        when(col("quality") < minQuality, "quality")
          .when(col("lm_score_e6") < minLmE6, "lm_score")
          .when(col("rare_rate_e6") > maxRareE6, "oov")
          .when(col("dup_cov_e4") > maxDupCovE4, "repetition")
          .otherwise("kept"))
      .withColumn("keep", (col("reject_reason") === "kept").cast("int"))
      .select(col(idCol), col("quality"), col("lm_score_e6"),
        col("rare_rate_e6"), col("dup_cov_e4"), col("reject_reason"),
        col("keep"))
  }

  /** Domain/source blocklist filter: drop every document whose domain
    * appears in the blocklist — the first gate of any web-corpus
    * pipeline (spam/adult/malware domain lists, robots.txt opt-outs).
    * The blocklist is explicitly broadcast: real blocklists are
    * thousands-to-millions of rows against a multi-billion-document
    * corpus, so the anti-join must ship the list to the data, never
    * shuffle the corpus on the domain.
    *
    * NULL semantics: a NULL domain is KEPT (an unknown domain is not on
    * the list), and NULL blocklist entries are dropped before the join —
    * both pinned so the anti-join can never silently diverge from a
    * `NOT IN` reading (whose NULL propagation drops every row).
    */
  /** Parse robots.txt contents (RFC 9309 / original REP subset: prefix
    * rules, no `*`/`$` wildcards) into flat rules: comment-stripped
    * lines, stacked `User-agent:` lines forming a group that every
    * following `Allow:`/`Disallow:` rule applies to, until the next
    * group starts. One window per file (the chat-turn grouping shape):
    * a User-agent line whose predecessor is NOT a User-agent line opens
    * a new group. Returns (idCol, agent, allow, prefix) — an empty
    * prefix survives parsing (an empty Disallow is a legal
    * allow-everything line) and is skipped at DECISION time, where
    * "matches nothing" is its defined meaning.
    */
  def parseRobots(robots: DataFrame, contentCol: String = "content",
                  idCol: String = "domain"): DataFrame = {
    val byLine = Window.partitionBy(col(idCol)).orderBy(col("__i"))
    val typed = robots
      .select(col(idCol),
        posexplode(split(col(contentCol), "\n")).as(Seq("__i", "__l")))
      .withColumn("__l",
        regexp_replace(regexp_replace(col("__l"), "#.*$", ""), "\\s+$", ""))
      .withColumn("__is_ua",
        col("__l").rlike("(?i)^user-agent:").cast("long"))
      .withColumn("__ua",
        regexp_extract(col("__l"), "(?i)^user-agent:\\s*(\\S+)", 1))
      .withColumn("__is_rule",
        col("__l").rlike("(?i)^(allow|disallow):").cast("long"))
      .withColumn("__allow", when(
        col("__l").rlike("(?i)^allow:"), 1L).otherwise(0L))
      .withColumn("__prefix",
        regexp_extract(col("__l"), "(?i)^(?:allow|disallow):\\s*(\\S*)", 1))
    val grouped = typed
      .withColumn("__new_group",
        (col("__is_ua") === 1 &&
          coalesce(lag(col("__is_ua"), 1).over(byLine), lit(0L)) === 0)
          .cast("long"))
      .withColumn("__gid", sum(col("__new_group")).over(byLine))
      .filter(col("__gid") >= 1)
    val agents = grouped.filter(col("__is_ua") === 1)
      .select(col(idCol), col("__gid"), col("__ua").as("agent")).distinct()
    val rules = grouped.filter(col("__is_rule") === 1)
      .select(col(idCol), col("__gid"), col("__allow").as("allow"),
        col("__prefix").as("prefix"))
    agents.join(rules, Seq(idCol, "__gid")).drop("__gid")
  }

  /** Robots-exclusion decision for a URL batch: the url's OWN agent
    * group applies when one exists, else the `*` group; the
    * longest-prefix-matching rule wins, Allow beating Disallow on equal
    * length (RFC 9309 "least restrictive"); no matching rule = allowed.
    * Scale shape: rules (site policies — small by nature) broadcast
    * onto the corpus-scale URL batch; the winner resolves in a window
    * partitioned per URL over its few matching rules.
    * Returns (urlIdCol, agentCol, pathCol, allowed, winner_len).
    */
  def robotsDecide(rules: DataFrame, urls: DataFrame,
                   urlIdCol: String = "doc_id", agentCol: String = "agent",
                   pathCol: String = "path"): DataFrame = {
    val present = rules.select(col("agent").as("__pa")).distinct()
      .withColumn("__has", lit(1L))
    val eff = urls
      .join(broadcast(present), col(agentCol) === col("__pa"), "left")
      .withColumn("__agent_eff",
        when(col("__has").isNotNull, col(agentCol)).otherwise(lit("*")))
      .select(col(urlIdCol), col(agentCol), col(pathCol), col("__agent_eff"))
    val r = rules.filter(length(col("prefix")) > 0)
      .select(col("agent").as("__ra"), col("allow").as("__rallow"),
        col("prefix").as("__rprefix"))
    val w = Window.partitionBy(col(urlIdCol))
      .orderBy(length(col("__rprefix")).desc, col("__rallow").desc)
    val winners = eff
      .join(broadcast(r), col("__agent_eff") === col("__ra") &&
        expr(s"substring($pathCol, 1, length(__rprefix)) = __rprefix"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(urlIdCol), col("__rallow"),
        length(col("__rprefix")).cast("long").as("__rlen"))
    eff.join(winners, Seq(urlIdCol), "left")
      .select(col(urlIdCol), col(agentCol), col(pathCol),
        coalesce(col("__rallow"), lit(1L)).as("allowed"),
        coalesce(col("__rlen"), lit(0L)).as("winner_len"))
  }

  /** N-gram novelty (memorization-risk) audit between a train split and
    * a heldout split: for each n in [1, maxN], the fraction of the
    * heldout's DISTINCT word n-grams never seen in train —
    * `novelty_e6 = (heldout − overlap) · 1e6 DIV heldout`. A heldout
    * whose long n-grams mostly exist in train will be "predicted" by
    * memorization, not generalization, so its eval numbers are inflated
    * — this is the screen run before trusting a perplexity eval.
    *
    * Scale shape: each side makes ONE pass emitting all n-gram widths
    * tagged (n, gram-hash) from a single explode, distincts are
    * (n, h60)-keyed aggregates, and the overlap is a LEFT SEMI join of
    * two distinct sets — never a pair product.
    */
  def ngramNovelty(train: DataFrame, heldout: DataFrame, maxN: Int = 4,
                   textCol: String = "text"): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"bad maxN: $maxN")
    // the hash runs AFTER the explode, on a flat column: inside the
    // array lambda it would evaluate interpreted per element — the
    // post-explode form is whole-stage-codegen'd md5. The input text
    // repartitions BEFORE the ~4·|words| fan-out: the shuffle moves
    // only raw text (a small fraction of the gram-stream bytes it
    // parallelizes), which matters when the source has fewer splits
    // than cores — a single-row-group file would otherwise run the
    // whole explode+hash stage on one task.
    def grams(docs: DataFrame): DataFrame = docs
      .select(col(textCol))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(explode(flatten(array((1 to maxN).map(n =>
        transform(Dedup.shingles(col(textCol), n),
          g => struct(lit(n.toLong).as("n"), g.as("g")))): _*)))
        .as("__g"))
      .select(col("__g.n").as("n"), Dedup.h60(col("__g.g")).as("h"))
    // NO JOIN: both gram streams union with a side tag and ONE (n, h)
    // aggregate computes per distinct gram whether the heldout and the
    // train side saw it (max/min of the tag). The previous shape
    // semi-joined the FULL train gram stream against the heldout
    // distinct — two sorted corpus-scale shuffle sides — whereas the
    // union's aggregate gets map-side partial aggregation, so repeated
    // grams collapse before the exchange and nothing is sorted. Counts
    // are identical: heldout_ngrams = distinct heldout grams,
    // overlap = distinct grams seen on both sides.
    val tagged = grams(heldout).select(col("n"), col("h"),
        lit(true).as("__h"))
      .unionByName(grams(train).select(col("n"), col("h"),
        lit(false).as("__h")))
    tagged.groupBy(col("n"), col("h"))
      .agg(max(col("__h")).as("__has_h"), min(col("__h")).as("__all_h"))
      .filter(col("__has_h"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("heldout_ngrams"),
        count_if(!col("__all_h")).as("overlap_ngrams"))
      .withColumn("novelty_e6", expr(
        "(heldout_ngrams - overlap_ngrams) * 1000000L DIV heldout_ngrams"))
  }

  /** Preference-pair assembly for DPO/RLHF data: per prompt, the
    * highest-scored response becomes `chosen` and the lowest `rejected`
    * (ties break to the lower response id on BOTH sides, so an
    * all-equal prompt collapses to chosen == rejected and the
    * margin > 0 filter drops it — uninformative pairs never ship).
    * Emits the score margin plus the LENGTH-BIAS flag (chosen longer
    * than rejected), the standard reward-hacking audit a preference set
    * is screened for before training.
    *
    * Scale shape: ONE per-prompt aggregate — both extremes fold into
    * the same groupBy via struct max/min (no window, no second pass).
    */
  def preferencePairs(responses: DataFrame, promptIdCol: String = "prompt_id",
                      respIdCol: String = "resp_id",
                      scoreCol: String = "score",
                      lenCol: String = "len"): DataFrame =
    responses
      .groupBy(col(promptIdCol))
      .agg(
        count(lit(1)).as("__n"),
        // max of (score, -id) = highest score, LOWEST id on ties
        max(struct(col(scoreCol), (col(respIdCol) * -1).as("__neg"),
          col(respIdCol), col(lenCol))).as("__c"),
        min(struct(col(scoreCol), col(respIdCol), col(lenCol))).as("__r"))
      .filter(col("__n") >= 2 &&
        col(s"__c.$scoreCol") > col(s"__r.$scoreCol"))
      .select(col(promptIdCol),
        col(s"__c.$respIdCol").as("chosen_id"),
        col(s"__r.$respIdCol").as("rejected_id"),
        (col(s"__c.$scoreCol") - col(s"__r.$scoreCol")).cast("long")
          .as("margin"),
        col(s"__c.$lenCol").cast("long").as("len_chosen"),
        col(s"__r.$lenCol").cast("long").as("len_rejected"),
        (col(s"__c.$lenCol") > col(s"__r.$lenCol")).cast("long")
          .as("len_bias"))

  def blocklistFilter(docs: DataFrame, blocked: DataFrame,
                      domainCol: String = "source"): DataFrame = {
    val listCol = blocked.columns.head
    docs.join(broadcast(blocked.filter(blocked(listCol).isNotNull)),
      docs(domainCol) === blocked(listCol), "left_anti")
  }

  /** Deterministic uniform k-sample WITHOUT a corpus sort — the
    * relational reservoir: rank every row by the salted 60-bit hash of
    * its id and take the k smallest. Under the hash's uniformity each
    * row is equally likely, the pick is rerun-stable for a fixed salt
    * (audit-friendly, unlike RNG reservoirs), a new salt redraws, and
    * samples merge across corpus shards by re-ranking the union — the
    * same property chain as bottom-k sketches.
    *
    * Scale: TakeOrdered, not Sort — each partition keeps a k-row heap
    * and the driver merges |partitions|·k candidates; the corpus is
    * never shuffled. Ties cannot happen across distinct ids at the
    * same hash thanks to the id tiebreak, so the cut is total.
    * Returns the sampled rows with their `sample_rank`.
    */
  def reservoirSample(docs: DataFrame, k: Int, salt: String,
                      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    docs
      .withColumn("sample_rank",
        Dedup.h60(concat(lit(salt + "|"), col(idCol).cast("string"))))
      .orderBy(col("sample_rank"), col(idCol))
      .limit(k)
  }

  /** Corpus snapshot diff — the dataset-release audit: per document id,
    * whether it was ADDED, REMOVED, or CHANGED (content hash differs)
    * between two corpus versions; unchanged rows are dropped so the
    * result is release-note-sized, not corpus-sized. Feed it two
    * [[graft.lake.TxLog.readAt]] snapshots of one table (time travel)
    * or any two corpus DataFrames.
    *
    * Presence is tracked by explicit markers, NEVER inferred from the
    * content hash: a present row whose text is NULL has a NULL hash but
    * is still present, so (NULL text → text) is 'changed' and a
    * NULL-text row absent from the other side still reads
    * added/removed. Hash comparison is null-safe for the same reason.
    *
    * Scale: each side reduces to (id, 60-bit content hash) at the scan
    * — the full-outer join shuffles ~17 bytes per doc on the id, never
    * text; the status CASE is pure map-side.
    */
  def corpusDiff(before: DataFrame, after: DataFrame,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val a = before.select(col(idCol), Dedup.h60(col(textCol)).as("hash_a"),
      lit(true).as("__in_a"))
    val b = after.select(col(idCol), Dedup.h60(col(textCol)).as("hash_b"),
      lit(true).as("__in_b"))
    a.join(b, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__in_a").isNull, "added")
          .when(col("__in_b").isNull, "removed")
          .when(col("hash_a") <=> col("hash_b"), "unchanged")
          .otherwise("changed"))
      .filter(col("status") =!= "unchanged")
      .select(col(idCol), col("hash_a"), col("hash_b"), col("status"))
  }

  /** Canonical-document selection per duplicate cluster — the step that
    * turns [[Dedup.connectedComponents]] output into a drop list: within
    * each cluster keep the highest-quality member (ties to the smallest
    * id) and account for what the dedup reclaims. One shuffle keyed on
    * the cluster id; the cluster table is pair-graph-sized (near-dup
    * candidates only), orders of magnitude smaller than the corpus, and
    * the window + aggregate share the same partitioning.
    *
    * `scored` must carry (idCol, quality, n_tokens) — e.g.
    * [[TextAnalysis.qualityScore]] joined with a token count.
    * Returns (cluster, canonical_id, canonical_quality, n_members,
    * tokens_dropped).
    */
  def canonicalPerCluster(clusters: DataFrame, scored: DataFrame,
                          idCol: String = "doc_id"): DataFrame = {
    // the winner is min_by the (-quality, id) pair — best quality, then
    // SMALLEST id, and ids are unique so the key is total and the pick
    // deterministic. Negating quality (always numeric) instead of the
    // id keeps the op correct for string/any-orderable id columns. One
    // hash aggregate on cluster; the per-cluster window-sort
    // formulation pays an extra in-partition SORT for the same answer
    val key = struct((col("quality") * lit(-1)).as("__nq"), col(idCol))
    clusters
      .join(scored.select(col(idCol), col("quality"), col("n_tokens")), idCol)
      .groupBy(col("cluster"))
      .agg(
        min_by(col(idCol), key).as("canonical_id"),
        max(col("quality")).as("canonical_quality"),
        count(lit(1)).as("n_members"),
        (sum(col("n_tokens")) - min_by(col("n_tokens"), key))
          .as("tokens_dropped"))
  }

  /** Deterministic token-budget sampling: select documents best-quality
    * first until a global token budget is filled — the data-mixing step
    * that cuts a corpus to a training budget.
    *
    * 100 TB shape: a GLOBAL quality-ordered prefix sum over documents
    * would be a single-partition window over the corpus. Instead the
    * budget is resolved on (quality, hash-bucket) CELLS:
    *  1. one map-side aggregate -> <= (qualities x nBuckets) cell sums;
    *  2. the running-sum window runs over that TINY cell table (one
    *     task over ~1k rows, never over documents);
    *  3. cells wholly under the budget admit their documents by a
    *     broadcast-joined map-side filter — no document-level window;
    *  4. only the ONE boundary cell ranks its own documents (bounded by
    *     corpus/nBuckets) to fill the remaining budget exactly.
    * Selection is hash-ranked inside a cell, so reruns are stable and
    * no executor coordinates RNG state.
    *
    * `scored` needs (idCol, quality, n_tokens). Returns the selected
    * (idCol, quality, n_tokens) rows.
    */
  def tokenBudgetSample(scored: DataFrame, budgetTokens: Long,
                        nBuckets: Int = 256, idCol: String = "doc_id",
                        seed: String = "budget"): DataFrame = {
    // the seeded hash is computed ONCE as a column — the bucket and the
    // within-cell rank below must stay derived from the same value
    val s = scored.select(col(idCol), col("quality"), col("n_tokens"))
      .withColumn("__h",
        Dedup.h60(concat(lit(seed + "|"), col(idCol).cast("string"))))
      .withColumn("__bkt", pmod(col("__h"), lit(nBuckets.toLong)))
    val cells = s.groupBy(col("quality"), col("__bkt"))
      .agg(sum(col("n_tokens")).as("__cell"))
    // exclusive prefix over the cell table (tiny by construction)
    val order = Window.orderBy(col("quality").desc, col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = cells.withColumn("__cum",
      coalesce(sum(col("__cell")).over(order), lit(0L)))
    val fullCells = cum.filter(col("__cum") + col("__cell") <= budgetTokens)
      .select(col("quality"), col("__bkt"))
    // the single first cell that crosses the budget, with what remains
    val boundary = cum
      .filter(col("__cum") < budgetTokens &&
        col("__cum") + col("__cell") > budgetTokens)
      .select(col("quality"), col("__bkt"),
        (lit(budgetTokens) - col("__cum")).as("__rem"))
    val fromFull = s.join(broadcast(fullCells), Seq("quality", "__bkt"))
    val cellW = Window.partitionBy(col("quality"), col("__bkt"))
      .orderBy(col("__h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fromBoundary = s.join(broadcast(boundary), Seq("quality", "__bkt"))
      .withColumn("__cs", sum(col("n_tokens")).over(cellW))
      .filter(col("__cs") <= col("__rem"))
    fromFull.select(col(idCol), col("quality"), col("n_tokens"))
      .union(fromBoundary.select(col(idCol), col("quality"), col("n_tokens")))
  }

  /** Sequence packing (concat-and-chunk): lay documents end to end and
    * cut the stream into fixed `seqLen`-token training sequences — the
    * step that turns a curated corpus into equal-length samples. Each
    * document is mapped to the half-open token interval it occupies in
    * its stream, from which its first/last sequence index and offset
    * follow.
    *
    * 100 TB shape: one GLOBAL stream would serialize the corpus through
    * a single running-sum window. Instead documents are hash-assigned to
    * `nStreams` independent streams (deterministic, rerun-stable) and
    * the running sum windows over each stream in parallel — the stream
    * count scales with the cluster, and each training sequence still
    * draws from exactly one stream. Returns (idCol, stream, n_tokens,
    * first_seq, last_seq, offset_in_first): sequence ids are per-stream.
    */
  /** T5-style span corruption (Raffel et al. 2020 §3.1.4 — the
    * denoising-objective sample builder): mask one `spanTokens`-long
    * span per `blockTokens`-token block, replacing it in the input with
    * a per-block sentinel `<extra_id_j>` and emitting
    * `sentinel + masked tokens` as the target. Span starts are
    * hash-derived from (doc, block) — deterministic, rerun-stable, no
    * RNG state — and BLOCK-LOCAL, so (unlike the paper's sequential
    * span sampler) every block masks independently: the operator is a
    * shuffle-free narrow map replayable in SQL, and the corruption rate
    * is exactly `spanTokens/blockTokens` on full blocks (a tail block
    * of ≤ spanTokens tokens passes through unmasked). Splicing each
    * target span back over its sentinel reconstructs the original text
    * (the spec pins the round trip).
    */
  def spanCorrupt(docs: DataFrame, blockTokens: Int = 20,
                  spanTokens: Int = 3, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val b = blockTokens
    val l = spanTokens
    val blockOf: Column => Column = j => slice(col("__t"), j * b + 1, lit(b))
    val withBlocks = docs
      .withColumn("__t", split(col(textCol), " "))
      .withColumn("n_tokens", size(col("__t")).cast("long"))
      // size >= 1 always (split never returns an empty array), so the
      // block sequence is never built with a negative upper bound
      .withColumn("__js",
        sequence(lit(0), ((size(col("__t")) + b - 1) / b).cast("int") - 1))
    val spanStart: Column => Column = j =>
      pmod(Dedup.h60(concat(col(idCol).cast("string"), lit("|"),
        j.cast("string"))), size(blockOf(j)) - l + 1).cast("int")
    val inputs = transform(col("__js"), j => {
      val blk = blockOf(j)
      val s = spanStart(j)
      when(size(blk) > l,
        concat(slice(blk, lit(1), s),
          array(concat(lit("<extra_id_"), j.cast("string"), lit(">"))),
          slice(blk, s + l + 1, size(blk) - s - l)))
        .otherwise(blk)
    })
    val targets = transform(col("__js"), j => {
      val blk = blockOf(j)
      when(size(blk) > l,
        concat(array(concat(lit("<extra_id_"), j.cast("string"), lit(">"))),
          slice(blk, spanStart(j) + 1, lit(l))))
        .otherwise(array().cast("array<string>"))
    })
    withBlocks
      .withColumn("n_blocks", size(col("__js")).cast("long"))
      .withColumn("n_masked", (size(filter(col("__js"),
        j => size(blockOf(j)) > l)) * l).cast("long"))
      .withColumn("input_text", array_join(flatten(inputs), " "))
      .withColumn("target_text", array_join(flatten(targets), " "))
      .drop("__t", "__js")
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022 — the
    * infilling objective code models train with): split each document's
    * tokens at two hash-derived cut points into (prefix, middle,
    * suffix) and emit the PSM reordering
    * `<PRE> prefix <SUF> suffix <MID> middle`. Token-level cuts (the
    * paper cuts characters; the operator contract is the corpus's
    * space-token domain); the two cuts are h60 draws mod (n+1), sorted,
    * so every split is rerun-stable, uniform over positions, and
    * replayable in SQL. Degenerate spans (empty prefix/middle/suffix)
    * are legitimate FIM samples and pass through — the paper keeps
    * them. Concatenating prefix+middle+suffix in original order always
    * reconstructs the document (the spec pins it). Shuffle-free narrow
    * map.
    */
  def fimTransform(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val cutA = pmod(Dedup.h60(concat(col(idCol).cast("string"),
      lit("|fim1"))), size(col("__t")) + 1).cast("int")
    val cutB = pmod(Dedup.h60(concat(col(idCol).cast("string"),
      lit("|fim2"))), size(col("__t")) + 1).cast("int")
    docs
      .withColumn("__t", split(col(textCol), " "))
      .withColumn("n_tokens", size(col("__t")).cast("long"))
      .withColumn("cut1", least(cutA, cutB).cast("long"))
      .withColumn("cut2", greatest(cutA, cutB).cast("long"))
      .withColumn("psm_text", concat_ws(" ",
        concat(lit("<PRE> "),
          array_join(slice(col("__t"), lit(1), col("cut1").cast("int")),
            " ")),
        concat(lit("<SUF> "),
          array_join(slice(col("__t"), col("cut2").cast("int") + 1,
            size(col("__t")) - col("cut2").cast("int")), " ")),
        concat(lit("<MID> "),
          array_join(slice(col("__t"), col("cut1").cast("int") + 1,
            (col("cut2") - col("cut1")).cast("int")), " "))))
      .drop("__t")
  }

  def packSequences(docs: DataFrame, seqLen: Int, nStreams: Int = 64,
                    textCol: String = "text", idCol: String = "doc_id",
                    seed: String = "pack"): DataFrame = {
    val key = Dedup.h60(concat(lit(seed + "|"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("stream"))
      .orderBy(col("__key").asc, col(idCol).asc)
    docs
      .select(col(idCol), size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("__key", key)
      .withColumn("stream", pmod(col("__key"), lit(nStreams.toLong)))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("stream"), col("n_tokens"),
        expr(s"(__cum - n_tokens) div $seqLen").as("first_seq"),
        expr(s"(__cum - 1) div $seqLen").as("last_seq"),
        expr(s"(__cum - n_tokens) % $seqLen").as("offset_in_first"))
  }

  /** Deterministic global shuffle rank: a rerun-stable pseudorandom
    * training order (0..n-1) with NO corpus-wide window. Documents are
    * ordered by a 60-bit hash; the global rank decomposes into
    * (docs in lower hash-range buckets) + (rank within the bucket):
    *  1. bucket = top `log2(nBuckets)` hash bits, so bucket order IS
    *     hash-prefix order;
    *  2. per-bucket counts -> tiny table; exclusive prefix sum over it
    *     (one task over nBuckets rows, never over documents);
    *  3. broadcast the offsets back and rank within each bucket.
    * The within-bucket window shuffles on the bucket key — corpus-sized
    * data but nBuckets-way parallel, the same shape a distributed sort
    * uses. `nBuckets` must be a power of two (hash-prefix blocking).
    */
  def shuffleRank(docs: DataFrame, nBuckets: Int = 256,
                  idCol: String = "doc_id",
                  seed: String = "shuffle"): DataFrame = {
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two, got $nBuckets")
    val bits = java.lang.Integer.numberOfTrailingZeros(nBuckets)
    val key = Dedup.h60(concat(lit(seed + "|"), col(idCol).cast("string")))
    val keyed = docs.select(col(idCol)).withColumn("__key", key)
      .withColumn("__bkt", shiftright(col("__key"), 60 - bits))
    val counts = keyed.groupBy(col("__bkt")).agg(count(lit(1)).as("__n"))
    val prefix = Window.orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(prefix), lit(0L)))
      .select(col("__bkt"), col("__off"))
    val inBucket = Window.partitionBy(col("__bkt"))
      .orderBy(col("__key").asc, col(idCol).asc)
    keyed.join(broadcast(offsets), "__bkt")
      .withColumn("shuffle_pos",
        col("__off") + row_number().over(inBucket) - 1)
      .select(col(idCol), col("shuffle_pos"))
  }

  /** Curriculum data ordering: a deterministic global training order
    * that ascends through caller-defined STAGES (sequence-length
    * curriculum, quality annealing — any small-domain expression) while
    * shuffling uniformly WITHIN each stage. The standard curriculum
    * schedule: the model sees stage 0 first, and inside a stage the
    * order carries no signal.
    *
    * [[shuffleRank]] generalized: the prefix-sum offset table is keyed
    * by (stage, hash-prefix bucket) — still tiny (nStages × nBuckets
    * rows, the deliberate single-partition window), broadcast back; the
    * corpus-side window partitions per (stage, bucket). Equivalent to
    * `row_number() over (order by stage, h60(seed|id), id) - 1` but
    * with no corpus-wide window. A NULL stage coalesces to
    * Long.MinValue — those docs order FIRST (ASC NULLS FIRST
    * semantics), never silently dropping out of the permutation
    * through the null-unsafe offset join. Returns (idCol, stage,
    * curriculum_pos) with the coalesced stage.
    */
  def curriculumOrder(docs: DataFrame, stage: Column, nBuckets: Int = 256,
                      idCol: String = "doc_id",
                      seed: String = "curriculum"): DataFrame = {
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two, got $nBuckets")
    val bits = java.lang.Integer.numberOfTrailingZeros(nBuckets)
    val key = Dedup.h60(concat(lit(seed + "|"), col(idCol).cast("string")))
    val keyed = docs
      .select(col(idCol),
        coalesce(stage.cast("long"), lit(Long.MinValue)).as("stage"))
      .withColumn("__key", key)
      .withColumn("__bkt", shiftright(col("__key"), 60 - bits))
    val counts = keyed.groupBy(col("stage"), col("__bkt"))
      .agg(count(lit(1)).as("__n"))
    val prefix = Window.orderBy(col("stage").asc, col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(prefix), lit(0L)))
      .select(col("stage"), col("__bkt"), col("__off"))
    val inBucket = Window.partitionBy(col("stage"), col("__bkt"))
      .orderBy(col("__key").asc, col(idCol).asc)
    keyed.join(broadcast(offsets), Seq("stage", "__bkt"))
      .withColumn("curriculum_pos",
        col("__off") + row_number().over(inBucket) - 1)
      .select(col(idCol), col("stage"), col("curriculum_pos"))
  }

  /** Mixture re-weighting: per-domain sampling weights that steer the
    * corpus token distribution toward target shares — the "data mixing"
    * knob (upweight rare-but-wanted domains, downweight the crawl
    * giants). Pure integer arithmetic (1e6-scaled) so the weights are
    * engine-exact. One corpus-wide aggregate (map-side partial) plus
    * driver-free share math on the tiny per-domain table.
    *
    * `targetUnits` maps each domain to its relative target weight
    * (un-normalized); absent domains default to 1. weight_e6 =
    * target_share / actual_share, 1e6-scaled, capped at `maxWeightE6`.
    */
  def mixtureWeights(docs: DataFrame, domainCol: String,
                     targetUnits: Column, textCol: String = "text",
                     maxWeightE6: Long = 10000000L): DataFrame = {
    val perDomain = docs
      .select(col(domainCol), size(Dedup.tokens(col(textCol))).as("n_toks"),
        // absent/NULL targets default to 1 (the documented contract) —
        // without the coalesce, least() skips the NULL target and the
        // weight silently becomes the CAP for every unspecified domain
        coalesce(targetUnits, lit(1L)).as("__units"))
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
        max(col("__units")).as("__u"))
    // window over the per-domain table: domains number in the hundreds,
    // so the unpartitioned total is one tiny task, not a corpus window.
    // share math runs in DECIMAL: n_tokens * 1e6 overflows LONG for any
    // domain past ~9.2e12 tokens (well inside a 100 TB corpus) — DuckDB
    // widens to HUGEINT automatically, so the decimal path keeps both
    // engines integer-exact
    perDomain
      .withColumn("share_e6",
        expr("cast(n_tokens as decimal(38,0)) * 1000000" +
          " div sum(cast(n_tokens as decimal(38,0))) over ()"))
      .withColumn("target_e6",
        expr("__u * 1000000 div sum(__u) over ()"))
      .withColumn("weight_e6",
        // a sub-1e-6 domain floors share_e6 to 0: its weight IS the cap
        // (the cap exists exactly to bound such upweights), never a
        // divide-by-zero under ANSI mode
        least(expr("target_e6 * 1000000 div greatest(share_e6, 1)"),
          lit(maxWeightE6)))
      .select(col(domainCol), col("n_docs"), col("n_tokens"),
        col("share_e6"), col("target_e6"), col("weight_e6"))
  }

  /** Leakage-free train/validation split: a near-dup CLUSTER is
    * assigned to one split atomically — hashing the cluster id, not the
    * doc id — so two near-duplicate documents can never straddle train
    * and validation (the classic eval-contamination bug); docs outside
    * any cluster (no near-dup pair) hash on their own id. Deterministic
    * and rerun-stable, same hash-threshold discipline as
    * [[graft.ops.TextAnalysis.stratifiedSample]].
    *
    * Scale: `clusters` is the pair-graph-sized CC output (orders of
    * magnitude smaller than the corpus); the corpus LEFT-joins it on
    * doc id — one shuffle — and the split decision is map-side hash
    * arithmetic.
    */
  /** The ONE salted train/validation assignment expression — every
    * split consumer (leakageFreeSplit, the curation pipeline) derives
    * its label from this so the salt format and threshold scale cannot
    * drift between them (the SQL oracles share `dhSalted` for the same
    * reason).
    */
  def splitLabel(key: Column, validationPerMille: Int,
                 salt: String = "split"): Column =
    when(pmod(Dedup.h60(concat(lit(s"$salt|"), key.cast("string"))),
        lit(1000L)) < validationPerMille, lit("validation"))
      .otherwise(lit("train"))

  def leakageFreeSplit(docs: DataFrame, clusters: DataFrame,
                       validationPerMille: Int, salt: String = "split",
                       idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol))
      .join(clusters.select(col(idCol), col("cluster")), Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("cluster"), col(idCol)))
      .withColumn("split",
        splitLabel(col("split_key"), validationPerMille, salt))
      .select(col(idCol), col("split_key"), col("split"))

  /** Epoch/repetition schedule for a token budget over sources — the
    * data-constrained mixing step (Muennighoff et al. 2023,
    * arXiv:2305.16264: repeating data beyond ~4 epochs stops helping,
    * so a budget-constrained run caps repetition per source and spends
    * the freed budget elsewhere). Allocates `budgetTokens` across
    * sources by target weight, caps each source at `maxEpochsE2`
    * (epochs ×100), and hands the capped sources' unused budget to the
    * uncapped ones in ONE proportional redistribution round —
    * deterministic by construction; production schedulers iterate to a
    * fixed point, the single round is the documented contract here
    * (post-redistribution allocations may re-exceed the cap).
    *
    * Budget × share products run in DECIMAL(38,0) (a 100 TB-scale
    * budget ~2.5e13 tokens × an e6 share overflows a LONG — the
    * [[mixtureWeights]] discipline). Returns (domainCol, n_tokens,
    * target_e6, alloc_tokens, epochs_e2, capped).
    *
    * Scale: one per-source hash aggregate; every window runs over the
    * tiny source table (the [[mixtureWeights]] shape — hundreds of
    * rows, never documents).
    */
  def epochSchedule(docs: DataFrame, domainCol: String, targetUnits: Column,
                    budgetTokens: Long, maxEpochsE2: Long = 400L,
                    textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0 && maxEpochsE2 > 0,
      s"bad schedule params: budget=$budgetTokens capE2=$maxEpochsE2")
    val perSource = docs
      .select(col(domainCol),
        size(Dedup.tokens(col(textCol))).cast("long").as("n_toks"),
        coalesce(targetUnits, lit(1L)).as("__u"))
      .groupBy(col(domainCol))
      .agg(sum(col("n_toks")).as("n_tokens"), max(col("__u")).as("__u"))
    perSource
      .withColumn("target_e6", expr("__u * 1000000 div sum(__u) over ()"))
      .withColumn("want",
        expr(s"cast($budgetTokens as decimal(38,0)) * target_e6 div 1000000"))
      .withColumn("cap_tokens",
        expr(s"cast($maxEpochsE2 as decimal(38,0)) * n_tokens div 100"))
      .withColumn("capped", (col("want") > col("cap_tokens")).cast("int"))
      .withColumn("alloc1", least(col("want"), col("cap_tokens")))
      .withColumn("leftover", expr(s"$budgetTokens - sum(alloc1) over ()"))
      .withColumn("uncapped_u",
        expr("sum(case when capped = 0 then __u else 0 end) over ()"))
      .withColumn("alloc_tokens", expr(
        "alloc1 + (case when capped = 0 and uncapped_u > 0" +
          " then cast(leftover as decimal(38,0)) * __u div uncapped_u" +
          " else 0 end)"))
      .withColumn("epochs_e2",
        expr("cast(alloc_tokens as decimal(38,0)) * 100 div n_tokens"))
      .select(col(domainCol), col("n_tokens"), col("target_e6"),
        col("alloc_tokens"), col("epochs_e2"), col("capped"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, arXiv:2302.03169
    * "Data Selection for Language Models via Importance Resampling"):
    * score every document by how much more likely its tokens are under
    * a TARGET slice of the corpus (`isTarget` marks the exemplar docs —
    * a trusted source, a hand-curated subset) than under the raw corpus
    * overall; selection = rank or weighted-draw on the emitted weight.
    *
    * The paper works in log domain over hashed n-gram features. This is
    * the linear-domain integer-exact variant: the per-token add-1-
    * smoothed probability RATIO, averaged with multiplicity —
    *   ratio_e6(w)    = floor((tf_t(w)+1)·(TOT_r+V)·1e6
    *                          / ((tf_r(w)+1)·(TOT_t+V)))
    *   weight_e6(doc) = floor(Σ_w m_w·ratio_e6(w) / n_tokens)
    * — because a log-domain float product is not bit-stable across
    * engines, and the ranking it induces is what matters for selection.
    * Numerators run in DECIMAL(38,0): (tf+1)·(TOT+V)·1e6 overflows a
    * LONG once the corpus passes ~10^12 tokens (the [[mixtureWeights]]
    * discipline; DuckDB widens to HUGEINT on its own).
    *
    * Shape: one explode to per-(doc, token-hash) multiplicities, two
    * vocabulary aggregates off it (map-side combine on 8-byte hashes),
    * corpus totals as 1-row cross joins, ratio table joined back on the
    * token hash — vocabulary-scale at 100 TB, so deliberately NOT
    * broadcast-hinted (the TF-IDF decision: AQE broadcasts it at small
    * SF, shuffles it at scale) — then one doc-keyed aggregate. No
    * windows, no corpus-wide funnel.
    *
    * Returns (idCol, n_tokens, weight_e6); a target doc's own tokens
    * count in both distributions, the standard self-inclusive estimate.
    * An EMPTY target slice yields NULL weights for every doc (the
    * 1-row target-total aggregate is NULL and the ratio propagates) —
    * absence of signal, deliberately not masked as 0 or an error on
    * the distributed path.
    */
  def importanceWeight(docs: DataFrame, isTarget: Column,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val inst = docs
      .select(col(idCol), isTarget.cast("boolean").as("__tgt"),
        explode(Dedup.tokens(col(textCol))).as("w"))
      .select(col(idCol), col("__tgt"), Dedup.h60(col("w")).as("tw"))
    val byDoc = inst.groupBy(col(idCol), col("__tgt"), col("tw"))
      .agg(count(lit(1)).as("m"))
    val raw = byDoc.groupBy(col("tw")).agg(sum(col("m")).as("tf_r"))
    val tgt = byDoc.filter(col("__tgt")).groupBy(col("tw"))
      .agg(sum(col("m")).as("tf_t"))
    // corpus totals: two 1-row aggregates riding in as cross joins
    val totals = raw.agg(sum(col("tf_r")).as("tot_r"),
      count(lit(1)).as("v"))
    val totT = byDoc.filter(col("__tgt")).agg(sum(col("m")).as("tot_t"))
    val ratio = raw.join(tgt, Seq("tw"), "left")
      .crossJoin(totals).crossJoin(totT)
      .select(col("tw"), expr(
        "cast((coalesce(tf_t, 0) + 1) as decimal(38,0))" +
          " * cast(tot_r + v as decimal(38,0)) * 1000000" +
          " div (cast(tf_r + 1 as decimal(38,0))" +
          "      * cast(tot_t + v as decimal(38,0)))").as("ratio_e6"))
    byDoc
      .join(ratio, "tw")
      .groupBy(col(idCol))
      .agg(sum(col("m")).as("n_tokens"),
        expr("sum(m * ratio_e6) div sum(m)").as("weight_e6"))
  }

  /** DETERMINISTIC bootstrap confidence interval for an eval metric
    * (Efron 1979, percentile form) — the error bar every benchmark
    * comparison needs before "model A beats model B" means anything.
    * Classic bootstrap needs an RNG; here replicate `b`'s i-th draw is
    * `h60("bs|" + b + "|" + i) mod n` — the salted-hash uniform that
    * [[graft.ops.Dedup]]'s sampling family already uses — so every
    * resample, every replicate mean, and the CI bounds replay bit for
    * bit in any engine (and rerun-stable across partitionings).
    * Returns ONE row: (n_eval, n_boot, point_e6, lo_e6, hi_e6) with
    * means in e6 fixed point and the percentile bounds at
    * `alphaPerMille`/1000 each side (25 = the standard 95% CI).
    *
    * Scale shape: eval sets are FIXED-SIZE benchmark slices by
    * construction (hundreds to thousands of rows — never
    * corpus-proportional), so the rank window over the eval rows, the
    * nBoot·n draw explode, the index equi-join, and the nBoot-row
    * percentile window are all bounded regardless of corpus size.
    */
  def bootstrapCI(eval: DataFrame, scoreCol: String, nBoot: Int = 200,
                  alphaPerMille: Int = 25,
                  idCol: String = "doc_id"): DataFrame = {
    require(nBoot >= 2, s"need >= 2 replicates: $nBoot")
    require(alphaPerMille >= 1 && alphaPerMille < 500,
      s"alphaPerMille out of (0, 500): $alphaPerMille")
    val spark = eval.sparkSession
    import spark.implicits._
    // __s as a secondary sort key keeps the row-index assignment (and
    // so the bit-replayable-determinism contract) total even when ids
    // collide: equal (id, score) rows are interchangeable in every
    // resample, and unequal ones now order deterministically
    val wi = Window.orderBy(col(idCol), col("__s"))
    // cached: the index table feeds the replicate join AND the point
    // estimate, and carrying its window through every branch would
    // rescan the eval source per consumer (the mmrRerank discipline)
    val idx = eval
      .select(col(idCol), col(scoreCol).cast("long").as("__s"))
      .withColumn("__i", row_number().over(wi).cast("long") - 1)
      .cache()
    try {
      // n materialized EAGERLY: with n = 0, sequence(0, __n - 1) counts
      // DOWN in Spark (yields [0, -1] — the Dedup.h60 doc pitfall),
      // pmod(·, 0) nulls out, and the bounds/point getLong calls below
      // would NPE on null aggregates — fail loudly instead
      val n = idx.count()
      require(n > 0, "bootstrapCI needs a non-empty eval set")
      val draws = spark.range(nBoot.toLong).toDF("__b")
        .select(col("__b"),
          explode(expr(s"sequence(0, ${n - 1}L)")).as("__j"))
        .withColumn("__t", pmod(Dedup.h60(
          concat(lit("bs|"), col("__b").cast("string"), lit("|"),
            col("__j").cast("string"))), lit(n)))
      val means = draws.join(idx, col("__t") === col("__i"))
        .groupBy(col("__b"))
        .agg(expr("sum(__s) * 1000000L DIV count(1)").as("mean_e6"))
      val wb = Window.orderBy(col("mean_e6"), col("__b"))
      val loR = math.max(1, alphaPerMille * nBoot / 1000)
      val hiR = math.min(nBoot, nBoot - loR + 1)
      // BOTH percentile bounds from ONE pass over the replicate means
      // (two filter branches would run the nBoot·n resample twice),
      // materialized eagerly — the result is one bounded row, so the
      // caches can drop before returning
      val bounds = means.withColumn("__r", row_number().over(wb))
        .filter(col("__r") === loR || col("__r") === hiR)
        .agg(max(when(col("__r") === loR, col("mean_e6"))).as("lo"),
          max(when(col("__r") === hiR, col("mean_e6"))).as("hi"))
        .head()
      val pt = idx
        .agg(count(lit(1)).as("n"),
          expr("sum(__s) * 1000000L DIV count(1)").as("p"))
        .head()
      Seq((pt.getLong(0), nBoot.toLong, pt.getLong(1),
        bounds.getLong(0), bounds.getLong(1)))
        .toDF("n_eval", "n_boot", "point_e6", "lo_e6", "hi_e6")
    } finally { idx.unpersist(); () }
  }
}
