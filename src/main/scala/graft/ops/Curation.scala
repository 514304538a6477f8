package graft.ops

import org.apache.spark.sql.DataFrame
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

  /** Per-domain quota sampling: keep at most `maxPerDomain` documents per
    * domain, chosen by deterministic hash rank (ties broken by id) — the
    * domain-balancing step that stops a handful of giant crawl domains
    * from dominating the mixture. Rerun-stable: same corpus in, same
    * sample out, no RNG state to coordinate across executors.
    */
  def domainCapSample(docs: DataFrame, domainCol: String, maxPerDomain: Int,
                      idCol: String = "doc_id",
                      seed: String = "cap"): DataFrame = {
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
}
