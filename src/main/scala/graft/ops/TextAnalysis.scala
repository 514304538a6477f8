package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, document fingerprinting.
  *
  * All are narrow per-row transforms (no shuffle) — at 100 TB they run
  * entirely map-side inside whole-stage codegen.
  */
object TextAnalysis {

  /** Language marker words (tiny stopword profiles). Deterministic
    * argmax with fixed precedence order on ties.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  // the single tokenization contract lives in Dedup.tokens — dedup and
  // text analysis must agree on token boundaries
  private def toks(text: Column): Column = Dedup.tokens(text)

  /** Exact-token marker matching — the CORPUS CONTRACT is pre-normalized
    * text (lowercased, punctuation-separated), as the testdata is; raw
    * text should pass through `lower()` + punctuation stripping first or
    * sentence-initial capitals ("The") will not count as markers.
    */
  private def markerHits(words: Column, markers: Seq[String]): Column =
    size(filter(words, w => w.isin(markers.map(_.asInstanceOf[Any]): _*)))

  /** Per-document statistics: char/token counts, punctuation count,
    * stopword count, average token length (scaled integer).
    */
  def stats(docs: DataFrame, textCol: String = "text"): DataFrame =
    // one split per row, shared by three consumers (no HOF-lambda CSE)
    statsOfTokens(docs.withColumn("__w", toks(col(textCol))),
      textCol, "__w").drop("__w")

  /** [[stats]] over a PRE-MATERIALIZED token-array column — the fused
    * ensemble pass tokenizes the corpus once and shares the array
    * across all four signals; identical arithmetic.
    */
  private[ops] def statsOfTokens(d: DataFrame, textCol: String,
                                 tokCol: String): DataFrame = {
    val t = col(textCol)
    d
      .withColumn("n_chars_m", length(t))
      .withColumn("n_tokens", size(col(tokCol)))
      .withColumn("n_punct",
        length(t) - length(regexp_replace(t, "[.,;:!?]", "")))
      .withColumn("n_stopwords", markerHits(col(tokCol), langMarkers.head._2))
      .withColumn("avg_token_len_e2",
        // bigint: at INT, a ~21 MB document's length * 100 would overflow
        expr(s"(cast(length($textCol) as bigint) - size($tokCol) + 1) * 100" +
          s" DIV size($tokCol)"))
  }

  /** Quality score 0..4: one point each for length in range, token count
    * in range, low punctuation, stopword presence (exact integer rules —
    * reproducible and cheap; mirrors ratio-based quality filters).
    */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame =
    qualityRules(stats(docs, textCol))

  /** [[qualityScore]] over a pre-materialized token array (the fused
    * ensemble pass; identical rules).
    */
  private[ops] def qualityScoreOfTokens(d: DataFrame, textCol: String,
                                        tokCol: String): DataFrame =
    qualityRules(statsOfTokens(d, textCol, tokCol))

  private def qualityRules(statted: DataFrame): DataFrame =
    statted
      .withColumn("quality",
        when(col("n_chars_m").between(100, 2000), 1).otherwise(0) +
        when(col("n_tokens").between(20, 500), 1).otherwise(0) +
        when(col("n_punct") * 10 <= col("n_tokens"), 1).otherwise(0) +
        when(col("n_stopwords") > 0, 1).otherwise(0))
      .withColumn("keep", col("quality") >= 3)

  /** Character-repetition filter via the Simpson/collision index —
    * Rényi order-2 diversity WITHOUT the log, so it is exactly
    * rational and both engines agree bit for bit where a Shannon
    * -Σ p·ln p would drift in the last double ulp:
    * collision_e6 = 1e6 · Σ c_i² / n² over per-character counts.
    * Natural prose sits near the language's unigram collision rate
    * (this corpus: 0.068-0.10); character runs, padding, and
    * boilerplate push toward 1.0 — the classic cheap screen run
    * before the heavier LM scorers.
    *
    * Scale shape: one (doc, char) micro-group aggregate, then one
    * per-doc aggregate — the n-gram family's two-exchange shape; no
    * window, no join. Exact while n ≤ ~3.0M chars per doc (the
    * remainder·1e6 term of the quotient-remainder split caps at
    * n²·1e6); a larger "document" is a concatenation bug, not text.
    * Returns (idCol, n_chars_counted, distinct_chars, collision_e6,
    * keep).
    */
  def charDiversity(docs: DataFrame, keepMaxE6: Long = 120000L,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame =
    docs
      // CONTRACT: empty/NULL-text docs are excluded from the output (a
      // collision index over zero characters is undefined). The filter is
      // explicit — engines disagree on splitting "" (DuckDB string_split
      // can emit ['']), so both sides of the oracle pre-filter identically.
      .filter(length(col(textCol)) > 0)
      // empty-string guard: Java's split("", -1) emits a trailing ""
      // element that DuckDB's string_split does not
      .select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_chars_counted"),
        count(lit(1)).as("distinct_chars"),
        sum(col("c") * col("c")).as("__ss"))
      .withColumn("collision_e6", expr(
        "(__ss DIV (n_chars_counted * n_chars_counted)) * 1000000L + " +
          "((__ss % (n_chars_counted * n_chars_counted)) * 1000000L)" +
          " DIV (n_chars_counted * n_chars_counted)"))
      .withColumn("keep", col("collision_e6") <= keepMaxE6)
      .drop("__ss")

  /** Language-ID by marker-word voting: per-language hit counts,
    * deterministic argmax (strict > chain, earlier language wins ties).
    */
  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // split once: inlining re-splits per LANGUAGE (no HOF-lambda CSE)
    val scored = langMarkers.foldLeft(
      docs.withColumn("__w", toks(col(textCol)))) {
      case (d, (lang, markers)) =>
        d.withColumn(s"score_$lang", markerHits(col("__w"), markers))
    }.drop("__w")
    val best = langMarkers.map(_._1).foldRight(lit("und")) { case (lang, rest) =>
      val isMax = langMarkers.map(_._1).filter(_ != lang)
        .map(o => col(s"score_$lang") >= col(s"score_$o"))
        .reduce(_ && _)
      when(col(s"score_$lang") > 0 && isMax, lit(lang)).otherwise(rest)
    }
    scored.withColumn("predicted_lang", best)
  }

  /** TRAINED language-ID — the CLD/TextCat char-n-gram profile family,
    * upgrading [[languageId]]'s fixed marker lists to profiles learned
    * from LABELED data: per language, the `topN` most frequent char
    * trigrams of its labeled docs form the profile SET; a doc is
    * classified to the language sharing the most of the doc's own topN
    * trigrams. Set overlap keeps everything integer-exact and
    * oracle-replayable (no float cosine); all ranks and the final
    * argmax break ties deterministically (count desc, then gram/lang
    * lexicographic). Docs overlapping no profile report 'und'.
    *
    * Scale: trigram extraction is a narrow explode; profile building
    * aggregates to (langs × grams) and windows per LANGUAGE (tiny);
    * per-doc ranking windows per DOC; classification is one equi-join
    * on the gram against a broadcastable profile table (languages ×
    * topN rows) and a per-doc argmax. No cartesian, no global window.
    */
  def langProfiles(labeled: DataFrame, topN: Int = 64,
                   textCol: String = "text",
                   langCol: String = "lang"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol)).orderBy(col("cnt").desc, col("gram"))
    charTrigrams(labeled.select(col(langCol), col(textCol)), textCol)
      .groupBy(col(langCol), col("gram")).agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topN)
      .select(col(langCol), col("gram"))
  }

  /** Classify by profile overlap; see [[langProfiles]]. Returns
    * (idCol, pred_lang, overlap).
    */
  def classifyByProfile(docs: DataFrame, profiles: DataFrame,
                        topN: Int = 64, textCol: String = "text",
                        idCol: String = "doc_id",
                        langCol: String = "lang"): DataFrame = {
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("cnt").desc, col("gram"))
    val docTop = charTrigrams(docs.select(col(idCol), col(textCol)), textCol)
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(wd))
      .filter(col("rk") <= topN)
      .select(col(idCol), col("gram"))
    val overlaps = docTop
      .join(broadcast(profiles), Seq("gram"))
      .groupBy(col(idCol), col(langCol))
      .agg(count(lit(1)).as("overlap"))
      // argmax via min(struct(-overlap, lang)): largest overlap, ties
      // to the lexicographically smallest language — total order
      .groupBy(col(idCol))
      .agg(min(struct((-col("overlap")).as("no"), col(langCol).as("lg")))
        .as("best"))
      .select(col(idCol), col("best.lg").as("pred_lang"),
        (-col("best.no")).as("overlap"))
    docs.select(col(idCol)).join(overlaps, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("overlap"), lit(0L)).as("overlap"))
  }

  /** Char trigrams of a text column (spaces included — word-boundary
    * grams carry signal in this family), as one row per occurrence.
    */
  private def charTrigrams(df: DataFrame, textCol: String): DataFrame =
    df.select(df.columns.filter(_ != textCol).map(col) :+
      // the short-text case is explicit: sequence(0, -1) counts DOWN
      // in Spark (the Dedup.shingles lesson)
      explode(expr(
        s"CASE WHEN length($textCol) < 3 THEN CAST(array() AS ARRAY<STRING>)" +
          s" ELSE transform(sequence(0, length($textCol) - 3)," +
          s" s -> substring($textCol, s + 1, 3)) END")).as("gram"): _*)

  /** Document fingerprints: 60-bit content min-hash over word 3-shingles
    * (rolling-hash-style): min/max hashes over the shingle set plus
    * `fp_first` = the hash of the shingle that minimizes a SECOND,
    * independently-salted hash (a second minhash permutation — a
    * content-stable anchor, NOT the document's opening shingle). The
    * anchor ordering is the 8-byte salted hash, never the shingle
    * string itself: carrying full shingle text through the min_by
    * aggregate would make every partial-aggregate row string-wide —
    * measured multi-second at sf0.1, and a byte-bandwidth multiplier at
    * 100 TB. Groupable for near-dup clustering; one explode + aggregate.
    */
  def fingerprint(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val sh = Dedup.explodedShingles(docs, 3, textCol, idCol)
      .withColumn("h", Dedup.h60(col("sh")))
      .withColumn("h2", Dedup.h60(concat(col("sh"), lit("#"))))
    sh.groupBy(col(idCol)).agg(
      min(col("h")).as("fp_min"),
      max(col("h")).as("fp_max"),
      min_by(col("h"), col("h2")).as("fp_first"),
      count(lit(1)).as("n_shingles"))
  }

  /** Winnowing fingerprints (the MOSS local-minima selection, Schleimer
    * et al. 2003): hash every word n-gram, then keep the MINIMUM hash of
    * each window of k consecutive grams. Guarantees any shared run of
    * ≥ n+k-1 tokens shares at least one fingerprint while selecting only
    * ~2/(k+1) of the grams — the standard robust alternative to fixed
    * stride sampling for plagiarism/near-dup detection.
    *
    * Scale: the min-over-k window is PARTITIONED BY doc — thousands of
    * independent tiny windows per task, never a corpus-wide funnel; docs
    * shorter than n+k-1 tokens yield no complete window and are absent
    * from the output (nothing to fingerprint).
    */
  def winnowFingerprints(docs: DataFrame, n: Int = 3, k: Int = 4,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    val grams = Dedup.posExplodedShingles(docs, n, textCol, idCol)
      .withColumn("g", Dedup.h60(col("sh")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(0, k - 1)
    grams
      .withColumn("fp", min(col("g")).over(w))
      .filter(col("pos") <= col("n_grams") - k) // complete windows only
      .groupBy(col(idCol))
      .agg(
        count_distinct(col("fp")).as("n_fp"),
        min(col("fp")).as("fp_min"),
        max(col("fp")).as("fp_max"))
  }

  /** TF-IDF top-k terms per document, in exact integer arithmetic so the
    * result is engine-deterministic: score = tf * ((N * 1e6) DIV df).
    * One explode, one df aggregate, one window top-k. The tf⋈df join is
    * NOT broadcast-hinted: a web corpus's distinct-term table (URLs,
    * hashes, typos) runs to billions of rows — AQE broadcasts it when
    * it is actually small, and a shuffle equi-join on the term carries
    * the 100 TB case a forced driver collect would kill.
    */
  def tfIdfTopTerms(docs: DataFrame, k: Int, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val n = docs.count()
    val terms = docs.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = terms.select(col(idCol), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      // BIGINT literals: as INTs, n * 1e6 overflows at ~2.1k docs (the
      // sf0.01 gate passed while sf0.1 threw at constant folding)
      .withColumn("idf1e6", expr(s"(${n}L * 1000000L) DIV df"))
      .withColumn("score", col("tf") * col("idf1e6"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("term"), col("tf"), col("df"),
        col("score"))
  }

  /** Okapi BM25 top-k retrieval scoring (Robertson et al., TREC-3) in
    * EXACT integer arithmetic: per query term,
    * idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)), summed per doc,
    * everything in e6 fixed point. The IDF is the ODDS form
    * ((N − df + ½)/(df + ½), i.e. exp of the Robertson–Spärck Jones
    * log-idf, carried as (2(N−df)+1)e6 div (2df+1)) — the ranking is
    * identical (exp is monotone) and, unlike ln, engine-deterministic:
    * libm last-ulp differences between the JVM and the oracle engine
    * would flip e6 roundings.
    *
    * Plan shape for 100 TB: ONE corpus pass — explode + an `isin`
    * prefilter on the query-term set pushed into the scan — then
    * aggregates keyed by (doc, term) → doc; the term-df and
    * corpus-stats sides are query-sized and broadcast; the final top-k
    * is a TakeOrdered, never a global sort. Docs containing no query
    * term drop out naturally (score 0).
    */
  def bm25Rank(docs: DataFrame, terms: Seq[String], k: Int,
               k1E3: Long = 1200L, bE3: Long = 750L,
               textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty && terms.forall(_.nonEmpty), "empty query")
    require(k > 0 && k1E3 >= 0 && bE3 >= 0 && bE3 <= 1000, "bad bm25 params")
    val k1E6 = k1E3 * 1000L
    val bE6 = bE3 * 1000L
    val toksDf = docs
      .select(col(idCol), toks(col(textCol)).as("__ts"))
      .select(col(idCol), col("__ts"),
        size(col("__ts")).cast("long").as("dl"))
    val tk = toksDf.select(col(idCol), col("dl"),
        explode(col("__ts")).as("w"))
      .filter(col("w").isin(terms: _*))
    val tf = tk.groupBy(col(idCol), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("w")).agg(count(lit(1)).as("dft"))
    val stats = toksDf.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_dl"))
    withBm25TermScore(
      tf.join(broadcast(dfT), "w").crossJoin(broadcast(stats)), k1E6, bE6)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        sum(col("term_score_e6")).as("score_e6"))
      .orderBy(col("score_e6").desc, col(idCol))
      .limit(k)
  }

  /** Block-max pruned BM25 top-k (Ding & Suel's block-max WAND recast
    * as two batch passes) — the scale path for retrieval over a sharded
    * index: per (term, block) the index carries the MAX attainable
    * term score (query-independent — BM25's term score depends only on
    * tf/dl/df/corpus stats), so a query can skip every block whose
    * summed bound cannot beat the running k-th best score.
    *
    * Batch form (no per-posting cursor): phase 1 exact-scores the
    * smallest prefix of blocks by (bound desc) holding >= k candidate
    * docs and takes tau = the k-th best exact score; phase 2
    * exact-scores only the remaining blocks with bound >= tau (>=, not
    * >: an equal-bound block can hold an equal score that wins the
    * doc-id tie-break). Any doc in a skipped block scores <= bound <
    * tau with k docs already at >= tau, so the union's top-k equals
    * the full scan's — the spec asserts that equality and that the
    * skip actually bites.
    *
    * Scale shape: ONE distributed action computes every bounded input
    * the merge needs (per-block bounds, candidate counts, per-block
    * top-k under a PARTITIONED window) as a tagged union — AQE
    * materializes the independent branches CONCURRENTLY, the candidate
    * tf exchange and the block repartition are each built once and
    * ReusedExchange'd across branches, and the corpus is scanned
    * exactly twice (tf chain + 1-row stats), the same count as plain
    * bm25Rank. Block selection then runs on the driver over bounded
    * metadata — |terms| df rows, |blocks| bound/count rows, and the
    * <= |blocks|*k per-block survivors the final pick draws from — the
    * same partial-top-k-then-driver-merge contract as Spark's own
    * TakeOrderedAndProject. The round-12 lazy form instead chained
    * every consumer behind its own sequential AQE stage chain and cost
    * ~5x the plain scan at FIXED data size (stage-floor latency, not
    * data volume). Returns a local k-row table (idCol, n_hits,
    * score_e6, phase, scanned_blocks, total_blocks).
    */
  def bm25BlockMaxTopK(docs: DataFrame, terms: Seq[String], k: Int,
                       blocks: Int = 8, k1E3: Long = 1200L, bE3: Long = 750L,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty && k > 0 && blocks > 0, "bad blockmax params")
    val toksDf = docs
      .select(col(idCol), toks(col(textCol)).as("__ts"))
      .select(col(idCol), col("__ts"),
        size(col("__ts")).cast("long").as("dl"))
    val tk = toksDf.select(col(idCol), col("dl"),
        explode(col("__ts")).as("w"))
      .filter(col("w").isin(terms: _*))
    // candidate-bounded: only docs holding >= 1 query term survive the
    // isin pushdown. tf feeds two branches (its own term-df aggregate
    // and the scoring join) — one exchange, ReusedExchange'd.
    val tf = tk.groupBy(col(idCol), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("w")).agg(count(lit(1)).as("dft"))
    val stats = toksDf.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_dl"))
    val scored = withBm25TermScore(
      tf.join(broadcast(dfT), "w").crossJoin(broadcast(stats)),
      k1E3 * 1000L, bE3 * 1000L)
      .withColumn("block", pmod(col(idCol), lit(blocks.toLong)))
      .select(col("block"), col(idCol), col("w"), col("term_score_e6"))
      // ONE exchange for the whole merge: hash(block) satisfies every
      // downstream clustering — groupBy(block, doc), groupBy(block, w),
      // groupBy(block), and the block-partitioned window — so the merge
      // branches chain in-partition off a single ReusedExchange.
      // Parallelism = |blocks| here, the same bound the per-block
      // window already imposes.
      .repartition(col("block"))
    val perDoc = scored.groupBy(col("block"), col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        sum(col("term_score_e6")).as("score_e6"))
    // index metadata: per-(term, block) max term score; query bound =
    // the sum over the query's terms. |blocks| rows from here down.
    val ub = scored.groupBy(col("block"), col("w"))
      .agg(max(col("term_score_e6")).as("mx"))
      .groupBy(col("block")).agg(sum(col("mx")).as("ub"))
    blockMaxMerge(perDoc, ub, k, idCol)
  }

  /** Local block-max result with the operator's fixed output schema —
    * the merge's candidate set is <= |blocks|*k rows by construction,
    * so the final selection is driver-side (the same contract as
    * Spark's TakeOrderedAndProject); the empty Seq is the no-candidate
    * path.
    */
  private def blockMaxResult(spark: org.apache.spark.sql.SparkSession,
                             idCol: String,
                             rows: Seq[org.apache.spark.sql.Row]): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(idCol, "n_hits", "score_e6", "phase",
        "scanned_blocks", "total_blocks").map(StructField(_, LongType))))
  }

  /** The two-phase block-max merge shared by [[bm25BlockMaxTopK]]
    * (bounds derived inline) and [[bm25TopKOverIndex]] (bounds read
    * from the at-rest index): `perDoc` = (block, idCol, n_hits,
    * score_e6) exact per-doc scores, `ub` = (block, ub) summed
    * per-block score bounds for the query's terms.
    *
    * ONE distributed job computes the three bounded tables — per-block
    * bounds, candidate counts, and the per-block top-k under a
    * PARTITIONED window — as a tagged union; block selection and the
    * final k-row pick then run on the DRIVER, the way a search
    * engine's query planner consumes block-max metadata. Everything
    * collected is |blocks|- or |blocks|*k-bounded by construction
    * (blocks is a config constant): the per-block top-k window means
    * every possible output row is among the survivors, the same
    * partial-top-k-then-driver-merge contract as Spark's own
    * TakeOrderedAndProject. The round-12 lazy form instead chained
    * every consumer behind its own AQE stage chain and cost ~5x the
    * plain scan at fixed data size.
    */
  private def blockMaxMerge(perDoc: DataFrame, ub: DataFrame, k: Int,
                            idCol: String): DataFrame = {
    val spark = perDoc.sparkSession
    val wInB = Window.partitionBy(col("block"))
      .orderBy(col("score_e6").desc, col(idCol))
    // per-block top-k under a PARTITIONED window (WindowGroupLimit
    // pushes the limit below the exchange): <= |blocks|*k survivors,
    // and every possible output row is one of them
    val topPerBlock = perDoc
      .withColumn("rb", row_number().over(wInB))
      .filter(col("rb") <= k)
    val tagged = ub
      .select(lit(0L).as("t"), col("block"), col("ub").as("a"),
        lit(0L).as("b"), lit(0L).as("c"))
      .unionByName(perDoc.groupBy(col("block"))
        .agg(count(lit(1)).as("a"))
        .select(lit(1L).as("t"), col("block"), col("a"),
          lit(0L).as("b"), lit(0L).as("c")))
      .unionByName(topPerBlock
        .select(lit(2L).as("t"), col("block"), col(idCol).as("a"),
          col("n_hits").as("b"), col("score_e6").as("c")))
      .collect()
    val ubRows = tagged.filter(_.getLong(0) == 0L)
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val ndRows = tagged.filter(_.getLong(0) == 1L)
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    // (block, id, n_hits, score) per-block survivors
    val top = tagged.filter(_.getLong(0) == 2L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // marked = ub inner-join nd, bound-descending with block tie-break;
    // phase 1 = the smallest prefix holding >= k candidate docs
    // (cum - nd < k is a prefix property: the running sum is monotone)
    val marked = ubRows.keySet.intersect(ndRows.keySet).toSeq
      .map(b => (b, ubRows(b), ndRows(b)))
      .sortBy { case (b, u, _) => (-u, b) }
    var cum = 0L
    val p1Blocks = marked.takeWhile { case (_, _, nd) =>
      val before = cum; cum += nd; before < k
    }.map(_._1)
    val p1Set = p1Blocks.toSet
    val byScoreDescThenId: Ordering[(Long, Long)] =
      Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long)
    // tau = the k-th best exact (score desc, id) phase-1 score; the
    // per-block top-k preserves every global top-k candidate, so the
    // k-th of the phase-1 survivors IS the k-th of all phase-1 docs.
    // Fewer than k rows -> -1 = no pruning possible.
    val p1Top = top.filter(t => p1Set(t._1))
      .sortBy(t => (t._4, t._2))(byScoreDescThenId)
    val tau = if (p1Top.length >= k) p1Top(k - 1)._4 else -1L
    // phase 2: remaining blocks with bound >= tau (>=, not >: an
    // equal-bound block can hold an equal score that wins the doc-id
    // tie-break)
    val p2Blocks = marked.drop(p1Blocks.length).collect {
      case (b, u, _) if u >= tau => b
    }
    val p2Set = p2Blocks.toSet
    val scanned = (p1Blocks.length + p2Blocks.length).toLong
    val rows = top.filter(t => p1Set(t._1) || p2Set(t._1))
      .sortBy(t => (t._4, t._2))(byScoreDescThenId)
      .take(k)
      .map { case (b, id, nHits, score) =>
        org.apache.spark.sql.Row(id, nHits, score,
          if (p1Set(b)) 1L else 2L, scanned, marked.length.toLong)
      }
    blockMaxResult(spark, idCol, rows.toSeq)
  }

  /** At-rest block-max BM25 index build — the faithful block-max design
    * (Ding & Suel): the pruning metadata is PRECOMPUTED index
    * structure, not derived per query. BM25's per-posting score depends
    * only on (tf, dl, df, corpus stats) — all query-independent — so
    * the index stores the FINAL impact score per posting (an
    * impact-ordered index) next to the per-(term, block) maxima:
    *
    *   `path/postings/block=<b>/`: (doc_id, w, term_score_e6) — one row
    *     per (doc, term); `partitionBy("block")` is the IO contract: a
    *     block filter prunes parquet DIRECTORIES, and within a block the
    *     `w` predicate pushes into row-group stats.
    *   `path/blockmax/`: (block, w, mx_e6) — the per-(term, block)
    *     score bound a query sums over its terms.
    *
    * Built in TWO corpus passes (the tf chain and the corpus-stats
    * aggregate — the same count as one bm25Rank query); the blockmax
    * table derives from the postings ALREADY WRITTEN, never a third
    * pass. The term-dictionary join shuffles rather than broadcasts:
    * at corpus scale the dictionary is vocabulary-sized, not
    * query-sized.
    */
  def bm25IndexWrite(docs: DataFrame, path: String, blocks: Int = 8,
                     k1E3: Long = 1200L, bE3: Long = 750L,
                     textCol: String = "text",
                     idCol: String = "doc_id"): Unit = {
    require(blocks > 0, "bad blocks")
    val spark = docs.sparkSession
    val toksDf = docs
      .select(col(idCol), toks(col(textCol)).as("__ts"))
      .select(col(idCol), col("__ts"),
        size(col("__ts")).cast("long").as("dl"))
    val tf = toksDf.select(col(idCol), col("dl"),
        explode(col("__ts")).as("w"))
      .groupBy(col(idCol), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("w")).agg(count(lit(1)).as("dft"))
    val stats = toksDf.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_dl"))
    withBm25TermScore(
      tf.join(dfT, "w").crossJoin(broadcast(stats)),
      k1E3 * 1000L, bE3 * 1000L)
      .withColumn("block", pmod(col(idCol), lit(blocks.toLong)))
      .select(col("block"), col(idCol), col("w"), col("term_score_e6"))
      .write.partitionBy("block").parquet(path + "/postings")
    spark.read.parquet(path + "/postings")
      .groupBy(col("block").cast("long").as("block"), col("w"))
      .agg(max(col("term_score_e6")).as("mx_e6"))
      .write.parquet(path + "/blockmax")
  }

  /** Block-max top-k over the at-rest index written by
    * [[bm25IndexWrite]] — the corpus is NEVER touched at query time:
    * the bounds come from the |query terms|·|blocks| blockmax rows and
    * the exact scores from the query's own postings (the `w isin`
    * predicate pushes into the postings scan). Row-identical to
    * [[bm25BlockMaxTopK]] over the same corpus/terms/k/blocks — the
    * spec pins that equality. The block repartition is the one
    * exchange of the merge action (ReusedExchange'd across its
    * branches), so the postings parquet is read once; the result is a
    * local k-row table.
    */
  def bm25TopKOverIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String, terms: Seq[String], k: Int,
                        idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty && k > 0, "bad blockmax params")
    val postings = spark.read.parquet(path + "/postings")
      .filter(col("w").isin(terms: _*))
      // partition-column types are directory-inferred (int); restore the
      // written long so downstream joins never insert casts
      .withColumn("block", col("block").cast("long"))
      // one exchange for the merge job (see bm25BlockMaxTopK)
      .repartition(col("block"))
    val ub = spark.read.parquet(path + "/blockmax")
      .filter(col("w").isin(terms: _*))
      .groupBy(col("block")).agg(sum(col("mx_e6")).as("ub"))
    val perDoc = postings.groupBy(col("block"), col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        sum(col("term_score_e6")).as("score_e6"))
    blockMaxMerge(perDoc, ub, k, idCol)
  }

  /** Rows of ONE BM25 segment (the Lucene commit model, relational):
    * `postings` (seg, doc_id, w, tf, dl) over EVERY term, `termstats`
    * (seg, w, dft), `segstats` (seg, n_docs, total_dl). A doc lives in
    * exactly one segment; per-segment stats SUM to the global stats, so
    * a query over any segment set scores with exact from-scratch
    * numbers as long as every indexed doc is live.
    */
  private[graft] def bm25SegmentRows(docs: DataFrame, seg: Long,
                                     textCol: String, idCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val toksDf = docs
      .select(col(idCol), toks(col(textCol)).as("__ts"))
      .select(col(idCol), col("__ts"),
        size(col("__ts")).cast("long").as("dl"))
    val tf = toksDf.select(col(idCol), col("dl"),
        explode(col("__ts")).as("w"))
      .groupBy(col(idCol), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
      .select(lit(seg).as("seg"), col(idCol), col("w"), col("tf"), col("dl"))
    val termstats = tf.groupBy(col("w"))
      .agg(count(lit(1)).as("dft"))
      .select(lit(seg).as("seg"), col("w"), col("dft"))
    val segstats = toksDf
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
      .select(lit(seg).as("seg"), col("n_docs"), col("total_dl"))
    (tf, termstats, segstats)
  }

  /** SEGMENTED at-rest BM25 index — the incremental counterpart of the
    * impact-ordered [[bm25IndexWrite]] and the relational form of
    * Lucene's segment model: postings carry RAW (tf, dl) so new docs
    * append as new segments without touching old ones, global stats
    * assemble at query time from the per-segment stats rows (k-row
    * aggregates), and a `live` table (doc_id → its segment) is the
    * live-docs bitmap — updates/deletes flip live rows, hiding stale
    * postings via one equi semi-join. Postings range-cluster by term at
    * write so a query's term set prunes the scan through the manifest's
    * per-file min/max ([[graft.lake.TxLog.readRange]]).
    *
    * Freshness contract (exactly Lucene's): results always reflect the
    * LIVE doc set; the df/length STATS include dead docs until a
    * rebuild (stats staleness bounded by churn since the last rebuild —
    * rebuilding restores from-scratch-exact scores, spec-pinned). With
    * no deletes/updates the serve is bit-identical to [[bm25Rank]].
    */
  def bm25SegmentsWrite(docs: DataFrame, index: String,
                        textCol: String = "text",
                        idCol: String = "doc_id"): Unit = {
    import graft.lake.TxLog
    val (posts, tstats, sstats) = bm25SegmentRows(docs, 0L, textCol, idCol)
    TxLog.append(posts.repartitionByRange(col("w"), col(idCol)),
      s"$index/postings")
    TxLog.append(tstats.repartitionByRange(col("w")), s"$index/termstats")
    TxLog.append(sstats.coalesce(1), s"$index/segstats")
    TxLog.append(docs.select(col(idCol), lit(0L).as("seg"))
      .repartitionByRange(col(idCol)), s"$index/live")
  }

  /** Rebuild a COMPACTED single-segment index at `target` from
    * `index` ITSELF — Lucene's merge/optimize as a blue/green swap: the
    * live-filtered postings already carry every (tf, dl) fact, so the
    * fresh per-term df and corpus stats recompute from one pass over
    * the INDEX (the corpus is never touched, never re-tokenized), dead
    * segments vanish, and stats staleness resets to zero —
    * [[bm25TopKOverSegments]] over the rebuilt index is bit-identical
    * to from-scratch [[bm25Rank]] over the live docs (spec-pinned).
    * The caller swaps readers to `target` atomically (the
    * directory-rename publish pattern); the old index stays readable
    * throughout — the crash-safe shape an in-place multi-table rewrite
    * cannot give.
    */
  def bm25SegmentsRebuild(spark: org.apache.spark.sql.SparkSession,
                          index: String, target: String,
                          idCol: String = "doc_id"): Unit = {
    import graft.lake.TxLog
    val live = TxLog.read(spark, s"$index/live")
    val posts = TxLog.read(spark, s"$index/postings")
      .join(live, Seq(idCol, "seg"), "left_semi")
      .select(lit(0L).as("seg"), col(idCol), col("w"), col("tf"), col("dl"))
      .persist()
    try {
      TxLog.append(posts.repartitionByRange(col("w"), col(idCol)),
        s"$target/postings")
      TxLog.append(posts.groupBy(col("w")).agg(count(lit(1)).as("dft"))
        .select(lit(0L).as("seg"), col("w"), col("dft"))
        .repartitionByRange(col("w")), s"$target/termstats")
      // every doc owns >= 1 posting row (an empty text still tokenizes
      // to one empty-string token), so the distinct (doc, dl) set IS
      // the live doc set — n_docs/total_dl recompute exactly
      TxLog.append(posts.select(col(idCol), col("dl")).distinct()
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
        .select(lit(0L).as("seg"), col("n_docs"), col("total_dl"))
        .coalesce(1), s"$target/segstats")
      TxLog.append(posts.select(col(idCol)).distinct()
        .select(col(idCol), lit(0L).as("seg"))
        .repartitionByRange(col(idCol)), s"$target/live")
    } finally { posts.unpersist(); () }
  }

  /** Top-k BM25 over the segmented index: one stats-pruned range read
    * per query term (postings + termstats), the live semi-join, two
    * broadcast stats sides, then the same exact-integer
    * [[withBm25TermScore]] chain and TakeOrdered as [[bm25Rank]] — the
    * corpus is never touched and nothing re-tokenizes.
    */
  def bm25TopKOverSegments(spark: org.apache.spark.sql.SparkSession,
                           index: String, terms: Seq[String], k: Int,
                           k1E3: Long = 1200L, bE3: Long = 750L,
                           idCol: String = "doc_id"): DataFrame = {
    import graft.lake.TxLog
    require(terms.nonEmpty && terms.forall(_.nonEmpty), "empty query")
    require(k > 0 && k1E3 >= 0 && bE3 >= 0 && bE3 <= 1000, "bad bm25 params")
    val ts = terms.distinct
    val posts = ts.map(t =>
        TxLog.readRange(spark, s"$index/postings", "w", t, t))
      .reduce(_ unionByName _)
    val live = TxLog.read(spark, s"$index/live")
    val dftG = ts.map(t =>
        TxLog.readRange(spark, s"$index/termstats", "w", t, t))
      .reduce(_ unionByName _)
      .groupBy(col("w")).agg(sum(col("dft")).as("dft"))
    val statsG = TxLog.read(spark, s"$index/segstats")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_dl")).as("total_dl"))
    withBm25TermScore(
      posts.join(live, Seq(idCol, "seg"), "left_semi")
        .join(broadcast(dftG), "w")
        .crossJoin(broadcast(statsG)),
      k1E3 * 1000L, bE3 * 1000L)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        sum(col("term_score_e6")).as("score_e6"))
      .orderBy(col("score_e6").desc, col(idCol))
      .limit(k)
  }

  /** Signed delta-count rows for the at-rest LM index — the KenLM-shaped
    * serving artifact's write unit. Four ADDITIVE tables (bigram,
    * prefix, second-word, total counts over h60 word hashes): counts
    * form a commutative group, so a batch of documents contributes
    * `sign = +1` rows and a retraction the same rows at `-1`, and any
    * interleaving of appends sums to the exact corpus counts — the
    * property that makes the incremental index EXACT under churn (no
    * staleness contract needed, unlike the segmented BM25 index's df).
    */
  private[graft] def lmDeltaRows(docs: DataFrame, sign: Long,
                                 textCol: String, idCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val bi0 = bigramHashInst(docs, textCol, idCol)
      .groupBy(col("pw"), col("sw")).agg(count(lit(1)).as("n"))
    val bi = bi0.select(col("pw"), col("sw"), (col("n") * sign).as("c"))
    val pre = bi0.groupBy(col("pw"))
      .agg((sum(col("n")) * sign).as("c"))
    val wrd = bi0.groupBy(col("sw"))
      .agg((sum(col("n")) * sign).as("c"))
    val tot = bi0.agg((coalesce(sum(col("n")), lit(0L)) * sign).as("c"))
    (bi, pre, wrd, tot)
  }

  /** AT-REST bigram LM index: the four [[lmDeltaRows]] count tables
    * persisted as TxLog tables, hash-range-clustered on their key so a
    * scoring batch's term set prunes the reads through manifest
    * min/max stats. [[lmScoreOverIndex]] serves against it with ZERO
    * corpus re-tokenization — the n-gram-LM twin of the segmented BM25
    * index, and the relational shape of a KenLM count file.
    */
  def lmIndexWrite(train: DataFrame, index: String,
                   textCol: String = "text",
                   idCol: String = "doc_id"): Unit = {
    import graft.lake.TxLog
    val (bi, pre, wrd, tot) = lmDeltaRows(train, 1L, textCol, idCol)
    TxLog.append(bi.repartitionByRange(col("pw"), col("sw")),
      s"$index/bigrams")
    TxLog.append(pre.repartitionByRange(col("pw")), s"$index/prefixes")
    TxLog.append(wrd.repartitionByRange(col("sw")), s"$index/words")
    TxLog.append(tot.coalesce(1), s"$index/stats")
  }

  /** Jelinek–Mercer interpolated bigram score of `heldout` against the
    * at-rest index — [[lmScoreInterpolated]]'s exact e6 mix, with the
    * count tables READ (and delta-summed) instead of trained, plus the
    * out-of-vocabulary contract self-training never needs: an unseen
    * bigram scores only its unigram prior, an unseen second word
    * scores 0 from that term (λ-weighted pieces coalesce to 0
    * independently). A heldout doc with no bigrams emits no row, like
    * the trainer.
    *
    * Scale shape: one narrow heldout tokenize/explode, per-key sums of
    * the delta tables (hash-keyed, map-side combinable), three hash
    * joins on 8-byte keys, one broadcast 1-row total. After churn the
    * sums ARE the current corpus counts (see [[lmDeltaRows]]) — serve
    * results equal a from-scratch rebuild bit for bit, spec-pinned.
    */
  def lmScoreOverIndex(spark: org.apache.spark.sql.SparkSession,
                       index: String, heldout: DataFrame,
                       lambdaE6: Long = 700000L,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    import graft.lake.TxLog
    require(lambdaE6 >= 0 && lambdaE6 <= 1000000L,
      s"lambdaE6 out of [0, 1e6]: $lambdaE6")
    val byDoc = bigramHashInst(heldout, textCol, idCol)
      .groupBy(col(idCol), col("pw"), col("sw"))
      .agg(count(lit(1)).as("m"))
    def summed(table: String, keys: Seq[String], as: String): DataFrame =
      TxLog.read(spark, s"$index/$table")
        .groupBy(keys.map(col): _*)
        .agg(sum(col("c")).as(as))
        .filter(col(as) > 0)
    val bi = summed("bigrams", Seq("pw", "sw"), "c2")
    val pre = summed("prefixes", Seq("pw"), "c1")
    val wrd = summed("words", Seq("sw"), "cw")
    // tot materialized EAGERLY: an empty or fully-retracted index sums
    // to NULL (sum over zero rows) or 0, and `cw * 1000000 DIV tot`
    // would then silently NULL every lm_i_score_e6 — fail loudly
    val totRow = TxLog.read(spark, s"$index/stats")
      .agg(sum(col("c")).as("tot")).head()
    require(!totRow.isNullAt(0) && totRow.getLong(0) > 0,
      s"lmScoreOverIndex: empty or fully-retracted LM index at $index")
    val tot = spark.range(1).select(lit(totRow.getLong(0)).as("tot"))
    val mixE6 =
      s"(($lambdaE6 * (CASE WHEN c1 > 0" +
        " THEN cast(c2 as decimal(38,0)) * 1000000 DIV c1 ELSE 0 END)" +
        s" + ${1000000L - lambdaE6} *" +
        " (cast(cw as decimal(38,0)) * 1000000 DIV tot)) DIV 1000000)"
    byDoc
      .join(bi, Seq("pw", "sw"), "left")
      .join(pre, Seq("pw"), "left")
      .join(wrd, Seq("sw"), "left")
      .crossJoin(broadcast(tot))
      .select(col(idCol), col("m"),
        coalesce(col("c2"), lit(0L)).as("c2"),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("cw"), lit(0L)).as("cw"), col("tot"))
      .groupBy(col(idCol))
      .agg(
        sum(col("m")).as("n_bigrams"),
        expr(s"sum(m * $mixE6) DIV sum(m)").as("lm_i_score_e6"))
  }

  /** Block-sharded inverted index build — the retrieval-side artifact a
    * training-data pipeline exports next to the corpus (BM25/TF-IDF
    * score AGAINST it; search infra consumes it). Per (term, block):
    * document frequency, total term frequency, first/last doc id, the
    * byte size of the delta-gap UNSIGNED-varint posting encoding (the
    * classic index layout — [[graft.functions.Varint]] is the matching
    * byte codec), and an order-sensitive checksum over the gap sequence
    * (position-tagged h60 xor — pins the exact posting ORDER, not just
    * the set).
    *
    * Scale shape: two exchanges — one building the (term, doc) tf
    * pairs, one keyed (term, block) that the row_number/lag window and
    * the final groupBy SHARE (the spec pins the exchange count).
    * `blocks` is the hot-term shard knob: a
    * stopword's postings at corpus scale would serialize one task, so
    * real indexes split each term's postings by a doc-hash block — gaps
    * restart per block and blocks merge by concatenation (doc ids
    * within a block stay sorted). tf uses partial aggregation; nothing
    * corpus-wide ever sits in one task beyond |postings(term)|/blocks.
    */
  def invertedIndex(docs: DataFrame, blocks: Int = 1,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val pairs = docs
      .select(col(idCol).as("doc"), explode(toks(col(textCol))).as("term"))
      .groupBy(col("term"), col("doc")).agg(count(lit(1)).as("tf"))
      .withColumn("block", pmod(col("doc"), lit(blocks.toLong)))
    val w = Window.partitionBy(col("term"), col("block")).orderBy(col("doc"))
    // full 9-step chain: the first posting per block carries the
    // ABSOLUTE doc id as its gap, so 64-bit ids (snapshot/snowflake)
    // need up to ceil(63/7) = 9 bytes — a 5-step chain would
    // under-report index_bytes past 2^35 (gaps are non-negative, so
    // the 10-byte sign-extension case cannot occur)
    val width = when(col("gap") < (1L << 7), 1L)
      .when(col("gap") < (1L << 14), 2L)
      .when(col("gap") < (1L << 21), 3L)
      .when(col("gap") < (1L << 28), 4L)
      .when(col("gap") < (1L << 35), 5L)
      .when(col("gap") < (1L << 42), 6L)
      .when(col("gap") < (1L << 49), 7L)
      .when(col("gap") < (1L << 56), 8L)
      .otherwise(9L)
    pairs
      .withColumn("pos", row_number().over(w))
      .withColumn("gap",
        col("doc") - coalesce(lag(col("doc"), 1).over(w), lit(0L)))
      .withColumn("g_h", Dedup.h60(
        concat_ws("|", col("term"), col("block"), col("pos"), col("gap"))))
      .groupBy(col("term"), col("block"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"),
        min(col("doc")).as("first_doc"), max(col("doc")).as("last_doc"),
        sum(width).as("index_bytes"),
        expr("bit_xor(g_h)").cast("long").as("gap_checksum"))
  }

  /** The BM25 e6 fixed-point score columns over per-(doc, term) stats
    * `(tf, dl, dft, n_docs, total_dl)`. Every `(x·y) DIV m` is expanded
    * to the EXACT identity `(x DIV m)·y + ((x MOD m)·y) DIV m` (holds
    * for non-negative integers in any truncating-division engine), so no
    * intermediate ever multiplies two corpus-sized factors: the naive
    * form wraps Long silently at n_docs ≈ 6M (df=1 idf × tfpart) and at
    * dl ≈ 9.2M tokens (dl·1e12); the decomposed form is exact to
    * n_docs ≈ 2e12 docs, total corpora of any size (avgdl decomposed by
    * n_docs), mean doc length ≤ 9.2M tokens, and per-doc tf ≤ 9.2M —
    * all beyond a 100 TB corpus. Exposed so overflow-range tests can
    * drive synthetic stats rows directly.
    */
  private[graft] def withBm25TermScore(scored: DataFrame, k1E6: Long,
                                       bE6: Long): DataFrame =
    scored
      .withColumn("avgdl_e6", expr(
        "(total_dl DIV n_docs) * 1000000L + " +
          "((total_dl % n_docs) * 1000000L) DIV n_docs"))
      .withColumn("ratio_e6", expr(
        "((dl * 1000000L) DIV avgdl_e6) * 1000000L + " +
          "(((dl * 1000000L) % avgdl_e6) * 1000000L) DIV avgdl_e6"))
      .withColumn("norm_e6", expr(
        s"1000000L - ${bE6}L + ${bE6}L * (ratio_e6 DIV 1000000L) + " +
          s"(${bE6}L * (ratio_e6 % 1000000L)) DIV 1000000L"))
      .withColumn("den", expr(
        s"tf * 1000000L + ${k1E6}L * (norm_e6 DIV 1000000L) + " +
          s"(${k1E6}L * (norm_e6 % 1000000L)) DIV 1000000L"))
      .withColumn("tfpart_e6", expr(
        s"((tf * (${k1E6}L + 1000000L)) DIV den) * 1000000L + " +
          s"(((tf * (${k1E6}L + 1000000L)) % den) * 1000000L) DIV den"))
      .withColumn("idf_e6", expr(
        "((2 * (n_docs - dft) + 1) DIV (2 * dft + 1)) * 1000000L + " +
          "(((2 * (n_docs - dft) + 1) % (2 * dft + 1)) * 1000000L) " +
          "DIV (2 * dft + 1)"))
      .withColumn("term_score_e6", expr(
        "(idf_e6 DIV 1000000L) * tfpart_e6 + " +
          "((idf_e6 % 1000000L) * tfpart_e6) DIV 1000000L"))

  /** Deterministic stratified sampling: keep a document iff
    * h60(salt || id) mod 1000 < rate(stratum) * 1000. Hash-threshold
    * sampling is reproducible, join-free, and stable under reruns —
    * exactly what a training-data pipeline needs (no rand()).
    */
  def stratifiedSample(docs: DataFrame, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       idCol: String = "doc_id"): DataFrame = {
    val bucket = pmod(
      Dedup.h60(concat(lit("sample|"), col(idCol).cast("string"))), lit(1000L))
    // round, don't truncate: 0.29 * 1000 is 289.999... in binary floats
    // and truncation would bias every non-representable rate down by one
    // bucket permille
    val rateCol = rates.toSeq.sortBy(_._1).foldRight(
      lit(math.round(defaultRate * 1000))) { case ((s, r), rest) =>
      when(col(strataCol) === s, lit(math.round(r * 1000))).otherwise(rest)
    }
    docs.withColumn("__bucket", bucket)
      .filter(col("__bucket") < rateCol)
      .drop("__bucket")
  }

  /** PII patterns shared with the oracle: kept RE2-and-Java compatible
    * (no backrefs, no lookaround, ASCII classes) so DuckDB replays them
    * byte-for-byte.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Invisible characters that poison tokenizers and dedup: zero-width
    * spaces/joiners, BiDi controls, word joiner, BOM/ZWNBSP, soft
    * hyphen. Two visually identical documents differing only in these
    * hash apart (dedup misses), and BiDi controls are a known
    * text-spoofing vector. \x{...} escapes keep the class VISIBLE in
    * source and parse identically in Java regex and RE2 (the oracle
    * uses the same string).
    */
  val InvisibleRe: String =
    "[\\x{200B}-\\x{200F}\\x{202A}-\\x{202E}\\x{2060}\\x{FEFF}\\x{00AD}]"

  /** Invisible-character hygiene: count and strip [[InvisibleRe]].
    * High counts are themselves an adversarial-content signal worth
    * filtering on. Narrow codegen'd pass (regexp builtins), no shuffle
    * — scan speed at 100 TB like [[redactPii]].
    */
  def cleanInvisible(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_invisible",
        regexp_count(col(textCol), lit(InvisibleRe)))
      .withColumn("clean_text",
        regexp_replace(col(textCol), InvisibleRe, ""))

  /** PII redaction for training corpora: emails and IPv4 addresses
    * replaced with typed placeholder tokens, with per-doc match counts.
    * regexp_count/regexp_replace are codegen'd builtins — the whole
    * redaction pass stays inside whole-stage codegen, no UDF, so it runs
    * at scan speed over 100 TB of text.
    */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)))
      .withColumn("n_ips", regexp_count(col(textCol), lit(Ipv4Re)))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"))

  /** BPE-ish subword token count: whitespace tokens plus an extra token
    * per 4 chars of long words (cheap deterministic proxy for subword
    * tokenizers — counts how a BPE vocab would split rare long words).
    */
  def subwordTokenCount(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("n_subword_tokens",
      expr(s"""aggregate(split($textCol, ' '),
              |0L,
              |(acc, w) -> acc + 1L + CAST(length(w) DIV 4 AS LONG))""".stripMargin))

  /** WordPiece tokenizer application (Wu et al. 2016 — the BERT
    * tokenizer): greedy longest-match-first segmentation of each
    * whitespace word against a fixed vocabulary, `##`-prefixed
    * continuation pieces, whole-word `[UNK]` fallback. Completes the
    * tokenizer triad next to BPE ([[bpeEncode]]) and the unigram LM.
    * The vocab rides as ONE broadcast; the segmentation is a
    * shuffle-free narrow map — scan speed at 100 TB.
    */
  def wordpieceEncode(docs: DataFrame, vocab: Seq[String],
                      unk: String = "[UNK]", maxWordChars: Int = 100,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      graft.functions.WordPieceExpressions.wordpieceEncode(
        toks(col(textCol)), vocab, unk, maxWordChars).as("pieces"))

  /** HTML entities decoded by [[stripHtml]], applied in this order —
    * `&amp;` LAST, so `&amp;lt;` decodes to the literal text `&lt;`
    * rather than a phantom `<` (the standard double-decoding guard).
    * Kept tiny and regex-free on both engines (plain `replace`).
    */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** HTML → text extraction (the stage-zero step for web-crawl corpora:
    * the reference pipelines run trafilatura-class strippers before any
    * quality signal): drop `<script>`/`<style>` ELEMENTS wholesale
    * (their content is code, not prose), drop comments, strip remaining
    * tags, decode the six core entities, collapse whitespace. Pure
    * codegen'd `regexp_replace`/`replace` builtins — no UDF, the whole
    * pass stays inside whole-stage codegen at scan speed. Patterns are
    * RE2-and-Java compatible (non-greedy + (?s), no lookaround) so the
    * DuckDB oracle replays them byte-for-byte.
    */
  def stripHtml(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = HtmlEntities.foldLeft(noTags) { case (c, (e, r)) =>
      call_function("replace", c, lit(e), lit(r))
    }
    trim(regexp_replace(decoded, "[ \\t\\r\\n\\f]+", " "))
  }

  /** Main-content extraction from raw HTML — the boilerplate-removal
    * step that precedes line filters like [[c4Filter]] in a web-corpus
    * pipeline (jusText / Kohlschütter-style block classification recast
    * as per-line heuristics). Navigation, footers and chrome are short
    * and LINK-HEAVY; body prose is long and link-light — the two axes
    * the whole family keys on:
    *
    *   - visible(l): the line with tags stripped and entities decoded
    *     (the [[stripHtml]] pipeline applied per line)
    *   - link density: anchor-text chars / visible chars, from the
    *     `<a ...>inner</a>` captures of the line
    *   - a line is CONTENT iff it holds >= minWords visible words AND
    *     its link density is <= maxLinkPermille/1000
    *
    * Appends n_lines, n_content, `content` (the kept lines' visible
    * text, newline-joined, "" when nothing survives) and
    * boiler_permille (integer permille of lines dropped). Shuffle-free
    * narrow map — HOFs over the line array, builtins only, so the pass
    * runs inside whole-stage codegen at scan speed over 100 TB; every
    * step is engine-deterministic and the oracle replays it line by
    * line. Anchors spanning a line break count as plain text on both
    * engines (per-line contract).
    */
  def extractContent(docs: DataFrame, minWords: Int = 5,
                     maxLinkPermille: Int = 330,
                     htmlCol: String = "html",
                     idCol: String = "doc_id"): DataFrame = {
    require(minWords >= 1 && maxLinkPermille >= 0 && maxLinkPermille <= 1000,
      s"bad params: minWords=$minWords maxLinkPermille=$maxLinkPermille")
    def vis(l: Column): Column = stripHtml(l)
    // (?is): the generic tag strip is case-blind by construction, so the
    // anchor capture must be too — legacy <A HREF=...> chrome would
    // otherwise read as link-free prose and leak through the link axis
    def anchorLen(l: Column): Column = aggregate(
      regexp_extract_all(l, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)),
      lit(0L), (acc, x) => acc +
        length(trim(regexp_replace(
          regexp_replace(x, "<[^>]*>", " "), "[ \\t\\r\\n\\f]+", " "))))
    def isContent(f: Column): Column = {
      val v = f.getField("v")
      val words = when(length(v) === 0, lit(0))
        .otherwise(size(split(v, " ")))
      words >= minWords &&
        f.getField("alen") * lit(1000L) <=
          lit(maxLinkPermille.toLong) * length(v)
    }
    docs
      .withColumn("__lines", split(col(htmlCol), "\r?\n"))
      // visible text + anchor length computed ONCE per line into a
      // struct — the filter/content/count consumers read the struct
      // fields instead of re-running the strip chain per consumer
      // (HOF lambdas get no CSE)
      .withColumn("__feat", transform(col("__lines"),
        l => struct(vis(l).as("v"), anchorLen(l).as("alen"))))
      .withColumn("n_lines", size(col("__lines")).cast("long"))
      .withColumn("__kept", filter(col("__feat"), isContent(_)))
      .withColumn("n_content", size(col("__kept")).cast("long"))
      .withColumn("content",
        array_join(transform(col("__kept"), _.getField("v")), "\n"))
      .withColumn("boiler_permille",
        expr("(1000 * (n_lines - n_content)) DIV n_lines"))
      .drop("__lines", "__feat", "__kept")
  }

  /** Content-phrase blocklist scan: per-phrase occurrence counts over
    * each document in ONE text pass via a broadcast Aho–Corasick
    * automaton ([[graft.functions.PhraseExpressions]] — see there for
    * why this beats P regexp passes by the blocklist size P at scale).
    * Appends `phrase_counts: array<long>` aligned with `phrases`;
    * overlapping occurrences count (the AC contract).
    */
  def phraseBlocklist(docs: DataFrame, phrases: Seq[String],
                      textCol: String = "text"): DataFrame =
    docs.withColumn("phrase_counts",
      graft.functions.PhraseExpressions.phraseCount(col(textCol), phrases))

  /** The C4 cleaning recipe (Raffel et al. 2020 §2.2 — the most-cited
    * web-corpus filter): line rules keep only lines that (a) end in
    * terminal punctuation, (b) carry at least `minLineWords` words,
    * (c) don't mention "javascript"; page rules then drop documents
    * that kept fewer than `minKeptLines` lines, contain a curly brace
    * (code), or the phrase "lorem ipsum" (template residue). Appends
    * per-doc audit columns (n_lines, n_kept, reject_reason, keep,
    * kept_text) — keep=1 docs carry the REBUILT text of surviving
    * lines, the corpus the next pipeline stage consumes.
    *
    * Shuffle-free narrow map over line arrays (one split + one HOF
    * filter per doc); every rule is a codegen'd builtin in the
    * RE2-and-Java-identical subset, so the DuckDB oracle replays the
    * decision table exactly.
    */
  def c4Filter(docs: DataFrame, minLineWords: Int = 3, minKeptLines: Int = 5,
               textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    // \r?\n split + \z anchor: Java's default `$` also matches before a
    // trailing line terminator (incl. a bare \r), RE2's does not — \z is
    // absolute end-of-text in BOTH engines, so CRLF pages filter the same
    // here and in the DuckDB replay. The line array materializes once
    // (no CSE inside HOF lambdas — inlining re-splits per consumer).
    docs
      .withColumn("__lines", split(col(textCol), "\r?\n"))
      .withColumn("n_lines", size(col("__lines")).cast("long"))
      .withColumn("__kept", filter(col("__lines"), l =>
        size(split(l, " ")) >= minLineWords &&
          l.rlike("[.!?\"]\\z") && !l.contains("javascript")))
      .withColumn("n_kept", size(col("__kept")).cast("long"))
      .withColumn("reject_reason",
        when(col(textCol).contains("{"), "brace")
          .when(col(textCol).contains("lorem ipsum"), "lorem")
          .when(col("n_kept") < minKeptLines, "too_few_lines")
          .otherwise("kept"))
      .withColumn("keep",
        (col("reject_reason") === "kept").cast("int"))
      .withColumn("kept_text",
        when(col("keep") === 1, array_join(col("__kept"), "\n"))
          .otherwise(lit(null).cast("string")))
      .drop("__kept", "__lines")
  }

  /** The eight required stopwords of the Gopher quality rules — a doc
    * must contain at least two DISTINCT entries (Rae et al. 2021, App. A
    * "MassiveWeb" filters). Shared with the oracle renderer.
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher quality rules (Rae et al. 2021, Appendix A — the
    * document-level sibling of [[c4Filter]]'s line rules; together they
    * are the two canonical web-corpus cleaning recipes). A document is
    * kept iff ALL of:
    *   - word count in `[minWords, maxWords]` (50..100k in the paper);
    *   - mean word length in `[minMeanLen, maxMeanLen]` chars (3..10);
    *   - symbol-to-word ratio (`#` + `...` + `…`) ≤ 1/10;
    *   - ≤ 90% of lines start with a bullet (`•`, `- `, `* `);
    *   - ≤ 30% of lines end with an ellipsis;
    *   - ≥ 80% of words contain an alphabetic character;
    *   - ≥ 2 distinct [[GopherStopwords]] present.
    * Every ratio test is an exact integer cross-multiplication (e.g.
    * `symbols*10 ≤ words`), so the DuckDB oracle replays the decision
    * table bit-for-bit — no floats anywhere. `reject_reason` names the
    * FIRST failing rule in the order above; audit counts ride along.
    *
    * Shuffle-free narrow map (two splits + HOF filters per doc, all
    * codegen'd builtins in the RE2-and-Java-identical subset) — at crawl
    * scale this runs at scan speed next to [[stripHtml]] and
    * [[c4Filter]].
    */
  def gopherFilter(docs: DataFrame, minWords: Int = 50,
                   maxWords: Int = 100000, minMeanLen: Int = 3,
                   maxMeanLen: Int = 10, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    val ell3 = (length(t) - length(call_function("replace", t, lit("..."),
      lit("")))) / 3
    val ellC = length(t) - length(call_function("replace", t, lit("…"),
      lit("")))
    val hashes = length(t) - length(call_function("replace", t, lit("#"),
      lit("")))
    val stopArr = array(GopherStopwords.map(lit): _*)
    docs
      // materialize the split arrays ONCE: expressions inside HOF
      // lambdas get no CSE, so inlining `words` into its four consumers
      // re-splits (and re-filters) the text per metric — measured as the
      // dominant cost of the whole filter. The whitespace class is
      // EXPLICIT because Java's \s includes U+000B where RE2's does not
      // — the one divergence in an otherwise-shared regex subset; the
      // split can emit empty edge tokens (and Java drops trailing ones
      // where RE2 keeps them) — filter empties on BOTH sides.
      .withColumn("__w", filter(split(t, "[ \\t\\n\\f\\r]+"),
        w => length(w) > 0))
      .withColumn("__ln", split(t, "\r?\n"))
      .withColumn("n_words", size(col("__w")).cast("long"))
      .withColumn("word_len_sum",
        aggregate(col("__w"), lit(0L), (acc, w) => acc + length(w)))
      .withColumn("n_symbols", (hashes + ell3 + ellC).cast("long"))
      .withColumn("n_lines", size(col("__ln")).cast("long"))
      .withColumn("bullet_lines", size(filter(col("__ln"), l =>
        l.startsWith("•") || l.startsWith("- ") || l.startsWith("* ")))
        .cast("long"))
      .withColumn("ellipsis_lines", size(filter(col("__ln"), l =>
        l.endsWith("...") || l.endsWith("…"))).cast("long"))
      .withColumn("alpha_words",
        size(filter(col("__w"), _.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("stop_kinds", size(filter(stopArr,
        m => array_contains(col("__w"), m))).cast("long"))
      .withColumn("reject_reason",
        when(col("n_words") < minWords || col("n_words") > maxWords,
          "word_count")
          .when(col("word_len_sum") < col("n_words") * minMeanLen ||
            col("word_len_sum") > col("n_words") * maxMeanLen,
            "mean_word_len")
          .when(col("n_symbols") * 10 > col("n_words"), "symbol_ratio")
          .when(col("bullet_lines") * 10 > col("n_lines") * 9,
            "bullet_lines")
          .when(col("ellipsis_lines") * 10 > col("n_lines") * 3,
            "ellipsis_lines")
          .when(col("alpha_words") * 5 < col("n_words") * 4, "alpha_words")
          .when(col("stop_kinds") < 2, "stopwords")
          .otherwise("kept"))
      .withColumn("keep", (col("reject_reason") === "kept").cast("int"))
      .drop("__w", "__ln")
  }

  /** URL canonicalization — the crawl-dedup key step that runs right
    * next to [[stripHtml]] in a web pipeline (two crawls of one page
    * differ only in tracking params / host case / default ports; URL
    * dedup before fetch-dedup is the cheapest dedup there is). Rules
    * (the RFC 3986 §6 safe normalizations plus the universal utm strip):
    *   - drop the fragment (first `#` onward);
    *   - lowercase scheme and host; strip a leading `www.`;
    *   - strip the scheme's default port (`:443` https, `:80` http);
    *   - drop trailing slashes from the path (empty path → `/`);
    *   - drop `utm_*` tracking params, sort the survivors bytewise,
    *     drop the `?` if none survive.
    * Non-absolute inputs (no `scheme://`) pass through untouched — the
    * contract covers crawl frontiers, which are absolute by definition.
    *
    * Returns a struct `(canon_url, host, domain)` — `domain` is the
    * last-two-labels registrable domain (a deterministic stand-in for
    * a public-suffix-list lookup, which is a data file, not logic).
    * Everything is codegen'd regex/string/array builtins in the
    * RE2-and-Java-identical subset (no lookaround, no backrefs): a
    * shuffle-free narrow map at crawl scale.
    */
  def urlParts(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    val noPort = when(scheme === "https",
        regexp_replace(hostRaw, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .otherwise(hostRaw)
    // ALL leading www. labels, not one — else canon isn't idempotent
    // on www.www.ex.com (the property the spec pins)
    val host = regexp_replace(noPort, "^(www\\.)+", "")
    val pathq = regexp_replace(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", "")
    val path0 = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1),
      "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val qSorted = array_join(array_sort(filter(
      split(regexp_extract(pathq, "\\?(.*)$", 1), "&"),
      p => p =!= "" && !p.startsWith("utm_"))), "&")
    val canon = concat(scheme, lit("://"), host, path,
      when(qSorted === "", lit("")).otherwise(concat(lit("?"), qSorted)))
    struct(
      when(scheme === "", url).otherwise(canon).as("canon_url"),
      host.as("host"),
      regexp_extract(regexp_replace(host, ":[0-9]+$", ""),
        "([^.]+\\.[^.]+)$", 1).as("domain"))
  }

  /** Deterministic weighted PRIORITY SAMPLE of k documents (the integer
    * analog of Duffield–Lund–Thorup 2007 priority sampling / A-Res
    * weighted reservoirs): priority = h60(salt‖id) DIV weight, keep the
    * k smallest. Heavier docs draw proportionally smaller priorities,
    * so inclusion odds scale with weight, yet the draw is rerun-stable,
    * join-free, and salt-redrawable — and shard-mergeable: the k
    * globally smallest priorities of shard-local top-k unions are the
    * global sample, so a TakeOrdered computes it with no global sort.
    */
  def prioritySample(docs: DataFrame, weightCol: Column, k: Int,
                     salt: String = "prio",
                     idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    docs
      .withColumn("__h",
        Dedup.h60(concat(lit(s"$salt|"), col(idCol).cast("string"))))
      .withColumn("__w", greatest(weightCol.cast("long"), lit(1L)))
      // integer DIV, not Column./ (double division) — the oracle's `//`
      .withColumn("priority", expr("__h DIV __w"))
      .drop("__h", "__w")
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }

  /** Overlapping fixed-size chunking: split each document into
    * `chunkTokens`-token windows advancing by (chunkTokens - overlap) —
    * the context-window splitting step for RAG indexing and long-doc
    * training. A document shorter than one chunk yields exactly one
    * chunk. Narrow per-row explode, no shuffle — scan-speed at any
    * corpus size; output rows ~ corpus tokens / stride.
    */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int, overlapTokens: Int,
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    require(overlapTokens >= 0 && chunkTokens > overlapTokens,
      s"need 0 <= overlap < chunk, got chunk=$chunkTokens overlap=$overlapTokens")
    val stride = chunkTokens - overlapTokens
    docs
      .select(col(idCol), toks(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      // last chunk starts at the largest multiple of stride that still
      // leaves unseen tokens: ceil((n - chunk) / stride) + 1 chunks
      .withColumn("__nc",
        when(col("__n") <= chunkTokens, lit(1)).otherwise(
          // integer ceil-div (Column./ would be double division)
          expr(s"cast((__n - $chunkTokens + ${stride - 1}) div $stride as int) + 1"))
      )
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_idx"))
      .withColumn("__start", col("chunk_idx") * stride)
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ",
          slice(col("__toks"), (col("__start") + 1).cast("int"), lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), col("__n") - col("__start")).cast("long")
          .as("n_chunk_tokens"))
  }

  /** Top-k adjacent token pairs across the corpus — the merge-choice
    * statistic a BPE-style tokenizer trainer computes each round (here at
    * word level; the distributed shape for byte/char level is identical).
    * One explode + one map-side-combining hash aggregate + a TakeOrdered
    * top-k: no global sort, no corpus-wide window — the same plan at
    * 100 TB. Ties break lexicographically so the cut is deterministic.
    * Returns (rank, pair, n_occurrences).
    */
  /** Exact phrase query the POSITIONAL-INDEX way: build (term, doc,
    * position) postings for the phrase's terms only, anchor on the
    * first term, and intersect the remaining terms' lists shifted by
    * their phrase offset — k−1 equi-joins on (doc, anchor), the
    * standard positional-postings evaluation (overlapping occurrences
    * count, e.g. "a a a" matches ["a","a"] twice). Complements the
    * [[graft.functions.PhraseExpressions]] text-scan path: the scan is
    * one pass over ALL text, this touches only the phrase terms'
    * postings — the right side of the tradeoff when phrases are
    * queried against a standing corpus. Returns per matching doc:
    * (doc, n_matches, first_pos).
    *
    * Scale: the term filter lands before anything widens, so the
    * postings built are |occurrences of phrase terms|, not |corpus
    * tokens|; joins are equi-joins on (doc, position).
    */
  def phraseQueryViaIndex(docs: DataFrame, phrase: Seq[String],
                          textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val pos = docs.select(col(idCol).as("doc"),
        posexplode(toks(col(textCol))).as(Seq("pos", "term")))
      .filter(col("term").isin(phrase.map(_.asInstanceOf[Any]): _*))
    val anchor = pos.filter(col("term") === phrase.head)
      .select(col("doc"), col("pos").as("p0"))
    val matched = phrase.zipWithIndex.tail.foldLeft(anchor) {
      case (acc, (t, i)) =>
        acc.join(pos.filter(col("term") === t)
          .select(col("doc"), (col("pos") - i).as("p0")), Seq("doc", "p0"))
    }
    matched.groupBy(col("doc"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("p0")).cast("long").as("first_pos"))
  }

  /** Collocation extraction by pointwise mutual information: rank
    * adjacent word pairs by the PMI KERNEL c(ab)·N / (c(a)·c(b)) —
    * monotone in PMI (log is order-preserving), so the top-k by the
    * integer ratio IS the top-k by PMI with no float log anywhere:
    * score_e6 = c(ab)·N·1e6 DIV (c(a)·c(b)) over DECIMAL(38,0)
    * intermediates (the DuckDB HUGEINT twin). `minCount` drops
    * singleton pairs — raw PMI famously maxes out on hapax pairs, the
    * standard collocation-extraction guard (Church & Hanks 1990). N is
    * the corpus token-INSTANCE count; unigram counts c(·) count
    * instances too, so the kernel is the textbook MLE ratio.
    *
    * Scale: one explode for bigram instances, one for unigrams — both
    * map-side-combined to vocabulary-sized tables — two equi-joins on
    * the word, and a TakeOrdered top-k. No window over the corpus.
    */
  def pmiCollocations(docs: DataFrame, k: Int, minCount: Long = 3,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val uni = docs.select(explode(toks(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val n = uni.agg(sum(col("c1")).cast("long").as("n"))
    val pairs = graft.ops.Dedup.explodedShingles(docs, 2, textCol, idCol)
      .select(split(col("sh"), " ").as("p"))
      .select(element_at(col("p"), 1).as("a"), element_at(col("p"), 2).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    pairs
      .join(uni.select(col("w").as("a"), col("c1").as("c_a")), "a")
      .join(uni.select(col("w").as("b"), col("c1").as("c_b")), "b")
      .crossJoin(broadcast(n))
      .withColumn("pmi_e6", expr(
        "(cast(c_ab as decimal(38,0)) * n * 1000000) DIV " +
          "(cast(c_a as decimal(38,0)) * c_b)").cast("long"))
      .orderBy(col("pmi_e6").desc, col("a").asc, col("b").asc)
      .limit(k)
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        col("pmi_e6"))
  }

  def topBigrams(docs: DataFrame, k: Int, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val counted = graft.ops.Dedup.explodedShingles(docs, 2, textCol, idCol)
      .groupBy(col("sh").as("pair"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair").asc)
      .limit(k)
    // rank window runs over the k surviving rows only
    counted.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n_occurrences").desc, col("pair").asc)))
      .select(col("rank"), col("pair"), col("n_occurrences"))
  }

  /** Raw-text normalization to the CORPUS CONTRACT every other text op
    * assumes (lowercased, punctuation-separated, single-space token
    * boundaries — see [[markerHits]]): lowercase, map every char
    * outside [a-z0-9 ] to a space, collapse runs of spaces, trim.
    * This is the pipeline's stage zero — run it once at ingest and the
    * dedup/quality/LM ops downstream see canonical tokens.
    *
    * Pure per-row regexp work inside whole-stage codegen: no shuffle,
    * embarrassingly parallel at any scale.
    * Returns the input columns plus (norm_text, n_tokens_norm).
    */
  def normalize(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "), " +", " "))
    docs
      .withColumn("norm_text", norm)
      .withColumn("n_tokens_norm",
        when(col("norm_text") === "", lit(0))
          .otherwise(size(split(col("norm_text"), " "))).cast("long"))
  }

  /** Corpus-trained bigram language-model score per document — the
    * perplexity-proxy quality filter (CCNet/Gopher-style "does this doc
    * look like the corpus" signal) in exact integer arithmetic. The
    * "model" is the corpus itself: P(w2|w1) = c(w1 w2) / c(w1 ·), both
    * counts over ALL bigram instances (with multiplicity). Each doc is
    * scored by the average conditional probability of its own bigrams,
    * scaled by 1e6 with integer division so Spark and the SQL oracle
    * agree bit-for-bit. Low scores = improbable word sequences =
    * gibberish/noise candidates; high = fluent (or boilerplate).
    *
    * Scale shape: one explode (rows ≈ tokens), a per-(doc, bigram)
    * multiplicity aggregate (map-side combinable), two count tables
    * whose cardinality is the bigram/prefix vocabulary — orders of
    * magnitude below the instance count — and two equi-joins on 8-byte
    * hashes. No all-pairs stage, no window. At 100 TB the count tables
    * are the natural broadcast candidates when the vocab fits; the
    * equi-join degrades gracefully to a shuffle join when it does not.
    * Returns (doc_id, n_bigrams, lm_score_e6).
    */
  /** (id, pw, sw) bigram-hash instances shared by the LM scorers — ONE
    * md5 per TOKEN (hash the token array once, pair adjacent hashes),
    * not one per shingle string plus its words: bigrams ≈ tokens, so
    * this is ~3× less hashing, and md5 is the map-side hot cost of the
    * LM family at corpus scale. The bigram identity IS the hash pair —
    * no combined key needed.
    */
  private def bigramHashInst(docs: DataFrame, textCol: String,
                             idCol: String): DataFrame = {
    val hs = transform(toks(col(textCol)), w => Dedup.h60(w))
    // single-split fan-out guard: the bigram explode emits ~|tokens|
    // rows per doc — spread the raw (id, text) rows before the fan-out
    // so a single-row-group source doesn't serialize it on one task
    bigramInstOfHashes(docs.select(col(idCol), col(textCol))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), hs.as("hs")), idCol, "hs")
  }

  /** (id, pw, sw) bigram instances from a PRE-MATERIALIZED per-doc
    * token-hash array — the pairing half of [[bigramHashInst]], so the
    * fused ensemble pass can reuse one shared hash array.
    */
  private[ops] def bigramInstOfHashes(d: DataFrame, idCol: String,
                                      hsCol: String): DataFrame =
    d.select(col(idCol), explode(zip_with(
        slice(col(hsCol), lit(1), greatest(size(col(hsCol)) - 1, lit(0))),
        slice(col(hsCol), lit(2), greatest(size(col(hsCol)) - 1, lit(0))),
        (a, b) => struct(a.as("pw"), b.as("sw")))).as("pr"))
      .select(col(idCol), col("pr.pw").as("pw"), col("pr.sw").as("sw"))

  /** Rule-based sentence segmentation — the primitive sentence-level
    * ops (TextTiling at sentence gaps, per-sentence dedup, SFT target
    * splitting) assume: a sentence ends at `[.!?]` followed by a
    * space. Implemented as one boundary-marking regexp_replace (the
    * matched space becomes a U+0001 sentinel — RE2 engines have no
    * lookbehind, so the sentinel form is what both engines can run
    * identically) + one split. Returns per-doc sentence stats and a
    * position-salted xor checksum over the sentences themselves.
    */
  def sentenceStats(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val sents = split(
      regexp_replace(col(textCol), "([.!?]) ", "$1\u0001"), "\u0001")
    docs
      // single-split fan-out guard: the posexplode emits |sentences|
      // rows per doc off the source scan -- spread the raw docs first so
      // a single-row-group file doesn't serialize the whole fan-out
      .select(col(idCol), col(textCol))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), posexplode(sents).as(Seq("__p", "__s")))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_sentences"),
        sum(length(col("__s"))).cast("long").as("n_chars"),
        max(length(col("__s"))).cast("long").as("max_len"),
        expr("sum(cast(length(__s) as bigint) * 100) DIV count(1)")
          .as("mean_len_e2"),
        expr("bit_xor(cast(" +
          "conv(substring(md5(cast(concat(__p, '|', __s) as binary)), 1, 15)" +
          ", 16, 10) as bigint))").as("checksum"))
  }

  /** TextTiling topic segmentation (Hearst 1997, "TextTiling:
    * Segmenting Text into Multi-paragraph Subtopic Passages") — the
    * SEMANTIC chunking step for RAG corpora, where fixed-size windows
    * ([[Curation.chunkOverlap]]-style) cut mid-topic: at every `step`
    * tokens, the cosine between the `blockK`-token bags on either side
    * of the gap; a gap whose cohesion sits in a valley (depth = how far
    * the score drops below its neighborhood peaks on BOTH sides) past
    * `depthMinE6` is a topic boundary.
    *
    * Everything is integer-exact until the one cosine (bag counts are
    * longs; the cosine takes the knn family's two-step 6-decimal
    * rounding so both engines agree bit for bit). Returns one row per
    * gap: (idCol, gap_pos, cos_e6, depth_e6, boundary).
    *
    * Scale shape: a SHUFFLE-FREE narrow map — every gap's cosine and
    * its valley depth read only the doc's own token array, so the
    * whole computation runs inside one per-doc native kernel
    * ([[graft.functions.TextTileKernels]]) followed by one explode of
    * ~(|tokens|/step) 4-long structs. The earlier relational form
    * (kept below as [[textTilesRelational]], the spec's bit-equality
    * twin and the oracle's shape) carried four exchanges of
    * ~(|tokens|/step)·2k (doc, gap, side, hash) rows — measured 105 s
    * at the 100x decade entirely on those exchanges; the kernel form
    * ships the tokens nowhere.
    */
  def textTiles(docs: DataFrame, blockK: Int = 10, step: Int = 5,
                depthMinE6: Long = 150000L, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    require(blockK >= 1 && step >= 1, s"bad params: k=$blockK step=$step")
    val gaps = graft.functions.TextTileExpressions.textTileGaps(
      toks(col(textCol)), blockK, step, depthMinE6)
    docs
      // parallelism guard: with zero shuffles in the op, the kernel
      // inherits the source's split count — spread the raw docs first
      // so a single-row-group file doesn't serialize the whole pass
      .select(col(idCol), col(textCol))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), explode(gaps).as("__g"))
      .select(col(idCol), col("__g.gap_pos").as("gap_pos"),
        col("__g.cos_e6").as("cos_e6"), col("__g.depth_e6").as("depth_e6"),
        col("__g.boundary").as("boundary"))
  }

  /** The relational TextTiling form — retained as the bit-equality
    * REFERENCE TWIN for [[textTiles]]' kernel (the spec pins kernel ==
    * relational on real and edge-case docs; the DuckDB oracle replays
    * this shape).
    */
  private[graft] def textTilesRelational(docs: DataFrame, blockK: Int = 10,
                step: Int = 5,
                depthMinE6: Long = 150000L, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    require(blockK >= 1 && step >= 1, s"bad params: k=$blockK step=$step")
    // single-split fan-out guard (the ngramJaccardPairs convention): the
    // gap explode emits ~(|tokens|/step)·2k rows per doc straight off
    // the source scan, so a single-row-group file would run the whole
    // fan-out on one task — shuffle the (id, text) rows, which are a
    // small fraction of the gap-stream bytes they parallelize, first
    val base = docs
      .select(col(idCol), col(textCol))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), toks(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")))
      .filter(col("__n") > step) // at least one gap with a non-empty right
    val gaps = base.select(col(idCol), col("__t"), col("__n"),
      explode(sequence(lit(step),
        (((col("__n") - 1) / step).cast("int") * step), lit(step))).as("g"))
    val sides = gaps.select(col(idCol), col("g"), explode(concat(
      transform(
        slice(col("__t"), greatest(lit(1), col("g") - (blockK - 1)),
          least(lit(blockK), col("g"))),
        w => struct(lit(0).as("side"), w.as("w"))),
      transform(
        slice(col("__t"), col("g") + 1,
          least(lit(blockK), col("__n") - col("g"))),
        w => struct(lit(1).as("side"), w.as("w"))))).as("x"))
      .select(col(idCol), col("g"), col("x.side").as("side"),
        Dedup.h60(col("x.w")).as("wh"))
    val counts = sides.groupBy(col(idCol), col("g"), col("side"), col("wh"))
      .agg(count(lit(1)).as("c"))
    val lc = counts.filter(col("side") === 0)
      .select(col(idCol), col("g"), col("wh"), col("c").as("cl"))
    val rc = counts.filter(col("side") === 1)
      .select(col(idCol), col("g"), col("wh"), col("c").as("cr"))
    val dot = lc.join(rc, Seq(idCol, "g", "wh"))
      .groupBy(col(idCol), col("g"))
      .agg(sum(col("cl") * col("cr")).as("__dot"))
    val na = lc.groupBy(col(idCol), col("g"))
      .agg(sum(col("cl") * col("cl")).as("__na"))
    val nb = rc.groupBy(col(idCol), col("g"))
      .agg(sum(col("cr") * col("cr")).as("__nb"))
    val scored = na.join(nb, Seq(idCol, "g"))
      .join(dot, Seq(idCol, "g"), "left") // disjoint bags: dot = 0
      .withColumn("cos_e6", round(round(
        coalesce(col("__dot"), lit(0L)).cast("double") /
          sqrt(col("__na").cast("double") * col("__nb").cast("double")), 6)
        * 1e6).cast("long"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("g"))
    val prevMax = max(col("cos_e6")).over(w.rowsBetween(-2, -1))
    val nextMax = max(col("cos_e6")).over(w.rowsBetween(1, 2))
    scored
      .withColumn("depth_e6",
        (coalesce(prevMax, col("cos_e6")) - col("cos_e6")) +
          (coalesce(nextMax, col("cos_e6")) - col("cos_e6")))
      .select(col(idCol), col("g").cast("long").as("gap_pos"),
        col("cos_e6"), col("depth_e6"),
        (col("depth_e6") >= depthMinE6).cast("long").as("boundary"))
  }

  /** Stupid-backoff trigram LM (Brants et al. 2007, "Large Language
    * Models in Machine Translation" — the backoff designed FOR
    * MapReduce-scale corpora: no normalization pass, pure count ratios
    * with a fixed α = 0.4 penalty per level). Counts train on `train`;
    * each `score` doc's trigrams resolve at the deepest level the train
    * corpus has seen:
    * {{{ S = c(w1w2w3)/c(w1w2)            seen trigram
    *       | 0.4 · c(w2w3)/c(w2)          backoff to the bigram
    *       | 0.16 · c(w3)/N               backoff to the unigram
    *       | 0                            OOV word }}}
    * — e6 fixed point, DECIMAL(38,0) ↔ HUGEINT engine twins. Per-doc
    * level-hit counts ride along (how much of a doc scores at full
    * depth is itself a fluency/memorization diagnostic). Returns
    * (idCol, n_trigrams, hits3, hits2, hits1, oov, lm_backoff_e6).
    *
    * Scale shape: three train count tables (trigram/bigram/unigram —
    * vocab-bounded aggregates), the scored docs' (doc, trigram)
    * multiplicities, five hash-keyed equi-joins, one 1-row total
    * broadcast. Exactly the shape the paper sharded over MapReduce.
    */
  def lmBackoff(train: DataFrame, score: DataFrame,
                textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    // single-split fan-out guard: the trigram explode emits ~|tokens|
    // rows per doc (each carrying 3 hashes) straight off the source
    // scan — spread the raw (id, text) rows first, and the identical
    // repartition subtree under every consumer (c3t/c2t/c1t/byDoc) is
    // built once and REUSED (the prunedGramIntersections convention)
    def hashes(docs: DataFrame) = docs
      .select(col(idCol), col(textCol))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol),
        transform(toks(col(textCol)), w => Dedup.h60(w)).as("hs"))
    def triInst(docs: DataFrame) = {
      val n = size(col("hs"))
      hashes(docs).select(col(idCol), explode(
        when(n < 3, array().cast("array<struct<w1:bigint,w2:bigint,w3:bigint>>"))
          .otherwise(transform(sequence(lit(1), n - 2), i => struct(
            element_at(col("hs"), i).as("w1"),
            element_at(col("hs"), i + 1).as("w2"),
            element_at(col("hs"), i + 2).as("w3"))))).as("t"))
        .select(col(idCol), col("t.w1").as("w1"), col("t.w2").as("w2"),
          col("t.w3").as("w3"))
    }
    val c3t = triInst(train).groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c3"))
    val c2t = bigramHashInst(train, textCol, idCol)
      .groupBy(col("pw"), col("sw")).agg(count(lit(1)).as("c2"))
    val c1t = hashes(train).select(explode(col("hs")).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("c1"))
    val totals = c1t.agg(sum(col("c1")).as("n_tokens"))

    val byDoc = triInst(score).groupBy(col(idCol), col("w1"), col("w2"),
      col("w3")).agg(count(lit(1)).as("m"))
    val joined = byDoc
      .join(c3t, Seq("w1", "w2", "w3"), "left")
      .join(c2t.select(col("pw").as("w1"), col("sw").as("w2"),
        col("c2").as("ctx2")), Seq("w1", "w2"), "left")
      .join(c2t.select(col("pw").as("w2"), col("sw").as("w3"),
        col("c2").as("num2")), Seq("w2", "w3"), "left")
      .join(c1t.select(col("u").as("w2"), col("c1").as("ctx1")),
        Seq("w2"), "left")
      .join(c1t.select(col("u").as("w3"), col("c1").as("num1")),
        Seq("w3"), "left")
      .crossJoin(broadcast(totals))
      // a seen trigram implies its prefix bigram is seen (ctx2 >= c3),
      // and a seen (w2,w3) bigram implies c(w2) >= 1 — the denominators
      // of the chosen level can never be NULL
      .withColumn("level",
        when(col("c3").isNotNull, 3L)
          .when(col("num2").isNotNull, 2L)
          .when(col("num1").isNotNull, 1L)
          .otherwise(0L))
      .withColumn("s_e6", expr(
        """CASE level
          |  WHEN 3L THEN cast(c3 as decimal(38,0)) * 1000000 DIV ctx2
          |  WHEN 2L THEN
          |    (4 * (cast(num2 as decimal(38,0)) * 1000000 DIV ctx1)) DIV 10
          |  WHEN 1L THEN
          |    (16 * (cast(num1 as decimal(38,0)) * 1000000 DIV n_tokens))
          |      DIV 100
          |  ELSE 0 END""".stripMargin))
    joined.groupBy(col(idCol))
      .agg(
        sum(col("m")).as("n_trigrams"),
        sum(when(col("level") === 3, col("m")).otherwise(0L)).as("hits3"),
        sum(when(col("level") === 2, col("m")).otherwise(0L)).as("hits2"),
        sum(when(col("level") === 1, col("m")).otherwise(0L)).as("hits1"),
        sum(when(col("level") === 0, col("m")).otherwise(0L)).as("oov"),
        expr("sum(m * s_e6) DIV sum(m)").cast("long").as("lm_backoff_e6"))
  }

  def lmScore(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame =
    lmScoreOfInst(bigramHashInst(docs, textCol, idCol), idCol)

  /** [[lmScore]] over a PRE-BUILT (id, pw, sw) bigram-hash instance
    * table — the fused ensemble pass derives the instances from a
    * shared per-doc token-hash array instead of re-tokenizing and
    * re-hashing the corpus; identical counts and arithmetic.
    */
  private[ops] def lmScoreOfInst(inst: DataFrame,
                                 idCol: String): DataFrame = {
    // multiplicity per (doc, bigram) FIRST: the count-table joins then
    // run over distinct-per-doc rows, not every token instance
    val byDoc = inst.groupBy(col(idCol), col("pw"), col("sw"))
      .agg(count(lit(1)).as("m"))
    val bigramCounts = byDoc.groupBy(col("pw"), col("sw"))
      .agg(sum(col("m")).as("c2"))
    val prefixCounts = byDoc.groupBy(col("pw")).agg(sum(col("m")).as("c1"))
    byDoc
      .join(bigramCounts, Seq("pw", "sw"))
      .join(prefixCounts, Seq("pw"))
      .groupBy(col(idCol))
      .agg(
        sum(col("m")).as("n_bigrams"),
        // DECIMAL: c2 * 1e6 wraps a LONG once a bigram passes ~9.2e12
        // corpus occurrences (the temperatureMixture discipline)
        expr("sum(m * (cast(c2 as decimal(38,0)) * 1000000 DIV c1))" +
          " DIV sum(m)").as("lm_score_e6"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.4): per
    * LANGUAGE, split documents into head/middle/tail tertiles by LM
    * score — the standard "keep the head, sample the middle, drop the
    * tail" curation split. The scorer is [[lmScore]]'s corpus-trained
    * bigram model (integer-exact, so the tertile CUTS are
    * engine-deterministic; CCNet trains per-language KenLM models —
    * with a single-engine corpus model the ordering signal is the
    * same, the model table is just shared). Higher score = more fluent
    * = head; ties break on the id so the split is total. Docs too
    * short to have a bigram score 0 (tail).
    *
    * Scale: the LM family's shapes plus ONE window keyed by language —
    * the tertile rank shuffles on the language, which at corpus scale
    * is the partition column a curation pipeline already buckets by.
    * Returns (idCol, langCol, n_bigrams, lm_score_e6, bucket,
    * bucket_name).
    */
  def ccnetBuckets(docs: DataFrame, langCol: String = "lang",
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val scored = docs.select(col(idCol), col(langCol))
      .join(lmScore(docs, textCol, idCol), Seq(idCol), "left")
      .select(col(idCol), col(langCol),
        coalesce(col("n_bigrams"), lit(0L)).cast("long").as("n_bigrams"),
        coalesce(col("lm_score_e6"), lit(0L)).cast("long")
          .as("lm_score_e6"))
    val w = Window.partitionBy(col(langCol))
      .orderBy(col("lm_score_e6").desc, col(idCol).asc)
    scored
      .withColumn("bucket", ntile(3).over(w).cast("long"))
      .withColumn("bucket_name",
        when(col("bucket") === 1, "head")
          .when(col("bucket") === 2, "middle")
          .otherwise("tail"))
  }

  /** Jelinek–Mercer INTERPOLATED bigram LM score — [[lmScore]] with the
    * standard smoothing every deployed n-gram scorer uses: per bigram,
    * score = λ·P(w2|w1) + (1−λ)·P(w2), mixing the sharp conditional
    * with the unigram prior so one rare-but-seen prefix cannot swing a
    * document's score. P(w2) counts SECOND-position instances (the
    * distribution the conditional backs off to). λ is an e6 integer
    * and every probability is pre-scaled to e6 by integer division, so
    * both engines agree bit for bit. Bounds make the λ-mix safe in
    * LONG: c2 ≤ c1 and cw ≤ tot, so each e6 probability ≤ 1e6 and the
    * weighted sum ≤ 1e12 before the final ÷1e6.
    *
    * Same linear window-free shape as [[lmScore]] plus ONE extra count
    * table on the second-word hash and a broadcast one-row total.
    * Returns (doc_id, n_bigrams, lm_i_score_e6).
    */
  def lmScoreInterpolated(docs: DataFrame, lambdaE6: Long = 700000L,
                          textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    require(lambdaE6 >= 0 && lambdaE6 <= 1000000L,
      s"lambdaE6 out of [0, 1e6]: $lambdaE6")
    val inst = bigramHashInst(docs, textCol, idCol)
    val byDoc = inst.groupBy(col(idCol), col("pw"), col("sw"))
      .agg(count(lit(1)).as("m"))
    val bigramCounts = byDoc.groupBy(col("pw"), col("sw"))
      .agg(sum(col("m")).as("c2"))
    val prefixCounts = byDoc.groupBy(col("pw")).agg(sum(col("m")).as("c1"))
    val wordCounts = byDoc.groupBy(col("sw")).agg(sum(col("m")).as("cw"))
    val total = wordCounts.agg(sum(col("cw")).as("tot"))
    val mixE6 =
      s"(($lambdaE6 * (cast(c2 as decimal(38,0)) * 1000000 DIV c1)" +
        s" + ${1000000L - lambdaE6} *" +
        " (cast(cw as decimal(38,0)) * 1000000 DIV tot)) DIV 1000000)"
    byDoc
      .join(bigramCounts, Seq("pw", "sw"))
      .join(prefixCounts, Seq("pw"))
      .join(wordCounts, Seq("sw"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        sum(col("m")).as("n_bigrams"),
        expr(s"sum(m * $mixE6) DIV sum(m)").as("lm_i_score_e6"))
  }

  /** Interpolated Kneser–Ney bigram LM score (Kneser & Ney 1995; the
    * modified-KN family of Chen & Goodman 1999 with one discount) — the
    * smoothing every serious n-gram LM ships with, scoring each bigram
    *   P_KN(w2|w1) = max(c(w1w2) − d, 0)/c(w1·)
    *               + (d·N1+(w1,·)/c(w1·)) · N1+(·,w2)/N1+(·,·)
    * The continuation probability (how many DISTINCT contexts a word
    * follows, not how often) is what distinguishes KN from the
    * Jelinek–Mercer mix in [[lmScoreInterpolated]]: "Francisco" is
    * frequent but follows only "San", so its continuation mass is tiny.
    *
    * d rides as an e6 integer and every probability is e6 integer
    * division (DECIMAL(38,0) intermediates — DuckDB's HUGEINT sums are
    * the oracle twin), so both engines agree bit for bit. d = 0
    * degenerates to the unsmoothed conditional = [[lmScore]], the
    * property the spec pins.
    *
    * Scale shape: [[lmScore]]'s linear window-free pass plus TWO extra
    * count tables derived from the bigram-type table (distinct
    * followers per prefix, distinct predecessors per word) and a
    * broadcast one-row type total — all joins keyed on 8-byte hashes.
    * Returns (doc_id, n_bigrams, lm_kn_score_e6).
    */
  def lmScoreKneserNey(docs: DataFrame, discountE6: Long = 750000L,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    require(discountE6 >= 0 && discountE6 <= 1000000L,
      s"discountE6 out of [0, 1e6]: $discountE6")
    val inst = bigramHashInst(docs, textCol, idCol)
    val byDoc = inst.groupBy(col(idCol), col("pw"), col("sw"))
      .agg(count(lit(1)).as("m"))
    val bigramCounts = byDoc.groupBy(col("pw"), col("sw"))
      .agg(sum(col("m")).as("c2"))
    val prefixCounts = byDoc.groupBy(col("pw")).agg(sum(col("m")).as("c1"))
    val contPrefix = bigramCounts.groupBy(col("pw"))
      .agg(count(lit(1)).as("n1p_p"))
    val contWord = bigramCounts.groupBy(col("sw"))
      .agg(count(lit(1)).as("n1p_w"))
    val types = bigramCounts.agg(count(lit(1)).as("n_types"))
    val lamE6 = s"(($discountE6 * cast(n1p_p as decimal(38,0))) DIV c1)"
    val pcontE6 = "(cast(n1p_w as decimal(38,0)) * 1000000 DIV n_types)"
    val knE6 =
      s"(greatest(cast(c2 as decimal(38,0)) * 1000000 - $discountE6, 0)" +
        s" DIV c1 + ($lamE6 * $pcontE6) DIV 1000000)"
    byDoc
      .join(bigramCounts, Seq("pw", "sw"))
      .join(prefixCounts, Seq("pw"))
      .join(contPrefix, Seq("pw"))
      .join(contWord, Seq("sw"))
      .crossJoin(broadcast(types))
      .groupBy(col(idCol))
      .agg(
        sum(col("m")).as("n_bigrams"),
        expr(s"sum(m * $knE6) DIV sum(m)").as("lm_kn_score_e6"))
  }

  /** Per-source dataset card — the release-report table every corpus
    * ships with: document and token counts, mean rule-based quality,
    * language spread, and the exact-duplicate ratio, one row per
    * source. Means and ratios are integer-scaled (e2/e6) so both
    * engines agree exactly.
    *
    * Scale: a narrow per-doc projection (token count, content hash,
    * quality — all map-side), one hash aggregate to find duplicated
    * content hashes, one equi-join back on the 8-byte hash, and one
    * aggregate to the sources-sized report. No window, no all-pairs.
    */
  def sourceReport(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id",
                   sourceCol: String = "source",
                   langCol: String = "lang"): DataFrame = {
    // n_tokens rides out of the quality pass — re-tokenizing here would
    // pay a second split() per document and risk the token definition
    // drifting from the oracle's quality CTE
    val q = qualityScore(docs, textCol)
      .select(col(idCol), col("quality"), col("n_tokens").cast("long")
        .as("n_toks"))
    val base = docs.select(col(idCol), col(sourceCol), col(langCol),
      Dedup.h60(col(textCol)).as("hsh"))
    val dupHashes = base.groupBy(col("hsh"))
      .agg(count(lit(1)).as("nc")).filter(col("nc") > 1)
      .select(col("hsh"), lit(1L).as("isdup"))
    base.join(dupHashes, Seq("hsh"), "left")
      .join(q, Seq(idCol))
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        expr("sum(quality) * 100 DIV count(1)").as("mean_quality_e2"),
        countDistinct(col(langCol)).as("n_langs"),
        sum(coalesce(col("isdup"), lit(0L))).as("n_dup_docs"))
      .withColumn("dup_ratio_e6", expr("n_dup_docs * 1000000 DIV n_docs"))
  }

  /** Rare-token (pseudo-OOV) rate per document: the fraction of token
    * instances whose corpus-wide SHARE is below 1/`rareShareDenom`
    * (share, not absolute count, so the same threshold means the same
    * thing at sf0.01 and at 100 TB). Docs dominated by tokens the
    * corpus has essentially never seen are encoding noise, mojibake,
    * or code soup — the standard cheap companion to the LM score
    * above. Rates are ×1e6 integer so both engines agree exactly.
    *
    * One explode + per-(doc, token) multiplicity aggregate + a
    * vocabulary count table joined back on the 8-byte token hash —
    * the same linear, window-free shape as [[lmScore]]. The corpus
    * total is a one-row aggregate broadcast to the scorers.
    * Returns (doc_id, n_tokens, n_rare, rare_rate_e6).
    */
  def oovRate(docs: DataFrame, rareShareDenom: Long = 100L,
              textCol: String = "text",
              idCol: String = "doc_id"): DataFrame =
    oovRateOfInst(docs
      .select(col(idCol), explode(toks(col(textCol))).as("w"))
      .select(col(idCol), Dedup.h60(col("w")).as("tw")),
      rareShareDenom, idCol)

  /** [[oovRate]] over a PRE-BUILT (id, tw) token-hash instance table
    * (the fused ensemble pass; identical counts).
    */
  private[ops] def oovRateOfInst(inst: DataFrame, rareShareDenom: Long,
                                 idCol: String): DataFrame = {
    val byDoc = inst.groupBy(col(idCol), col("tw"))
      .agg(count(lit(1)).as("m"))
    val vocab = byDoc.groupBy(col("tw")).agg(sum(col("m")).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("tot"))
    byDoc.join(vocab, "tw")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        sum(col("m")).as("n_tokens"),
        sum(when(col("cnt") * lit(rareShareDenom) < col("tot"), col("m"))
          .otherwise(lit(0L))).as("n_rare"))
      .withColumn("rare_rate_e6", expr("n_rare * 1000000 DIV n_tokens"))
  }

  /** Feature-hashing (hashing-trick) bag-of-words vectors in long form:
    * every token instance is routed to bucket h60(w) mod `dims` with a
    * ±1 sign drawn from an independent hash bit (bit 32 — disjoint from
    * the bucket bits for any dims ≤ 2^32, so the sign is not a function
    * of the bucket). Signed sums make collisions cancel in expectation
    * (Weinberger et al. 2009) — the classic text→vector featurizer
    * feeding ANN / clustering when no learned embedding exists yet.
    * Long-form (doc_id, bucket, feat) output keeps the oracle exact and
    * lets downstream ops pivot to arrays only when they need to.
    *
    * One explode + one map-side-combining aggregate on (doc, bucket);
    * no joins, no window — embarrassingly parallel at any scale.
    */
  def featureHash(docs: DataFrame, dims: Int, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    require(dims > 0 && dims <= (1 << 30), s"dims out of range: $dims")
    val th = Dedup.h60(col("w"))
    docs
      .select(col(idCol), explode(toks(col(textCol))).as("w"))
      .select(col(idCol),
        pmod(th, lit(dims.toLong)).as("bucket"),
        when(shiftright(th, 32).bitwiseAND(lit(1L)) === 1L, lit(-1L))
          .otherwise(lit(1L)).as("sign"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("sign")).as("feat"))
  }

  /** Payment-card-number candidate pattern: bare 13-19 digit runs
    * (word-boundary-delimited). Shared with the oracle; RE2-and-Java
    * compatible like [[EmailRe]].
    */
  val CardRe = "\\b[0-9]{13,19}\\b"

  /** Luhn-checksum-validated card-number redaction — the PII pass
    * [[redactPii]]'s regexes cannot do alone: a 16-digit run is only
    * treated as a card number when its Luhn check digit validates
    * (ISO/IEC 7812), cutting the false-positive flood of timestamps,
    * order ids and hashes that plain digit-run regexes redact. Valid
    * numbers are replaced with `<CARD>`; `n_card_numbers` counts them.
    *
    * Pure per-row work: regexp extraction plus an integer fold over
    * each candidate's digits (higher-order functions, no UDF) — no
    * shuffle, embarrassingly parallel. HOF lambdas are interpreted,
    * not codegen'd, but they run only on the extracted candidates
    * (rare), not per character of the corpus.
    */
  def luhnRedact(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // Luhn: from the RIGHTMOST digit (i = 1), double every second
    // digit, subtract 9 on overflow, sum % 10 == 0
    val luhnSum =
      """aggregate(sequence(1, length(s)), 0, (acc, i) ->
        |  acc + CASE WHEN i % 2 = 0
        |    THEN CASE
        |      WHEN 2 * (ascii(substring(s, length(s) - i + 1, 1)) - 48) > 9
        |      THEN 2 * (ascii(substring(s, length(s) - i + 1, 1)) - 48) - 9
        |      ELSE 2 * (ascii(substring(s, length(s) - i + 1, 1)) - 48) END
        |    ELSE ascii(substring(s, length(s) - i + 1, 1)) - 48 END)""".stripMargin
    docs
      .withColumn("__valid", expr(
        s"""filter(regexp_extract_all($textCol, '\\\\b[0-9]{13,19}\\\\b', 0),
           |  s -> $luhnSum % 10 = 0)""".stripMargin))
      .withColumn("n_card_numbers", size(col("__valid")).cast("long"))
      .withColumn("redacted_cards",
        // boundary-anchored replace: a bare replace() would also rewrite
        // the candidate digits when EMBEDDED in a longer non-candidate
        // run (e.g. a 20-digit reference id containing a valid 16-digit
        // substring), corrupting text the extractor never flagged
        expr(s"aggregate(__valid, $textCol, (t, s) ->" +
          s" regexp_replace(t, concat('\\\\b', s, '\\\\b'), '<CARD>'))"))
      .drop("__valid")
  }

  /** Vocabulary coverage curve: for each N in `ns`, the share of all
    * token INSTANCES covered by the N most frequent vocabulary terms —
    * the statistic that sizes a tokenizer vocabulary (the N where the
    * curve flattens) and flags corpus skew (a 10-term vocab covering
    * 90% means templated text). Ties at the rank-N boundary break on
    * the term hash so the cut is engine-deterministic.
    *
    * Scale: one map-side-combining vocab aggregate; each top-N is a
    * TakeOrdered (no global sort, no corpus window) over the
    * vocab-sized table followed by a two-row-aggregate; the corpus
    * total is a one-row broadcast. N is bounded and tiny (vocab design
    * explores 10s-100Ks), so the unioned output is N-sized.
    */
  def vocabCoverage(docs: DataFrame, ns: Seq[Int] = Seq(10, 100, 1000),
                    textCol: String = "text"): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ > 0), s"bad top-N list: $ns")
    val vocab = docs
      .select(explode(toks(col(textCol))).as("w"))
      .groupBy(Dedup.h60(col("w")).as("tw"))
      .agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("tot"))
    ns.map { n =>
      vocab.orderBy(col("cnt").desc, col("tw").asc).limit(n)
        .agg(count(lit(1)).as("n_terms"), sum(col("cnt")).as("covered"))
        .withColumn("n_top", lit(n))
    }.reduce(_ unionByName _)
      .crossJoin(broadcast(total))
      // DECIMAL: covered * 1e6 wraps a LONG past ~9.2e12 token
      // instances (the temperatureMixture discipline)
      .withColumn("coverage_e6",
        expr("cast(covered as decimal(38,0)) * 1000000 div tot"))
      .select(col("n_top"), col("n_terms"), col("covered"), col("tot"),
        col("coverage_e6"))
  }

  /** Per-group n-gram diversity: distinct n-grams / total n-gram
    * instances (1e4-scaled integer) plus the singleton-gram count — a
    * corpus-health metric per source/shard (self-BLEU's cheap cousin):
    * a source whose diversity collapses is emitting templated or
    * machine-generated text even when its documents individually look
    * fine, and the singleton share separates "diverse" from "uniformly
    * random".
    *
    * Two-level hash aggregate on (group, 8-byte gram hash) then group —
    * both map-side combinable, no joins, no window; the distinct-count
    * is exact (it IS the second-level row count), not a sketch.
    */
  def ngramDiversity(docs: DataFrame, n: Int = 3,
                     groupCol: String = "source",
                     textCol: String = "text"): DataFrame =
    docs
      .select(col(groupCol), toks(col(textCol)).as("__toks"))
      .select(col(groupCol),
        explode(Dedup.shinglesOfTokens(col("__toks"), n)).as("sh"))
      .select(col(groupCol), Dedup.h60(col("sh")).as("h"))
      .groupBy(col(groupCol), col("h"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(groupCol))
      .agg(
        sum(col("c")).as("n_grams"),
        count(lit(1)).as("n_distinct_grams"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_singleton_grams"))
      .withColumn("diversity_e4",
        expr("n_distinct_grams * 10000 div n_grams"))

  /** Source-pair token-distribution divergence: exact total-variation
    * distance between every two sources' unigram distributions,
    * tv_e6 = 1e6 · ½ Σ_w |p_a(w) − p_b(w)| — the dataset-audit matrix
    * that says WHICH sources carry interchangeable text (tv → 0) and
    * which bring genuinely different mass (tv → 1e6), complementing the
    * doc-level window-overlap matrix ([[graft.ops.Dedup
    * .sourceOverlapMatrix]]: shared strings) with a distributional
    * signal that needs no shared n-gram at all. Total variation instead
    * of KL/JS because it is integer-exact: with p = tf/T, the summand
    * |tf_a·T_b − tf_b·T_a| is a product of longs (DECIMAL(38,0) — at
    * corpus scale tf·T overflows a LONG), and tokens absent from one
    * source contribute their full mass via the totals, no smoothing
    * constant to tune. log-domain divergences are not bit-stable across
    * engines.
    *
    * Shape: one (source, token-hash) tf aggregate (map-side combine),
    * token-keyed self-join whose per-token cost is bounded by
    * nSources² (never corpus²), source-pair aggregate; the missing-mass
    * terms come from per-source totals joined at nSources rows. At
    * 100 TB the tf table is vocab×sources and AQE picks the join
    * strategy — the TF-IDF non-hint decision.
    *
    * Returns (source_a, source_b, n_shared_tokens, tv_e6), a < b. A
    * pair sharing NO token does not appear (its tv is exactly 1e6) —
    * the inner join is the deliberate scale choice and the oracle
    * mirrors it.
    */
  def sourceDivergence(docs: DataFrame, sourceCol: String = "source",
                       textCol: String = "text"): DataFrame = {
    val tf = docs
      .select(col(sourceCol).as("src"),
        explode(toks(col(textCol))).as("w"))
      .select(col("src"), Dedup.h60(col("w")).as("tw"))
      .groupBy(col("src"), col("tw")).agg(count(lit(1)).as("tf"))
    val totals = tf.groupBy(col("src")).agg(sum(col("tf")).as("t"))
    val a = tf.join(totals, "src")
      .select(col("tw"), col("src").as("source_a"),
        col("tf").as("tf_a"), col("t").as("t_a"))
    val b = tf.join(totals, "src")
      .select(col("tw"), col("src").as("source_b"),
        col("tf").as("tf_b"), col("t").as("t_b"))
    // co-occurring tokens: Σ |tf_a·T_b − tf_b·T_a|, plus each side's
    // matched mass so the absent-token remainder (T − Σ tf_matched)
    // can be added from the totals without an outer join
    val co = a.join(b, "tw")
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"), col("t_a"), col("t_b"))
      .agg(count(lit(1)).as("n_shared_tokens"),
        sum(expr("abs(cast(tf_a as decimal(38,0)) * t_b" +
          " - cast(tf_b as decimal(38,0)) * t_a)")).as("co_diff"),
        sum(col("tf_a")).as("m_a"), sum(col("tf_b")).as("m_b"))
    co.select(col("source_a"), col("source_b"), col("n_shared_tokens"),
      expr("cast((co_diff" +
        " + cast(t_a - m_a as decimal(38,0)) * t_b" +
        " + cast(t_b - m_b as decimal(38,0)) * t_a) * 1000000" +
        " div (cast(t_a as decimal(38,0)) * t_b * 2) as bigint)")
        .as("tv_e6"))
  }

  /** The BPE training dictionary: ONE corpus pass (explode + hash
    * aggregate with map-side partials) collapsing the corpus to its
    * DISTINCT whitespace words with frequencies, each word opened into
    * its code-point symbol array. Everything after this pass is
    * vocabulary-sized. ("" stays a one-symbol word — the split
    * contract.)
    */
  private[graft] def bpeDict(docs: DataFrame,
                             textCol: String = "text",
                             byteLevel: Boolean = false): DataFrame =
    docs.select(explode(toks(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        (if (byteLevel) graft.functions.BpeExpressions.byteSyms(col("word"))
         else graft.functions.BpeExpressions.charSyms(col("word")))
          .as("syms"))

  /** Frequency-weighted adjacent-symbol-pair counts over the
    * dictionary — ALL adjacent occurrences count (["a","a","a"] holds
    * (a, a) twice), matching the recount convention of a reference BPE
    * trainer's `get_stats`. Pure higher-order functions: the pairs
    * explode out of each vocab row with no window and no join; the
    * aggregate is partial-agg combinable.
    */
  private[graft] def bpePairCounts(dict: DataFrame): DataFrame =
    dict.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(slice(syms, 1, size(syms) - 1)," +
          " (s, i) -> named_struct('a', s, 'b', element_at(syms, i + 2)))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("freq"))

  /** One training round's rewrite: merge every non-overlapping
    * left-to-right adjacent (a, b) inside each dictionary word's symbol
    * array — a shuffle-free narrow map over the vocab-sized dictionary
    * (the single-rank [[graft.functions.BpeExpressions.bpeRewriteSyms]]
    * kernel, the same code path the encode half runs).
    */
  private[graft] def bpeRewriteRound(dict: DataFrame, a: String,
                                     b: String): DataFrame =
    dict.withColumn("syms",
      graft.functions.BpeExpressions.bpeRewriteSyms(col("syms"),
        Seq((a, b))))

  /** BPE tokenizer training (Sennrich et al. 2016, arXiv:1508.07909) in
    * the paper's own DICTIONARY form: symbols start as the code points
    * of each whitespace word (merges never cross word boundaries), the
    * corpus is read ONCE to build the distinct-word count table
    * ([[bpeDict]]), and every one of the `nMerges` greedy rounds runs
    * over that vocabulary-sized table only — count freq-weighted
    * adjacent pairs ([[bpePairCounts]]), take the 1-row argmax (ties:
    * lexicographic (a, b) — fully deterministic), rewrite merged words
    * in place ([[bpeRewriteRound]]). Compound symbols are spelled
    * "a b"; words cannot contain spaces, so the spelling is
    * unambiguous. Returns the learned merge table (merge_rank, token_a,
    * token_b, freq) — the artifact a tokenizer ships.
    *
    * Scale: rounds cost |vocab|, not |corpus| — the property that makes
    * a real 32k-merge vocabulary tractable at 100 TB (32k corpus-wide
    * shuffles would not be; this is the same round-cost shape as
    * [[unigramTrain]]). Each round is one HOF explode + one
    * map-side-combined aggregate + a 1-row TakeOrdered + a narrow
    * kernel map; `localCheckpoint` truncates lineage at VOCAB size with
    * the CC loop's leak-free unpersist of the previous round.
    *
    * The full trajectory is engine-deterministic, so the DuckDB oracle
    * replays every round (chained CTEs over the same word dictionary)
    * and checks the learned merges bit-for-bit. If the dictionary
    * degenerates before nMerges rounds (no adjacent pairs left),
    * training stops early and the table holds the merges learned so
    * far.
    */
  /** Materialize a training round's vocab-sized dictionary to executor
    * storage and truncate lineage, holding the EXACT persisted RDD so
    * the next round can unpersist THIS one — never a set-diff over the
    * global persistent-RDD registry, which on a shared SparkContext
    * would capture (and later evict) an unrelated job's cache. Shared
    * by the BPE and WordPiece merge trainers (one copy: the invariant
    * is subtle and a divergent fix would silently miss a trainer).
    */
  private def checkpointDict(df: DataFrame)
      : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    val rdd = df.rdd
    rdd.localCheckpoint()
    rdd.count()
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  def bpeTrainMerges(docs: DataFrame, nMerges: Int,
                     textCol: String = "text",
                     byteLevel: Boolean = false): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var (dict, dictRdd) = checkpointDict(bpeDict(docs, textCol, byteLevel))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var exhausted = false
    for (r <- 1 to nMerges if !exhausted) {
      val top = bpePairCounts(dict)
        .orderBy(col("freq").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, f) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((r, a, b, f))
        if (r < nMerges) {
          val (next, nextRdd) =
            checkpointDict(bpeRewriteRound(dict, a, b))
          // the previous round's vocab checkpoint fed this rewrite and
          // is now garbage — same leak-free pattern as the CC loop
          dictRdd.unpersist(false)
          dict = next
          dictRdd = nextRdd
        }
      }
    }
    dictRdd.unpersist(false)
    merges.result().toDF("merge_rank", "token_a", "token_b", "freq")
  }

  /** WordPiece tokenizer TRAINING (Schuster & Nakajima 2012, the
    * likelihood criterion BERT's vocab was built with): identical
    * greedy merge rounds to [[bpeTrainMerges]] — same word dictionary,
    * same pair counting, same within-word rewrite — but the round's
    * winner maximizes the LIKELIHOOD RATIO
    *   score(a,b) = count(ab) / (count(a)·count(b))
    * (the unigram-LM likelihood gain of merging), not the raw pair
    * count: a pair of rare-but-always-adjacent symbols beats a pair of
    * ubiquitous ones. score rides as e12 integer division over
    * DECIMAL(38,0) (freq ≤ min(ca, cb) ⇒ score ≤ 1e12, BIGINT-safe);
    * equal truncated scores fall back to the lexicographic (a, b)
    * tie-break, identically in both engines.
    *
    * Scale shape = the BPE trainer's: rounds cost |vocab| not |corpus|;
    * the one addition is a per-round symbol count table (vocab-sized
    * hash aggregate) joined to the pair counts on the symbol. The loop
    * is kept separate from [[bpeTrainMerges]] rather than abstracted
    * over it — the BPE trajectory is oracle-pinned and stays untouched.
    * Returns (merge_rank, token_a, token_b, freq, score_e12).
    */
  def wordpieceTrainMerges(docs: DataFrame, nMerges: Int,
                           textCol: String = "text"): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var (dict, dictRdd) = checkpointDict(bpeDict(docs, textCol))
    val merges = Seq.newBuilder[(Int, String, String, Long, Long)]
    var exhausted = false
    for (r <- 1 to nMerges if !exhausted) {
      val symCounts = dict
        .select(explode(col("syms")).as("s"), col("freq"))
        .groupBy(col("s")).agg(sum(col("freq")).as("cnt"))
      val top = bpePairCounts(dict)
        .join(symCounts.select(col("s").as("a"), col("cnt").as("ca")), "a")
        .join(symCounts.select(col("s").as("b"), col("cnt").as("cb")), "b")
        .withColumn("score_e12",
          expr("(cast(freq as decimal(38,0)) * 1000000000000)" +
            " DIV (cast(ca as decimal(38,0)) * cb)").cast("long"))
        .orderBy(col("score_e12").desc, col("a").asc, col("b").asc)
        .limit(1).select("a", "b", "freq", "score_e12").collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((r, a, b, top(0).getLong(2), top(0).getLong(3)))
        if (r < nMerges) {
          val (next, nextRdd) = checkpointDict(bpeRewriteRound(dict, a, b))
          dictRdd.unpersist(false)
          dict = next
          dictRdd = nextRdd
        }
      }
    }
    dictRdd.unpersist(false)
    merges.result()
      .toDF("merge_rank", "token_a", "token_b", "freq", "score_e12")
  }

  /** Apply a trained merge table to the corpus — the ENCODE half of the
    * BPE pair ([[bpeTrainMerges]] is the train half). The merge table
    * ships inside one native expression
    * ([[graft.functions.BpeExpressions.bpeEncode]]) so the whole pass is
    * a shuffle-free narrow map: at 100 TB this is a plain scan, while a
    * join-based rewrite would shuffle the corpus once per merge rank.
    * Returns (idCol, tokens array<string>) with compound symbols spelled
    * "a b", exactly as the trainer's rewrite emits them.
    */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)],
                textCol: String = "text", idCol: String = "doc_id",
                byteLevel: Boolean = false): DataFrame =
    docs.select(col(idCol),
      (if (byteLevel)
        graft.functions.BpeExpressions.bpeEncodeBytes(toks(col(textCol)),
          merges)
      else
        graft.functions.BpeExpressions.bpeEncode(toks(col(textCol)), merges))
        .as("tokens"))

  /** Persist a trained merge table ([[bpeTrainMerges]] /
    * [[wordpieceTrainMerges]] output) as a TxLog table — the
    * tokenizer.json of this engine: the artifact is versioned (TxLog
    * time travel reproduces any past tokenization exactly), tiny
    * (|merges| rows), and every downstream encode reads it instead of
    * retraining. Completes the at-rest artifact family next to the
    * BM25 segments, the IVF-PQ model, and the LM count index.
    */
  def bpeMergesWrite(merges: DataFrame, index: String): Unit =
    graft.lake.TxLog.append(merges.coalesce(1), index)

  /** Encode a corpus against the at-rest merge table: the merges
    * collect (|vocab|-bounded, rank-ordered) and ship inside the same
    * native kernel as [[bpeEncode]] — a shuffle-free narrow corpus
    * map, zero training work at encode time. Row-identical to encoding
    * with the in-memory merges the table was written from.
    */
  def bpeEncodeOverIndex(spark: org.apache.spark.sql.SparkSession,
                         index: String, docs: DataFrame,
                         textCol: String = "text",
                         idCol: String = "doc_id",
                         byteLevel: Boolean = false): DataFrame = {
    val ms = graft.lake.TxLog.read(spark, index)
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getAs[String]("token_a"), r.getAs[String]("token_b")))
      .toSeq
    bpeEncode(docs, ms, textCol, idCol, byteLevel)
  }

  /** Unigram-LM (SentencePiece-style) tokenizer TRAINING — the other
    * real-world tokenizer family next to BPE (Kudo 2018), via hard-EM
    * (Viterbi-EM, SentencePiece's own alternation with the soft E-step
    * replaced by the max-derivation — a documented standard variant):
    *
    *  1. seed vocab = every substring up to `maxPieceLen` of the
    *     corpus's DISTINCT words with corpus frequency ≥ `minSeedCount`,
    *     plus ALL single characters (coverage floor);
    *  2. per round: price pieces at −ln(count/total) (e6 integer),
    *     Viterbi-resegment the distinct-word table with the
    *     [[graft.functions.UnigramKernels]] kernel, recount pieces from
    *     the segmentations weighted by word frequency;
    *  3. prune to the `vocabSize` best multi-char pieces by count
    *     (single chars always survive), and iterate.
    *
    * Scale shape: the expensive corpus pass happens ONCE (word counts —
    * one explode + hash aggregate); every EM round then runs over the
    * DISTINCT-WORD table (vocabulary-sized, orders of magnitude below
    * the corpus), with the piece table riding into executors as a
    * reference object — no joins, no windows. This is why unigram
    * training is tractable at 100 TB: rounds cost |vocab|, not |corpus|.
    *
    * Returns the trained vocab rows (piece, count, cost_e6), ready for
    * [[unigramEncode]]. Costs are integer e6; ln is evaluated once per
    * piece on the driver over exact counts, so the trajectory is
    * deterministic for a fixed corpus.
    */
  def unigramTrain(docs: DataFrame, vocabSize: Int = 200,
                   maxPieceLen: Int = 6, rounds: Int = 3,
                   minSeedCount: Long = 2L,
                   textCol: String = "text"): Seq[(String, Long, Long)] = {
    require(vocabSize > 0 && maxPieceLen >= 2 && rounds >= 1,
      s"bad params: vocabSize=$vocabSize maxPieceLen=$maxPieceLen rounds=$rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordCounts(docs, textCol).persist()
    try {
      // cut to (all single chars) ∪ (top vocabSize multi-char) BEFORE
      // collecting: the full substring table is corpus-vocabulary-sized
      // and collecting it whole would be a driver OOM at web scale —
      // the TakeOrdered limit brings back only what prune would keep
      val seedDf = seedCountsOf(words, maxPieceLen, minSeedCount)
      val seed = seedDf.filter(length(col("piece")) === 1)
        .unionByName(seedDf.filter(length(col("piece")) > 1)
          .orderBy(col("cnt").desc, col("piece")).limit(vocabSize))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      var vocab: Seq[(String, Long)] = prune(seed, vocabSize)
      for (_ <- 1 to rounds) {
        val costs = toCosts(vocab)
        // one piece-table broadcast per EM round, destroyed once the
        // vocab-sized recount is on the driver — no leaked blocks
        val bc = graft.functions.UnigramExpressions.broadcastVocab(costs)
        val recount = words
          .select(col("n"),
            explode(graft.functions.UnigramExpressions.unigramEncodeBc(
              array(col("w")), bc, maxPieceLen,
              unkCostE6 = UnigramUnkCostE6)).as("piece"))
          .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
        bc.destroy()
        // seed single chars must survive even when a round never uses
        // them (an unseen char next round still needs a priced fallback)
        val chars = vocab.filter(p => cpLen(p._1) == 1).toMap
        val merged = (chars ++ recount.toMap).toSeq
        vocab = prune(merged, vocabSize)
      }
      val costs = toCosts(vocab).toMap
      vocab.sortWith(byCountThenPiece)
        .map { case (p, c) => (p, c, costs(p)) }
    } finally { words.unpersist(); () }
  }

  /** Unknown-char fallback cost: worse than any real piece (a real
    * count's cost is < ln(total)·1e6 ≈ 32e6 even for singletons in an
    * exabyte corpus).
    */
  val UnigramUnkCostE6: Long = 100000000L

  /** Distinct-word frequency table — the ONE corpus-wide pass of
    * unigram training.
    */
  /** Heaps-law vocabulary-growth curve: the corpus in `nBuckets`
    * doc-id-prefix slices, each carrying the CUMULATIVE token count and
    * distinct-vocabulary size up to that slice — the sublinear-growth
    * diagnostic (V ≈ K·nᵝ) that flags template/boilerplate corpora
    * (vocab flattens early) or id-like token explosions (near-linear).
    *
    * Scale shape: the corpus max id rides a 1-row broadcast (the
    * withScalar pattern); first-sighting per token is ONE vocab-bounded
    * aggregate (min bucket — buckets are monotone in doc id, so min
    * bucket IS first sight); the cumulative sums window over nBuckets
    * rows, never the corpus.
    */
  def vocabGrowth(docs: DataFrame, nBuckets: Int = 16,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    require(nBuckets >= 2, s"need >= 2 buckets: $nBuckets")
    val n1 = docs.agg((max(col(idCol)) + 1).as("__n"))
    // integral `div`, not double `/`-then-cast: the oracle buckets with
    // integer `//`, and double division loses exactness for ids above
    // ~2^53/nBuckets (hash-derived Long ids), silently diverging
    val bucketed = docs.crossJoin(broadcast(n1))
      .withColumn("__bn", col(idCol).cast("long") * nBuckets)
      .withColumn("__b", expr("__bn div __n"))
      .select(col(idCol), col(textCol), col("__b"))
    val perBucketTokens = bucketed
      .groupBy(col("__b"))
      .agg(sum(size(toks(col(textCol)))).cast("long").as("__toks"))
    val firstSeen = bucketed
      .select(col("__b"), explode(toks(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(min(col("__b")).as("__fb"))
      .groupBy(col("__fb")).agg(count(lit(1)).as("__new_vocab"))
    val w = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucketTokens
      .join(firstSeen, col("__b") === col("__fb"), "left")
      .select(col("__b").as("bucket"),
        sum(col("__toks")).over(w).as("cum_tokens"),
        sum(coalesce(col("__new_vocab"), lit(0L))).over(w).as("cum_vocab"))
  }

  /** Zipf rank-frequency audit: the top-`maxRank` vocabulary by corpus
    * frequency, sampled at power-of-two ranks with the exact integer
    * product `freq·rank` — Zipf's law (freq ∝ 1/rank) predicts a flat
    * product column, so a corpus-health dashboard reads the bow
    * directly: boilerplate/template floods bulge it at mid ranks,
    * id-like token floods sink the tail. The shape complement of
    * [[vocabGrowth]] (Heaps' law watches vocabulary GROWTH, this its
    * frequency DISTRIBUTION), and all-integer so any engine replays it.
    *
    * Scale shape: one vocab-bounded aggregate (map-side partials
    * compress each partition to its distinct words), then a TakeOrdered
    * top-`maxRank` — never a global sort; the rank window orders the
    * surviving `maxRank` rows, a constant-size single partition by
    * construction.
    */
  def zipfCheck(docs: DataFrame, maxRank: Int = 256,
                textCol: String = "text"): DataFrame = {
    require(maxRank >= 1, s"need maxRank >= 1: $maxRank")
    val top = wordCounts(docs, textCol)
      .orderBy(col("n").desc, col("w"))
      .limit(maxRank)
    val w = Window.orderBy(col("n").desc, col("w"))
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(expr("(rank & (rank - 1)) = 0"))
      .select(col("rank"), col("w").as("word"), col("n").as("freq"),
        (col("n") * col("rank")).as("freq_rank"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004, "TextRank:
    * Bringing Order into Texts" §3.1): PageRank over the word
    * co-occurrence graph — adjacent-token pairs, undirected (each
    * adjacency emits both directions) — surfaces the corpus's central
    * vocabulary by GRAPH CENTRALITY instead of raw frequency (a word
    * co-occurring with many distinct well-connected words outranks an
    * equally frequent word stuck in one template). Duplicate edges act
    * as weights: [[Graph.pageRank]]'s per-instance `r DIV outdeg`
    * contribution makes a pair seen m times carry m shares of its
    * source's rank — exactly the paper's weighted variant in the
    * integer-exact e12 domain, so the oracle replays the trajectory.
    * Returns the top `k` (word, rank_e12) with the id tie-break.
    *
    * Scale shape: edge building is one shuffle-free narrow pass (pair
    * array per doc, exploded); the rounds ride pageRank's Pregel shape
    * — the edge list materializes once and each round shuffles only
    * |vocab| rank rows; the final top-k is a TakeOrdered.
    */
  def textRankKeywords(docs: DataFrame, iters: Int = 5, k: Int = 20,
                       textCol: String = "text"): DataFrame = {
    val adjacent = docs
      .select(toks(col(textCol)).as("__w"))
      .select(explode(
        when(size(col("__w")) < 2,
          array().cast("array<struct<src:string,dst:string>>"))
          .otherwise(transform(sequence(lit(0), size(col("__w")) - 2),
            i => struct(element_at(col("__w"), i + 1).as("src"),
              element_at(col("__w"), i + 2).as("dst"))))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
      .filter(col("src") =!= "" && col("dst") =!= "")
    // collapse instance multiplicity into WEIGHTED edge types before
    // the rounds: the co-occurrence graph has ~|tokens| edge instances
    // but only ~|bigram types| distinct pairs, and m·(r DIV d) is
    // integer-identical to summing m instances — the rounds join a
    // table that grows with the vocabulary, not the corpus.
    // Count the DIRECTED types first, then symmetrize: the old
    // instance-level union evaluated the corpus explode once per
    // branch, and its aggregate shuffled ~2·|tokens| rows — this shape
    // explodes once, aggregates with map-side partials, and the
    // symmetrizing union runs over the vocabulary-sized type table.
    // m(src,dst) = fwd(src,dst) + fwd(dst,src) either way.
    val cnt = adjacent.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("m0"))
    val edges = cnt.union(
        cnt.select(col("dst").as("src"), col("src").as("dst"), col("m0")))
      .groupBy(col("src"), col("dst")).agg(sum(col("m0")).as("m"))
    Graph.pageRankWeighted(edges, iters)
      .orderBy(col("r").desc, col("v"))
      .limit(k)
      .select(col("v").as("word"), col("r").as("rank_e12"))
  }

  private def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(toks(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))

  /** Seed counts over a (w, n) word table: every substring (up to
    * maxPieceLen) of every DISTINCT word, weighted by the word's corpus
    * frequency; single chars are kept unconditionally (coverage floor),
    * multi-char pieces must clear `minSeedCount`.
    */
  private def seedCountsOf(words: DataFrame, maxPieceLen: Int,
                           minSeedCount: Long): DataFrame =
    words
      .select(col("n"), explode(expr(
        s"""flatten(transform(sequence(0, length(w) - 1),
           |  s -> transform(sequence(1, least($maxPieceLen, length(w) - s)),
           |    l -> substring(w, s + 1, l))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
      .filter(length(col("piece")) === 1 || col("cnt") >= minSeedCount)

  /** The seed stage of [[unigramTrain]] as a standalone query — the
    * corpus-cost part of tokenizer training, oracle-checkable (the EM
    * rounds' log-prob costs are not SQL-expressible, but THIS stage's
    * exact substring counts are). Returns the top `k` seed pieces by
    * (weighted count, piece) — a total order, so the cut is
    * deterministic in both engines.
    */
  def unigramSeedTop(docs: DataFrame, k: Int, maxPieceLen: Int = 6,
                     minSeedCount: Long = 2L,
                     textCol: String = "text"): DataFrame =
    seedCountsOf(wordCounts(docs, textCol), maxPieceLen, minSeedCount)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(k)

  /** Code-point length — the unit the seed stage (Spark length()) and
    * the Viterbi kernel both use; String.length would call an
    * astral-plane char (surrogate PAIR) multi-char and silently drop
    * it from the single-char coverage floor.
    */
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Code-point lexicographic compare — the SAME order Spark's string
    * orderBy uses (UTF-8 byte order preserves code-point order), so
    * the pre-collect TakeOrdered cut and the driver-side prune break
    * count ties identically; String.compareTo (UTF-16 unit order)
    * ranks U+E000..U+FFFF above astral chars and would disagree at a
    * tie on the vocabSize boundary.
    */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  private def byCountThenPiece(x: (String, Long), y: (String, Long)): Boolean =
    x._2 > y._2 || (x._2 == y._2 && cpCompare(x._1, y._1) < 0)

  private def prune(vocab: Seq[(String, Long)],
                    vocabSize: Int): Seq[(String, Long)] = {
    val (chars, multi) = vocab.partition(p => cpLen(p._1) == 1)
    chars ++ multi.sortWith(byCountThenPiece).take(vocabSize)
  }

  private def toCosts(vocab: Seq[(String, Long)]): Seq[(String, Long)] = {
    val total = vocab.map(_._2).sum.toDouble
    vocab.map { case (p, c) =>
      (p, math.round(-math.log(c / total) * 1e6)) }
  }

  /** Apply a trained unigram vocab: per doc, the min-cost piece stream
    * (shuffle-free narrow map, the same deployment shape as
    * [[bpeEncode]]).
    */
  def unigramEncode(docs: DataFrame, vocab: Seq[(String, Long, Long)],
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    require(vocab.nonEmpty, "empty unigram vocab")
    // max candidate length comes from the VOCAB, never a parameter: a
    // caller-supplied cap below the longest trained piece would turn
    // those pieces into silent dead weight in the table
    val maxLen = vocab.iterator.map(v => cpLen(v._1)).max
    docs.select(col(idCol),
      graft.functions.UnigramExpressions.unigramEncode(
        toks(col(textCol)), vocab.map(v => (v._1, v._3)), maxLen,
        UnigramUnkCostE6).as("pieces"))
  }

  /** SUBWORD-REGULARIZATION sampling (Kudo 2018 §3) — the training-time
    * augmentation that draws, per word, a segmentation from the n-best
    * list with probability ∝ P(seg)^alpha instead of always the 1-best:
    * exposure to alternative segmentations makes the downstream model
    * robust to tokenization noise. The draw is DETERMINISTIC like every
    * sampler here: u = salted-hash(word) uniform, walked down the
    * softmax CDF — rerun-stable for a fixed salt, redrawn by changing
    * it (vary the salt per epoch, the SentencePiece usage).
    * alpha → large degenerates to the 1-best (spec-pinned);
    * alpha = 0 is uniform over the n-best.
    *
    * Scale: the n-best + softmax run once per DISTINCT word
    * (vocabulary-sized); each OCCURRENCE then draws its own u (hashed
    * from salt, doc, position, word — per-occurrence diversity, the
    * §3 semantics) and walks the word's CDF, a cheap per-row
    * expression after the equi-join; documents rebuild with one
    * doc-keyed sorted aggregate — no corpus-wide window. The
    * distinct-word branch re-scans the input tokenization; pass a
    * cached `docs` when the corpus is large.
    */
  def unigramSampleEncode(docs: DataFrame, vocab: Seq[(String, Long, Long)],
                          alpha: Double = 0.2, salt: String = "sp0",
                          nBest: Int = 8, textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    require(vocab.nonEmpty, "empty unigram vocab")
    require(alpha >= 0, s"alpha must be >= 0: $alpha")
    val maxLen = vocab.iterator.map(v => cpLen(v._1)).max
    // "" tokens (double/leading spaces) carry no pieces and would NULL
    // a whole document through element_at-of-empty + flatten — same
    // filter discipline as wordCounts
    val words = docs
      .select(col(idCol), posexplode(toks(col(textCol))).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val nb = words.select(col("w")).distinct()
      .withColumn("nb", graft.functions.UnigramExpressions.unigramNbest(
        col("w"), vocab.map(v => (v._1, v._3)), maxLen,
        UnigramUnkCostE6, nBest))
      // softmax over -alpha * cost (costs are -ln p scaled e6, so this
      // IS P^alpha up to the shared normalizer); weights relative to
      // the cheapest for numeric stability
      .withColumn("w0", element_at(col("nb"), 1).getField("cost_e6"))
      .withColumn("wts", expr(
        s"transform(nb, s -> exp(-$alpha * (s.cost_e6 - w0) / 1e6))"))
      .withColumn("tot", expr("aggregate(wts, 0d, (a, x) -> a + x)"))
      .select(col("w"), col("nb"), col("wts"), col("tot"))
    val sampled = words.join(nb, Seq("w"))
      // deterministic uniform PER OCCURRENCE: every instance of a word
      // draws independently (hashing only the word would collapse an
      // epoch's diversity to one draw per word type)
      .withColumn("u",
        (Dedup.h60(concat_ws("|", lit(salt), col(idCol).cast("string"),
          col("pos").cast("string"), col("w"))) % lit(1000000L))
          .cast("double") / lit(1000000.0))
      // CDF walk: the first index where cumulative weight passes u·tot
      .withColumn("pick", expr(
        """aggregate(wts, struct(0d AS acc, -1 AS idx, 0 AS i),
          |  (s, x) -> struct(s.acc + x AS acc,
          |    CASE WHEN s.idx >= 0 THEN s.idx
          |         WHEN s.acc + x >= u * tot THEN s.i ELSE -1 END AS idx,
          |    s.i + 1 AS i),
          |  s -> CASE WHEN s.idx >= 0 THEN s.idx ELSE 0 END)""".stripMargin))
      .select(col(idCol), col("pos"),
        expr("element_at(nb, pick + 1).pieces").as("wpieces"))
    // left join: a doc whose every token was "" (or empty text) still
    // reports a row, with an empty piece stream like unigramEncode's
    docs.select(col(idCol)).join(
      sampled.groupBy(col(idCol))
        .agg(flatten(array_sort(collect_list(struct(col("pos"),
          col("wpieces")))).getField("wpieces")).as("pieces")),
      Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("pieces"), array().cast("array<string>")).as("pieces"))
  }

  /** Compression-ratio repetitiveness signal (the RefinedWeb/Dolma
    * boilerplate filter): ratio_e3 = 1000 · raw_bytes / deflated_bytes.
    * Natural prose lands around 2-3×; templated or repeated text
    * compresses much harder (high ratio = suspicious). Scale shape: a
    * narrow map — one native DEFLATE kernel per row, no shuffle, no
    * tokenization. `flagged` marks docs past `maxRatioE3`.
    */
  def compressionRatio(docs: DataFrame, maxRatioE3: Long = 4000L,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val raw = octet_length(col(textCol)).cast("long")
    val packed = graft.functions.BpeExpressions.deflateLen(col(textCol))
    docs.select(col(idCol), raw.as("raw_len"), packed.as("deflate_len"))
      // integer DIV: Column./ is double division and the signal must
      // stay engine-exact like every other quality rule here
      .withColumn("ratio_e3",
        expr("raw_len * 1000L DIV greatest(deflate_len, 1L)"))
      .withColumn("flagged", (col("ratio_e3") > maxRatioE3).cast("int"))
  }
}
