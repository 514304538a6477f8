package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Curation, Dedup, EvalMetrics, Graph, Similarity, Sketches, TextAnalysis}

/** Training-data pipeline queries (dedup / similarity / text analysis)
  * with DuckDB oracle SQL. Hashing is the shared 60-bit truncated md5 so
  * both engines compute identical integers; vector math is fixed-point
  * (see [[Similarity]]).
  */
object TrainingQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  /** Exact dedup groups by content hash. */
  def qDedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(docs(s, dir))
      .select("content_hash", "n_copies", "canonical_id")

  /** MinHash(8 hashes, 3-shingles) + LSH (4 bands of 2) candidate pairs. */
  def qDedupMinhash(s: SparkSession, dir: String): DataFrame = {
    val sig = Dedup.minhashSignatures(docs(s, dir), numHashes = 8, shingleN = 3)
    Dedup.lshCandidatePairs(sig, numHashes = 8, rowsPerBand = 2)
  }

  /** SimHash(32-bit) near-dup pairs: Hamming <= 2, blocked on the top 4
    * sketch bits so the candidate join is an equi-join (the scale path).
    */
  def qDedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Dedup.simhash(docs(s, dir)), maxHamming = 2, blockBits = 4)

  /** Word-trigram Jaccard pairs >= 0.3 via inverted-index join with
    * stop-gram pruning (df <= 2% of corpus): only discriminative shingles
    * join, keeping posting lists bounded at corpus scale.
    */
  def qDedupNgram(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(s, dir), n = 3, minJaccard = 0.3,
      maxDocFreqFraction = 0.02)

  /** Exact-substring duplication stats: 8-token rolling windows (the
    * Lee et al. 2022 method scaled to the synthetic corpus).
    */
  def qSubstringDup(s: SparkSession, dir: String): DataFrame =
    Dedup.substringDupStats(docs(s, dir), windowTokens = 8)

  /** Cross-corpus incremental dedup: docs 250+ are the "incoming batch",
    * docs 0-249 the already-ingested corpus; bipartite LSH candidates.
    */
  def qCrossDedup(s: SparkSession, dir: String): DataFrame = {
    val sig = Dedup.minhashSignatures(docs(s, dir), numHashes = 8, shingleN = 3)
    Dedup.lshCrossCorpusPairs(
      sig.filter(col("doc_id") >= 250), sig.filter(col("doc_id") < 250),
      numHashes = 8, rowsPerBand = 2)
  }

  /** Cross-source duplication matrix over 8-token windows. */
  def qSourceOverlap(s: SparkSession, dir: String): DataFrame =
    Dedup.sourceOverlapMatrix(docs(s, dir), windowTokens = 8)

  /** KMV-sketch vocabulary overlap between sources: per-source
    * 128-minimum-hash sketches of the distinct token sets, pairwise
    * union/intersection/Jaccard ESTIMATES from the k-row sketches alone
    * — the constant-space form of the exact q_source_overlap scan
    * (sketch once at ingest, answer pairwise questions forever).
    * Deterministic given h60, so the oracle replays the sketches and
    * the estimates bit for bit.
    */
  def qKmvOverlap(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Sketches
    val toks = docs(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    Sketches.kmvPairOverlap(
      Sketches.kmvSketch(toks, "source", "w", k = 128), "source", k = 128)
  }

  /** Shared-span removal: rebuild each doc without its cross-document
    * 8-token windows (the corpus-editing half of Lee et al. 2022).
    */
  def qDedupTrim(s: SparkSession, dir: String): DataFrame =
    Dedup.trimSharedSpans(docs(s, dir), windowTokens = 8)
      .select("doc_id", "n_tokens", "n_removed", "kept_text")

  /** Line-level (CCNet paragraph) dedup. The synthetic corpus has no
    * newlines, so the query first folds each doc into 12-token
    * pseudo-paragraph lines — pure array ops, reproduced verbatim in
    * the oracle — then drops every line appearing in >1 document. The
    * corpus carries exact-duplicate docs by construction, so dup-cluster
    * members lose all their (identical) lines while unique docs keep
    * theirs: both the drop and keep paths are exercised at scale.
    */
  def qLineDedup(s: SparkSession, dir: String): DataFrame = {
    val paras = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        array_join(
          transform(
            sequence(lit(0),
              ceil(size(col("w")) / lit(12.0)).cast("int") - 1),
            i => array_join(slice(col("w"), i * 12 + 1, lit(12)), " ")),
          "\n").as("text"))
    Dedup.lineDedup(paras, maxDocs = 1)
  }

  /** Leakage-free split: near-dup clusters (MinHash pairs → CC) land in
    * one split atomically; ~10% validation.
    */
  def qLeakageSplit(s: SparkSession, dir: String): DataFrame = {
    val clusters = Dedup.connectedComponents(qDedupMinhash(s, dir))
    Curation.leakageFreeSplit(docs(s, dir), clusters,
      validationPerMille = 100)
  }

  /** Winnowing fingerprints: 3-gram hashes, local minimum per window of
    * 4 consecutive grams (MOSS selection).
    */
  def qWinnow(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowFingerprints(docs(s, dir), n = 3, k = 4)

  /** Per-label embedding centroids in exact fixed-point sums. */
  def qLabelCentroids(s: SparkSession, dir: String): DataFrame =
    Similarity.labelCentroids(embs(s, dir))

  /** Brute-force cosine top-10 against vec_id=0. */
  def qKnnBrute(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineTopK(embs(s, dir), queryId = 0L, k = 10)

  /** Batch kNN JOIN: top-5 corpus neighbors for EVERY query in a set
    * (vec_id < 8) — one broadcast fan-out pass, per-query window.
    */
  def qKnnJoin(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.knnJoin(
      e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding")),
      e, k = 5)
  }

  /** DPR-style hard negatives (Karpukhin et al. 2020): each query
    * (vec_id < 8) retrieves its cosine top-20 shortlist, same-label
    * candidates drop as positives, and the top-5 survivors re-rank as
    * the training negatives.
    */
  def qHardNegatives(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.hardNegatives(
      e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("label"), col("embedding")),
      e, shortlist = 20, k = 5)
  }

  /** MMR diversified rerank (Carbonell & Goldstein 1998): greedy λ=0.7
    * relevance-vs-redundancy selection of 5 from vec 0's top-12
    * shortlist, in exact e6 integers.
    */
  def qMmr(s: SparkSession, dir: String): DataFrame =
    Similarity.mmrRerank(embs(s, dir), queryId = 0L, shortlist = 12, k = 5)

  /** Margin-based bitext mining over an even/odd split of the embedding
    * table standing in for two languages' sentence embeddings: each
    * even vector's best odd neighbor, scored by the Artetxe–Schwenk
    * ratio margin (cosine over the mean of both sides' 4-NN cosines)
    * and kept when the margin clears 1.0 — i.e. the pair is closer than
    * its neighborhoods' average, the hubness-robust mining criterion.
    */
  def qBitextMine(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    // auto-sized cells: bits = 0 (exact) below 1024 vectors/side, then
    // grows with the corpus — the oracle replays the same formula, so
    // the graded decades exercise the REAL scale path, not a pinned one
    Similarity.bitextMineAuto(
      e.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("src_id"), col("embedding")),
      e.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("tgt_id"), col("embedding")),
      k = 4, minMarginE6 = 1000000L)
  }

  /** Bloom-filter incremental dedup — the "seen before?" gate of a
    * crawl pipeline, where the history is too large to join and the
    * bloom is the only state carried forward. A 2^16-bit, 5-hash bloom
    * holds every document text; the probe batch asks about each even-id
    * doc's true text (definite members — the no-false-negative
    * guarantee) and each odd-id doc's text perturbed by one character
    * (non-members — false only at the designed false-positive rate,
    * which the oracle replays bit for bit).
    */
  def qBloomDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val bloom = Sketches.bloomBuild(d.select(col("text")), "text",
      mBits = 1 << 16, k = 5)
    val probes = d.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, col("text"))
        .otherwise(concat(col("text"), lit("~"))).as("text"))
    Sketches.bloomProbe(bloom, probes, "text", "doc_id",
      mBits = 1 << 16, k = 5)
  }

  /** Trained char-trigram language-ID: profiles from the even-id half's
    * labels classify the odd-id half (the supervised CLD/TextCat
    * pattern; set-overlap scoring, integer-exact).
    */
  def qLangidTrained(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val profiles = TextAnalysis.langProfiles(
      d.filter(col("doc_id") % 2 === 0), topN = 64)
    TextAnalysis.classifyByProfile(
      d.filter(col("doc_id") % 2 === 1), profiles, topN = 64)
  }

  /** Unigram-tokenizer SEED stage: top-50 substring pieces by weighted
    * corpus count — the oracle-checkable half of unigram training.
    */
  def qUnigramSeed(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramSeedTop(docs(s, dir), k = 50)

  /** Jelinek–Mercer interpolated LM score, λ = 0.7. */
  def qLmInterp(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmScoreInterpolated(docs(s, dir))

  /** Interpolated Kneser–Ney LM score, d = 0.75. */
  def qLmKneserNey(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmScoreKneserNey(docs(s, dir))

  /** At-rest LM count index: train on the %10!=9 split, persist the
    * four delta-count tables as TxLog tables, score the heldout tenth
    * AGAINST THE INDEX — zero corpus re-tokenization at serve, with the
    * unseen-bigram/unseen-word contract the self-trained scorer never
    * exercises ([[TextAnalysis.lmIndexWrite]]/[[TextAnalysis
    * .lmScoreOverIndex]]).
    */
  def qLmIndex(s: SparkSession, dir: String): DataFrame = {
    val index = cachedIndexFor(dir, "documents.parquet", "lmidx-v1") {
      tmp => TextAnalysis.lmIndexWrite(
        docs(s, dir).filter(col("doc_id") % 10 =!= 9), tmp)
    }
    TextAnalysis.lmScoreOverIndex(s, index,
      docs(s, dir).filter(col("doc_id") % 10 === 9))
  }

  /** Per-source dataset card: counts, mean quality, language spread,
    * exact-duplicate ratio.
    */
  def qSourceReport(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceReport(docs(s, dir))

  /** Deterministic 100-doc reservoir sample (salt "res8"). */
  def qReservoir(s: SparkSession, dir: String): DataFrame =
    Curation.reservoirSample(
      docs(s, dir).select(col("doc_id"), col("source")), k = 100,
      salt = "res8")

  /** Snapshot diff audit: "version A" drops every 7th doc, "version B"
    * drops every 5th and edits every 3rd — the diff must label exactly
    * the adds, removes, and changes (and say nothing about the rest).
    * In production the two sides are [[graft.lake.TxLog.readAt]] time
    * travel snapshots (LakeSpec pins that path).
    */
  def qCorpusDiff(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val a = d.filter(col("doc_id") % 7 =!= 0)
    val b = d.filter(col("doc_id") % 5 =!= 0)
      .withColumn("text", when(col("doc_id") % 3 === 0,
        concat(col("text"), lit("X"))).otherwise(col("text")))
    Curation.corpusDiff(a, b)
  }

  /** IVF-style bucketed ANN: top-5 within the query's sign-bit cell. */
  def qKnnIvf(s: SparkSession, dir: String): DataFrame =
    Similarity.annBucketed(embs(s, dir), queryId = 0L, k = 5, bits = 3)

  /** Trained IVF (seed-pinned k-means) with nProbe = nCells: probing
    * every cell degenerates to exact search, so the production ANN path
    * is oracle-checkable against plain brute-force cosine — the
    * full-probe == brute-force property verified end-to-end, not just
    * spec-pinned. Cell ids are centroid assignments (not
    * SQL-expressible) and are dropped from the output.
    */
  def qKnnIvfTrained(s: SparkSession, dir: String): DataFrame =
    Similarity.annIvfTrained(embs(s, dir), queryId = 0L, k = 10,
      nCells = 4, nProbe = 4)
      .select("vec_id", "cosine_r")

  /** PQ top-10 by asymmetric distance: 4 subspaces × 16 dims, 8-code
    * books (2 Lloyd rounds), query vec_id=0 — the full
    * train→encode→ADC pipeline, integer-deterministic so the oracle
    * replays all four codebook trajectories and the table-lookup sum.
    */
  def qPqAdc(s: SparkSession, dir: String): DataFrame =
    Similarity.pqTopK(embs(s, dir), queryId = 0L, k = 10,
      m = 4, ksub = 8, iters = 2)

  /** IVF-PQ top-10: 4 coarse Lloyd cells, residual product quantization
    * (4 subspaces × 8 codes, 2 rounds), nProbe=2 — the FAISS index
    * shape, integer-deterministic, so the oracle replays the coarse
    * chain, all four residual codebook chains, the probe selection,
    * and the per-cell ADC lookup sum.
    */
  def qIvfPqAdc(s: SparkSession, dir: String): DataFrame =
    Similarity.annIvfPq(embs(s, dir), queryId = 0L, k = 10,
      nCells = 4, nProbe = 2, m = 4, ksub = 8, iters = 2)

  /** Two-stage IVF-PQ: 40-candidate ADC shortlist, exact-cosine top-10
    * re-rank — the production serving pattern, oracle-replayed end to
    * end on the shared IVF-PQ CTE chain.
    */
  def qIvfPqRerank(s: SparkSession, dir: String): DataFrame =
    Similarity.annIvfPqRerank(embs(s, dir), queryId = 0L, k = 10,
      shortlist = 40, nCells = 4, nProbe = 2, m = 4, ksub = 8, iters = 2)

  /** IVF-PQ top-10 served from the AT-REST index
    * ([[graft.ops.Similarity.ivfPqIndexWrite]] →
    * [[graft.ops.Similarity.ivfPqTopKOverIndex]]): the corpus is
    * touched only to build the index (once per testdata fingerprint —
    * reused across runs) and to fetch the query's own vector; the
    * search itself reads the stats-pruned coded table + the
    * codebooks. Same params as q_ivfpq_adc, and row-identical to it by
    * construction — the oracle replays the same trajectory.
    */
  def qIvfPqIndex(s: SparkSession, dir: String): DataFrame = {
    val index = ivfPqIndexFor(s, dir)
    val q = embs(s, dir).filter(col("vec_id") === 0L)
      .select(Similarity.quantize(col("embedding")).as("qe"))
      .head().getSeq[Long](0)
    Similarity.ivfPqTopKOverIndex(s, index, q, k = 10, nProbe = 2,
      excludeId = 0L)
  }

  /** Build-or-reuse an at-rest index for `dir`'s `srcTable`, keyed by a
    * fingerprint of the source parquet files (name, size, mtime) so a
    * regenerated testdata set can never serve a stale index. Crash-safe
    * publish: a killed run must never leave a half-index at the cached
    * path (rebuilding over a partial table would duplicate rows) — the
    * build lands in a scratch dir and ONE atomic rename publishes it;
    * a concurrent publisher's identical index wins the race harmlessly.
    */
  private val idxBuildLock = new Object
  private def cachedIndexFor(dir: String, srcTable: String, tag: String)
                            (build: String => Unit): String = {
    import scala.jdk.CollectionConverters._
    val src = java.nio.file.Paths.get(dir, srcTable)
    val fp = {
      val md = java.security.MessageDigest.getInstance("MD5")
      // the table may be one parquet file or a directory of parts
      val parts =
        if (java.nio.file.Files.isDirectory(src))
          scala.util.Using.resource(java.nio.file.Files.list(src))(
            _.iterator().asScala.toSeq.sortBy(_.toString))
        else Seq(src)
      parts.foreach { p =>
        md.update((p.toString + ":" +
          java.nio.file.Files.size(p) + ":" +
          java.nio.file.Files.getLastModifiedTime(p).toMillis + "\n")
          .getBytes("UTF-8"))
      }
      md.digest().take(6).map(b => f"$b%02x").mkString
    }
    val root = s"${sys.props("java.io.tmpdir")}/graft-$tag-$fp"
    idxBuildLock.synchronized {
      if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(root))) {
        val tmp = java.nio.file.Paths.get(
          s"$root.build.${java.util.UUID.randomUUID().toString.take(8)}")
        build(tmp.toString)
        try java.nio.file.Files.move(tmp, java.nio.file.Paths.get(root),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          // a concurrent JVM published first: rename onto the existing
          // target surfaces as EEXIST on some filesystems and ENOTEMPTY
          // (DirectoryNotEmptyException) on Linux rename(2) — either
          // way the winner's identical index stands and ours drops
          case _: java.nio.file.FileAlreadyExistsException =>
            org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
          case _: java.nio.file.DirectoryNotEmptyException =>
            org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
        }
      }
    }
    root
  }

  private def ivfPqIndexFor(s: SparkSession, dir: String): String =
    cachedIndexFor(dir, "embeddings.parquet", "ivfpq-v1") { tmp =>
      Similarity.ivfPqIndexWrite(embs(s, dir), tmp,
        nCells = 4, m = 4, ksub = 8, iters = 2)
    }

  /** Per-document statistics. */
  def qTextStats(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.stats(docs(s, dir))
      .select("doc_id", "n_chars_m", "n_tokens", "n_punct", "n_stopwords",
        "avg_token_len_e2")

  /** Language-ID by marker voting. */
  def qLangId(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.languageId(docs(s, dir))
      .select("doc_id", "lang", "score_en", "score_de", "predicted_lang")

  /** Quality scoring + keep decision. */
  def qQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(docs(s, dir))
      .select(col("doc_id"), col("n_tokens"), col("quality"),
        col("keep").cast("int").as("keep"))

  /** Min-hash fingerprints over 3-shingles. */
  def qFingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(docs(s, dir))
      .select("doc_id", "fp_min", "fp_max", "fp_first", "n_shingles")

  /** Subword (BPE-proxy) token counts. */
  def qSubwordTokens(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.subwordTokenCount(docs(s, dir))
      .select("doc_id", "n_subword_tokens")

  /** Corpus-trained bigram LM score (avg conditional probability ×1e6). */
  def qLmScore(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmScore(docs(s, dir))
      .select("doc_id", "n_bigrams", "lm_score_e6")

  /** Rare-token rate: corpus share below 1% marks a token rare. */
  def qOovRate(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.oovRate(docs(s, dir), rareShareDenom = 100L)
      .select("doc_id", "n_tokens", "n_rare", "rare_rate_e6")

  /** Hashing-trick 64-dim signed bag-of-words features, long form. */
  def qFeatureHash(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.featureHash(docs(s, dir), dims = 64)
      .select("doc_id", "bucket", "feat")

  /** Stage-zero normalization to the corpus contract. */
  def qNormalize(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.normalize(docs(s, dir))
      .select("doc_id", "norm_text", "n_tokens_norm")

  /** End-to-end curation pipeline — the ops composed the way a real
    * training-data build runs them: (1) cut cross-document 8-token
    * spans, (2) keep only docs that retained at least half their
    * tokens (a doc that kept exactly half survives; mostly-boilerplate
    * docs below that are dropped), (3) exact-dedup the REBUILT text
    * (trimming different originals can converge on identical
    * survivors), keeping the min-id canonical — the [[Dedup.exactGroups]]
    * hash-aggregate, fused inline so the canonical token count rides
    * the same aggregate instead of joining back (a second consumer of
    * the trim output would recompute the whole trim DAG), (4) assign
    * the canonical survivors to train/validation by salted hash (100‰
    * validation). This query pins the composition.
    */
  def qCuratePipeline(s: SparkSession, dir: String): DataFrame = {
    val trimmed = Dedup.trimSharedSpans(docs(s, dir), windowTokens = 8)
    // kept >= half implies kept >= 1 (n_tokens is never 0: split always
    // returns at least one token), so no separate non-empty conjunct
    val filt = trimmed
      .filter((col("n_tokens") - col("n_removed")) * 2 >= col("n_tokens"))
      .select(col("doc_id"), col("kept_text").as("text"))
    // one aggregate does the [[Dedup.exactGroups]] job AND carries the
    // canonical token count: every group member has identical text, so
    // min(token count) IS the count — folding it here avoids a join
    // back to `filt` whose second consumer would recompute the whole
    // trim DAG a second time
    filt
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(
        min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("n_copies"),
        min(size(Dedup.tokens(col("text")))).cast("long").as("n_kept"))
      .select(
        col("doc_id"), col("n_kept"), col("n_copies"),
        Curation.splitLabel(col("doc_id"), validationPerMille = 100)
          .as("split"))
  }

  /** Asymmetric containment pairs: the quote/near-subset detector —
    * pairs where ≥ 50% of one side's distinct trigrams live inside the
    * other, both directions carried on one row ([[Dedup.containmentPairs]];
    * same df-pruned gram space as q_dedup_ngram).
    */
  def qContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(docs(s, dir), n = 3, minContainE6 = 500000L,
      maxDocFreqFraction = 0.02)

  /** EXACT complete trigram-Jaccard >= 0.35 pairs via the lossless
    * prefix filter ([[Dedup.prefixFilteredJaccard]]) — the oracle
    * replays the brute-force definition, so a green row proves no pair
    * was lost to the filter.
    */
  def qPpjoin(s: SparkSession, dir: String): DataFrame =
    Dedup.prefixFilteredJaccard(docs(s, dir), n = 3, tauE6 = 350000L)

  /** Pairs -> clusters: connected components over the MinHash candidate
    * pairs, canonical doc = min cluster member.
    */
  def qDedupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(qDedupMinhash(s, dir))

  /** Integer-exact TF-IDF top-3 terms per document. */
  def qTfIdf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfIdfTopTerms(docs(s, dir), k = 3)

  /** Integer-exact Okapi BM25 top-10 for a 3-term query. */
  def qBm25(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25Rank(docs(s, dir),
      terms = Seq("spark", "merge", "window"), k = 10)

  /** BM25 top-10 served from the SEGMENTED at-rest index (the Lucene
    * model — [[graft.ops.TextAnalysis.bm25SegmentsWrite]] →
    * [[graft.ops.TextAnalysis.bm25TopKOverSegments]]): raw-count
    * postings + per-segment stats + the live table, corpus never
    * touched at query time. A single-segment all-live index scores
    * bit-identically to the from-scratch [[qBm25]], so the oracle is
    * the same replay.
    */
  def qBm25Segmented(s: SparkSession, dir: String): DataFrame = {
    val index = cachedIndexFor(dir, "documents.parquet", "bm25seg-v1") {
      tmp => TextAnalysis.bm25SegmentsWrite(docs(s, dir), tmp)
    }
    TextAnalysis.bm25TopKOverSegments(s, index,
      terms = Seq("spark", "merge", "window"), k = 10)
  }

  /** Block-max pruned BM25 top-10 over 8 doc-hash blocks: the two-pass
    * batch WAND whose output the oracle replays block by block —
    * bounds, phase-1 prefix, tau, phase-2 survivors, and the scan
    * diagnostics — not just the final ranking.
    */
  def qBlockmaxTopk(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25BlockMaxTopK(docs(s, dir),
      terms = Seq("spark", "merge", "window"), k = 10, blocks = 8)

  /** At-rest block-max retrieval: build the impact-ordered index
    * (postings partitioned by block + per-(term, block) maxima) in a
    * scratch dir, then answer the top-k WITHOUT touching the corpus —
    * the faithful design where the pruning metadata is index structure,
    * not per-query derivation. Row-identical to q_blockmax_topk, so
    * the oracle replays the same SQL.
    */
  def qBlockmaxIndex(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-bmx")
    try {
      TextAnalysis.bm25IndexWrite(docs(s, dir), root.toString, blocks = 8)
      // the result is a local k-row table (TakeOrdered contract), so
      // deleting the scratch index afterwards is safe
      TextAnalysis.bm25TopKOverIndex(s, root.toString,
        terms = Seq("spark", "merge", "window"), k = 10)
    } finally {
      Fs.deleteRecursively(root)
    }
  }

  /** Simpson collision-index repetition filter, with char-run padding
    * planted on doc_id % 23 so the keep flag actually bites (natural
    * corpus collision tops out ~0.10; the threshold is 0.12).
    */
  def qCharDiversity(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.charDiversity(
      docs(s, dir).withColumn("text",
        when(col("doc_id") % 23 === 0,
          concat(col("text"), lit(" " + "z" * 400)))
          .otherwise(col("text"))))

  /** 4-block inverted index over the corpus: per (term, block) posting
    * stats, varint byte sizing, and the order-sensitive gap checksum.
    */
  def qPostings(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.invertedIndex(docs(s, dir), blocks = 4)

  /** Perceptual-hash near-dup pairs over a media table planted with
    * one-byte-edited copies (doc%9, media_id+10000) and exact clones
    * (doc%27, media_id+20000) — the oracle recomputes every blob's
    * block-mean hash from character codes (ASCII corpus: byte == char)
    * and replays the banded join.
    */
  def qPhashPairs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val base = d.select(col("doc_id").as("media_id"),
      col("text").as("payload"))
    val edited = d.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 10000L).as("media_id"),
        concat(expr("substring(text, 1, length(text) - 1)"), lit("~"))
          .as("payload"))
    val clones = d.filter(col("doc_id") % 27 === 0)
      .select((col("doc_id") + 20000L).as("media_id"),
        col("text").as("payload"))
    val media = graft.ops.Multimodal.asMediaTable(
      base.union(edited).union(clones), "media_id", "payload",
      modality = "image", format = "png")
    graft.ops.Multimodal.phashNearDupPairs(media)
  }

  /** Exact dedup AFTER NFC normalization, over a corpus planted with
    * precomposed/decomposed twins (codepoints constructed explicitly
    * on both sides — no source-encoding ambiguity): the twins collapse
    * to n_copies=2 groups only because NFC canonicalizes them.
    */
  def qNfcDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // one row precomposed-é + decomposed-Å, its twin the other way
    // around — NFC must compose BOTH rows to the same " café Å" tail
    val pre = d.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), concat(col("text"),
        lit(" caf\u00e9 A\u030a")).as("t"))
    val dec = d.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 10000L).as("doc_id"), concat(col("text"),
        lit(" cafe\u0301 \u00c5")).as("t"))
    val rest = d.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), col("text").as("t"))
    pre.union(dec).union(rest)
      .select(col("doc_id"),
        graft.functions.UnicodeExpressions.nfc(col("t")).as("nt"))
      .groupBy(Dedup.h60(col("nt")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_id"))
  }

  /** FIM PSM reordering over the corpus: cut points + the PSM stream
    * hash; the oracle rebuilds the exact string.
    */
  def qFim(s: SparkSession, dir: String): DataFrame =
    Curation.fimTransform(docs(s, dir))
      .select(col("doc_id"), col("n_tokens"), col("cut1"), col("cut2"),
        Dedup.h60(col("psm_text")).as("psm_h"))

  /** CCNet head/middle/tail tertiles per language by bigram LM score. */
  def qCcnetBuckets(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.ccnetBuckets(docs(s, dir))

  /** T5 span corruption over the corpus: per-doc token/block/mask
    * counts plus hashes of the built input/target strings — the oracle
    * rebuilds both strings block by block.
    */
  def qSpanCorrupt(s: SparkSession, dir: String): DataFrame =
    Curation.spanCorrupt(docs(s, dir))
      .select(col("doc_id"), col("n_tokens"), col("n_blocks"),
        col("n_masked"),
        Dedup.h60(col("input_text")).as("input_h"),
        Dedup.h60(col("target_text")).as("target_h"))

  /** PageRank over a deterministic synthetic link graph (each doc links
    * to `(doc_id·31 + j·7 + 1) mod N` for j=1..3 — ids are contiguous
    * 0..N−1, so every target exists). 5 integer-exact e12 rounds; the
    * oracle unrolls the same trajectory.
    */
  def qPagerank(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val n = d.count()
    val edges = d
      .select(col("doc_id").as("src"),
        explode(sequence(lit(1), lit(3))).as("j"))
      .select(col("src"),
        ((col("src") * 31 + col("j") * 7 + 1) % n).as("dst"))
    Graph.pageRank(edges, iters = 5)
      .select(col("v").as("node"), col("r").as("rank_e12"))
  }

  /** TextRank keywords: 5 integer-exact PageRank rounds over the
    * adjacent-token co-occurrence graph, top-20 by centrality
    * ([[TextAnalysis.textRankKeywords]]).
    */
  def qTextrank(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.textRankKeywords(docs(s, dir), iters = 5, k = 20)

  /** Deterministic hash-threshold stratified sample by language. */
  def qStratifiedSample(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.stratifiedSample(docs(s, dir), "lang",
      rates = Map("en" -> 0.2, "de" -> 0.5), defaultRate = 0.8)
      .select("doc_id", "lang")

  /** PII redaction over the corpus: plant one email + one IPv4 per doc
    * (synthetic corpus has none), redact, and verify counts AND the
    * redacted text itself (xor of 60-bit hashes) per source — the
    * replacement semantics are oracle-checked, not just the counts.
    */
  def qRedact(s: SparkSession, dir: String): DataFrame = {
    val planted = docs(s, dir).withColumn("text2",
      concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com from 10.0."),
        col("doc_id") % 256, lit(".7")))
    TextAnalysis.redactPii(planted, "text2")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_emails")).as("n_emails_sum"),
        sum(col("n_ips")).as("n_ips_sum"),
        expr("bit_xor(cast(" +
          "conv(substring(md5(cast(redacted as binary)),1,15),16,10)" +
          " as bigint))").as("xor_redacted"))
  }

  /** Benchmark decontamination: docs with doc_id % 97 == 0 stand in as
    * the held-out benchmark; every other doc is flagged when it shares a
    * word 3-gram with any of them.
    */
  def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Curation.contamination(
      d.filter(col("doc_id") % 97 =!= 0),
      d.filter(col("doc_id") % 97 === 0),
      n = 3, minOverlap = 1)
  }

  /** Multi-benchmark sweep in one corpus scan: docs %97 and %89 stand in
    * for two held-out eval sets; every remaining doc gets a per-benchmark
    * hit count and flag from the single tagged broadcast join.
    */
  def qDecontaminateMulti(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Curation.contaminationMulti(
      d.filter(col("doc_id") % 97 =!= 0 && col("doc_id") % 89 =!= 0),
      Seq(
        "bench_a" -> d.filter(col("doc_id") % 97 === 0),
        "bench_b" -> d.filter(col("doc_id") % 89 === 0)),
      n = 3, minOverlap = 1)
  }

  /** Per-domain quota: at most 10 docs per source, hash-ranked. */
  def qDomainCap(s: SparkSession, dir: String): DataFrame =
    Curation.domainCapSample(docs(s, dir), "source", maxPerDomain = 10)
      .select("doc_id", "source", "sample_rank")

  /** Within-document repetition / boilerplate score. */
  def qRepetition(s: SparkSession, dir: String): DataFrame =
    Curation.repetitionStats(docs(s, dir))
      .select("doc_id", "n_tokens", "n_distinct_tokens", "top_token_freq",
        "ttr_e4")

  /** Quality + token count per doc — shared input of the canonical /
    * budget queries.
    */
  private def scoredDocs(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(docs(s, dir))
      .select(col("doc_id"), col("quality"), col("n_tokens"))

  /** Dedup epilogue: canonical member per MinHash duplicate cluster —
    * best quality wins, ties to the smallest id; reports reclaimable
    * tokens per cluster.
    */
  def qKeepCanonical(s: SparkSession, dir: String): DataFrame =
    Curation.canonicalPerCluster(qDedupClusters(s, dir), scoredDocs(s, dir))
      .select("cluster", "canonical_id", "canonical_quality", "n_members",
        "tokens_dropped")

  /** Global 10k-token training budget, best-quality-first, resolved on
    * (quality, hash-bucket) cells — no corpus-wide window.
    */
  def qTokenBudget(s: SparkSession, dir: String): DataFrame =
    Curation.tokenBudgetSample(scoredDocs(s, dir), budgetTokens = 10000L,
      nBuckets = 16)

  /** Per-source mixture weights toward targets proportional to
    * (source_number mod 3)+1 — integer-exact share/weight math.
    */
  def qMixWeights(s: SparkSession, dir: String): DataFrame =
    Curation.mixtureWeights(docs(s, dir), "source",
      targetUnits = expr("cast(substring(source, 4) as bigint) % 3 + 1"))

  /** Concat-and-chunk packing into 256-token sequences over 8 streams. */
  def qPackSequences(s: SparkSession, dir: String): DataFrame =
    Curation.packSequences(docs(s, dir), seqLen = 256, nStreams = 8)

  /** Deterministic global shuffle order, 16 hash-prefix buckets. */
  def qShuffleRank(s: SparkSession, dir: String): DataFrame =
    Curation.shuffleRank(docs(s, dir), nBuckets = 16)
      .select(col("doc_id"), col("shuffle_pos").cast("long").as("shuffle_pos"))

  /** Top-50 adjacent word pairs (the BPE merge-choice statistic). */
  def qVocabBigrams(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.topBigrams(docs(s, dir), k = 50)
      .select(col("rank"), col("pair"), col("n_occurrences"))

  /** Int8 symmetric quantization, verified via integer-exact per-vector
    * aggregates of the quantized values.
    */
  def qQuantizeEmbed(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(embs(s, dir))
      .select(
        col("vec_id"), col("label"),
        col("amax").cast("double").as("amax_d"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
        aggregate(col("q"), lit(0L), (a, x) => a + abs(x)).as("q_l1"))

  /** Sparse sign random projection of the 64-dim embeddings onto 16
    * hash-derived axes, flattened to (vec_id, axis, coordinate) rows —
    * the oracle rebuilds the LCG sign matrix from the indices and
    * re-sums the exact integer coordinates.
    */
  def qRandProj(s: SparkSession, dir: String): DataFrame =
    Similarity.randomProjection(embs(s, dir), outDims = 16)
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "proj")))
      .select(col("vec_id"), col("j").cast("long").as("j"), col("proj"))

  /** 16-token chunks with 4-token overlap (stride 12). */
  def qChunkOverlap(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkDocuments(docs(s, dir), chunkTokens = 16,
      overlapTokens = 4)

  /** Gopher-rule within-doc duplicated 3-gram coverage per document. */
  def qDupNgramCov(s: SparkSession, dir: String): DataFrame =
    Curation.dupNgramCoverage(docs(s, dir), n = 3)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("n_grams"), col("top_gram_freq"), col("dup_cov_e4"))

  /** Quality-weighted deterministic sampling: P(keep) = quality / 4
    * (quality 0..4 → acceptance 0/2500/5000/7500/10000 per 1e4).
    */
  def qWeightedSample(s: SparkSession, dir: String): DataFrame =
    Curation.weightedSample(
      scoredDocs(s, dir).select(col("doc_id"), col("quality")),
      weightE4 = col("quality").cast("long") * 2500L)
      .select(col("doc_id"), col("quality"), col("draw_e4"))

  /** Per-source 3-gram diversity (corpus-health / templated-text
    * detector).
    */
  def qNgramDiversity(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.ngramDiversity(docs(s, dir), n = 3)
      .select("source", "n_grams", "n_distinct_grams", "n_singleton_grams",
        "diversity_e4")

  /** Temperature-scaled (alpha = 0.5) per-source sampling weights. */
  def qTemperatureMix(s: SparkSession, dir: String): DataFrame =
    Curation.temperatureMixture(docs(s, dir), "source")
      .select("source", "n_docs", "n_tokens", "isqrt_tokens", "share_e6",
        "weight_e6")

  /** MinHash LSH candidates verified by exact shingle-set Jaccard
    * (≥ 0.3) — the false-positive-removing second half of the minhash
    * pipeline.
    */
  def qMinhashVerified(s: SparkSession, dir: String): DataFrame =
    Dedup.lshVerifiedPairs(docs(s, dir), numHashes = 8, rowsPerBand = 2,
      shingleN = 3, minJaccardE4 = 3000L)

  /** Luhn-validated card-number redaction over synthesized digit runs
    * (every third doc gets a 16-digit number derived from its id, so
    * both the valid- and invalid-checksum branches execute).
    */
  def qLuhnRedact(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.luhnRedact(
      docs(s, dir).withColumn("text",
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" "),
            lpad((col("doc_id") * 7919 % 1000000000).cast("string"), 16, "4")))
          .otherwise(col("text"))))
      .select(col("doc_id"), col("n_card_numbers"), col("redacted_cards"))

  /** Domain blocklist gate: drop three blocked sources via broadcast
    * anti-join.
    */
  def qBlocklist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blocked = Seq("src0", "src7", "src14").toDF("domain")
    Curation.blocklistFilter(docs(s, dir), blocked)
      .select(col("doc_id"), col("source"))
  }

  /** Four-signal keep/reject audit: quality rules, corpus-LM fluency,
    * rare-token rate, repetition coverage — first failing rule wins.
    * Thresholds chosen so every rule fires on the synthetic corpus.
    */
  def qQualityEnsemble(s: SparkSession, dir: String): DataFrame =
    Curation.qualityEnsemble(docs(s, dir), minQuality = 3,
      minLmE6 = 34000L, maxRareE6 = 20000L, maxDupCovE4 = 500L)

  /** Vocabulary coverage at top-10/100/1000 terms. */
  def qVocabCoverage(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabCoverage(docs(s, dir), ns = Seq(10, 100, 1000))

  /** Relational Lloyd k-means (k=4, 2 update rounds) — the full
    * trajectory is integer-exact, so the oracle replays every iteration.
    */
  def qKmeansAssign(s: SparkSession, dir: String): DataFrame =
    Similarity.kmeansAssign(embs(s, dir), k = 4, iters = 2)

  /** SemDeDup: within-k-means-cluster cosine near-dup drop (>= 0.4). */
  def qSemDedup(s: SparkSession, dir: String): DataFrame =
    Similarity.semDedup(embs(s, dir), k = 4, iters = 2, minCosine = 0.4)

  /** Cluster-balanced sampling: <= 80 vectors kept per k-means cluster. */
  def qClusterBalance(s: SparkSession, dir: String): DataFrame =
    Similarity.clusterBalancedSample(embs(s, dir), k = 4, iters = 2,
      maxPerCluster = 80)

  /** DSIR-style importance weight against the src1 slice as target. */
  def qImportanceWeight(s: SparkSession, dir: String): DataFrame =
    Curation.importanceWeight(docs(s, dir), col("source") === "src1")

  /** BPE tokenizer training: 4 greedy merge rounds over the corpus. */
  def qBpeMerges(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeTrainMerges(docs(s, dir), nMerges = 4)

  /** WordPiece likelihood-ratio merge training, 4 rounds. */
  def qWpMerges(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.wordpieceTrainMerges(docs(s, dir), nMerges = 4)

  /** Top-20 PMI collocations, min pair count 3. */
  def qPmi(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.pmiCollocations(docs(s, dir), k = 20)

  /** Positional-postings phrase query for "data table". */
  def qPhraseQuery(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.phraseQueryViaIndex(docs(s, dir), Seq("data", "table"))

  private def accented(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("text2", concat(col("text"), lit(ByteTail)))

  /** BYTE-level (GPT-2) BPE merge training over the accent-planted
    * corpus — same round chain as q_bpe_merges with byte symbolization;
    * the é-run makes the byte pairs (Ã,©)/(©,Ã) the top merges, so the
    * gate itself proves the bytes.
    */
  def qBbpeMerges(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeTrainMerges(accented(s, dir), nMerges = 4,
      textCol = "text2", byteLevel = true)

  /** Byte-level train + encode, same per-doc stream stats as
    * q_bpe_encode.
    */
  def qBbpeEncode(s: SparkSession, dir: String): DataFrame = {
    val d = accented(s, dir)
    val merges = TextAnalysis.bpeTrainMerges(d, nMerges = 4,
      textCol = "text2", byteLevel = true)
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    TextAnalysis.bpeEncode(d, merges, textCol = "text2", byteLevel = true)
      .select(col("doc_id"),
        size(col("tokens")).cast("long").as("n_tokens"),
        size(filter(col("tokens"), t => t.contains(" "))).cast("long")
          .as("n_merged"),
        aggregate(transform(col("tokens"), t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).as("total_len"))
  }

  /** Train 4 merges, then ENCODE the corpus with them (the native
    * broadcast-merge-table narrow map) and emit per-doc stream stats:
    * token count, merged-symbol count, total symbol length. The oracle
    * replays train + encode as one CTE chain — its round-4 stream IS
    * the encoded corpus.
    */
  def qBpeEncode(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val merges = TextAnalysis.bpeTrainMerges(d, nMerges = 4)
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    bpeEncodeStats(TextAnalysis.bpeEncode(d, merges))
  }

  /** The per-doc stream stats both BPE-encode queries emit — ONE
    * definition so the documented row-identity between q_bpe_encode and
    * q_bpe_index cannot drift (the Spark twin of the shared
    * bpeEncodeOracle).
    */
  private def bpeEncodeStats(encoded: DataFrame): DataFrame =
    encoded
      .select(col("doc_id"),
        size(col("tokens")).cast("long").as("n_tokens"),
        size(filter(col("tokens"), t => t.contains(" "))).cast("long")
          .as("n_merged"),
        aggregate(transform(col("tokens"), t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).as("total_len"))

  /** At-rest tokenizer artifact: the 4 trained merges persisted as a
    * TxLog table, the corpus encoded AGAINST THE TABLE
    * ([[TextAnalysis.bpeMergesWrite]]/[[TextAnalysis
    * .bpeEncodeOverIndex]]) — row-identical to q_bpe_encode's in-query
    * training, which is exactly what the shared oracle pins.
    */
  def qBpeIndex(s: SparkSession, dir: String): DataFrame = {
    val index = cachedIndexFor(dir, "documents.parquet", "bpetok-v1") {
      tmp => TextAnalysis.bpeMergesWrite(
        TextAnalysis.bpeTrainMerges(docs(s, dir), nMerges = 4), tmp)
    }
    bpeEncodeStats(TextAnalysis.bpeEncodeOverIndex(s, index, docs(s, dir)))
  }

  /** Deterministic bootstrap 95% CI over a fixed 200-doc eval slice
    * (metric = text length): 200 hash-resampled replicates, percentile
    * bounds — every draw replayed by the oracle
    * ([[Curation.bootstrapCI]]).
    */
  def qBootstrapCI(s: SparkSession, dir: String): DataFrame =
    Curation.bootstrapCI(
      docs(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"), length(col("text")).as("score")),
      "score", nBoot = 200)

  /** The eval-pair fixture shared by the ROUGE/BLEU queries: even docs
    * are references, the following odd doc the candidate — real text on
    * both sides with partial vocabulary overlap, deterministic pairing.
    */
  private def evalPairs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val ref = d.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") / 2).cast("long").as("pair_id"),
        col("text").as("ref"))
    val cand = d.filter(col("doc_id") % 2 === 1)
      .select(((col("doc_id") - 1) / 2).cast("long").as("pair_id"),
        col("text").as("cand"))
    ref.join(cand, "pair_id")
  }

  /** ROUGE-2 per eval pair: clipped bigram matches and e6 P/R/F1 from
    * the per-pair overlap kernel ([[graft.ops.EvalMetrics.rougeN]]) —
    * the whole metric sweep is one shuffle-free map over the pairs.
    */
  def qRougeBigram(s: SparkSession, dir: String): DataFrame =
    EvalMetrics.rougeN(evalPairs(s, dir), n = 2)

  /** Integer-exact BLEU components per eval pair: clipped 1..4-gram
    * matches, totals, brevity deficit, and the e6 precision product
    * ([[graft.ops.EvalMetrics.bleuCounts]]).
    */
  def qBleu(s: SparkSession, dir: String): DataFrame =
    EvalMetrics.bleuCounts(evalPairs(s, dir))

  /** pass@4 per 8-sample problem (doc octets; "correct" = the same
    * deterministic score the preference fixtures use crossing its
    * midpoint) — the unbiased estimator, exact in e6
    * ([[graft.ops.EvalMetrics.passAtK]]).
    */
  def qPassAtK(s: SparkSession, dir: String): DataFrame =
    EvalMetrics.passAtK(
      docs(s, dir).select(
        (col("doc_id") / 8).cast("long").as("problem_id"),
        (length(col("text")) % 97 > 48).as("correct")),
      k = 4)

  /** Bradley-Terry strengths of the four response slots from every
    * prompt quartet's pairwise score comparisons, 3 fixed-point MM
    * rounds ([[graft.ops.EvalMetrics.bradleyTerry]]) — the wins
    * aggregation is the corpus-scale pass; the fit runs on the
    * 4-player matrix.
    */
  def qBradleyTerry(s: SparkSession, dir: String): DataFrame = {
    val resp = docs(s, dir).select(
      (col("doc_id") / 4).cast("long").as("prompt_id"),
      (col("doc_id") % 4).as("resp_id"),
      (length(col("text")) % 97).cast("long").as("score"))
    // per-prompt pair generation IN-ROW: one aggregate collects the
    // (at most 4) responses of a prompt and the ordered pairs explode
    // from the row — the corpus is shuffled ONCE on prompt_id instead
    // of twice through a self-join (same (i,j,n,wi) matrix, pair for
    // pair: the quartet is bounded so the in-row fan-out is 16 structs)
    val pairs = resp.groupBy(col("prompt_id"))
      .agg(collect_list(struct(col("resp_id").as("r"),
        col("score").as("s"))).as("rs"))
      .select(explode(expr(
        """filter(
          |  flatten(transform(rs, x -> transform(rs, y ->
          |    struct(x.r AS i, y.r AS j, x.s AS si, y.s AS sj)))),
          |  p -> p.i < p.j AND p.si != p.sj)""".stripMargin)).as("p"))
    val games = pairs
      .groupBy(col("p.i").as("i"), col("p.j").as("j"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("p.si") > col("p.sj"), 1L).otherwise(0L)).as("wi"))
    EvalMetrics.bradleyTerry(games, iters = 3)
  }

  /** Exact tie-aware AUC of a deterministic score/label pair over the
    * corpus ([[graft.ops.EvalMetrics.aucExact]]) — the corpus collapses
    * to <= 97 per-score rows in one aggregate.
    */
  def qAuc(s: SparkSession, dir: String): DataFrame =
    EvalMetrics.aucExact(docs(s, dir).select(
      (col("n_chars") % 97).cast("long").as("score"),
      (col("n_chars") % 89 > 44).as("label")))

  /** Reliability bins + exact ECE for a deterministic e6 confidence
    * and its >= 0.5 decision ([[graft.ops.EvalMetrics.calibrationBins]]).
    */
  def qCalibration(s: SparkSession, dir: String): DataFrame =
    EvalMetrics.calibrationBins(docs(s, dir).select(
      expr("(n_chars % 101) * 1000000L DIV 100").as("conf_e6"),
      ((col("n_chars") % 101 >= 50) === (col("n_chars") % 89 > 44))
        .as("correct")))

  /** Kendall tau-a between the quality score and a second deterministic
    * signal ([[graft.ops.EvalMetrics.kendallTauA]]) — the two-scorer
    * agreement audit; the corpus collapses to <= 5×61 cells.
    */
  def qRankCorr(s: SparkSession, dir: String): DataFrame =
    EvalMetrics.kendallTauA(
      TextAnalysis.qualityScore(docs(s, dir)).select(
        col("quality").cast("long").as("x"),
        (col("n_chars_m") % 61).cast("long").as("y")))

  /** Cohen's kappa between two deterministic pseudo-raters
    * ([[graft.ops.EvalMetrics.cohenKappa]]) — annotation-agreement
    * screening, exact in e6.
    */
  def qCohenKappa(s: SparkSession, dir: String): DataFrame =
    EvalMetrics.cohenKappa(docs(s, dir).select(
      (col("n_chars") % 89 > 44).as("a"),
      (col("n_chars") % 97 > 48).as("b")))

  /** Sequence-length curriculum order: short docs first, shuffled
    * within each 100-char length stage (capped at stage 5).
    */
  def qCurriculumOrder(s: SparkSession, dir: String): DataFrame =
    Curation.curriculumOrder(docs(s, dir),
      stage = least(expr("n_chars div 100"), lit(5L)))

  /** Composed embedding pipeline: one k-means feeding dedup + quota. */
  def qEmbedPipeline(s: SparkSession, dir: String): DataFrame =
    Similarity.embedCurationPipeline(embs(s, dir), k = 4, iters = 2,
      minCosine = 0.4, maxPerCluster = 60)

  /** Source-pair unigram total-variation divergence matrix. */
  def qSourceDivergence(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceDivergence(docs(s, dir))

  /** Epoch schedule: 60k-token budget, 3-epoch cap, mixture targets. */
  def qEpochSchedule(s: SparkSession, dir: String): DataFrame =
    Curation.epochSchedule(docs(s, dir), "source",
      targetUnits = expr("cast(substring(source, 4) as bigint) % 3 + 1"),
      budgetTokens = 60000L, maxEpochsE2 = 300L)

  /** Embedding-space decontamination: every 40th vector plays the
    * benchmark; the rest are the corpus.
    */
  def qEmbDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.embDecontaminate(
      e.filter(col("vec_id") % 40 =!= 0), e.filter(col("vec_id") % 40 === 0),
      minCosine = 0.4, bits = 2)
  }

  /** WordPiece vocab for q_wordpiece: hand-picked over the synthetic
    * corpus vocabulary so the segmentation exercises every contract
    * branch — greedy longest-match ("small" beats "sma" beats "s",
    * "##indow" beats "##i"), continuation prefixing, and whole-word
    * [UNK] fallback (no "##g" piece, so "agg"/"big" collapse). Single
    * definition: the DuckDB oracle's list literal is built from THIS
    * Seq, so the two engines cannot drift.
    */
  val WpVocab: Seq[String] = Seq(
    "a", "b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "o", "p",
    "q", "r", "s", "t", "v", "w", "the", "row", "join", "jo", "batch",
    "small", "sma", "str", "scan", "data",
    "##a", "##b", "##c", "##d", "##e", "##f", "##h", "##i", "##k",
    "##l", "##m", "##n", "##o", "##p", "##r", "##s", "##t", "##u",
    "##v", "##w", "##y", "##atch", "##in", "##an", "##ow", "##indow",
    "##ue")

  /** WordPiece greedy segmentation audit: per-doc piece count, unk
    * count, continuation share, and an order-sensitive xor checksum of
    * the piece stream (position-salted 60-bit hashes — xor, not sum,
    * so neither engine can overflow 64 bits).
    */
  def qWordpiece(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.wordpieceEncode(docs(s, dir), WpVocab).select(
      col("doc_id"),
      size(col("pieces")).cast("long").as("n_pieces"),
      size(filter(col("pieces"), p => p === "[UNK]")).cast("long")
        .as("n_unk"),
      size(filter(col("pieces"), p => p.startsWith("##"))).cast("long")
        .as("n_cont"),
      aggregate(
        transform(col("pieces"),
          (p, i) => Dedup.h60(concat(i.cast("string"), lit("|"), p))),
        lit(0L), (acc, x) => acc.bitwiseXOR(x)).as("checksum"))

  /** HTML → text extraction over a deterministically templated wrapper
    * (style/script elements, a comment, entities) built from each doc's
    * text on BOTH engines, so the oracle replays the exact regex chain.
    */
  def qStripHtml(s: SparkSession, dir: String): DataFrame = {
    val html = concat(
      lit("<html><head><style>p{color:red}</style></head><body><h1>"),
      substring(col("text"), 1, 40),
      lit("</h1><!-- boilerplate note --><p>"), col("text"),
      lit(" &amp; &lt;b&gt; x&nbsp;&#39;y&quot;</p>" +
        "<script>if (a<b) { alert('x'); }</script></body></html>"))
    docs(s, dir)
      .select(col("doc_id"), TextAnalysis.stripHtml(html).as("clean"))
      .withColumn("n_chars_clean", length(col("clean")).cast("long"))
  }

  /** Boilerplate removal: each doc wrapped in a 4-line page — a
    * link-heavy nav line (6 words but 94% anchor text: the LINK axis
    * must reject it, not the word count), the prose body, a link-heavy
    * footer, and a 2-word stub (the WORD axis rejects it). Only the
    * body survives — and only for docs with >= 5 words, so the keep
    * decision varies across the corpus.
    */
  def qExtractContent(s: SparkSession, dir: String): DataFrame = {
    val html = concat(
      lit("<div class=\"nav\"><a href=\"/\">Home page</a> " +
        "<a href=\"/a\">About our site</a> " +
        "<a href=\"/c\">Contact</a></div>\n<p>"),
      col("text"),
      lit("</p>\n<footer><a href=\"/p\">Privacy policy</a> " +
        "(c) example site</footer>\n<p>Too short.</p>"))
    TextAnalysis.extractContent(
      docs(s, dir).withColumn("html", html), minWords = 5)
      .select(col("doc_id"), col("n_lines"), col("n_content"),
        col("boiler_permille"), col("content"))
  }

  /** Invisible-character hygiene: ZWSP planted after char 1 plus a
    * trailing RLM + soft hyphen on doc_id % 7 == 0 — visually identical
    * text that hashes apart until stripped. The strip must restore the
    * pristine text exactly (clean_text replayed byte-for-byte by the
    * oracle) and the counts flag exactly the planted docs.
    */
  def qCleanText(s: SparkSession, dir: String): DataFrame = {
    val planted = docs(s, dir).withColumn("text",
      when(col("doc_id") % 7 === 0,
        concat(substring(col("text"), 1, 1), lit("\u200b"),
          expr("substring(text, 2)"), lit("\u200f\u00ad")))
        .otherwise(col("text")))
    TextAnalysis.cleanInvisible(planted)
      .select(col("doc_id"),
        col("n_invisible").cast("long").as("n_invisible"),
        col("clean_text"),
        length(col("clean_text")).cast("long").as("n_chars_clean"))
  }

  /** Deterministic weighted priority sample: 100 docs, n_chars weight. */
  def qPrioritySample(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.prioritySample(docs(s, dir), col("n_chars"), k = 100)
      .select(col("doc_id"), col("priority"))

  /** Phrase blocklist for q_phrase_blocklist — single definition, the
    * oracle's VALUES list is rendered from THIS Seq. Chosen to exercise
    * every automaton branch on the synthetic corpus: common unigram,
    * cross-token bigram/trigram, shared-prefix pair ("scan" inside
    * "scan slow" — both must count on one occurrence), self-overlapping
    * phrase ("a a" counts twice in "a a a"), absent phrase.
    */
  val BlockPhrases: Seq[String] = Seq(
    "slow", "fast join", "table value part", "scan", "scan slow",
    "a a", "zebra")

  /** Blocklist audit: per doc, total hits, distinct phrases hit, and an
    * index-salted xor checksum of the per-phrase counts.
    */
  def qPhraseBlocklist(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.phraseBlocklist(docs(s, dir), BlockPhrases).select(
      col("doc_id"),
      aggregate(col("phrase_counts"), lit(0L), (a, x) => a + x)
        .as("n_hits"),
      size(filter(col("phrase_counts"), c => c > 0L)).cast("long")
        .as("n_phrases"),
      aggregate(
        transform(col("phrase_counts"), (c, i) =>
          when(c > 0L, Dedup.h60(concat(i.cast("string"), lit("|"),
            c.cast("string")))).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc.bitwiseXOR(x)).as("checksum"))

  /** C4 cleaning over a deterministically templated multi-line corpus
    * (the synthetic docs are single-line, so the fixture folds each
    * doc's words into 6-word lines, gives 2/3 of them terminal
    * punctuation, salts in a "javascript" word every 11th line, and
    * plants the doc-level lorem/brace pages by doc_id residue — every
    * C4 rule fires on real data, both engines building the SAME lines).
    */
  def qC4Filter(s: SparkSession, dir: String): DataFrame = {
    // materialize the token array: inlined, the slice lambda re-splits
    // the text once per LINE
    val words = col("__wds")
    val nLines = expr("CAST((size(__wds) + 5) DIV 6 AS INT)")
    val lines = transform(sequence(lit(0), nLines - 1), i =>
      concat(
        array_join(slice(words, i * 6 + 1, lit(6)), " "),
        when((col("doc_id") + i) % 11 === 0, " javascript").otherwise(""),
        when((col("doc_id") + i) % 3 =!= 0, ".").otherwise("")))
    val extras = filter(array(
      when(col("doc_id") % 17 === 0, lit("lorem ipsum dolor sit.")),
      when(col("doc_id") % 13 === 0, lit("config { x }."))), x => x.isNotNull)
    // every 7th doc gets CRLF line endings — pins the \r?\n split +
    // \z anchor (Java-vs-RE2 end-of-line leniency) through the gate
    val planted = docs(s, dir)
      .withColumn("__wds", split(col("text"), " "))
      .withColumn("__t", array_join(concat(lines, extras), "\n"))
      .drop("__wds")
      .withColumn("text2",
        when(col("doc_id") % 7 === 0,
          regexp_replace(col("__t"), "\n", "\r\n")).otherwise(col("__t")))
      .drop("__t")
    TextAnalysis.c4Filter(planted, textCol = "text2").select(
      col("doc_id"), col("n_lines"), col("n_kept"),
      col("reject_reason"), col("keep").cast("long").as("keep"),
      Dedup.h60(coalesce(col("kept_text"), lit(""))).as("kept_h"))
  }

  /** Gopher-rules document filter over a planted corpus: each doc_id
    * residue class replaces the text with a page engineered to trip one
    * specific rule (pure-bullet page, ellipsis-terminated lines, hash
    * bursts, numeric-token floods, 15-char words, a stopword-free
    * six-fold copy, a 5-word stub), the default branch padding real
    * corpus text past the 50-word floor with a stopword-bearing tail —
    * so every reject_reason AND the kept path flow through the oracle
    * gate. The oracle rebuilds the same pages and replays the integer
    * decision table.
    */
  def qGopherFilter(s: SparkSession, dir: String): DataFrame = {
    val phrase = "the quick data of that batch have gone with them "
    val six = (1 to 6).map(_ => col("text"))
    val planted = docs(s, dir).withColumn("text2",
      when(col("doc_id") % 23 === 0,
        rtrim(repeat(lit("• alpha beta point\n"), 60), "\n"))
        .when(col("doc_id") % 19 === 0,
          rtrim(repeat(
            lit("the data of that run went on and on and on then...\n"),
            10), "\n"))
        .when(col("doc_id") % 17 === 0,
          concat(repeat(lit(phrase), 5), lit("# # # # # # # # # #")))
        .when(col("doc_id") % 13 === 0,
          concat(repeat(lit(phrase), 5),
            lit("1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20")))
        .when(col("doc_id") % 29 === 0,
          rtrim(repeat(lit("reconfiguration "), 50), " "))
        .when(col("doc_id") % 11 === 0, concat_ws(" ", six: _*))
        .when(col("doc_id") % 7 === 0, lit("tiny doc of the sort."))
        .otherwise(concat(
          concat_ws(" ", six.take(4): _*), lit("\n"),
          lit("the rest of that batch have come with them to be safe."))))
    TextAnalysis.gopherFilter(planted, textCol = "text2").select(
      col("doc_id"), col("n_words"), col("word_len_sum"), col("n_symbols"),
      col("n_lines"), col("bullet_lines"), col("ellipsis_lines"),
      col("alpha_words"), col("stop_kinds"), col("reject_reason"),
      col("keep").cast("long").as("keep"))
  }

  /** Training-shard export manifest: 16 deterministic shards with
    * re-verifiable audit rows.
    */
  def qShardManifest(s: SparkSession, dir: String): DataFrame =
    Curation.shardManifest(docs(s, dir), nShards = 16)

  /** Rendezvous shard names for q_hrw_assign — single definition, the
    * oracle's VALUES list renders from THIS Seq.
    */
  val HrwShards: Seq[String] = (0 until 12).map(i => f"shard$i%02d")

  /** Rendezvous assignment audit: per-shard doc count + id checksum. */
  def qHrwAssign(s: SparkSession, dir: String): DataFrame =
    Curation.rendezvousAssign(docs(s, dir), HrwShards)
      .withColumn("__h", Dedup.h60(col("doc_id").cast("string")))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(__h)").cast("long").as("checksum"))

  /** Multimodal frame-sampling plumbing, ORACLE-verified end to end:
    * a media table built from the documents' text bytes (a
    * deterministic blob both engines can reproduce — the corpus is
    * ASCII, so byte slices equal character slices), 4 pseudo-frames
    * per "video" via the real flatMap/slice path
    * ([[graft.ops.Multimodal.sampleFrames]]), each frame hashed. The
    * DECODE stays a stub by constraint (no codec libs in the image);
    * the schema, explode shape, slicing and batching are the real
    * sampler's and are what this row pins.
    */
  def qFrameSample(s: SparkSession, dir: String): DataFrame = {
    val media = graft.ops.Multimodal.asMediaTable(
      docs(s, dir).select(col("doc_id"), col("text")),
      "doc_id", "text", modality = "video", format = "mp4")
    graft.ops.Multimodal.sampleFrames(media, n = 4).select(
      col("media_id"),
      col("frame_idx").cast("long").as("frame_idx"),
      octet_length(col("frame_payload")).cast("long").as("frame_bytes"),
      Dedup.h60(col("frame_payload").cast("string")).as("frame_h"))
  }

  /** REAL BMP pixel decode, oracle-verified end to end: each doc's text
    * bytes cycle into a 7×4 24-bit image (odd width → 3 stride-padding
    * bytes per row), [[graft.functions.MediaCodecKernels.bmpEncode]]
    * mints the byte-exact container, and the decode kernel walks it
    * back out — bottom-up row order and stride padding both bind
    * (row0_sum is the LAST stored row; pixel_sum excludes padding), so
    * the oracle catches a naive contiguous reader. DuckDB replays the
    * pixel values straight from the text (ASCII corpus: byte == char).
    */
  def qBmpDecode(s: SparkSession, dir: String): DataFrame = {
    val w = 7; val h = 4 // 84 pixel bytes; stride 24 vs 21 row bytes
    val pixels = expr(
      "cast(substring(repeat(text, 84 div length(text) + 1), 1, 84) as binary)")
    val media = docs(s, dir).filter(length(col("text")) > 0)
      .select(col("doc_id").as("media_id"),
        graft.functions.MediaCodecExpressions.bmpEncode(pixels, w, h)
          .as("payload"))
    graft.ops.Multimodal.decodeBmpStats(media)
  }

  /** REAL WAV PCM16 decode, oracle-verified end to end: 48 mono samples
    * per doc derived from text chars (`c·129 + i·7 − 8192` — negative
    * amplitudes present, so the 16-bit sign extension binds), encoded
    * into a byte-exact RIFF container and decoded back to the integer
    * amplitude sum + exact energy (fixed-point RMS numerator, no libm).
    */
  def qWavDecode(s: SparkSession, dir: String): DataFrame = {
    val samples = expr(
      "transform(sequence(0, 47), i -> " +
        "ascii(substring(text, i % length(text) + 1, 1)) * 129 + i * 7 - 8192)")
    val media = docs(s, dir).filter(length(col("text")) > 0)
      .select(col("doc_id").as("media_id"),
        graft.functions.MediaCodecExpressions.wavEncode(samples, 16000)
          .as("payload"))
    graft.ops.Multimodal.decodeWavStats(media)
  }

  /** REAL GIF decode via the JDK's ImageIO: the 7x4 fixtures (same
    * display-order pixel bytes as q_bmp_decode) survive the palette
    * round trip LOSSLESSLY (<= 28 distinct colors per image, far under
    * the 256-entry table), so the LZW-decoded pixel sums replay exactly
    * from first principles — the same oracle as the BMP walk.
    */
  def qGifDecode(s: SparkSession, dir: String): DataFrame = {
    val pixels = expr(
      "cast(substring(repeat(text, 84 div length(text) + 1), 1, 84) as binary)")
    val media = docs(s, dir).filter(length(col("text")) > 0)
      .select(col("doc_id").as("media_id"),
        graft.functions.ImageIoExpressions.imageEncode(pixels, 7, 4, "gif")
          .as("payload"))
    graft.ops.Multimodal.decodeImageIoStats(media)
  }

  /** REAL JPEG decode via the JDK's ImageIO. JPEG is LOSSY, so the
    * oracle checks the exactly-reproducible fields — dimensions and
    * pixel count — while the decoded sums' tolerance and determinism
    * are spec-pinned (MultimodalSpec).
    */
  def qJpegDecode(s: SparkSession, dir: String): DataFrame = {
    val pixels = expr(
      "cast(substring(repeat(text, 84 div length(text) + 1), 1, 84) as binary)")
    val media = docs(s, dir).filter(length(col("text")) > 0)
      .select(col("doc_id").as("media_id"),
        graft.functions.ImageIoExpressions.imageEncode(pixels, 7, 4, "jpg")
          .as("payload"))
    graft.ops.Multimodal.decodeImageIoStats(media)
      .select(col("media_id"), col("ok"), col("width"), col("height"),
        col("n_pixels"))
  }

  /** Matryoshka-truncation retention: top-10 overlap of width-8/16/32
    * truncated rankings vs the full 64-dim ranking for probe vector 0
    * ([[Similarity.matryoshkaRetention]]) — the serving-width audit.
    */
  def qMrlRetention(s: SparkSession, dir: String): DataFrame =
    Similarity.matryoshkaRetention(embs(s, dir), queryId = 0L, k = 10,
      dims = Seq(8, 16, 32))

  /** N-gram novelty audit between the %10==9 heldout slice and the
    * rest: the memorization screen run before trusting a perplexity
    * eval on that heldout ([[Curation.ngramNovelty]]).
    */
  def qNgramNovelty(s: SparkSession, dir: String): DataFrame =
    Curation.ngramNovelty(
      docs(s, dir).filter(col("doc_id") % 10 =!= 9),
      docs(s, dir).filter(col("doc_id") % 10 === 9), maxN = 4)

  /** Sentence segmentation stats: the `[.!?]`-space boundary rule with
    * per-doc counts, lengths, and a position-salted sentence checksum
    * ([[TextAnalysis.sentenceStats]]).
    */
  def qSentences(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sentenceStats(docs(s, dir))

  /** Edit-distance verification of the MinHash-LSH candidates: true
    * Levenshtein similarity on JUST the banded pairs
    * ([[Dedup.editVerifiedPairs]]) — the exact-but-quadratic metric
    * confined to the set the LSH already shrank.
    */
  def qEditVerified(s: SparkSession, dir: String): DataFrame =
    Dedup.editVerifiedPairs(docs(s, dir), qDedupMinhash(s, dir),
      minSimE6 = 800000L)

  /** TextTiling topic boundaries: per-gap block cosines + valley
    * depths over every doc — the semantic-chunking complement to the
    * fixed-size q_chunk_overlap ([[TextAnalysis.textTiles]]).
    */
  def qTextTiles(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.textTiles(docs(s, dir), blockK = 10, step = 5,
      depthMinE6 = 150000L)

  /** Stupid-backoff trigram LM over the novelty audit's train/heldout
    * split — the web-scale LM scoring recipe (Brants et al. 2007); the
    * per-level hit counts say how much of each heldout doc scores at
    * full trigram depth ([[TextAnalysis.lmBackoff]]).
    */
  def qLmBackoff(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmBackoff(
      docs(s, dir).filter(col("doc_id") % 10 =!= 9),
      docs(s, dir).filter(col("doc_id") % 10 === 9))

  /** Heaps-law vocabulary growth over 16 corpus-prefix slices — the
    * V ≈ K·nᵝ sublinearity diagnostic for template-heavy or
    * id-token-exploded corpora ([[TextAnalysis.vocabGrowth]]).
    */
  def qVocabGrowth(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabGrowth(docs(s, dir), nBuckets = 16)

  /** Zipf rank-frequency audit at power-of-two ranks up to 256 — the
    * freq·rank constancy check ([[TextAnalysis.zipfCheck]]), Heaps'
    * distribution-shape complement.
    */
  def qZipf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.zipfCheck(docs(s, dir), maxRank = 256)

  /** DPO preference-pair assembly: docs quartets (doc_id DIV 4) stand
    * in for four scored responses to one prompt; score = text length
    * mod 97 (deterministic, with real ties — all-equal prompts must
    * drop). Output carries the margin and the length-bias audit flag.
    */
  def qPrefPairs(s: SparkSession, dir: String): DataFrame = {
    val responses = docs(s, dir).select(
      (col("doc_id") / 4).cast("long").as("prompt_id"),
      (col("doc_id") % 4).as("resp_id"),
      (length(col("text")) % 97).cast("long").as("score"),
      length(col("text")).cast("long").as("len"))
    Curation.preferencePairs(responses)
  }

  /** robots.txt fixture + its parsed rules — BOTH single-defined here:
    * the text is what Spark parses; the rules Seq renders the oracle's
    * VALUES (and OpsSpec pins parse(text) == rules, so the two cannot
    * drift). Covers comment stripping, stacked User-agent lines, and
    * the empty-Disallow allow-everything edge (parsed, skipped at
    * decision time).
    */
  val RobotsFixtureText: String = Seq(
    "# crawl policy",
    "User-agent: graftbot",
    "User-agent: fastbot",
    "Disallow: /",
    "Allow: /public/",
    "",
    "User-agent: *",
    "Disallow: /private/",
    "Allow: /private/ok/",
    "Disallow: /tmp/",
    "Disallow:").mkString("\n")

  /** (agent, allow, prefix) — decision-relevant rules (the empty-prefix
    * row is parsed but matches nothing, so the oracle omits it).
    */
  val RobotRules: Seq[(String, Int, String)] = Seq(
    ("graftbot", 0, "/"), ("graftbot", 1, "/public/"),
    ("fastbot", 0, "/"), ("fastbot", 1, "/public/"),
    ("*", 0, "/private/"), ("*", 1, "/private/ok/"), ("*", 0, "/tmp/"))

  /** Robots-exclusion evaluation over a synthetic URL batch: %2 docs
    * crawl as `graftbot` (own group: deny-all except /public/), the
    * rest as an unlisted agent that falls back to `*`; paths cycle
    * through the rule space (%4). Longest prefix wins, Allow beats
    * Disallow on ties, no match = allowed — replayed rule for rule by
    * the oracle from the same rules table.
    */
  def qRobots(s: SparkSession, dir: String): DataFrame = {
    val robots = s.range(1).select(lit("example.com").as("domain"),
      lit(RobotsFixtureText).as("content"))
    val w1 = element_at(split(col("text"), " "), 1)
    val urls = docs(s, dir).select(col("doc_id"),
      when(col("doc_id") % 2 === 0, "graftbot").otherwise("otherbot")
        .as("agent"),
      when(col("doc_id") % 4 === 0, concat(lit("/private/"), w1))
        .when(col("doc_id") % 4 === 1, concat(lit("/private/ok/"), w1))
        .when(col("doc_id") % 4 === 2, lit("/tmp/x"))
        .otherwise(concat(lit("/"), w1)).as("path"))
    Curation.robotsDecide(Curation.parseRobots(robots), urls)
  }

  /** Chat-transcript fixture shared by q_chat_turns and q_chat_render:
    * docs with ≥ 8 words become 4-turn dialogues (quarter-of-the-words
    * chunks, user/assistant alternating), with planted malformations —
    * %5 docs embed a continuation line in turn 0 (tests the
    * line-grouping window), %7 docs break role alternation, %11 docs
    * carry an empty assistant turn, %13 docs drop the last turn (end on
    * user). The oracle reconstructs every turn directly from the words,
    * so the Spark side must PARSE the flat transcript to agree.
    */
  private def chatFixture(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .filter(size(split(col("text"), " ")) >= 8)
      .withColumn("__ws", split(col("text"), " "))
      .withColumn("__q", (size(col("__ws")) / 4).cast("int"))
    def chunk(i: Int) = array_join(
      slice(col("__ws"), col("__q") * i + 1, col("__q")), " ")
    val c0 = when(col("doc_id") % 5 === 0,
      concat(chunk(0), lit("\nsee details below."))).otherwise(chunk(0))
    val c1 = when(col("doc_id") % 11 === 0, lit("")).otherwise(chunk(1))
    val role2 = when(col("doc_id") % 7 === 0, lit("assistant: "))
      .otherwise(lit("user: "))
    val tail = when(col("doc_id") % 13 === 0, lit(""))
      .otherwise(concat(lit("\nassistant: "), chunk(3)))
    d.select(col("doc_id"),
      concat(lit("user: "), c0, lit("\nassistant: "), c1, lit("\n"),
        role2, chunk(2), tail).as("text"))
  }

  /** Dialogue parse + structure validation: turns recovered from the
    * flat transcript (continuation lines re-grouped by the per-doc
    * window), then the alternation/empty/ends-on-assistant checks with
    * deterministic reject precedence ([[graft.ops.ChatData]]).
    */
  def qChatTurns(s: SparkSession, dir: String): DataFrame =
    graft.ops.ChatData.validateDialogue(
      graft.ops.ChatData.parseTurns(chatFixture(s, dir)))
      .select(col("doc_id"), col("n_turns"), col("role_violations"),
        col("empty_turns"), col("ends_assistant"), col("reject_reason"),
        col("keep"))

  /** Chat-template rendering of the kept dialogues with the
    * loss-bearing-token accounting (assistant tokens vs total).
    */
  def qChatRender(s: SparkSession, dir: String): DataFrame = {
    val turns = graft.ops.ChatData.parseTurns(chatFixture(s, dir))
    graft.ops.ChatData.renderTemplate(turns,
      graft.ops.ChatData.validateDialogue(turns))
  }

  /** WARC (ISO 28500) ingest, oracle-verified end to end: each doc
    * mints a 3-record WARC file (warcinfo + request + response, the
    * crawl-archive shape) built DECLARATIVELY from its text, and the
    * parse side walks it back — the native kernel does only the
    * stateful Content-Length framing ([[graft.functions.WarcKernels]]);
    * header fields, HTTP status and the two-level body split stay
    * builtin `regexp_extract`/`substr` over the exploded records.
    * DuckDB replays every field from first principles.
    */
  def qWarcParse(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val uri = concat(lit("http://example.com/doc/"), id)
    val crlf = "\r\n"
    val body0 = lit(s"software: graft$crlf")
    val body1 = concat(lit("GET /doc/"), id,
      lit(s" HTTP/1.1${crlf}Host: example.com$crlf$crlf"))
    val body2 = concat(
      lit(s"HTTP/1.1 200 OK${crlf}Content-Type: text/plain$crlf$crlf"),
      col("text"))
    def rec(tpe: String, idx: Int, uriCol: Option[Column],
            body: Column): Column =
      concat(
        lit(s"WARC/1.0${crlf}WARC-Type: $tpe${crlf}WARC-Record-ID: <urn:graft:"),
        id, lit(s"-$idx>$crlf"),
        uriCol.map(u => concat(lit("WARC-Target-URI: "), u, lit(crlf)))
          .getOrElse(lit("")),
        lit("Content-Length: "), length(body).cast("string"),
        lit(crlf + crlf), body, lit(crlf + crlf))
    val files = docs(s, dir).select(col("doc_id").as("warc_id"),
      concat(rec("warcinfo", 0, None, body0),
        rec("request", 1, Some(uri), body1),
        rec("response", 2, Some(uri), body2)).cast("binary").as("payload"))

    val recs = files.select(col("warc_id"),
      posexplode(graft.functions.WarcExpressions.warcRecords(col("payload")))
        .as(Seq("rec_idx", "rec")))
      .withColumn("r", col("rec").cast("string"))
      .withColumn("body",
        col("r").substr(locate(crlf + crlf, col("r")) + 4, length(col("r"))))
    recs.select(
      col("warc_id"), col("rec_idx").cast("long").as("rec_idx"),
      regexp_extract(col("r"), "WARC-Type: ([a-z]+)", 1).as("warc_type"),
      regexp_extract(col("r"), "WARC-Target-URI: (\\S+)", 1).as("target_uri"),
      regexp_extract(col("r"), "Content-Length: ([0-9]+)", 1).cast("long")
        .as("content_length"),
      Dedup.h60(col("body")).as("body_h"),
      when(regexp_extract(col("r"), "WARC-Type: ([a-z]+)", 1) === "response",
        regexp_extract(col("body"), "^HTTP/1\\.1 ([0-9]+)", 1).cast("long"))
        .otherwise(lit(0L)).as("http_status"),
      when(regexp_extract(col("r"), "WARC-Type: ([a-z]+)", 1) === "response",
        Dedup.h60(col("body")
          .substr(locate(crlf + crlf, col("body")) + 4, length(col("body")))))
        .otherwise(lit(0L)).as("http_body_h"))
  }

  /** MP4 fixture sample plan — single definition, the oracle's VALUES
    * lists render from THESE Seqs (the HrwShards discipline). 9 samples,
    * lens 4+(i%5) over cumulative starts, laid out in cycle-2,3 chunks
    * by the muxer so the stsc/stco indirection binds; timescale 12800,
    * delta 512 (duration 9·512/12800 s = 360 ms), keyframes every 3rd
    * sample (0, 3, 6).
    */
  private val Mp4Lens: Seq[Int] = (0 until 9).map(i => 4 + i % 5)
  private val Mp4Starts: Seq[Int] = Mp4Lens.scanLeft(0)(_ + _).init
  private val Mp4Total: Int = Mp4Lens.sum // 52

  private def mp4FixturePayload = {
    val parts = (0 until 9).map { i =>
      s"cast(substring(repeat(text, $Mp4Total div length(text) + 1), " +
        s"${Mp4Starts(i) + 1}, ${Mp4Lens(i)}) as binary)"
    }
    graft.functions.Mp4CodecExpressions.mp4Encode(
      expr(s"array(${parts.mkString(", ")})"),
      timescale = 12800, delta = 512, keyEvery = 3)
  }

  /** REAL ISO-BMFF demux, oracle-verified end to end: each doc's text
    * bytes become 9 access units muxed into a byte-exact MP4 (ftyp +
    * multi-sample-chunk mdat + full moov sample tables), and the
    * demuxer walks stts/stsz/stsc/stco/stss back out — the checksum
    * XORs the h60 of every sample's bytes EXTRACTED from mdat through
    * the chunk indirection, so a header-only reader (or one that
    * assumes one-sample-per-chunk) cannot reproduce it. DuckDB replays
    * the samples straight from the text (ASCII corpus: byte == char).
    */
  def qMp4Demux(s: SparkSession, dir: String): DataFrame = {
    val media = docs(s, dir).filter(length(col("text")) > 0)
      .select(col("doc_id").as("media_id"), mp4FixturePayload.as("payload"))
    graft.ops.Multimodal.demuxMp4Stats(media)
  }

  /** REAL keyframe extraction over the same fixtures: stss marks
    * samples 0/3/6 sync; the sampler slices their actual access-unit
    * bytes out of mdat. Replaces byte-range guessing with
    * container-true frames — the blobs a downstream decoder is handed.
    */
  def qMp4Keyframes(s: SparkSession, dir: String): DataFrame = {
    val media = docs(s, dir).filter(length(col("text")) > 0)
      .select(col("doc_id").as("media_id"), mp4FixturePayload.as("payload"))
    graft.ops.Multimodal.sampleSyncFrames(media).select(
      col("media_id"), col("frame_idx"),
      octet_length(col("frame_payload")).cast("long").as("frame_bytes"),
      Dedup.h60(col("frame_payload")).as("frame_h"))
  }

  /** Frame-level audio features over q_wav_decode's clips: 16-sample
    * frames over the 48-sample fixture (tail-exact 3 frames) — energy,
    * amplitude sum, zero crossings (sign flips: the word/space
    * alternation in the source chars flips v's sign), and clipping at
    * |v| >= 7800, which only the corpus's highest-valued chars reach
    * late in the clip (i·7 ramp) — both axes data-dependent.
    */
  def qWavFrames(s: SparkSession, dir: String): DataFrame = {
    val samples = expr(
      "transform(sequence(0, 47), i -> " +
        "ascii(substring(text, i % length(text) + 1, 1)) * 129 + i * 7 - 8192)")
    val media = docs(s, dir).filter(length(col("text")) > 0)
      .select(col("doc_id").as("media_id"),
        graft.functions.MediaCodecExpressions.wavEncode(samples, 16000)
          .as("payload"))
    graft.ops.Multimodal.wavFrameFeatures(media, frameLen = 16,
      clipAbs = 7800)
  }

  /** Real resize: 7x4 BMPs (q_bmp_decode's synthesis) downscaled to 3x2
    * by the nearest-neighbor kernel, then re-decoded — the oracle
    * replays every surviving byte via the floor pixel mapping.
    */
  def qBmpResize(s: SparkSession, dir: String): DataFrame = {
    val w = 7; val h = 4
    val pixels = expr(
      "cast(substring(repeat(text, 84 div length(text) + 1), 1, 84) as binary)")
    val media = docs(s, dir).filter(length(col("text")) > 0)
      .select(col("doc_id").as("media_id"),
        graft.functions.MediaCodecExpressions.bmpEncode(pixels, w, h)
          .as("payload"))
    graft.ops.Multimodal.decodeBmpStats(
      graft.ops.Multimodal.resizeBmp(media, 3, 2))
  }

  /** Real PNG decode: the same 7x4 display-order fixtures as
    * q_bmp_decode, but ENTROPY-CODED — minted with filterMode 1 so the
    * scanlines cycle all five PNG filters (None/Sub/Up/Average/Paeth);
    * the decode must inflate the IDAT (JDK zlib), verify chunk CRCs,
    * and unfilter every row to reproduce the first-principles sums.
    */
  def qPngDecode(s: SparkSession, dir: String): DataFrame = {
    val w = 7; val h = 4
    val pixels = expr(
      "cast(substring(repeat(text, 84 div length(text) + 1), 1, 84) as binary)")
    val media = docs(s, dir).filter(length(col("text")) > 0)
      .select(col("doc_id").as("media_id"),
        graft.functions.PngCodecExpressions.pngEncode(pixels, w, h,
          channels = 3, filterMode = 1).as("payload"))
    graft.ops.Multimodal.decodePngStats(media)
  }

  /** Real PNG resize: the filter-cycled 7x4 PNGs downscaled to 3x2 by
    * decode → nearest-neighbor → re-encode, then re-decoded — the same
    * floor pixel mapping the BMP oracle replays.
    */
  def qPngResize(s: SparkSession, dir: String): DataFrame = {
    val pixels = expr(
      "cast(substring(repeat(text, 84 div length(text) + 1), 1, 84) as binary)")
    val media = docs(s, dir).filter(length(col("text")) > 0)
      .select(col("doc_id").as("media_id"),
        graft.functions.PngCodecExpressions.pngEncode(pixels, 7, 4,
          channels = 3, filterMode = 1).as("payload"))
    graft.ops.Multimodal.decodePngStats(
      graft.ops.Multimodal.resizePng(media, 3, 2))
  }

  /** Area-average (box-filter) downscale of the same 7x4 BMPs to 3x2:
    * each output pixel is the truncating integer mean of its
    * floor-partitioned source block — the anti-aliased reduce.
    */
  def qBmpResizeArea(s: SparkSession, dir: String): DataFrame = {
    val pixels = expr(
      "cast(substring(repeat(text, 84 div length(text) + 1), 1, 84) as binary)")
    val media = docs(s, dir).filter(length(col("text")) > 0)
      .select(col("doc_id").as("media_id"),
        graft.functions.MediaCodecExpressions.bmpEncode(pixels, 7, 4)
          .as("payload"))
    graft.ops.Multimodal.decodeBmpStats(
      graft.ops.Multimodal.resizeBmpArea(media, 3, 2))
  }

  /** Mean-decimating 4x downsample of q_wav_decode's clips: each kept
    * sample is the integer mean of its 4-sample window.
    */
  def qWavDownsampleMean(s: SparkSession, dir: String): DataFrame = {
    val samples = expr(
      "transform(sequence(0, 47), i -> " +
        "ascii(substring(text, i % length(text) + 1, 1)) * 129 + i * 7 - 8192)")
    val media = docs(s, dir).filter(length(col("text")) > 0)
      .select(col("doc_id").as("media_id"),
        graft.functions.MediaCodecExpressions.wavEncode(samples, 16000)
          .as("payload"))
    graft.ops.Multimodal.decodeWavStats(
      graft.ops.Multimodal.downsampleWavMean(media, 4))
  }

  /** Real resample: q_wav_decode's 48-sample 16 kHz clips decimated 4x
    * to 12 samples at 4 kHz, then re-decoded.
    */
  def qWavDownsample(s: SparkSession, dir: String): DataFrame = {
    val samples = expr(
      "transform(sequence(0, 47), i -> " +
        "ascii(substring(text, i % length(text) + 1, 1)) * 129 + i * 7 - 8192)")
    val media = docs(s, dir).filter(length(col("text")) > 0)
      .select(col("doc_id").as("media_id"),
        graft.functions.MediaCodecExpressions.wavEncode(samples, 16000)
          .as("payload"))
    graft.ops.Multimodal.decodeWavStats(
      graft.ops.Multimodal.downsampleWav(media, 4))
  }

  /** Binary-signature ANN: top-10 by Hamming distance over sign-packed
    * 64-dim embeddings (2×32-bit words per vector).
    */
  def qHammingTopk(s: SparkSession, dir: String): DataFrame =
    Similarity.hammingTopK(embs(s, dir), queryId = 0L, k = 10, dims = 64)

  /** Hybrid retrieval: BM25 top-20 (terms spark/merge/window) fused
    * with cosine top-20 around vec 0 by reciprocal-rank fusion. The
    * rank windows run over the 20-row retrieved lists, not the corpus
    * (single-partition is the POINT — the lists are already tiny).
    */
  def qRrfFusion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bm = TextAnalysis
      .bm25Rank(docs(s, dir), Seq("spark", "merge", "window"), k = 20)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_e6").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank"))
    val vec = Similarity.cosineTopK(embs(s, dir), queryId = 0L, k = 20)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cosine_r").desc, col("vec_id"))))
      .select(col("vec_id").as("doc_id"), col("rank"))
    Similarity.rrfFuse(Seq(bm, vec), k = 10)
  }

  /** URL canonicalization + exact URL dedup over a deterministically
    * templated crawl frontier (host case, default port, www, fragment,
    * utm params, trailing slash, param order — every rule exercised;
    * doc_id DIV 100 in the path makes genuine collisions to dedup:
    * several raw URLs differing in fragment collapse to one canon row).
    */
  def qUrlCanon(s: SparkSession, dir: String): DataFrame = {
    val abs = concat(
      lit("HTTPS://WWW."), col("source"), lit(".Example.COM:443/docs/item"),
      expr("doc_id DIV 100").cast("string"),
      lit("/?utm_campaign=spring&ref="), col("source"),
      lit("&b=2&a=1&utm_source=feed#sec-"),
      (col("doc_id") % 7).cast("string"))
    // every 19th doc is a NON-absolute frontier entry — pins the
    // pass-through branch (urlParts returns the input untouched,
    // host/domain empty) through the oracle gate
    val raw = when(col("doc_id") % 19 === 0,
      concat(lit("relative/path-"), (col("doc_id") % 5).cast("string"),
        lit("?b=2&a=1#frag"))).otherwise(abs)
    docs(s, dir)
      .select(col("doc_id"), TextAnalysis.urlParts(raw).as("u"))
      .select(col("doc_id"), col("u.canon_url").as("canon_url"),
        col("u.domain").as("domain"))
      .groupBy(col("canon_url"), col("domain"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        min(col("doc_id")).as("first_doc"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_wordpiece" -> (qWordpiece _),
    "q_strip_html" -> (qStripHtml _),
    "q_extract_content" -> (qExtractContent _),
    "q_clean_text" -> (qCleanText _),
    "q_priority_sample" -> (qPrioritySample _),
    "q_hamming_topk" -> (qHammingTopk _),
    "q_rrf_fusion" -> (qRrfFusion _),
    "q_url_canon" -> (qUrlCanon _),
    "q_phrase_blocklist" -> (qPhraseBlocklist _),
    "q_frame_sample" -> (qFrameSample _),
    "q_bmp_decode" -> (qBmpDecode _),
    "q_png_decode" -> (qPngDecode _),
    "q_png_resize" -> (qPngResize _),
    "q_bmp_resize" -> (qBmpResize _),
    "q_bmp_resize_area" -> (qBmpResizeArea _),
    "q_wav_decode" -> (qWavDecode _),
    "q_wav_frames" -> (qWavFrames _),
    "q_gif_decode" -> (qGifDecode _),
    "q_jpeg_decode" -> (qJpegDecode _),
    "q_mp4_demux" -> (qMp4Demux _),
    "q_mp4_keyframes" -> (qMp4Keyframes _),
    "q_warc_parse" -> (qWarcParse _),
    "q_chat_turns" -> (qChatTurns _),
    "q_chat_render" -> (qChatRender _),
    "q_robots" -> (qRobots _),
    "q_pref_pairs" -> (qPrefPairs _),
    "q_vocab_growth" -> (qVocabGrowth _),
    "q_zipf" -> (qZipf _),
    "q_mrl_retention" -> (qMrlRetention _),
    "q_ngram_novelty" -> (qNgramNovelty _),
    "q_lm_backoff" -> (qLmBackoff _),
    "q_text_tiles" -> (qTextTiles _),
    "q_sentences" -> (qSentences _),
    "q_edit_verified" -> (qEditVerified _),
    "q_wav_downsample" -> (qWavDownsample _),
    "q_wav_downsample_mean" -> (qWavDownsampleMean _),
    "q_shard_manifest" -> (qShardManifest _),
    "q_c4_filter" -> (qC4Filter _),
    "q_gopher_filter" -> (qGopherFilter _),
    "q_hrw_assign" -> (qHrwAssign _),
    "q_chunk_overlap" -> (qChunkOverlap _),
    "q_pack_sequences" -> (qPackSequences _),
    "q_shuffle_rank" -> (qShuffleRank _),
    "q_vocab_bigrams" -> (qVocabBigrams _),
    "q_pmi" -> (qPmi _),
    "q_phrase_query" -> (qPhraseQuery _),
    "q_quantize_embed" -> (qQuantizeEmbed _),
    "q_rand_proj" -> (qRandProj _),
    "q_keep_canonical" -> (qKeepCanonical _),
    "q_token_budget" -> (qTokenBudget _),
    "q_mix_weights" -> (qMixWeights _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_decontaminate_multi" -> (qDecontaminateMulti _),
    "q_domain_cap" -> (qDomainCap _),
    "q_repetition" -> (qRepetition _),
    "q_redact" -> (qRedact _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_tfidf_top_terms" -> (qTfIdf _),
    "q_bm25" -> (qBm25 _),
    "q_bm25_segmented" -> (qBm25Segmented _),
    "q_blockmax_topk" -> (qBlockmaxTopk _),
    "q_blockmax_index" -> (qBlockmaxIndex _),
    "q_char_diversity" -> (qCharDiversity _),
    "q_postings" -> (qPostings _),
    "q_pagerank" -> (qPagerank _),
    "q_textrank" -> (qTextrank _),
    "q_span_corrupt" -> (qSpanCorrupt _),
    "q_ccnet_buckets" -> (qCcnetBuckets _),
    "q_fim" -> (qFim _),
    "q_nfc_dedup" -> (qNfcDedup _),
    "q_phash_pairs" -> (qPhashPairs _),
    "q_stratified_sample" -> (qStratifiedSample _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_dedup_simhash" -> (qDedupSimhash _),
    "q_dedup_ngram" -> (qDedupNgram _),
    "q_containment" -> (qContainment _),
    "q_ppjoin" -> (qPpjoin _),
    "q_knn_brute" -> (qKnnBrute _),
    "q_knn_join" -> (qKnnJoin _),
    "q_hard_negatives" -> (qHardNegatives _),
    "q_mmr" -> (qMmr _),
    "q_bitext_mine" -> (qBitextMine _),
    "q_bloom_dedup" -> (qBloomDedup _),
    "q_corpus_diff" -> (qCorpusDiff _),
    "q_langid_trained" -> (qLangidTrained _),
    "q_unigram_seed" -> (qUnigramSeed _),
    "q_lm_interp" -> (qLmInterp _),
    "q_lm_kn" -> (qLmKneserNey _),
    "q_lm_index" -> (qLmIndex _),
    "q_source_report" -> (qSourceReport _),
    "q_reservoir" -> (qReservoir _),
    "q_knn_ivf" -> (qKnnIvf _),
    "q_knn_ivf_trained" -> (qKnnIvfTrained _),
    "q_substring_dup" -> (qSubstringDup _),
    "q_cross_dedup" -> (qCrossDedup _),
    "q_source_overlap" -> (qSourceOverlap _),
    "q_kmv_overlap" -> (qKmvOverlap _),
    "q_leakage_split" -> (qLeakageSplit _),
    "q_winnow" -> (qWinnow _),
    "q_label_centroids" -> (qLabelCentroids _),
    "q_text_stats" -> (qTextStats _),
    "q_lang_id" -> (qLangId _),
    "q_quality" -> (qQuality _),
    "q_fingerprint" -> (qFingerprint _),
    "q_subword_tokens" -> (qSubwordTokens _),
    "q_lm_score" -> (qLmScore _),
    "q_oov_rate" -> (qOovRate _),
    "q_feature_hash" -> (qFeatureHash _),
    "q_dedup_trim" -> (qDedupTrim _),
    "q_line_dedup" -> (qLineDedup _),
    "q_curate_pipeline" -> (qCuratePipeline _),
    "q_normalize" -> (qNormalize _),
    "q_dup_ngram_cov" -> (qDupNgramCov _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_ngram_diversity" -> (qNgramDiversity _),
    "q_temperature_mix" -> (qTemperatureMix _),
    "q_minhash_verified" -> (qMinhashVerified _),
    "q_luhn_redact" -> (qLuhnRedact _),
    "q_blocklist" -> (qBlocklist _),
    "q_quality_ensemble" -> (qQualityEnsemble _),
    "q_vocab_coverage" -> (qVocabCoverage _),
    "q_kmeans_assign" -> (qKmeansAssign _),
    "q_pq_adc" -> (qPqAdc _),
    "q_ivfpq_adc" -> (qIvfPqAdc _),
    "q_ivfpq_index" -> (qIvfPqIndex _),
    "q_ivfpq_rerank" -> (qIvfPqRerank _),
    "q_semdedup" -> (qSemDedup _),
    "q_cluster_balance" -> (qClusterBalance _),
    "q_importance_weight" -> (qImportanceWeight _),
    "q_emb_decontaminate" -> (qEmbDecontaminate _),
    "q_bpe_merges" -> (qBpeMerges _),
    "q_bbpe_merges" -> (qBbpeMerges _),
    "q_bbpe_encode" -> (qBbpeEncode _),
    "q_wp_merges" -> (qWpMerges _),
    "q_bpe_encode" -> (qBpeEncode _),
    "q_bpe_index" -> (qBpeIndex _),
    "q_bootstrap_ci" -> (qBootstrapCI _),
    "q_rouge_bigram" -> (qRougeBigram _),
    "q_bleu" -> (qBleu _),
    "q_pass_at_k" -> (qPassAtK _),
    "q_bradley_terry" -> (qBradleyTerry _),
    "q_auc" -> (qAuc _),
    "q_calibration" -> (qCalibration _),
    "q_rank_corr" -> (qRankCorr _),
    "q_cohen_kappa" -> (qCohenKappa _),
    "q_epoch_schedule" -> (qEpochSchedule _),
    "q_source_divergence" -> (qSourceDivergence _),
    "q_embed_pipeline" -> (qEmbedPipeline _),
    "q_curriculum" -> (qCurriculumOrder _)
  )

  // ------------------------------------------------------------- oracles

  /** DuckDB 60-bit md5 hash of a SQL string expression. */
  private def dh(e: String) =
    s"CAST(('0x' || substring(md5($e),1,15)) AS BIGINT)"

  /** The unrolled PageRank trajectory: round k's CTE recomputes the
    * contribution sums, the dangling share, and the damped update from
    * round k−1 with the SAME integer truncation order as
    * [[graft.ops.Graph.pageRank]].
    */
  /** The integer-exact PageRank round template, one CTE pair per round
    * — shared by every oracle that replays a [[graft.ops.Graph
    * .pageRank]] trajectory (q_pagerank's synthetic link graph,
    * q_textrank's co-occurrence graph). Expects CTEs `nodes(v)`,
    * `params(n, base)`, `outdeg(src, d)`, `dedges(src, dst, d)` and
    * `r0(v, r)` in scope.
    */
  private def pagerankRounds(iters: Int, damp: Int): String =
    (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT n.v AS v,
         |    (p.base * ${100 - damp}) // 100 +
         |    ((coalesce(c.s, 0) + dg.share) * $damp) // 100 AS r
         |  FROM nodes n
         |  CROSS JOIN params p
         |  LEFT JOIN (
         |    SELECT e.dst AS dst, sum(r.r // e.d) AS s
         |    FROM dedges e JOIN r${k - 1} r ON r.v = e.src
         |    GROUP BY 1) c ON c.dst = n.v
         |  CROSS JOIN (
         |    SELECT (SELECT coalesce(sum(r.r), 0) FROM r${k - 1} r
         |      ANTI JOIN outdeg o ON r.v = o.src) // p2.n AS share
         |    FROM params p2) dg)""".stripMargin
    }.mkString(",\n")

  private def pagerankCtes(iters: Int, damp: Int): String =
    s"""params AS (
       |  SELECT count(*) AS n, 1000000000000 // count(*) AS base
       |  FROM documents),
       |edges AS (
       |  SELECT doc_id AS src, (doc_id * 31 + j * 7 + 1) % p.n AS dst
       |  FROM documents, params p, range(1, 4) t(j)),
       |nodes AS (
       |  SELECT DISTINCT v FROM (
       |    SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges)),
       |outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
       |dedges AS (
       |  SELECT e.src, e.dst, o.d FROM edges e
       |  JOIN outdeg o ON o.src = e.src),
       |r0 AS (SELECT v, p.base AS r FROM nodes, params p),
       |${pagerankRounds(iters, damp)}""".stripMargin

  /** q_textrank's CTE chain: the co-occurrence edge table (adjacent
    * non-empty tokens, both directions, duplicates kept as weights),
    * then the SAME round template as q_pagerank — params derive from
    * the NODES table here (the graph's vocabulary), not the document
    * count.
    */
  private def textrankCtes(iters: Int, damp: Int): String =
    s"""tkw AS (SELECT string_split(text, ' ') AS w FROM documents),
       |adjw AS (SELECT unnest(range(greatest(len(w) - 1, 0))) AS i, w
       |  FROM tkw),
       |e1 AS (SELECT w[i+1] AS src, w[i+2] AS dst FROM adjw
       |  WHERE w[i+1] != '' AND w[i+2] != ''),
       |edges AS (SELECT src, dst FROM e1
       |  UNION ALL SELECT dst AS src, src AS dst FROM e1),
       |nodes AS (
       |  SELECT DISTINCT v FROM (
       |    SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges)),
       |params AS (
       |  SELECT count(*) AS n, 1000000000000 // count(*) AS base
       |  FROM nodes),
       |outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
       |dedges AS (
       |  SELECT e.src, e.dst, o.d FROM edges e
       |  JOIN outdeg o ON o.src = e.src),
       |r0 AS (SELECT v, p.base AS r FROM nodes, params p),
       |${pagerankRounds(iters, damp)}""".stripMargin

  /** The seeded per-doc hash (mirrors Dedup.h60(seed + "|" + doc_id)) —
    * ONE definition for every curation oracle, so a salt's SQL can't
    * drift from its Scala twin.
    */
  private def dhSalted(salt: String) =
    dh(s"'$salt|' || CAST(doc_id AS VARCHAR)")

  /** Shared eval-pair fixture CTE — pr(pair_id, cw, rw): candidate and
    * reference token lists (even doc = reference, the next odd doc the
    * candidate; mirrors [[evalPairs]]).
    */
  private val evalPairCtes: String =
    """pr AS (
      |  SELECT a.doc_id // 2 AS pair_id,
      |    list_filter(string_split(b.text, ' '), x -> x != '') AS cw,
      |    list_filter(string_split(a.text, ' '), x -> x != '') AS rw
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |  WHERE a.doc_id % 2 = 0)""".stripMargin

  /** One clipped-match CTE triple per BLEU order n — ends in
    * mmN(pair_id, m). Emitted WITHOUT margin chars: the fragment embeds
    * in oracles that stripMargin afterwards.
    */
  private def bleuClipCte(n: Int): String = {
    def gram(c: String) =
      (1 to n).map(j => s"$c[i+$j]").mkString(" || ' ' || ")
    def side(c: String, nm: String) =
      s"""$nm$n AS (
  SELECT pair_id, ${dh("g")} AS h, count(*) AS c FROM (
    SELECT pair_id, unnest(list_transform(
      range(greatest(len($c) - ${n - 1}, 0)),
      i -> ${gram(c)})) AS g FROM pr)
  GROUP BY 1, 2)"""
    s"""${side("cw", "bc")},
${side("rw", "br")},
mm$n AS (
  SELECT bc$n.pair_id, CAST(sum(least(bc$n.c, br$n.c)) AS BIGINT) AS m
  FROM bc$n JOIN br$n ON bc$n.pair_id = br$n.pair_id AND bc$n.h = br$n.h
  GROUP BY 1)"""
  }

  /** One Bradley-Terry MM round as CTEs d/r/n/p{k} from p{k-1} —
    * the same e6 fixed-point DIV chain as
    * [[graft.ops.EvalMetrics.bradleyTerry]]. No margin chars (see
    * [[bleuClipCte]]).
    */
  private def btIterCtes(k: Int): String =
    s"""d$k AS (
  SELECT d.player, sum(d.n * 1000000000000 // (pi.p + pj.p)) AS den
  FROM dir d
  JOIN p${k - 1} pi ON pi.player = d.player
  JOIN p${k - 1} pj ON pj.player = d.other
  GROUP BY 1),
r$k AS (
  SELECT w.player, w.wins * 1000000000000 // d$k.den AS praw
  FROM w JOIN d$k ON d$k.player = w.player),
n$k AS (
  SELECT CAST(count(*) AS BIGINT) AS np, CAST(sum(praw) AS BIGINT) AS sp
  FROM r$k),
p$k AS (SELECT player, praw * (np * 1000000) // sp AS p FROM r$k, n$k)"""

  /** Shared CTE block for the span-trim family: rebuilds every doc
    * without its cross-document 8-token windows, ending in `trimout
    * (doc_id, n_tokens, n_removed, kept_text)`. Reused by q_dedup_trim
    * and the composed q_curate_pipeline so the two oracles cannot
    * drift.
    */
  private lazy val trimCtes: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |wn AS (
       |  SELECT doc_id, unnest(range(greatest(len(w)-7, 0))) AS pos, w
       |  FROM toks),
       |winh AS (
       |  SELECT doc_id, pos,
       |    ${dh("array_to_string(w[pos+1:pos+8], ' ')")} AS wh FROM wn),
       |shared AS (
       |  SELECT wh FROM (
       |    SELECT wh, count(DISTINCT doc_id) AS nd FROM winh GROUP BY 1)
       |  WHERE nd > 1),
       |cov AS (
       |  SELECT DISTINCT doc_id, t FROM (
       |    SELECT doc_id, unnest(range(pos, pos+8)) AS t
       |    FROM winh JOIN shared USING (wh))),
       |tp AS (
       |  SELECT doc_id, unnest(w) AS tok,
       |    generate_subscripts(w, 1) - 1 AS t FROM toks),
       |kept AS (
       |  SELECT tp.doc_id, tp.t, tp.tok FROM tp
       |  LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.t = cov.t
       |  WHERE cov.t IS NULL),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |    string_agg(tok, ' ' ORDER BY t) AS kept_text
       |  FROM kept GROUP BY 1),
       |trimout AS (
       |  SELECT d.doc_id,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |    CAST(len(string_split(d.text, ' ')) - coalesce(a.n_kept, 0)
       |      AS BIGINT) AS n_removed,
       |    coalesce(a.kept_text, '') AS kept_text
       |  FROM documents d LEFT JOIN agg a USING (doc_id))""".stripMargin

  /** Shared CTE block ending in `qout(doc_id, n_tokens, quality)` — the
    * rule-based quality score. Reused by q_quality, q_weighted_sample
    * and the ensemble so the rule set cannot drift between them.
    */
  private lazy val qualityCtes: String =
    """qs AS (
      |  SELECT doc_id, strlen(text) AS n_chars_m,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    strlen(text) - strlen(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
      |    len(list_filter(string_split(text, ' '),
      |        x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS n_stopwords
      |  FROM documents),
      |qout AS (
      |  SELECT doc_id, n_tokens,
      |    (CASE WHEN n_chars_m BETWEEN 100 AND 2000 THEN 1 ELSE 0 END) +
      |    (CASE WHEN n_tokens BETWEEN 20 AND 500 THEN 1 ELSE 0 END) +
      |    (CASE WHEN n_punct * 10 <= n_tokens THEN 1 ELSE 0 END) +
      |    (CASE WHEN n_stopwords > 0 THEN 1 ELSE 0 END) AS quality
      |  FROM qs)""".stripMargin

  /** Shared CTE block ending in `lmout(doc_id, n_bigrams, lm_score_e6)`
    * — the corpus-bigram LM score. CTE names are lm-prefixed so the
    * block composes with the other signal blocks in one query.
    */
  /** Bigram identity = the (prev-hash, word-hash) PAIR — one md5 per
    * token, mirroring the Spark side's bigramHashInst (parallel unnest
    * of the two shifted hash slices zips them row-wise in DuckDB).
    */
  private lazy val lmCtes: String =
    s"""lmtoks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |lmh AS (
       |  SELECT doc_id, list_transform(w, x -> ${dh("x")}) AS hs FROM lmtoks),
       |lminst AS (
       |  SELECT doc_id, unnest(hs[1:len(hs)-1]) AS pw,
       |    unnest(hs[2:len(hs)]) AS sw FROM lmh),
       |lmbyd AS (
       |  SELECT doc_id, pw, sw, count(*) AS m FROM lminst GROUP BY 1, 2, 3),
       |lmc2 AS (SELECT pw, sw, sum(m) AS c2 FROM lmbyd GROUP BY 1, 2),
       |lmc1 AS (SELECT pw, sum(m) AS c1 FROM lmbyd GROUP BY 1),
       |lmout AS (
       |  SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
       |    CAST(sum(m * (lmc2.c2 * 1000000 // lmc1.c1)) // sum(m) AS BIGINT)
       |      AS lm_score_e6
       |  FROM lmbyd JOIN lmc2 USING (pw, sw) JOIN lmc1 USING (pw)
       |  GROUP BY doc_id)""".stripMargin

  /** Shared CTE block ending in `ovout(doc_id, n_tokens, n_rare,
    * rare_rate_e6)` — the share-relative rare-token rate.
    */
  private lazy val oovCtes: String =
    s"""ovt AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |ovinst AS (SELECT doc_id, ${dh("w")} AS tw FROM ovt),
       |ovbyd AS (SELECT doc_id, tw, count(*) AS m FROM ovinst GROUP BY 1, 2),
       |ovv AS (SELECT tw, sum(m) AS cnt FROM ovbyd GROUP BY 1),
       |ovtot AS (SELECT sum(cnt) AS tot FROM ovv),
       |ovout AS (
       |  SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN cnt * 100 < tot THEN m ELSE 0 END) AS BIGINT)
       |      AS n_rare,
       |    CAST(sum(CASE WHEN cnt * 100 < tot THEN m ELSE 0 END) * 1000000
       |      // sum(m) AS BIGINT) AS rare_rate_e6
       |  FROM ovbyd JOIN ovv USING (tw) CROSS JOIN ovtot
       |  GROUP BY doc_id)""".stripMargin

  /** Shared CTE block ending in `dcout(doc_id, n_tokens, n_grams,
    * top_gram_freq, dup_cov_e4)` — within-doc duplicated-3-gram
    * coverage (the Gopher repetition rule).
    */
  private lazy val dupCovCtes: String =
    s"""dctoks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |dcwn AS (
       |  SELECT doc_id, unnest(range(greatest(len(w)-2, 0))) AS pos, w
       |  FROM dctoks),
       |dcgh AS (
       |  SELECT doc_id, pos,
       |    ${dh("array_to_string(w[pos+1:pos+3], ' ')")} AS h FROM dcwn),
       |dcc AS (
       |  SELECT doc_id, h, count(*) AS c FROM dcgh GROUP BY 1, 2),
       |dcpd AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
       |    CAST(max(c) AS BIGINT) AS top_gram_freq
       |  FROM dcc GROUP BY 1),
       |dccov AS (
       |  SELECT DISTINCT doc_id, t FROM (
       |    SELECT dcgh.doc_id, unnest(range(dcgh.pos, dcgh.pos+3)) AS t
       |    FROM dcgh JOIN dcc USING (doc_id, h) WHERE dcc.c > 1)),
       |dcca AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS ndup
       |  FROM dccov GROUP BY 1),
       |dcout AS (
       |  SELECT d.doc_id,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |    coalesce(p.n_grams, 0) AS n_grams,
       |    coalesce(p.top_gram_freq, 0) AS top_gram_freq,
       |    coalesce(ca.ndup, 0) * 10000
       |      // CAST(len(string_split(d.text, ' ')) AS BIGINT) AS dup_cov_e4
       |  FROM documents d
       |  LEFT JOIN dcpd p USING (doc_id) LEFT JOIN dcca ca USING (doc_id))""".stripMargin

  /** Shared CTE: word tokens and 3-shingles per doc. */
  private val shingleCte =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_transform(range(greatest(len(w)-2, 0)),
      |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
      |  FROM toks)
      |""".stripMargin

  /** Shared CTE chain for the minhash family: shingles → 8-hash
    * signatures → 4 band rows per doc, ending in `bands(doc_id,
    * band_idx, band_key)`. ONE definition so the three minhash oracles
    * (pairs, cross-corpus, verified) cannot drift from each other or
    * from the Scala hash family.
    */
  private lazy val minhashBandCtes: String = {
    val P = graft.ops.Dedup.MinhashP
    val mins = (0 until 8).map { k =>
      val a = 1103515245L * (k + 1) % P
      val b = 12345L * (2 * k + 1) % P
      s"min(($a * (${dh("sh")} % $P) + $b) % $P) AS mh$k"
    }.mkString(",\n    ")
    val bandSelects = (0 until 4)
      .map(b => s"SELECT doc_id, $b AS band_idx, mh${2 * b} || '_' || mh${2 * b + 1} AS band_key FROM sig")
      .mkString("\n  UNION ALL ")
    s"""${shingleCte.trim},
       |sig AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bandSelects)""".stripMargin
  }

  private lazy val minhashOracle: String =
    s"""$minhashBandCtes
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM bands a JOIN bands b
       |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |WHERE a.doc_id < b.doc_id""".stripMargin

  private lazy val crossDedupOracle: String =
    s"""$minhashBandCtes
       |SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
       |FROM bands a JOIN bands b
       |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |WHERE a.doc_id >= 250 AND b.doc_id < 250""".stripMargin

  private lazy val minhashVerifiedOracle: String =
    s"""$minhashBandCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |  WHERE a.doc_id < b.doc_id),
       |g AS (SELECT DISTINCT doc_id, ${dh("sh")} AS h FROM sh),
       |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1),
       |com AS (
       |  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_common
       |  FROM cand c
       |  JOIN g ga ON ga.doc_id = c.doc_a
       |  JOIN g gb ON gb.doc_id = c.doc_b AND gb.h = ga.h
       |  GROUP BY 1, 2)
       |SELECT c.doc_a, c.doc_b, sa.n AS n_a, sb.n AS n_b,
       |  coalesce(m.n_common, 0) AS n_common,
       |  coalesce(m.n_common, 0) * 10000
       |    // (sa.n + sb.n - coalesce(m.n_common, 0)) AS jaccard_e4
       |FROM cand c
       |LEFT JOIN com m ON m.doc_a = c.doc_a AND m.doc_b = c.doc_b
       |JOIN sz sa ON sa.doc_id = c.doc_a
       |JOIN sz sb ON sb.doc_id = c.doc_b
       |WHERE coalesce(m.n_common, 0) * 10000
       |  // (sa.n + sb.n - coalesce(m.n_common, 0)) >= 3000""".stripMargin

  private val simhashOracle: String = {
    val votes = (0 until 32)
      .map(j => s"SUM(CASE WHEN (h32 >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j")
      .mkString(",\n    ")
    val sketch = (0 until 32)
      .map(j => s"(CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |h AS (
       |  SELECT doc_id, ${dh("w")} % 4294967296 AS h32 FROM words),
       |votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM h GROUP BY doc_id),
       |sk AS (
       |  SELECT doc_id, CAST($sketch AS BIGINT) AS simhash,
       |    CAST($sketch AS BIGINT) >> 28 AS blk
       |  FROM votes)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  bit_count(xor(a.simhash, b.simhash)) AS hamming
       |FROM sk a JOIN sk b ON a.blk = b.blk AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2""".stripMargin
  }

  private val ngramOracle: String =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |shs AS (
      |  SELECT doc_id, unnest(list_transform(range(greatest(len(w)-2, 0)),
      |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
      |  FROM toks),
      |grams0 AS (
      |  SELECT DISTINCT doc_id, ${dh("sh")} AS g FROM shs),
      |rare AS (
      |  SELECT g FROM grams0 GROUP BY g
      |  HAVING count(*) <= (SELECT count(*) * 0.02 FROM documents)),
      |grams AS (
      |  SELECT grams0.doc_id, grams0.g FROM grams0 JOIN rare USING (g)),
      |sizes AS (
      |  SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, n_common, sa.n_grams AS size_a, sb.n_grams AS size_b,
      |  (n_common * 10000) // (sa.n_grams + sb.n_grams - n_common) AS jaccard1e4
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = doc_a
      |JOIN sizes sb ON sb.doc_id = doc_b
      |WHERE (n_common * 10000) // (sa.n_grams + sb.n_grams - n_common) >= 3000""".stripMargin

  /** q_ppjoin's oracle is the BRUTE-FORCE thresholded Jaccard join —
    * no df pruning, no prefix anything — so the green row certifies
    * the Spark side's prefix filter lossless, not merely consistent.
    */
  private val ppjoinOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |shs AS (
       |  SELECT doc_id, unnest(list_transform(range(greatest(len(w)-2, 0)),
       |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
       |  FROM toks),
       |grams AS (
       |  SELECT DISTINCT doc_id, ${dh("sh")} AS g FROM shs),
       |sizes AS (
       |  SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
       |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_common,
       |  CAST(sa.sz AS BIGINT) AS size_a, CAST(sb.sz AS BIGINT) AS size_b,
       |  (n_common * 1000000) // (sa.sz + sb.sz - n_common) AS j_e6
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE (n_common * 1000000) // (sa.sz + sb.sz - n_common)
       |  >= 350000""".stripMargin

  /** The sentence split replayed with the same sentinel trick (RE2 has
    * no lookbehind, so both engines mark the boundary space and split).
    */
  private val sentencesOracle: String =
    s"""WITH sp AS (
       |  SELECT doc_id, string_split(
       |    regexp_replace(text, '([.!?]) ', '\\1' || chr(1), 'g'),
       |    chr(1)) AS ss
       |  FROM documents),
       |x AS (SELECT doc_id, unnest(range(len(ss))) AS p,
       |    unnest(ss) AS s FROM sp)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sentences,
       |  CAST(sum(strlen(s)) AS BIGINT) AS n_chars,
       |  CAST(max(strlen(s)) AS BIGINT) AS max_len,
       |  CAST(sum(strlen(s) * 100) // count(*) AS BIGINT) AS mean_len_e2,
       |  CAST(bit_xor(${dh("CAST(p AS VARCHAR) || '|' || s")}) AS BIGINT)
       |    AS checksum
       |FROM x GROUP BY 1""".stripMargin

  /** Levenshtein verification replayed over the SAME banded candidate
    * set (the minhash oracle rides along as a CTE, the clustersOracle
    * pattern) — both engines' builtin levenshtein is the classic DP.
    */
  private lazy val editVerifiedOracle: String =
    s"""WITH pairs AS (
       |$minhashOracle
       |),
       |t AS (SELECT doc_id, text FROM documents)
       |SELECT p.doc_a, p.doc_b,
       |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
       |  CAST(((greatest(strlen(a.text), strlen(b.text))
       |      - levenshtein(a.text, b.text)) * 1000000)
       |    // greatest(strlen(a.text), strlen(b.text)) AS BIGINT) AS sim_e6
       |FROM pairs p
       |JOIN t a ON a.doc_id = p.doc_a
       |JOIN t b ON b.doc_id = p.doc_b
       |WHERE greatest(strlen(a.text), strlen(b.text)) > 0
       |  AND ((greatest(strlen(a.text), strlen(b.text))
       |      - levenshtein(a.text, b.text)) * 1000000)
       |    // greatest(strlen(a.text), strlen(b.text)) >= 800000""".stripMargin

  /** The TextTiling replay: same gap grid, same block slices (Spark's
    * slice(start, LENGTH) vs DuckDB's list_slice(begin, END) rendered
    * to the same token ranges), same two-step cosine rounding, same
    * 2-gap neighborhood-peak windows.
    */
  private val textTilesOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS t,
       |    len(string_split(text, ' ')) AS n
       |  FROM documents WHERE len(string_split(text, ' ')) > 5),
       |g AS (SELECT doc_id, t, n,
       |    unnest(range(5, ((n - 1) // 5) * 5 + 1, 5)) AS g
       |  FROM d),
       |sides AS (
       |  SELECT doc_id, g, 0 AS side, ${dh("w")} AS wh FROM (
       |    SELECT doc_id, g,
       |      unnest(list_slice(t, greatest(1, g - 9), g)) AS w FROM g)
       |  UNION ALL
       |  SELECT doc_id, g, 1 AS side, ${dh("w")} AS wh FROM (
       |    SELECT doc_id, g,
       |      unnest(list_slice(t, g + 1, least(n, g + 10))) AS w FROM g)),
       |counts AS (SELECT doc_id, g, side, wh, count(*) AS c
       |  FROM sides GROUP BY 1, 2, 3, 4),
       |dt AS (SELECT a.doc_id, a.g, sum(a.c * b.c) AS dot
       |  FROM counts a JOIN counts b
       |    ON a.doc_id = b.doc_id AND a.g = b.g AND a.wh = b.wh
       |    AND a.side = 0 AND b.side = 1
       |  GROUP BY 1, 2),
       |na AS (SELECT doc_id, g, sum(c * c) AS na FROM counts
       |  WHERE side = 0 GROUP BY 1, 2),
       |nb AS (SELECT doc_id, g, sum(c * c) AS nb FROM counts
       |  WHERE side = 1 GROUP BY 1, 2),
       |sc AS (
       |  SELECT na.doc_id, na.g,
       |    CAST(round(round(CAST(coalesce(dt.dot, 0) AS DOUBLE) /
       |      sqrt(CAST(na.na AS DOUBLE) * CAST(nb.nb AS DOUBLE)), 6)
       |      * 1000000) AS BIGINT) AS cos_e6
       |  FROM na JOIN nb ON na.doc_id = nb.doc_id AND na.g = nb.g
       |  LEFT JOIN dt ON dt.doc_id = na.doc_id AND dt.g = na.g),
       |dep AS (
       |  SELECT doc_id, g, cos_e6,
       |    (coalesce(max(cos_e6) OVER (PARTITION BY doc_id ORDER BY g
       |       ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING), cos_e6) - cos_e6)
       |    + (coalesce(max(cos_e6) OVER (PARTITION BY doc_id ORDER BY g
       |       ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING), cos_e6) - cos_e6)
       |      AS depth_e6
       |  FROM sc)
       |SELECT doc_id, CAST(g AS BIGINT) AS gap_pos, cos_e6,
       |  CAST(depth_e6 AS BIGINT) AS depth_e6,
       |  CAST(CASE WHEN depth_e6 >= 150000 THEN 1 ELSE 0 END AS BIGINT)
       |    AS boundary
       |FROM dep""".stripMargin

  /** The stupid-backoff replay: train counts from the %10!=9 split at
    * INSTANCE granularity, heldout (doc, trigram) multiplicities, the
    * same deepest-seen-level CASE, HUGEINT ↔ DECIMAL(38,0) twins.
    */
  private val lmBackoffOracle: String = {
    def grams(k: Int, names: Seq[String]) = names.zipWithIndex.map {
      case (nm, j) =>
        s"unnest(list_transform(range(greatest(len(w) - ${k - 1}, 0)), " +
          s"i -> ${dh(s"w[i+${j + 1}]")})) AS $nm"
    }.mkString(",\n    ")
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w
       |  FROM documents),
       |tri AS (SELECT doc_id,
       |    ${grams(3, Seq("w1", "w2", "w3"))}
       |  FROM tok),
       |bi AS (SELECT doc_id,
       |    ${grams(2, Seq("b1", "b2"))}
       |  FROM tok),
       |uni AS (SELECT doc_id,
       |    unnest(list_transform(range(len(w)), i -> ${dh("w[i+1]")})) AS u
       |  FROM tok),
       |c3t AS (SELECT w1, w2, w3, count(*) AS c3 FROM tri
       |  WHERE doc_id % 10 != 9 GROUP BY 1, 2, 3),
       |c2t AS (SELECT b1, b2, count(*) AS c2 FROM bi
       |  WHERE doc_id % 10 != 9 GROUP BY 1, 2),
       |c1t AS (SELECT u, count(*) AS c1 FROM uni
       |  WHERE doc_id % 10 != 9 GROUP BY 1),
       |tt AS (SELECT sum(c1) AS n_tokens FROM c1t),
       |byd AS (SELECT doc_id, w1, w2, w3, count(*) AS m FROM tri
       |  WHERE doc_id % 10 = 9 GROUP BY 1, 2, 3, 4),
       |j AS (SELECT byd.doc_id, byd.m, c3t.c3, x2.c2 AS ctx2,
       |    n2.c2 AS num2, k1.c1 AS ctx1, k3.c1 AS num1, tt.n_tokens,
       |    CASE WHEN c3t.c3 IS NOT NULL THEN 3
       |      WHEN n2.c2 IS NOT NULL THEN 2
       |      WHEN k3.c1 IS NOT NULL THEN 1 ELSE 0 END AS level
       |  FROM byd
       |  LEFT JOIN c3t USING (w1, w2, w3)
       |  LEFT JOIN c2t x2 ON x2.b1 = byd.w1 AND x2.b2 = byd.w2
       |  LEFT JOIN c2t n2 ON n2.b1 = byd.w2 AND n2.b2 = byd.w3
       |  LEFT JOIN c1t k1 ON k1.u = byd.w2
       |  LEFT JOIN c1t k3 ON k3.u = byd.w3
       |  CROSS JOIN tt),
       |s AS (SELECT doc_id, m, level,
       |    CASE level
       |      WHEN 3 THEN CAST(c3 AS HUGEINT) * 1000000 // ctx2
       |      WHEN 2 THEN
       |        (4 * (CAST(num2 AS HUGEINT) * 1000000 // ctx1)) // 10
       |      WHEN 1 THEN
       |        (16 * (CAST(num1 AS HUGEINT) * 1000000 // n_tokens)) // 100
       |      ELSE 0 END AS s_e6
       |  FROM j)
       |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_trigrams,
       |  CAST(sum(CASE WHEN level = 3 THEN m ELSE 0 END) AS BIGINT)
       |    AS hits3,
       |  CAST(sum(CASE WHEN level = 2 THEN m ELSE 0 END) AS BIGINT)
       |    AS hits2,
       |  CAST(sum(CASE WHEN level = 1 THEN m ELSE 0 END) AS BIGINT)
       |    AS hits1,
       |  CAST(sum(CASE WHEN level = 0 THEN m ELSE 0 END) AS BIGINT) AS oov,
       |  CAST(sum(CAST(m AS HUGEINT) * s_e6) // sum(m) AS BIGINT)
       |    AS lm_backoff_e6
       |FROM s GROUP BY 1""".stripMargin
  }

  /** The ngram pair chain with the containment epilogue — CTEs shared
    * textually with [[ngramOracle]] so the gram space cannot drift.
    */
  private val containmentOracle: String = {
    val front = ngramOracle.split("\\nSELECT doc_a")(0)
    s"""$front
       |SELECT doc_a, doc_b, n_common, sa.n_grams AS size_a,
       |  sb.n_grams AS size_b,
       |  (n_common * 1000000) // sa.n_grams AS contain_a_e6,
       |  (n_common * 1000000) // sb.n_grams AS contain_b_e6
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE greatest((n_common * 1000000) // sa.n_grams,
       |  (n_common * 1000000) // sb.n_grams) >= 500000""".stripMargin
  }

  /** Quantized-vector CTE for the knn oracles. */
  private val quantCte =
    """WITH e AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS qe
      |  FROM embeddings)
      |""".stripMargin

  private def dotSql(a: String, b: String) =
    s"CAST(list_sum(list_transform(range(64), i -> $a[i+1] * $b[i+1])) AS BIGINT)"

  /** The BM25 e6 fixed-point scoring chain as a CTE body ending in
    * `bmscore(doc_id, n_hits, score_e6)` — ONE definition shared by
    * q_bm25 and q_rrf_fusion so the hybrid oracle replays exactly the
    * scoring the standalone oracle pins.
    */
  private val bm25ScoredCtes: String =
    """tk AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |dlt AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY 1),
      |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl
      |  FROM dlt),
      |q(w) AS (VALUES ('spark'), ('merge'), ('window')),
      |tft AS (SELECT tk.doc_id, tk.w, count(*) AS tf
      |  FROM tk JOIN q USING (w) GROUP BY 1, 2),
      |dft AS (SELECT w, count(*) AS dft FROM tft GROUP BY 1),
      |base AS (
      |  -- every (x*y)//m below is the exact quotient-remainder split
      |  -- (x//m)*y + ((x%m)*y)//m, mirroring the Spark side so neither
      |  -- engine ever multiplies two corpus-sized factors (the naive
      |  -- form wraps Spark Longs / raises here at ~6M docs)
      |  SELECT t.doc_id, t.tf, d.dl, f.dft, st.n_docs,
      |    (st.total_dl // st.n_docs) * 1000000 +
      |      ((st.total_dl % st.n_docs) * 1000000) // st.n_docs AS avgdl_e6
      |  FROM tft t JOIN dlt d USING (doc_id) JOIN dft f USING (w)
      |  CROSS JOIN st),
      |c1 AS (SELECT *,
      |    ((dl * 1000000) // avgdl_e6) * 1000000 +
      |      (((dl * 1000000) % avgdl_e6) * 1000000) // avgdl_e6 AS ratio_e6
      |  FROM base),
      |c2 AS (SELECT *,
      |    1000000 - 750000 + 750000 * (ratio_e6 // 1000000) +
      |      (750000 * (ratio_e6 % 1000000)) // 1000000 AS norm_e6
      |  FROM c1),
      |c3 AS (SELECT *,
      |    tf * 1000000 + 1200000 * (norm_e6 // 1000000) +
      |      (1200000 * (norm_e6 % 1000000)) // 1000000 AS den
      |  FROM c2),
      |calc AS (
      |  SELECT doc_id,
      |    ((2 * (n_docs - dft) + 1) // (2 * dft + 1)) * 1000000 +
      |      (((2 * (n_docs - dft) + 1) % (2 * dft + 1)) * 1000000)
      |        // (2 * dft + 1) AS idf_e6,
      |    ((tf * (1200000 + 1000000)) // den) * 1000000 +
      |      (((tf * (1200000 + 1000000)) % den) * 1000000) // den AS tfpart_e6
      |  FROM c3),
      |bmscore AS (
      |  SELECT doc_id, count(*) AS n_hits,
      |    CAST(sum((idf_e6 // 1000000) * tfpart_e6 +
      |      ((idf_e6 % 1000000) * tfpart_e6) // 1000000) AS BIGINT) AS score_e6
      |  FROM calc GROUP BY 1)""".stripMargin

  /** The k-means trajectory as chained CTEs — one (assign, update) pair
    * per iteration, replaying Similarity.kmeansAssign step for step
    * (same seeds, same dist*k+cid argmin encoding, same floor(sum/cnt)
    * centroid update). Expects an `e(vec_id, qe)` CTE in scope; leaves
    * `af(vec_id, kk)` with kk = final dist * k + cid.
    */
  /** Lloyd-trajectory CTE chain replaying [[Similarity.kmeansAssign]]
    * step for step over the `src` CTE's (vec_id, qe). With a prefix the
    * chain becomes `${p}c0/${p}a1/.../${p}af` reading from any source —
    * the PQ oracle instantiates one prefixed chain per subspace.
    */
  private def kmeansCtes(k: Int, iters: Int, dims: Int,
                         src: String = "e", p: String = ""): String = {
    def dist(q: String, c: String) =
      s"CAST(list_sum(list_transform(range($dims), " +
        s"i -> ($q[i+1] - $c[i+1]) * ($q[i+1] - $c[i+1]))) AS BIGINT)"
    def assign(name: String, cents: String) =
      s"""$name AS (
         |  SELECT s.vec_id, min(${dist("s.qe", "c.cen")} * $k + c.cid) AS kk
         |  FROM $src s CROSS JOIN $cents c GROUP BY 1)""".stripMargin
    val c0 =
      s"""${p}c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
         |    qe AS cen
         |  FROM (SELECT vec_id, qe FROM $src ORDER BY vec_id LIMIT $k))""".stripMargin
    val steps = (1 to iters).map { n =>
      s"""${assign(s"${p}a$n", s"${p}c${n - 1}")},
         |${p}c$n AS (
         |  SELECT cid, list(m ORDER BY i) AS cen FROM (
         |    SELECT ${p}a$n.kk % $k AS cid, t.i,
         |      CAST(floor(CAST(sum(s.qe[t.i + 1]) AS DOUBLE) / count(*)) AS BIGINT) AS m
         |    FROM $src s JOIN ${p}a$n USING (vec_id) CROSS JOIN range($dims) t(i)
         |    GROUP BY 1, 2)
         |  GROUP BY cid)""".stripMargin
    }
    (c0 +: steps :+ assign(s"${p}af", s"${p}c$iters")).mkString(",\n")
  }

  /** The full IVF-PQ replay as a CTE chain ending in `adc` (vec_id,
    * cell, adc over the probed cells, query excluded) — shared by the
    * plain ADC top-k oracle and the exact-rerank oracle. Parameters are
    * pinned to the q_ivfpq_* queries' (4 cells, probe 2, m=4, ksub=8,
    * 2 rounds, query 0).
    */
  private def ivfPqCtes(): String = {
    val m = 4; val sub = 16; val ksub = 8; val iters = 2
    val nCells = 4; val nProbe = 2
    def dist(dims: Int, a: String, b: String) =
      s"CAST(list_sum(list_transform(range($dims), " +
        s"i -> ($a[i+1] - $b[i+1]) * ($a[i+1] - $b[i+1]))) AS BIGINT)"
    def distOff(off: Int, dims: Int, a: String, b: String) =
      s"CAST(list_sum(list_transform(range($dims), " +
        s"i -> ($a[$off + i + 1] - $b[i+1]) * ($a[$off + i + 1] - $b[i+1]))) AS BIGINT)"
    val residChains = (0 until m).map { i =>
      s"""r$i AS (SELECT vec_id,
         |  list_transform(range($sub), j -> qe[${i * sub} + j + 1]) AS qe
         |  FROM resid),
         |${kmeansCtes(ksub, iters, sub, src = s"r$i", p = s"s${i}_")},
         |t$i AS (
         |  SELECT qr.cell, b.cid,
         |    ${distOff(i * sub, sub, "qr.qe", "b.cen")} AS d
         |  FROM qr CROSS JOIN s${i}_c$iters b)""".stripMargin
    }.mkString(",\n")
    val codeCols = (0 until m)
      .map(i => s"s${i}_af.kk % $ksub AS c$i").mkString(", ")
    val codeJoins = (0 until m)
      .map(i => s"JOIN s${i}_af ON resid.vec_id = s${i}_af.vec_id")
      .mkString(" ")
    val tblJoins = (0 until m)
      .map(i => s"JOIN t$i ON codes.cell = t$i.cell AND codes.c$i = t$i.cid")
      .mkString(" ")
    val adcSum = (0 until m).map(i => s"t$i.d").mkString(" + ")
    s"""${quantCte.trim},
       |${kmeansCtes(nCells, iters, 64, src = "e", p = "cc_")},
       |cells AS (SELECT vec_id, kk % $nCells AS cell FROM cc_af),
       |resid AS (
       |  SELECT e.vec_id, cells.cell,
       |    list_transform(range(64), j -> e.qe[j+1] - c.cen[j+1]) AS qe
       |  FROM e JOIN cells USING (vec_id)
       |  JOIN cc_c$iters c ON cells.cell = c.cid),
       |q AS (SELECT qe FROM e WHERE vec_id = 0),
       |probe AS (
       |  SELECT c.cid AS cell, ${dist(64, "q.qe", "c.cen")} AS d
       |  FROM cc_c$iters c CROSS JOIN q
       |  ORDER BY d, cell LIMIT $nProbe),
       |qr AS (
       |  SELECT p.cell,
       |    list_transform(range(64), j -> q.qe[j+1] - c.cen[j+1]) AS qe
       |  FROM probe p JOIN cc_c$iters c ON p.cell = c.cid CROSS JOIN q),
       |$residChains,
       |codes AS (
       |  SELECT resid.vec_id, resid.cell, $codeCols
       |  FROM resid $codeJoins),
       |adc AS (
       |  SELECT codes.vec_id, codes.cell, $adcSum AS adc
       |  FROM codes $tblJoins
       |  WHERE codes.vec_id != 0)""".stripMargin
  }

  /** The BPE merge trajectory as chained CTEs — one block per round,
    * replaying TextAnalysis.bpeTrainMerges step for step in the
    * DICTIONARY form: the corpus collapses once to its distinct
    * whitespace words with frequencies (`string_split(word, '')`
    * code-point symbols, '' → [''] — the trainer's split contract),
    * then each round counts freq-weighted adjacent pairs WITHIN words,
    * takes the same (freq DESC, a, b) argmax, and replays the same
    * gaps-and-islands non-overlapping left-to-right rewrite per word.
    * Leaves `m1..m{n}` (a, b, freq) for the final UNION and `s{n}` —
    * the fully-rewritten per-word symbol stream, i.e. the encoded form
    * of every dictionary word.
    */
  private def bpeCtes(nMerges: Int): String = bpeCtes(nMerges, wpScore = false)

  /** Train+encode replay shared by q_bpe_encode (in-query training) and
    * q_bpe_index (the same merges frozen as an at-rest artifact): the
    * round-4 dictionary stream IS the encoded corpus either way.
    */
  private lazy val bpeEncodeOracle: String =
    s"""WITH ${bpeCtes(4)},
       |wenc AS (
       |  SELECT word, count(*) AS n_syms,
       |    sum(CASE WHEN s LIKE '% %' THEN 1 ELSE 0 END) AS w_merged,
       |    sum(length(s)) AS w_len
       |  FROM s4 GROUP BY 1),
       |inst AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents)
       |SELECT doc_id, CAST(sum(n_syms) AS BIGINT) AS n_tokens,
       |  CAST(sum(w_merged) AS BIGINT) AS n_merged,
       |  CAST(sum(w_len) AS BIGINT) AS total_len
       |FROM inst JOIN wenc USING (word) GROUP BY 1""".stripMargin

  /** The accent tail every byte-BPE query appends to each doc: real
    * multi-byte words plus a 40-char é run whose (Ã,©)/(©,Ã) byte
    * pairs dominate the count table — the learned merges PROVE the
    * byte symbolization in the gate, not just in the spec.
    */
  private[graft] val ByteTail: String =
    " caf\u00e9 na\u00efve \u00fcber " + ("\u00e9" * 40)

  private def byteTailSql: String =
    "' caf' || chr(233) || ' na' || chr(239) || 've ' || chr(252) || " +
      "'ber ' || repeat(chr(233), 40)"

  /** Byte-level dictionary initialization: UTF-8 bytes via hex(word)
    * (DuckDB hex of a VARCHAR is its UTF-8 byte stream), each byte
    * mapped through the GPT-2 table rendered from the ONE Scala
    * definition ([[graft.functions.BpeKernels.ByteToCp]]).
    */
  private def byteS0: String = {
    val values = graft.functions.BpeKernels.ByteToCp.zipWithIndex
      .map { case (cp, b) => s"($b, $cp)" }.mkString(", ")
    s"""bmap AS (
       |  SELECT b, chr(cp) AS sym FROM (VALUES $values) t(b, cp)),
       |s0w AS (
       |  SELECT word, freq, hex(word) AS hx, strlen(word) AS nb FROM (
       |    SELECT word, count(*) AS freq
       |    FROM (SELECT unnest(string_split(text || $byteTailSql, ' '))
       |            AS word
       |          FROM documents)
       |    GROUP BY 1)),
       |s0p AS (
       |  SELECT word, freq, hx, unnest(range(nb)) AS pos FROM s0w),
       |s0 AS (
       |  SELECT word, freq, CAST(pos AS BIGINT) AS pos, m.sym AS s
       |  FROM s0p JOIN bmap m ON m.b =
       |    CAST('0x' || substr(hx, CAST(pos * 2 + 1 AS INTEGER), 2)
       |      AS INT))""".stripMargin
  }

  /** The BPE/WordPiece training replay: identical dictionary, pair
    * counting, and within-word rewrite chain; `wpScore = true` swaps
    * the round argmax from raw pair count to the WordPiece likelihood
    * ratio freq·1e12 ÷ (cnt(a)·cnt(b)) over HUGEINT (the Spark side's
    * DECIMAL(38,0) twin).
    */
  private def bpeCtes(nMerges: Int, wpScore: Boolean): String =
    bpeCtes(nMerges, wpScore, s0Override = None)

  /** `s0Override` swaps the dictionary-initialization CTE block (it
    * must end by defining `s0(word, freq, pos, s)`) — the byte-level
    * trainer reuses the whole round chain with only the symbolization
    * changed, exactly like the Spark side.
    */
  private def bpeCtes(nMerges: Int, wpScore: Boolean,
                      s0Override: Option[String]): String = {
    val s0 = s0Override.getOrElse(
      """s0 AS (
        |  SELECT word, freq, CAST(unnest(range(len(sy))) AS BIGINT) AS pos,
        |    unnest(sy) AS s
        |  FROM (
        |    SELECT word, count(*) AS freq, string_split(word, '') AS sy
        |    FROM (SELECT unnest(string_split(text, ' ')) AS word
        |          FROM documents)
        |    GROUP BY 1))""".stripMargin)
    val rounds = (1 to nMerges).map { r =>
      val p = s"s${r - 1}"
      val argmax =
        if (!wpScore)
          s"""m$r AS (SELECT a, b, freq FROM p$r
             |  ORDER BY freq DESC, a, b LIMIT 1),""".stripMargin
        else
          s"""u$r AS (SELECT s AS sym, CAST(sum(freq) AS BIGINT) AS cnt
             |  FROM $p GROUP BY 1),
             |m$r AS (
             |  SELECT a, b, freq, score_e12 FROM (
             |    SELECT p.a, p.b, p.freq,
             |      CAST(p.freq AS HUGEINT) * 1000000000000
             |        // (CAST(ua.cnt AS HUGEINT) * ub.cnt) AS score_e12
             |    FROM p$r p JOIN u$r ua ON p.a = ua.sym
             |      JOIN u$r ub ON p.b = ub.sym)
             |  ORDER BY score_e12 DESC, a, b LIMIT 1),""".stripMargin
      s"""p$r AS (
         |  SELECT a, b, CAST(sum(freq) AS BIGINT) AS freq FROM (
         |    SELECT freq, s AS a,
         |      lead(s) OVER (PARTITION BY word ORDER BY pos) AS b
         |    FROM $p)
         |  WHERE b IS NOT NULL GROUP BY 1, 2),
         |$argmax
         |c$r AS (
         |  SELECT t.word, t.freq, t.pos, t.s,
         |    row_number() OVER (PARTITION BY t.word ORDER BY t.pos) AS seq,
         |    (t.s = m.a AND coalesce(
         |      lead(t.s) OVER (PARTITION BY t.word ORDER BY t.pos) = m.b,
         |      FALSE)) AS cand
         |  FROM $p t CROSS JOIN m$r m),
         |g$r AS (
         |  SELECT *, seq - sum(CASE WHEN cand THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY word ORDER BY seq) AS grp
         |  FROM c$r),
         |k$r AS (
         |  SELECT *, cand AND (row_number() OVER (
         |      PARTITION BY word, grp, cand ORDER BY seq) % 2 = 1) AS keep
         |  FROM g$r),
         |d$r AS (
         |  SELECT *, coalesce(lag(keep) OVER (
         |      PARTITION BY word ORDER BY seq), FALSE) AS consumed
         |  FROM k$r),
         |s$r AS (
         |  SELECT d.word, d.freq, d.pos,
         |    CASE WHEN d.keep THEN m.a || ' ' || m.b ELSE d.s END AS s
         |  FROM d$r d CROSS JOIN m$r m WHERE NOT d.consumed)""".stripMargin
    }
    (s0 +: rounds).mkString(",\n")
  }

  private val knnJoinOracle: String = {
    val cos = "round(CAST(" + dotSql("e.qe", "q.q_emb") +
      " AS DOUBLE) / sqrt(CAST(" + dotSql("e.qe", "e.qe") +
      " AS DOUBLE) * CAST(" + dotSql("q.q_emb", "q.q_emb") +
      " AS DOUBLE)), 6)"
    s"""${quantCte.trim},
       |q AS (SELECT vec_id AS q_id, qe AS q_emb FROM e WHERE vec_id < 8),
       |d AS (
       |  SELECT q.q_id, e.vec_id, $cos AS cosine_r
       |  FROM e CROSS JOIN q WHERE e.vec_id != q.q_id)
       |SELECT q_id, vec_id, cosine_r, rn FROM (
       |  SELECT q_id, vec_id, cosine_r,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY cosine_r DESC, vec_id) AS rn
       |  FROM d) WHERE rn <= 5""".stripMargin
  }

  /** knnJoinOracle's chain with the DPR twist: a 20-deep shortlist
    * window, the label!=q_label positive drop, then a second window
    * re-ranking the survivors 1..5.
    */
  private val hardNegativesOracle: String = {
    val cos = "round(CAST(" + dotSql("e.qe", "q.q_emb") +
      " AS DOUBLE) / sqrt(CAST(" + dotSql("e.qe", "e.qe") +
      " AS DOUBLE) * CAST(" + dotSql("q.q_emb", "q.q_emb") +
      " AS DOUBLE)), 6)"
    s"""${quantCte.trim},
       |q AS (SELECT vec_id AS q_id, label AS q_label, qe AS q_emb
       |  FROM e WHERE vec_id < 8),
       |d AS (
       |  SELECT q.q_id, q.q_label, e.vec_id, e.label, $cos AS cosine_r
       |  FROM e CROSS JOIN q WHERE e.vec_id != q.q_id),
       |sl AS (SELECT * FROM (
       |  SELECT d.*, ROW_NUMBER() OVER (PARTITION BY q_id
       |    ORDER BY cosine_r DESC, vec_id) AS srn FROM d) WHERE srn <= 20)
       |SELECT q_id, q_label, neg_id, neg_label, cosine_r, rn FROM (
       |  SELECT q_id, q_label, vec_id AS neg_id, label AS neg_label,
       |    cosine_r,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY cosine_r DESC, vec_id) AS rn
       |  FROM sl WHERE label != q_label) WHERE rn <= 5""".stripMargin
  }

  /** Replays every greedy MMR step as its own CTE pair: c_t scores the
    * remaining shortlist against the selected set s_1..s_{t-1} (max
    * pair sim from the SAME e6 pair table the Spark side computes),
    * s_t takes the argmax with the id tie-break. All-integer after the
    * 6-decimal cosine rounding, so the trajectory is engine-exact.
    */
  private val mmrOracle: String = {
    def cos(a: String, b: String) =
      s"round(CAST(${dotSql(a, b)} AS DOUBLE) / sqrt(CAST(${dotSql(a, a)}" +
        s" AS DOUBLE) * CAST(${dotSql(b, b)} AS DOUBLE)), 6)"
    val steps = (2 to 5).map { t =>
      val selPrev = (1 until t).map(i => s"SELECT vec_id FROM s$i")
        .mkString(" UNION ALL ")
      s"""c$t AS (
         |  SELECT sl.vec_id, sl.rel_e6, max(ps.sim_e6) AS ms
         |  FROM sl JOIN ps ON ps.a = sl.vec_id
         |    AND ps.b IN ($selPrev)
         |  WHERE sl.vec_id NOT IN ($selPrev)
         |  GROUP BY 1, 2),
         |s$t AS (SELECT CAST($t AS BIGINT) AS step, vec_id, rel_e6,
         |  ms AS maxsim_e6, 7 * rel_e6 - 3 * ms AS score_e6
         |  FROM c$t ORDER BY score_e6 DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val union = (1 to 5).map(i => s"SELECT * FROM s$i")
      .mkString(" UNION ALL ")
    s"""${quantCte.trim},
       |q AS (SELECT qe AS q_emb FROM e WHERE vec_id = 0),
       |dd AS (SELECT vec_id, qe,
       |  CAST(round(${cos("qe", "q_emb")} * 1000000) AS BIGINT) AS rel_e6
       |  FROM e CROSS JOIN q WHERE vec_id != 0),
       |sl AS (SELECT * FROM dd ORDER BY rel_e6 DESC, vec_id LIMIT 12),
       |ps AS (SELECT x.vec_id AS a, y.vec_id AS b,
       |  CAST(round(${cos("x.qe", "y.qe")} * 1000000) AS BIGINT) AS sim_e6
       |  FROM sl x JOIN sl y ON x.vec_id != y.vec_id),
       |s1 AS (SELECT CAST(1 AS BIGINT) AS step, vec_id, rel_e6,
       |  CAST(0 AS BIGINT) AS maxsim_e6, 7 * rel_e6 AS score_e6
       |  FROM sl ORDER BY rel_e6 DESC, vec_id LIMIT 1),
       |$steps
       |$union""".stripMargin
  }

  /** Replays the ratio-margin mining all-integer: the same 6-decimal
    * cosine rounding as knnJoinOracle feeds e6 fixed-point sums, and
    * the margin divides positive integers on both engines (floor ==
    * trunc there, so DuckDB's `//` matches Spark's `DIV`).
    */
  private val bitextMineOracle: String = {
    def cos(a: String, b: String) =
      s"round(CAST(${dotSql(a, b)} AS DOUBLE) / sqrt(CAST(${dotSql(a, a)}" +
        s" AS DOUBLE) * CAST(${dotSql(b, b)} AS DOUBLE)), 6)"
    // blockBitsFor replayed: 0 below the 1024 target, else
    // ceil(log2(ceil(n/1024))) capped at 24; the cell is the sign
    // bucket of the first `bits` RAW components (not the quantized
    // ones: floor() maps (0, 1e-7) to 0, flipping the sign test)
    s"""WITH n AS (SELECT GREATEST(
       |    (SELECT count(*) FROM embeddings WHERE vec_id % 2 = 0),
       |    (SELECT count(*) FROM embeddings WHERE vec_id % 2 = 1)) AS cnt),
       |bb AS (SELECT CASE WHEN cnt <= 1024 THEN 0
       |    ELSE LEAST(24, CAST(ceil(log2(
       |      CAST((cnt + 1023) // 1024 AS DOUBLE))) AS INT)) END AS bits
       |  FROM n),
       |e AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS qe,
       |    CAST(coalesce(list_sum(list_transform(
       |      range((SELECT bits FROM bb)),
       |      i -> CASE WHEN embedding[i + 1] > 0
       |        THEN CAST(1 AS BIGINT) << i ELSE 0 END)), 0) AS BIGINT)
       |      AS cell
       |  FROM embeddings),
       |src AS (SELECT vec_id, qe, cell FROM e WHERE vec_id % 2 = 0),
       |tgt AS (SELECT vec_id, qe, cell FROM e WHERE vec_id % 2 = 1),
       |fd AS (
       |  SELECT s.vec_id AS src_id, t.vec_id AS tgt_id,
       |    CAST(round(${cos("s.qe", "t.qe")} * 1000000) AS BIGINT) AS cos_e6,
       |    ROW_NUMBER() OVER (PARTITION BY s.vec_id
       |      ORDER BY ${cos("s.qe", "t.qe")} DESC, t.vec_id) AS rn
       |  FROM src s JOIN tgt t ON s.cell = t.cell),
       |bd AS (
       |  SELECT t.vec_id AS tgt_id, s.vec_id AS src_id,
       |    CAST(round(${cos("t.qe", "s.qe")} * 1000000) AS BIGINT) AS cos_e6,
       |    ROW_NUMBER() OVER (PARTITION BY t.vec_id
       |      ORDER BY ${cos("t.qe", "s.qe")} DESC, s.vec_id) AS rn
       |  FROM tgt t JOIN src s ON s.cell = t.cell),
       |fs AS (SELECT src_id, sum(cos_e6) AS fsum, count(*) AS fk
       |  FROM fd WHERE rn <= 4 GROUP BY 1),
       |bs AS (SELECT tgt_id, sum(cos_e6) AS bsum, count(*) AS bk
       |  FROM bd WHERE rn <= 4 GROUP BY 1),
       |m AS (
       |  SELECT b.src_id, b.tgt_id, b.cos_e6,
       |    CAST(b.cos_e6 * (fs.fk + bs.bk) * 1000000
       |      // (fs.fsum + bs.bsum) AS BIGINT) AS margin_e6
       |  FROM fd b JOIN fs USING (src_id) JOIN bs USING (tgt_id)
       |  WHERE b.rn = 1 AND b.cos_e6 > 0 AND fs.fsum + bs.bsum > 0)
       |SELECT src_id, tgt_id, cos_e6, margin_e6
       |FROM m WHERE margin_e6 >= 1000000""".stripMargin
  }

  /** Replays the bloom construction bit for bit: same 60-bit md5, same
    * Kirsch–Mitzenmacher double hashing, same 32-bit words — the
    * maybe_present verdicts (including any designed-rate false
    * positives) must agree exactly.
    */
  private val bloomDedupOracle: String = {
    val posOf = s"((h % 65536) + i * ((h >> 30) * 2 + 1)) % 65536"
    s"""WITH ks AS (VALUES (0),(1),(2),(3),(4)),
       |sh AS (SELECT ${dh("text")} AS h FROM documents),
       |sp AS (SELECT $posOf AS pos FROM sh CROSS JOIN ks t(i)),
       |bloom AS (SELECT pos >> 5 AS word,
       |    bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
       |  FROM sp GROUP BY 1),
       |ph AS (SELECT doc_id, ${dh(
            "CASE WHEN doc_id % 2 = 0 THEN text ELSE text || '~' END")} AS h
       |  FROM documents),
       |pp AS (SELECT doc_id, $posOf AS pos FROM ph CROSS JOIN ks t(i))
       |SELECT pp.doc_id,
       |  bool_and((coalesce(b.bits, 0) &
       |    (CAST(1 AS BIGINT) << CAST(pp.pos % 32 AS INT))) <> 0)
       |    AS maybe_present
       |FROM pp LEFT JOIN bloom b ON (pp.pos >> 5) = b.word
       |GROUP BY pp.doc_id""".stripMargin
  }

  /** Replays the profile training + overlap classification: char
    * trigrams (spaces included), per-lang and per-doc top-64 with
    * (count desc, gram) tie-breaks, argmax with (overlap desc, lang)
    * tie-break, 'und' for zero-overlap docs.
    */
  private val langidTrainedOracle: String =
    """WITH tg AS (
      |  SELECT doc_id, lang,
      |    unnest(CASE WHEN length(text) < 3 THEN []::VARCHAR[]
      |      ELSE list_transform(range(0, length(text) - 2),
      |        s -> substring(text, CAST(s + 1 AS INT), 3)) END) AS gram
      |  FROM documents),
      |prof AS (
      |  SELECT lang, gram FROM (
      |    SELECT lang, gram, ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY count(*) DESC, gram) AS rk
      |    FROM tg WHERE doc_id % 2 = 0 GROUP BY lang, gram)
      |  WHERE rk <= 64),
      |dt AS (
      |  SELECT doc_id, gram FROM (
      |    SELECT doc_id, gram, ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY count(*) DESC, gram) AS rk
      |    FROM tg WHERE doc_id % 2 = 1 GROUP BY doc_id, gram)
      |  WHERE rk <= 64),
      |ov AS (
      |  SELECT doc_id, p.lang, count(*) AS overlap
      |  FROM dt JOIN prof p USING (gram) GROUP BY 1, 2),
      |best AS (
      |  SELECT doc_id, lang AS pred_lang, overlap FROM (
      |    SELECT doc_id, lang, overlap, ROW_NUMBER() OVER (
      |      PARTITION BY doc_id ORDER BY overlap DESC, lang) AS rk
      |    FROM ov) WHERE rk = 1)
      |SELECT d.doc_id,
      |  coalesce(b.pred_lang, 'und') AS pred_lang,
      |  coalesce(b.overlap, 0) AS overlap
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
      |LEFT JOIN best b USING (doc_id)""".stripMargin

  /** length(), NOT strlen: DuckDB strlen counts BYTES — on a non-ASCII
    * word its offset range would overrun characters and emit spurious
    * empty pieces; length counts characters, matching Spark's length().
    */
  private val unigramSeedOracle: String =
    """WITH wds AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |wc AS (SELECT w, count(*) AS n FROM wds WHERE w <> '' GROUP BY 1),
      |subs AS (SELECT n, unnest(flatten(list_transform(range(0, length(w)),
      |    s -> list_transform(range(1, least(6, length(w) - s) + 1),
      |      l -> substring(w, CAST(s + 1 AS INT), CAST(l AS INT)))))) AS piece
      |  FROM wc),
      |agg AS (SELECT piece, CAST(sum(n) AS BIGINT) AS cnt FROM subs GROUP BY 1)
      |SELECT piece, cnt FROM agg
      |WHERE length(piece) = 1 OR cnt >= 2
      |ORDER BY cnt DESC, piece LIMIT 50""".stripMargin

  /** Interpolated bigram LM: λ·P(w2|w1) + (1−λ)·P(w2), all e6 integer
    * — mirrors lmScoreInterpolated's exact division order.
    */
  /** Bigram-hash count CTEs (t/th/inst/byd/c2t/c1t) shared by the LM
    * scorer oracles — one tokenize/hash/count definition for the whole
    * family.
    */
  private val bigramCtes: String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |th AS (
       |  SELECT doc_id, list_transform(w, x -> ${dh("x")}) AS hs FROM t),
       |inst AS (
       |  SELECT doc_id, unnest(hs[1:len(hs)-1]) AS pw,
       |    unnest(hs[2:len(hs)]) AS sw FROM th),
       |byd AS (
       |  SELECT doc_id, pw, sw, count(*) AS m FROM inst
       |  GROUP BY 1, 2, 3),
       |c2t AS (SELECT pw, sw, sum(m) AS c2 FROM byd GROUP BY 1, 2),
       |c1t AS (SELECT pw, sum(m) AS c1 FROM byd GROUP BY 1)""".stripMargin

  /** The at-rest-index serve replayed with the train/heldout split: the
    * count tables derive from the train instances only, the heldout
    * tenth LEFT-joins them (the unseen contract: unseen bigram → prior
    * only, unseen word → 0 from that term), same e6 mix and truncating
    * divisions as lmInterpOracle.
    */
  private val lmIndexOracle: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
       |  FROM documents),
       |th AS (
       |  SELECT doc_id, list_transform(w, x -> ${dh("x")}) AS hs FROM t),
       |inst AS (
       |  SELECT doc_id, unnest(hs[1:len(hs)-1]) AS pw,
       |    unnest(hs[2:len(hs)]) AS sw FROM th),
       |tr AS (SELECT pw, sw FROM inst WHERE doc_id % 10 != 9),
       |c2t AS (SELECT pw, sw, count(*) AS c2 FROM tr GROUP BY 1, 2),
       |c1t AS (SELECT pw, count(*) AS c1 FROM tr GROUP BY 1),
       |cwt AS (SELECT sw, count(*) AS cw FROM tr GROUP BY 1),
       |tt AS (SELECT count(*) AS tot FROM tr),
       |byd AS (
       |  SELECT doc_id, pw, sw, count(*) AS m FROM inst
       |  WHERE doc_id % 10 = 9 GROUP BY 1, 2, 3)
       |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
       |  CAST(sum(m * ((700000 * (CASE WHEN coalesce(c1, 0) > 0
       |      THEN coalesce(c2, 0) * 1000000 // c1 ELSE 0 END)
       |    + 300000 * (coalesce(cw, 0) * 1000000 // tot)) // 1000000))
       |    // sum(m) AS BIGINT) AS lm_i_score_e6
       |FROM byd LEFT JOIN c2t USING (pw, sw) LEFT JOIN c1t USING (pw)
       |  LEFT JOIN cwt USING (sw) CROSS JOIN tt
       |GROUP BY doc_id""".stripMargin

  private val lmInterpOracle: String =
    s"""WITH $bigramCtes,
       |cwt AS (SELECT sw, sum(m) AS cw FROM byd GROUP BY 1),
       |tt AS (SELECT sum(cw) AS tot FROM cwt)
       |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
       |  CAST(sum(m * ((700000 * (c2 * 1000000 // c1)
       |    + 300000 * (cw * 1000000 // tot)) // 1000000)) // sum(m)
       |    AS BIGINT) AS lm_i_score_e6
       |FROM byd JOIN c2t USING (pw, sw) JOIN c1t USING (pw)
       |  JOIN cwt USING (sw) CROSS JOIN tt
       |GROUP BY doc_id""".stripMargin

  /** The KN replay: continuation counts are DISTINCT-type counts over
    * the bigram-type table c2t, exactly as the Spark side derives them;
    * DuckDB's HUGEINT arithmetic twins Spark's DECIMAL(38,0).
    */
  private val lmKneserNeyOracle: String =
    s"""WITH $bigramCtes,
       |n1pp AS (SELECT pw, count(*) AS n1p_p FROM c2t GROUP BY 1),
       |n1pw AS (SELECT sw, count(*) AS n1p_w FROM c2t GROUP BY 1),
       |ty AS (SELECT count(*) AS n_types FROM c2t)
       |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
       |  -- HUGEINT casts before every *1e6 product: a bigram count past
       |  -- ~9.2e12 (in range at the 100 TB scale) must not raise here
       |  -- while Spark's DECIMAL(38,0) keeps going — the same overflow
       |  -- class the BM25 oracle splits guard against
       |  CAST(sum(CAST(m AS HUGEINT) *
       |    (greatest(CAST(c2 AS HUGEINT) * 1000000 - 750000, 0) // c1
       |    + (((750000 * CAST(n1p_p AS HUGEINT)) // c1)
       |       * (CAST(n1p_w AS HUGEINT) * 1000000 // n_types))
       |      // 1000000)) // sum(m)
       |    AS BIGINT) AS lm_kn_score_e6
       |FROM byd JOIN c2t USING (pw, sw) JOIN c1t USING (pw)
       |  JOIN n1pp USING (pw) JOIN n1pw USING (sw) CROSS JOIN ty
       |GROUP BY doc_id""".stripMargin

  private val sourceReportOracle: String =
    s"""WITH $qualityCtes,
       |srb AS (SELECT doc_id, source, lang, ${dh("text")} AS hsh
       |  FROM documents),
       |srdup AS (SELECT hsh FROM srb GROUP BY hsh HAVING count(*) > 1),
       |srf AS (
       |  SELECT b.doc_id, b.source, b.lang,
       |    CASE WHEN d.hsh IS NULL THEN 0 ELSE 1 END AS isdup
       |  FROM srb b LEFT JOIN srdup d ON b.hsh = d.hsh),
       |agg AS (
       |  SELECT f.source, count(*) AS n_docs,
       |    CAST(sum(q.n_tokens) AS BIGINT) AS n_tokens,
       |    CAST(sum(q.quality) * 100 // count(*) AS BIGINT)
       |      AS mean_quality_e2,
       |    count(DISTINCT f.lang) AS n_langs,
       |    CAST(sum(f.isdup) AS BIGINT) AS n_dup_docs
       |  FROM srf f JOIN qout q USING (doc_id) GROUP BY 1)
       |SELECT source, n_docs, n_tokens, mean_quality_e2, n_langs,
       |  n_dup_docs,
       |  CAST(n_dup_docs * 1000000 // n_docs AS BIGINT) AS dup_ratio_e6
       |FROM agg""".stripMargin

  private val reservoirOracle: String =
    s"""SELECT doc_id, source,
       |  ${dhSalted("res8")} AS sample_rank
       |FROM documents
       |ORDER BY sample_rank, doc_id
       |LIMIT 100""".stripMargin

  private val corpusDiffOracle: String =
    s"""WITH a AS (SELECT doc_id, ${dh("text")} AS hash_a, 1 AS in_a
       |  FROM documents WHERE doc_id % 7 <> 0),
       |b AS (SELECT doc_id, ${dh(
          "CASE WHEN doc_id % 3 = 0 THEN text || 'X' ELSE text END")} AS hash_b,
       |    1 AS in_b
       |  FROM documents WHERE doc_id % 5 <> 0),
       |j AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, hash_a, hash_b,
       |    CASE WHEN in_a IS NULL THEN 'added'
       |         WHEN in_b IS NULL THEN 'removed'
       |         WHEN hash_a IS NOT DISTINCT FROM hash_b THEN 'unchanged'
       |         ELSE 'changed' END AS status
       |  FROM a FULL JOIN b ON a.doc_id = b.doc_id)
       |SELECT doc_id, hash_a, hash_b, status FROM j
       |WHERE status <> 'unchanged'""".stripMargin

  private val knnBruteOracle: String =
    s"""${quantCte.trim},
       |q AS (SELECT qe AS query_qe FROM e WHERE vec_id = 0),
       |d AS (
       |  SELECT vec_id, label,
       |    ${dotSql("qe", "query_qe")} AS dot,
       |    ${dotSql("qe", "qe")} AS na,
       |    ${dotSql("query_qe", "query_qe")} AS nb
       |  FROM e CROSS JOIN q WHERE vec_id != 0)
       |SELECT vec_id, label,
       |  round(CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS cosine_r
       |FROM d ORDER BY cosine_r DESC, vec_id LIMIT 10""".stripMargin

  private val knnIvfOracle: String = {
    val cell = (0 until 3)
      .map(i => s"(CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS qe,
       |    CAST($cell AS BIGINT) AS cell
       |  FROM embeddings),
       |q AS (SELECT qe AS query_qe, cell AS q_cell FROM e WHERE vec_id = 0),
       |d AS (
       |  SELECT vec_id, cell,
       |    ${dotSql("qe", "query_qe")} AS dot,
       |    ${dotSql("qe", "qe")} AS na,
       |    ${dotSql("query_qe", "query_qe")} AS nb
       |  FROM e CROSS JOIN q WHERE vec_id != 0 AND cell = q_cell)
       |SELECT vec_id, cell,
       |  round(CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS cosine_r
       |FROM d ORDER BY cosine_r DESC, vec_id LIMIT 5""".stripMargin
  }

  private val substringDupOracle: String = {
    // the 8-token window string, built the same way the Spark side's
    // shinglesOfTokens builds it (concat_ws over 8 consecutive tokens)
    val wincat = (0 until 8).map(j => s"w[i+${j + 1}]").mkString("||' '||")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |win AS (SELECT DISTINCT doc_id, ${dh("sh")} AS wh FROM (
       |  SELECT doc_id, unnest(list_transform(range(greatest(len(w)-7, 0)),
       |    i -> $wincat)) AS sh
       |  FROM toks)),
       |counts AS (SELECT wh, count(*) AS n_docs FROM win GROUP BY 1)
       |SELECT doc_id, count(*) AS n_windows,
       |  CAST(count(*) FILTER (WHERE n_docs > 1) AS BIGINT) AS n_shared
       |FROM win JOIN counts USING (wh)
       |GROUP BY doc_id""".stripMargin
  }

  private val winnowOracle: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |grams AS (SELECT doc_id, greatest(len(w)-2, 0) AS n_grams,
       |  unnest(range(greatest(len(w)-2, 0))) AS pos,
       |  unnest(list_transform(range(greatest(len(w)-2, 0)),
       |    i -> ${dh("w[i+1]||' '||w[i+2]||' '||w[i+3]")})) AS g
       |  FROM toks),
       |fps AS (SELECT doc_id, pos, n_grams,
       |  min(g) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
       |  FROM grams)
       |SELECT doc_id, count(DISTINCT fp) AS n_fp,
       |  min(fp) AS fp_min, max(fp) AS fp_max
       |FROM fps WHERE pos <= n_grams - 4
       |GROUP BY doc_id""".stripMargin

  private val labelCentroidsOracle: String =
    """WITH e AS (
      |  SELECT label,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS qe
      |  FROM embeddings)
      |SELECT label, CAST(i AS INT) AS pos, count(*) AS n,
      |  CAST(sum(qe[i+1]) AS BIGINT) AS sum_q,
      |  round(CAST(sum(qe[i+1]) AS DOUBLE) / count(*) / 10000000, 6) AS mean_r
      |FROM e CROSS JOIN range(64) t(i)
      |GROUP BY 1, 2""".stripMargin

  /** nProbe = nCells ⇒ every vector is scanned: the oracle is exact
    * brute-force cosine, independent of where k-means put the cells.
    */
  private val knnIvfTrainedOracle: String =
    s"""${quantCte.trim},
       |q AS (SELECT qe AS query_qe FROM e WHERE vec_id = 0),
       |d AS (
       |  SELECT vec_id,
       |    ${dotSql("qe", "query_qe")} AS dot,
       |    ${dotSql("qe", "qe")} AS na,
       |    ${dotSql("query_qe", "query_qe")} AS nb
       |  FROM e CROSS JOIN q WHERE vec_id != 0)
       |SELECT vec_id,
       |  round(CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS cosine_r
       |FROM d ORDER BY cosine_r DESC, vec_id LIMIT 10""".stripMargin

  private val langIdOracle: String = {
    val markers = TextAnalysis.langMarkers
    val scores = markers.map { case (lang, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), x -> x IN ($inList))) AS score_$lang"
    }.mkString(",\n    ")
    val langs = markers.map(_._1)
    val caseChain = langs.map { lang =>
      val geAll = langs.filter(_ != lang)
        .map(o => s"score_$lang >= score_$o").mkString(" AND ")
      s"WHEN score_$lang > 0 AND $geAll THEN '$lang'"
    }.mkString("\n    ")
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    $scores
       |  FROM documents)
       |SELECT doc_id, lang, score_en, score_de,
       |  CASE
       |    $caseChain
       |    ELSE 'und' END AS predicted_lang
       |FROM scored""".stripMargin
  }

  private val clustersOracle: String =
    s"""WITH RECURSIVE pairs AS (
       |$minhashOracle
       |),
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION
       |  SELECT doc_b AS a, doc_a AS b FROM pairs),
       |reach AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       |SELECT a AS doc_id, least(min(b), a) AS cluster
       |FROM reach GROUP BY a""".stripMargin

  private val sourceOverlapOracle: String = {
    val wincat = (0 until 8).map(j => s"w[i+${j + 1}]").mkString("||' '||")
    s"""WITH toks AS (SELECT source, string_split(text, ' ') AS w FROM documents),
       |win AS (SELECT DISTINCT source AS src, ${dh("sh")} AS wh FROM (
       |  SELECT source, unnest(list_transform(range(greatest(len(w)-7, 0)),
       |    i -> $wincat)) AS sh
       |  FROM toks))
       |SELECT a.src AS source_a, b.src AS source_b,
       |  count(*) AS n_shared_windows
       |FROM win a JOIN win b ON a.wh = b.wh AND a.src < b.src
       |GROUP BY 1, 2""".stripMargin
  }

  private val leakageSplitOracle: String = {
    val key = "coalesce(c.cluster, d.doc_id)"
    s"""WITH comp AS (
       |$clustersOracle
       |)
       |SELECT d.doc_id, $key AS split_key,
       |  CASE WHEN ${dh(s"'split|' || CAST($key AS VARCHAR)")} % 1000 < 100
       |       THEN 'validation' ELSE 'train' END AS split
       |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id""".stripMargin
  }

  /** Quality + token count per doc (mirrors TextAnalysis.qualityScore). */
  private val scoredCte: String =
    """scored AS (
      |  SELECT doc_id,
      |    (CASE WHEN strlen(text) BETWEEN 100 AND 2000 THEN 1 ELSE 0 END) +
      |    (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 500 THEN 1 ELSE 0 END) +
      |    (CASE WHEN (strlen(text) - strlen(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 10
      |          <= len(string_split(text, ' ')) THEN 1 ELSE 0 END) +
      |    (CASE WHEN len(list_filter(string_split(text, ' '),
      |        x -> x IN ('the', 'a', 'of', 'and', 'is'))) > 0 THEN 1 ELSE 0 END) AS quality,
      |    len(string_split(text, ' ')) AS n_tokens
      |  FROM documents)""".stripMargin

  private val keepCanonicalOracle: String =
    s"""WITH comp AS (
       |$clustersOracle
       |),
       |$scoredCte,
       |j AS (
       |  SELECT c.cluster, c.doc_id, s.quality, s.n_tokens,
       |    row_number() OVER (PARTITION BY c.cluster
       |      ORDER BY s.quality DESC, c.doc_id) AS rk
       |  FROM comp c JOIN scored s USING (doc_id))
       |SELECT cluster,
       |  MAX(CASE WHEN rk = 1 THEN doc_id END) AS canonical_id,
       |  MAX(CASE WHEN rk = 1 THEN quality END) AS canonical_quality,
       |  COUNT(*) AS n_members,
       |  CAST(SUM(CASE WHEN rk <> 1 THEN n_tokens ELSE 0 END) AS BIGINT)
       |    AS tokens_dropped
       |FROM j GROUP BY cluster""".stripMargin

  private val tokenBudgetOracle: String = {
    val h = dhSalted("budget")
    s"""WITH $scoredCte,
       |q AS (
       |  SELECT doc_id, quality, n_tokens, $h % 16 AS bkt, $h AS h
       |  FROM scored),
       |cells AS (
       |  SELECT quality, bkt, CAST(SUM(n_tokens) AS BIGINT) AS cell
       |  FROM q GROUP BY 1, 2),
       |cum AS (
       |  SELECT quality, bkt, cell,
       |    COALESCE(SUM(cell) OVER (ORDER BY quality DESC, bkt
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
       |  FROM cells),
       |full_cells AS (
       |  SELECT quality, bkt FROM cum WHERE cum + cell <= 10000),
       |boundary AS (
       |  SELECT quality, bkt, 10000 - cum AS rem FROM cum
       |  WHERE cum < 10000 AND cum + cell > 10000),
       |bsel AS (
       |  SELECT doc_id, quality, n_tokens FROM (
       |    SELECT q.doc_id, q.quality, q.n_tokens, b.rem,
       |      SUM(q.n_tokens) OVER (PARTITION BY q.quality, q.bkt
       |        ORDER BY q.h, q.doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
       |    FROM q JOIN boundary b ON q.quality = b.quality AND q.bkt = b.bkt)
       |  WHERE cs <= rem)
       |SELECT q.doc_id, q.quality, q.n_tokens
       |FROM q JOIN full_cells f ON q.quality = f.quality AND q.bkt = f.bkt
       |UNION ALL
       |SELECT doc_id, quality, n_tokens FROM bsel""".stripMargin
  }

  private val mixWeightsOracle: String =
    """WITH d AS (
      |  SELECT source, len(string_split(text, ' ')) AS n_toks,
      |    CAST(substring(source, 4) AS BIGINT) % 3 + 1 AS units
      |  FROM documents),
      |p AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens, MAX(units) AS u
      |  FROM d GROUP BY 1),
      |t AS (
      |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
      |    CAST(SUM(u) AS BIGINT) AS tot_u FROM p)
      |SELECT source, n_docs, n_tokens,
      |  n_tokens * 1000000 // tot_tokens AS share_e6,
      |  u * 1000000 // tot_u AS target_e6,
      |  least((u * 1000000 // tot_u) * 1000000
      |      // greatest(n_tokens * 1000000 // tot_tokens, 1), 10000000)
      |    AS weight_e6
      |FROM p CROSS JOIN t""".stripMargin

  private val packSequencesOracle: String = {
    val h = dhSalted("pack")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    $h AS key
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, key % 8 AS stream, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY key % 8 ORDER BY key, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM d)
       |SELECT doc_id, stream, n_tokens,
       |  CAST((cum - n_tokens) // 256 AS BIGINT) AS first_seq,
       |  CAST((cum - 1) // 256 AS BIGINT) AS last_seq,
       |  CAST((cum - n_tokens) % 256 AS BIGINT) AS offset_in_first
       |FROM c""".stripMargin
  }

  private val shuffleRankOracle: String = {
    val h = dhSalted("shuffle")
    s"""SELECT doc_id,
       |  CAST(row_number() OVER (ORDER BY $h, doc_id) - 1 AS BIGINT)
       |    AS shuffle_pos
       |FROM documents""".stripMargin
  }

  private val vocabBigramsOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |pairs AS (
      |  SELECT unnest(list_transform(range(greatest(len(w)-1, 0)),
      |    i -> w[i+1] || ' ' || w[i+2])) AS pair
      |  FROM toks),
      |c AS (
      |  SELECT pair, count(*) AS n_occurrences FROM pairs GROUP BY 1)
      |SELECT row_number() OVER (ORDER BY n_occurrences DESC, pair) AS rank,
      |  pair, n_occurrences
      |FROM c ORDER BY n_occurrences DESC, pair LIMIT 50""".stripMargin

  private val quantizeEmbedOracle: String =
    """WITH e AS (
      |  SELECT vec_id, label, embedding,
      |    list_max(list_transform(embedding, x -> abs(x))) AS amax
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, label, CAST(amax AS DOUBLE) AS amax_d,
      |    CASE WHEN amax = 0
      |      THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
      |      ELSE list_transform(embedding, x ->
      |        greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT),
      |          CAST(round(CAST(x AS DOUBLE) * 127
      |            / CAST(amax AS DOUBLE)) AS BIGINT))))
      |      END AS qv
      |  FROM e)
      |SELECT vec_id, label, amax_d,
      |  CAST(list_min(qv) AS BIGINT) AS q_min,
      |  CAST(list_max(qv) AS BIGINT) AS q_max,
      |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
      |  CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1
      |FROM q""".stripMargin

  private val chunkOverlapOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, w, n,
      |    CASE WHEN n <= 16 THEN 1
      |         ELSE CAST((n - 16 + 11) // 12 AS BIGINT) + 1 END AS nc
      |  FROM toks),
      |e AS (
      |  SELECT doc_id, w, n, unnest(range(nc)) AS chunk_idx FROM c)
      |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
      |  array_to_string(w[chunk_idx*12+1 : chunk_idx*12+16], ' ')
      |    AS chunk_text,
      |  CAST(least(16, n - chunk_idx*12) AS BIGINT) AS n_chunk_tokens
      |FROM e""".stripMargin

  private val blockmaxOracleSql: String =
    """WITH tk AS (
    |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
    |  FROM documents),
    |dlt AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY 1),
    |st AS (SELECT count(*) AS n_docs,
    |    CAST(sum(dl) AS BIGINT) AS total_dl FROM dlt),
    |q(w) AS (VALUES ('spark'), ('merge'), ('window')),
    |tft AS (SELECT tk.doc_id, tk.w, count(*) AS tf
    |  FROM tk JOIN q USING (w) GROUP BY 1, 2),
    |dft AS (SELECT w, count(*) AS dft FROM tft GROUP BY 1),
    |base AS (
    |  SELECT t.doc_id, t.w, t.tf, d.dl, f.dft, st.n_docs,
    |    (st.total_dl // st.n_docs) * 1000000 +
    |      ((st.total_dl % st.n_docs) * 1000000) // st.n_docs AS avgdl_e6
    |  FROM tft t JOIN dlt d USING (doc_id) JOIN dft f USING (w)
    |  CROSS JOIN st),
    |c1 AS (SELECT *,
    |    ((dl * 1000000) // avgdl_e6) * 1000000 +
    |      (((dl * 1000000) % avgdl_e6) * 1000000) // avgdl_e6 AS ratio_e6
    |  FROM base),
    |c2 AS (SELECT *,
    |    1000000 - 750000 + 750000 * (ratio_e6 // 1000000) +
    |      (750000 * (ratio_e6 % 1000000)) // 1000000 AS norm_e6
    |  FROM c1),
    |c3 AS (SELECT *,
    |    tf * 1000000 + 1200000 * (norm_e6 // 1000000) +
    |      (1200000 * (norm_e6 % 1000000)) // 1000000 AS den
    |  FROM c2),
    |calcw AS (
    |  SELECT doc_id, w, doc_id % 8 AS block,
    |    ((2 * (n_docs - dft) + 1) // (2 * dft + 1)) * 1000000 +
    |      (((2 * (n_docs - dft) + 1) % (2 * dft + 1)) * 1000000)
    |        // (2 * dft + 1) AS idf_e6,
    |    ((tf * (1200000 + 1000000)) // den) * 1000000 +
    |      (((tf * (1200000 + 1000000)) % den) * 1000000) // den
    |      AS tfpart_e6
    |  FROM c3),
    |ts AS (SELECT doc_id, w, block,
    |    (idf_e6 // 1000000) * tfpart_e6 +
    |      ((idf_e6 % 1000000) * tfpart_e6) // 1000000 AS term_score_e6
    |  FROM calcw),
    |pd AS (SELECT block, doc_id, count(*) AS n_hits,
    |    CAST(sum(term_score_e6) AS BIGINT) AS score_e6
    |  FROM ts GROUP BY 1, 2),
    |ubt AS (SELECT block, w, max(term_score_e6) AS mx
    |  FROM ts GROUP BY 1, 2),
    |ub AS (SELECT block, CAST(sum(mx) AS BIGINT) AS ub
    |  FROM ubt GROUP BY 1),
    |nd AS (SELECT block, count(*) AS nd FROM pd GROUP BY 1),
    |mk AS (SELECT b.block, b.ub, n.nd,
    |    sum(n.nd) OVER (ORDER BY b.ub DESC, b.block) AS cum
    |  FROM ub b JOIN nd n USING (block)),
    |mk2 AS (SELECT *, (cum - nd < 10) AS phase1 FROM mk),
    |p1 AS (SELECT pd.* FROM pd JOIN mk2 USING (block)
    |  WHERE mk2.phase1),
    |tau AS (SELECT coalesce((SELECT score_e6 FROM p1
    |    ORDER BY score_e6 DESC, doc_id LIMIT 1 OFFSET 9), -1) AS tau),
    |p2b AS (SELECT mk2.block FROM mk2, tau
    |  WHERE NOT mk2.phase1 AND mk2.ub >= tau.tau),
    |cand AS (
    |  SELECT p1.*, CAST(1 AS BIGINT) AS phase FROM p1
    |  UNION ALL
    |  SELECT pd.*, CAST(2 AS BIGINT) FROM pd JOIN p2b USING (block)),
    |scan AS (SELECT
    |    (SELECT count(DISTINCT block) FROM cand) AS scanned_blocks,
    |    (SELECT count(*) FROM mk2) AS total_blocks)
    |SELECT doc_id, n_hits, score_e6, phase, scanned_blocks,
    |  total_blocks
    |FROM cand, scan ORDER BY score_e6 DESC, doc_id LIMIT 10""".stripMargin

  /** The first-principles 7x4 pixel-sum replay shared by the BMP
    * byte-walk and the (lossless-for-these-fixtures) ImageIO GIF
    * decode: pixel byte j of the display-order image is text char
    * (j mod len)+1; display row 0 is chars 1..21.
    */
  private val pixelSumsOracleSql: String =
    """WITH d AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  WHERE length(text) > 0),
        |px AS (
        |  SELECT media_id,
        |    CAST(sum(c) AS BIGINT) AS pixel_sum,
        |    CAST(sum(CASE WHEN j < 21 THEN c ELSE 0 END) AS BIGINT)
        |      AS row0_sum
        |  FROM (
        |    SELECT d.media_id, t.j,
        |      ascii(substr(d.text, CAST(j % length(d.text) AS INT) + 1, 1))
        |        AS c
        |    FROM d CROSS JOIN range(84) t(j))
        |  GROUP BY media_id)
        |SELECT media_id, CAST(1 AS BIGINT) AS ok, CAST(7 AS BIGINT) AS width,
        |  CAST(4 AS BIGINT) AS height, CAST(28 AS BIGINT) AS n_pixels,
        |  pixel_sum, row0_sum
        |FROM px""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_chunk_overlap" -> chunkOverlapOracle,
    "q_pack_sequences" -> packSequencesOracle,
    "q_shuffle_rank" -> shuffleRankOracle,
    "q_vocab_bigrams" -> vocabBigramsOracle,

    // adjacency recount straight off the token arrays
    "q_phrase_query" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |m AS (
        |  SELECT doc_id, i AS p0
        |  FROM t, LATERAL unnest(range(greatest(len(w) - 1, 0))) s(i)
        |  WHERE w[CAST(i + 1 AS INTEGER)] = 'data'
        |    AND w[CAST(i + 2 AS INTEGER)] = 'table')
        |SELECT doc_id AS doc, CAST(count(*) AS BIGINT) AS n_matches,
        |  CAST(min(p0) AS BIGINT) AS first_pos
        |FROM m GROUP BY 1""".stripMargin,

    // the PMI kernel replayed in HUGEINT; same min-count guard, same
    // (score DESC, a, b) total order
    "q_pmi" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |uni AS (
        |  SELECT u AS w, CAST(count(*) AS BIGINT) AS c1
        |  FROM (SELECT unnest(w) AS u FROM t) GROUP BY 1),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n FROM uni),
        |bg AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM (
        |    SELECT w[i+1] AS a, w[i+2] AS b
        |    FROM t, LATERAL unnest(range(greatest(len(w) - 1, 0))) s(i))
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT a, b, c_ab, ua.c1 AS c_a, ub.c1 AS c_b,
        |  CAST((CAST(c_ab AS HUGEINT) * n.n * 1000000)
        |    // (CAST(ua.c1 AS HUGEINT) * ub.c1) AS BIGINT) AS pmi_e6
        |FROM bg JOIN uni ua ON ua.w = bg.a
        |JOIN uni ub ON ub.w = bg.b
        |CROSS JOIN n
        |ORDER BY pmi_e6 DESC, a, b LIMIT 20""".stripMargin,
    "q_quantize_embed" -> quantizeEmbedOracle,

    // the LCG sign matrix rebuilt from (axis, component) indices; exact
    // integer coordinate sums in the e7 fixed-point domain
    "q_rand_proj" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding, x ->
        |    CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS qe
        |  FROM embeddings),
        |jx AS (
        |  SELECT vec_id, qe, CAST(j AS BIGINT) AS j,
        |    (1103515245 * (j + 1)) % 2147483647 AS a,
        |    (12345 * (j * 2 + 1)) % 2147483647 AS b
        |  FROM q, range(16) t(j))
        |SELECT vec_id, j,
        |  CAST(list_sum(list_transform(range(1, len(qe) + 1), i ->
        |    CASE ((a * i + b) % 2147483647) % 6
        |      WHEN 0 THEN qe[i] WHEN 1 THEN -qe[i] ELSE 0 END))
        |    AS BIGINT) AS proj
        |FROM jx""".stripMargin,
    "q_keep_canonical" -> keepCanonicalOracle,
    "q_token_budget" -> tokenBudgetOracle,
    "q_mix_weights" -> mixWeightsOracle,
    "q_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, unnest(list_transform(range(greatest(len(w)-2, 0)),
        |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
        |  FROM toks),
        |bench AS (
        |  SELECT DISTINCT sh FROM grams WHERE doc_id % 97 = 0),
        |hits AS (
        |  SELECT g.doc_id, count(*) AS n
        |  FROM grams g JOIN bench USING (sh)
        |  WHERE g.doc_id % 97 <> 0
        |  GROUP BY g.doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(h.n, 0) AS BIGINT) AS n_bench_grams,
        |  CASE WHEN coalesce(h.n, 0) >= 1 THEN 1 ELSE 0 END AS contaminated
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        |WHERE d.doc_id % 97 <> 0""".stripMargin,

    // the tagged-union multi-benchmark sweep, replayed per benchmark
    "q_decontaminate_multi" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, unnest(list_transform(range(greatest(len(w)-2, 0)),
        |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
        |  FROM toks),
        |bench AS (
        |  SELECT 'bench_a' AS bench, sh
        |  FROM (SELECT DISTINCT sh FROM grams WHERE doc_id % 97 = 0)
        |  UNION ALL
        |  SELECT 'bench_b' AS bench, sh
        |  FROM (SELECT DISTINCT sh FROM grams WHERE doc_id % 89 = 0)),
        |hits AS (
        |  SELECT g.doc_id, b.bench, count(*) AS n
        |  FROM grams g JOIN bench b USING (sh)
        |  WHERE g.doc_id % 97 <> 0 AND g.doc_id % 89 <> 0
        |  GROUP BY 1, 2)
        |SELECT d.doc_id, b.bench,
        |  CAST(coalesce(h.n, 0) AS BIGINT) AS n_bench_grams,
        |  CASE WHEN coalesce(h.n, 0) >= 1 THEN 1 ELSE 0 END AS contaminated
        |FROM documents d
        |CROSS JOIN (VALUES ('bench_a'), ('bench_b')) b(bench)
        |LEFT JOIN hits h ON d.doc_id = h.doc_id AND b.bench = h.bench
        |WHERE d.doc_id % 97 <> 0 AND d.doc_id % 89 <> 0""".stripMargin,

    "q_domain_cap" ->
      ("""SELECT doc_id, source, sample_rank FROM (
        |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |    ORDER BY """ +
        dhSalted("cap") +
        """, doc_id) AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 10""").stripMargin,

    "q_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |tf AS (
        |  SELECT doc_id, w, count(*) AS tf FROM t GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |  COUNT(*) AS n_distinct_tokens,
        |  CAST(MAX(tf) AS BIGINT) AS top_token_freq,
        |  (COUNT(*) * 10000) // CAST(SUM(tf) AS BIGINT) AS ttr_e4
        |FROM tf GROUP BY doc_id""".stripMargin,

    "q_redact" ->
      """WITH d AS (
        |  SELECT source,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com from 10.0.'
        |      || CAST(doc_id % 256 AS VARCHAR) || '.7' AS text2
        |  FROM documents),
        |r AS (
        |  SELECT source,
        |    len(regexp_extract_all(text2,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_em,
        |    len(regexp_extract_all(text2,
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
        |    regexp_replace(regexp_replace(text2,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
        |  FROM d)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_em) AS BIGINT) AS n_emails_sum,
        |  CAST(SUM(n_ip) AS BIGINT) AS n_ips_sum,
        |  bit_xor(CAST(('0x' || substring(md5(redacted),1,15)) AS BIGINT))
        |    AS xor_redacted
        |FROM r GROUP BY 1""".stripMargin,
    "q_dedup_clusters" -> clustersOracle,

    "q_bm25" ->
      s"""WITH $bm25ScoredCtes
         |SELECT doc_id, n_hits, score_e6 FROM bmscore
         |ORDER BY score_e6 DESC, doc_id LIMIT 10""".stripMargin,

    // the segmented index's single-segment all-live build serves the
    // exact from-scratch scores (per-segment stats sum to the global
    // stats), so the oracle replays the same chain
    "q_bm25_segmented" ->
      s"""WITH $bm25ScoredCtes
         |SELECT doc_id, n_hits, score_e6 FROM bmscore
         |ORDER BY score_e6 DESC, doc_id LIMIT 10""".stripMargin,

    // the full two-pass block-max replay: per-(term, block) max scores,
    // bound-ordered phase-1 prefix holding >= k docs, tau = k-th best
    // exact phase-1 score, phase 2 = remaining blocks with bound >= tau.
    // q_blockmax_index round-trips the SAME scores through an at-rest
    // parquet index (exact integers survive the round trip), so both
    // queries replay one SQL.
    "q_blockmax_topk" -> blockmaxOracleSql,
    "q_blockmax_index" -> blockmaxOracleSql,

    // per-char counts -> exact quotient-remainder collision index; the
    // planted char runs must flip keep to false
    "q_char_diversity" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 23 = 0
        |      THEN text || ' ' || repeat('z', 400) ELSE text END AS text
        |  FROM documents),
        |ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM planted WHERE len(text) > 0),
        |cc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
        |d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars_counted,
        |    count(*) AS distinct_chars, CAST(sum(c * c) AS BIGINT) AS ss
        |  FROM cc GROUP BY 1),
        |coll AS (SELECT doc_id, n_chars_counted, distinct_chars,
        |    CAST((ss // (n_chars_counted * n_chars_counted)) * 1000000 +
        |      ((ss % (n_chars_counted * n_chars_counted)) * 1000000)
        |        // (n_chars_counted * n_chars_counted) AS BIGINT)
        |      AS collision_e6
        |  FROM d)
        |SELECT doc_id, n_chars_counted, distinct_chars, collision_e6,
        |  collision_e6 <= 120000 AS keep
        |FROM coll""".stripMargin,

    // every blob's 60-bit block-mean hash rebuilt from char codes,
    // then the same 4x15-bit band join and exact Hamming filter
    "q_phash_pairs" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id, text AS t FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, substring(text, 1, len(text) - 1) || '~'
        |  FROM documents WHERE doc_id % 9 = 0
        |  UNION ALL
        |  SELECT doc_id + 20000, text FROM documents WHERE doc_id % 27 = 0),
        |bych AS (
        |  SELECT media_id, strlen(t) AS n,
        |    list_transform(range(1, strlen(t) + 1),
        |      i -> ascii(substring(t, CAST(i AS INTEGER), 1))) AS cs
        |  FROM media),
        |tt AS (SELECT media_id, n, cs, list_sum(cs) AS total FROM bych),
        |bb AS (SELECT media_id, n, total, cs, unnest(range(60)) AS b
        |  FROM tt),
        |bits AS (
        |  SELECT media_id,
        |    CASE WHEN coalesce(list_sum(
        |        cs[CAST(b * n // 60 + 1 AS INTEGER)
        |           :CAST((b + 1) * n // 60 AS INTEGER)]), 0) * n
        |      > total * ((b + 1) * n // 60 - b * n // 60)
        |      THEN (CAST(1 AS BIGINT) << b) ELSE 0 END AS bit
        |  FROM bb),
        |h AS (SELECT media_id, CAST(sum(bit) AS BIGINT) AS phash
        |  FROM bits GROUP BY 1),
        |banded AS (
        |  SELECT media_id, phash, unnest(range(4)) AS band FROM h),
        |bv AS (
        |  SELECT media_id, phash, band,
        |    (phash >> (band * 15)) & 32767 AS band_val
        |  FROM banded),
        |cand AS (
        |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
        |    a.phash AS h_a, b.phash AS h_b
        |  FROM bv a JOIN bv b
        |    ON a.band = b.band AND a.band_val = b.band_val
        |    AND a.media_id < b.media_id)
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(h_a, h_b)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(h_a, h_b)) <= 3""".stripMargin,

    // NFC twins built from explicit codepoints (233=é, 769=combining
    // acute, 197=Å, 778=combining ring) collapse to one hash group
    "q_nfc_dedup" ->
      s"""WITH planted AS (
         |  SELECT doc_id, text || ' caf' || chr(233) || ' A' || chr(778)
         |    AS t
         |  FROM documents WHERE doc_id % 50 = 0
         |  UNION ALL
         |  SELECT doc_id + 10000,
         |    text || ' cafe' || chr(769) || ' ' || chr(197)
         |  FROM documents WHERE doc_id % 50 = 0
         |  UNION ALL
         |  SELECT doc_id, text FROM documents WHERE doc_id % 50 != 0),
         |n AS (SELECT doc_id, nfc_normalize(t) AS nt FROM planted)
         |SELECT ${dh("nt")} AS content_hash,
         |  CAST(count(*) AS BIGINT) AS n_copies,
         |  min(doc_id) AS canonical_id
         |FROM n GROUP BY 1""".stripMargin,

    // the PSM rebuild: same sorted hash cuts, same sentinel layout
    "q_fim" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |c AS (
         |  SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n,
         |    ${dh("CAST(doc_id AS VARCHAR) || '|fim1'")} % (len(w) + 1)
         |      AS a,
         |    ${dh("CAST(doc_id AS VARCHAR) || '|fim2'")} % (len(w) + 1)
         |      AS b
         |  FROM t),
         |s AS (
         |  SELECT doc_id, w, n,
         |    CAST(least(a, b) AS BIGINT) AS cut1,
         |    CAST(greatest(a, b) AS BIGINT) AS cut2
         |  FROM c),
         |p AS (
         |  SELECT doc_id, n AS n_tokens, cut1, cut2,
         |    -- coalesce: DuckDB's array_to_string of an EMPTY list is NULL
         |    -- (Spark's array_join is ''), and || would null the stream
         |    '<PRE> ' || coalesce(
         |      array_to_string(w[1:CAST(cut1 AS INTEGER)], ' '), '')
         |    || ' <SUF> ' || coalesce(array_to_string(
         |      w[CAST(cut2 + 1 AS INTEGER):CAST(n AS INTEGER)], ' '), '')
         |    || ' <MID> ' || coalesce(array_to_string(
         |      w[CAST(cut1 + 1 AS INTEGER):CAST(cut2 AS INTEGER)], ' '), '')
         |      AS psm
         |  FROM s)
         |SELECT doc_id, n_tokens, cut1, cut2, ${dh("psm")} AS psm_h
         |FROM p""".stripMargin,

    // the block-local T5 masking replayed: same hash-derived span
    // starts, same sentinel splice, same LF-free rebuild
    "q_span_corrupt" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |bl AS (
         |  SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_tokens,
         |    (len(w) + 19) // 20 AS nb
         |  FROM t),
         |bj AS (
         |  SELECT doc_id, w, n_tokens, unnest(range(nb)) AS j FROM bl),
         |blk AS (
         |  SELECT doc_id, n_tokens, j,
         |    w[(j * 20 + 1):((j + 1) * 20)] AS blk
         |  FROM bj),
         |sp AS (
         |  SELECT doc_id, n_tokens, j, blk, len(blk) AS bn,
         |    CASE WHEN len(blk) > 3 THEN
         |      ${dh("CAST(doc_id AS VARCHAR) || '|' || CAST(j AS VARCHAR)")}
         |        % (len(blk) - 2)
         |      ELSE 0 END AS s
         |  FROM blk),
         |built AS (
         |  SELECT doc_id, n_tokens, j, bn,
         |    CASE WHEN bn > 3 THEN blk[1:CAST(s AS INTEGER)] ||
         |      ['<extra_id_' || CAST(j AS VARCHAR) || '>'] ||
         |      blk[CAST(s + 4 AS INTEGER):CAST(bn AS INTEGER)]
         |      ELSE blk END AS input_blk,
         |    CASE WHEN bn > 3 THEN
         |      ['<extra_id_' || CAST(j AS VARCHAR) || '>'] ||
         |      blk[CAST(s + 1 AS INTEGER):CAST(s + 3 AS INTEGER)]
         |      ELSE CAST([] AS VARCHAR[]) END AS target_blk
         |  FROM sp),
         |agg AS (
         |  SELECT doc_id, any_value(n_tokens) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS n_blocks,
         |    CAST(3 * count_if(bn > 3) AS BIGINT) AS n_masked,
         |    array_to_string(flatten(list(input_blk ORDER BY j)), ' ')
         |      AS input_text,
         |    array_to_string(flatten(list(target_blk ORDER BY j)), ' ')
         |      AS target_text
         |  FROM built GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_blocks, n_masked,
         |  ${dh("input_text")} AS input_h,
         |  ${dh("target_text")} AS target_h
         |FROM agg""".stripMargin,

    // five unrolled integer-exact rounds over the synthetic link graph
    "q_pagerank" ->
      s"""WITH ${pagerankCtes(iters = 5, damp = 85)}
         |SELECT v AS node, CAST(r AS BIGINT) AS rank_e12 FROM r5""".stripMargin,

    // the same round template over the co-occurrence graph; the top-20
    // cut is total-ordered by (rank DESC, word) on both engines
    "q_textrank" ->
      s"""WITH ${textrankCtes(iters = 5, damp = 85)}
         |SELECT v AS word, CAST(r AS BIGINT) AS rank_e12 FROM r5
         |ORDER BY r DESC, v LIMIT 20""".stripMargin,

    // the 4-block postings rebuild: same (term, block) lists, same
    // delta gaps, same unsigned-varint widths, same position-tagged xor
    "q_postings" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents),
         |p AS (
         |  SELECT term, doc_id AS doc, count(*) AS tf, doc_id % 4 AS block
         |  FROM t GROUP BY 1, 2),
         |g AS (
         |  SELECT term, block, doc, tf,
         |    row_number() OVER (PARTITION BY term, block ORDER BY doc)
         |      AS pos,
         |    doc - coalesce(
         |      lag(doc) OVER (PARTITION BY term, block ORDER BY doc), 0)
         |      AS gap
         |  FROM p)
         |SELECT term, CAST(block AS BIGINT) AS block,
         |  CAST(count(*) AS BIGINT) AS df,
         |  CAST(sum(tf) AS BIGINT) AS tf_total,
         |  min(doc) AS first_doc, max(doc) AS last_doc,
         |  CAST(sum(CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
         |    WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4
         |    WHEN gap < 34359738368 THEN 5 WHEN gap < 4398046511104 THEN 6
         |    WHEN gap < 562949953421312 THEN 7
         |    WHEN gap < 72057594037927936 THEN 8
         |    ELSE 9 END) AS BIGINT) AS index_bytes,
         |  CAST(bit_xor(${dh("term || '|' || CAST(block AS VARCHAR) || '|' || CAST(pos AS VARCHAR) || '|' || CAST(gap AS VARCHAR)")}) AS BIGINT)
         |    AS gap_checksum
         |FROM g GROUP BY 1, 2""".stripMargin,


    "q_tfidf_top_terms" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |dfreq AS (
        |  SELECT term, count(*) AS df FROM (
        |    SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf, df,
        |    tf * ((n.n * 1000000) // df) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |SELECT doc_id, rnk, term, tf, df, score FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS rnk FROM scored)
        |WHERE rnk <= 3""".stripMargin,

    "q_stratified_sample" ->
      ("""SELECT doc_id, lang FROM documents
        |WHERE """ +
        dhSalted("sample") + " % 1000 < " +
        """CASE WHEN lang = 'de' THEN 500 WHEN lang = 'en' THEN 200 ELSE 800 END""").stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, count(*) AS n_copies,
        |  min(doc_id) AS canonical_id
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "q_dedup_minhash" -> minhashOracle,
    "q_dedup_simhash" -> simhashOracle,
    "q_dedup_ngram" -> ngramOracle,
    "q_containment" -> containmentOracle,
    "q_ppjoin" -> ppjoinOracle,
    "q_lm_backoff" -> lmBackoffOracle,
    "q_text_tiles" -> textTilesOracle,
    "q_sentences" -> sentencesOracle,
    "q_edit_verified" -> editVerifiedOracle,
    "q_knn_brute" -> knnBruteOracle,
    "q_knn_join" -> knnJoinOracle,
    "q_hard_negatives" -> hardNegativesOracle,
    "q_mmr" -> mmrOracle,
    "q_bitext_mine" -> bitextMineOracle,
    "q_bloom_dedup" -> bloomDedupOracle,
    "q_corpus_diff" -> corpusDiffOracle,
    "q_langid_trained" -> langidTrainedOracle,
    "q_unigram_seed" -> unigramSeedOracle,
    "q_lm_interp" -> lmInterpOracle,
    "q_lm_kn" -> lmKneserNeyOracle,
    "q_lm_index" -> lmIndexOracle,
    "q_source_report" -> sourceReportOracle,
    "q_reservoir" -> reservoirOracle,
    "q_knn_ivf" -> knnIvfOracle,
    "q_knn_ivf_trained" -> knnIvfTrainedOracle,
    "q_substring_dup" -> substringDupOracle,
    "q_cross_dedup" -> crossDedupOracle,
    "q_source_overlap" -> sourceOverlapOracle,

    // KMV sketches are deterministic order statistics of h60, so the
    // whole estimate chain replays: per-source k-min, pair-tagged union
    // k-min, (k-1)·2^60 // kth in HUGEINT, ratio estimates
    "q_kmv_overlap" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT source,
         |    ${dh("w")} AS h
         |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
         |        FROM documents)
         |  WHERE w <> ''),
         |sk AS (
         |  SELECT source, h FROM (
         |    SELECT source, h,
         |      row_number() OVER (PARTITION BY source ORDER BY h) AS r
         |    FROM tok) WHERE r <= 128),
         |g AS (SELECT DISTINCT source FROM sk),
         |gp AS (SELECT a.source AS grp_a, b.source AS grp_b
         |       FROM g a, g b WHERE a.source < b.source),
         |tagged AS (
         |  SELECT grp_a, grp_b, h, max(ina) AS ina, max(inb) AS inb FROM (
         |    SELECT gp.grp_a, gp.grp_b, sk.h, 1 AS ina, 0 AS inb
         |    FROM gp JOIN sk ON sk.source = gp.grp_a
         |    UNION ALL
         |    SELECT gp.grp_a, gp.grp_b, sk.h, 0 AS ina, 1 AS inb
         |    FROM gp JOIN sk ON sk.source = gp.grp_b)
         |  GROUP BY 1, 2, 3),
         |kmin AS (
         |  SELECT grp_a, grp_b, h, ina, inb FROM (
         |    SELECT grp_a, grp_b, h, ina, inb,
         |      row_number() OVER (PARTITION BY grp_a, grp_b ORDER BY h) AS r
         |    FROM tagged) WHERE r <= 128),
         |agg AS (
         |  SELECT grp_a, grp_b, count(*) AS n, max(h) AS kth,
         |    CAST(sum(ina * inb) AS BIGINT) AS nboth
         |  FROM kmin GROUP BY 1, 2),
         |est AS (
         |  SELECT grp_a, grp_b, n, nboth,
         |    CASE WHEN n < 128 THEN CAST(n AS BIGINT)
         |      ELSE CAST((CAST(1152921504606846976 AS HUGEINT) * 127)
         |        // kth AS BIGINT) END AS union_est
         |  FROM agg)
         |SELECT grp_a, grp_b, union_est,
         |  CAST((nboth * union_est) // n AS BIGINT) AS inter_est,
         |  CAST((nboth * 1000000) // n AS BIGINT) AS jaccard_e6
         |FROM est""".stripMargin,
    "q_leakage_split" -> leakageSplitOracle,
    "q_winnow" -> winnowOracle,
    "q_label_centroids" -> labelCentroidsOracle,
    "q_lang_id" -> langIdOracle,

    "q_text_stats" ->
      """SELECT doc_id, strlen(text) AS n_chars_m,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  strlen(text) - strlen(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
        |  len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS n_stopwords,
        |  (strlen(text) - len(string_split(text, ' ')) + 1) * 100
        |    // len(string_split(text, ' ')) AS avg_token_len_e2
        |FROM documents""".stripMargin,

    "q_quality" ->
      s"""WITH $qualityCtes
         |SELECT doc_id, n_tokens, quality,
         |  CASE WHEN quality >= 3 THEN 1 ELSE 0 END AS keep
         |FROM qout""".stripMargin,

    "q_fingerprint" -> (shingleCte +
      s"""SELECT doc_id,
         |  min(${dh("sh")}) AS fp_min,
         |  max(${dh("sh")}) AS fp_max,
         |  arg_min(${dh("sh")}, ${dh("sh || '#'")}) AS fp_first,
         |  count(*) AS n_shingles
         |FROM sh GROUP BY doc_id""".stripMargin),

    "q_subword_tokens" ->
      """SELECT doc_id,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |    w -> 1 + strlen(w) // 4)) AS BIGINT) AS n_subword_tokens
        |FROM documents""".stripMargin,

    "q_lm_score" ->
      s"""WITH $lmCtes
         |SELECT doc_id, n_bigrams, lm_score_e6 FROM lmout""".stripMargin,

    // per-language tertiles over the same LM trajectory; ntile's
    // equal-fill rule is SQL-standard so both engines cut identically
    "q_ccnet_buckets" ->
      s"""WITH $lmCtes,
         |sc AS (
         |  SELECT d.doc_id, d.lang,
         |    CAST(coalesce(l.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |    CAST(coalesce(l.lm_score_e6, 0) AS BIGINT) AS lm_score_e6
         |  FROM documents d LEFT JOIN lmout l ON l.doc_id = d.doc_id),
         |bk AS (
         |  SELECT doc_id, lang, n_bigrams, lm_score_e6,
         |    CAST(ntile(3) OVER (PARTITION BY lang
         |      ORDER BY lm_score_e6 DESC, doc_id) AS BIGINT) AS bucket
         |  FROM sc)
         |SELECT doc_id, lang, n_bigrams, lm_score_e6, bucket,
         |  CASE WHEN bucket = 1 THEN 'head' WHEN bucket = 2 THEN 'middle'
         |    ELSE 'tail' END AS bucket_name
         |FROM bk""".stripMargin,

    "q_oov_rate" ->
      s"""WITH $oovCtes
         |SELECT doc_id, n_tokens, n_rare, rare_rate_e6 FROM ovout""".stripMargin,

    "q_dedup_trim" -> (trimCtes +
      "\nSELECT doc_id, n_tokens, n_removed, kept_text FROM trimout"),

    // line (CCNet paragraph) dedup over 12-token pseudo-paragraphs; the
    // oracle counts by line VALUE where Spark counts by h60(value) —
    // identical modulo 60-bit collisions, the same contract as the
    // other dedup oracles
    "q_line_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tp AS (
        |  SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) - 1 AS t
        |  FROM toks),
        |paras AS (
        |  SELECT doc_id, t // 12 AS pos,
        |    string_agg(tok, ' ' ORDER BY t) AS line
        |  FROM tp GROUP BY 1, 2),
        |cnt AS (
        |  SELECT lower(trim(line)) AS k, count(DISTINCT doc_id) AS nd
        |  FROM paras GROUP BY 1),
        |dups AS (SELECT k FROM cnt WHERE nd > 1),
        |marked AS (
        |  SELECT p.doc_id, p.pos, p.line, d.k IS NOT NULL AS dropped
        |  FROM paras p LEFT JOIN dups d ON lower(trim(p.line)) = d.k)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(count(*) FILTER (WHERE dropped) AS BIGINT) AS n_removed,
        |  coalesce(string_agg(line, chr(10) ORDER BY pos)
        |    FILTER (WHERE NOT dropped), '') AS kept_text
        |FROM marked GROUP BY doc_id""".stripMargin,

    "q_curate_pipeline" -> (trimCtes + s""",
         |filt AS (
         |  SELECT doc_id, kept_text FROM trimout
         |  WHERE (n_tokens - n_removed) * 2 >= n_tokens),
         |grp AS (
         |  SELECT min(doc_id) AS doc_id, count(*) AS n_copies,
         |    min(len(string_split(kept_text, ' '))) AS n_kept
         |  FROM filt GROUP BY md5(kept_text))
         |SELECT doc_id, CAST(n_kept AS BIGINT) AS n_kept,
         |  CAST(n_copies AS BIGINT) AS n_copies,
         |  CASE WHEN ${dhSalted("split")} % 1000 < 100 THEN 'validation'
         |    ELSE 'train' END AS split
         |FROM grp""".stripMargin),

    "q_normalize" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
        |  FROM documents)
        |SELECT doc_id, norm_text,
        |  CAST(CASE WHEN norm_text = '' THEN 0
        |    ELSE len(string_split(norm_text, ' ')) END AS BIGINT)
        |    AS n_tokens_norm
        |FROM n""".stripMargin,

    "q_feature_hash" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |inst AS (
         |  SELECT doc_id, ${dh("w")} % 64 AS bucket,
         |    CASE WHEN (${dh("w")} // 4294967296) % 2 = 1 THEN -1 ELSE 1 END
         |      AS sign
         |  FROM t)
         |SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS feat
         |FROM inst GROUP BY 1, 2""".stripMargin,

    "q_dup_ngram_cov" ->
      s"""WITH $dupCovCtes
         |SELECT doc_id, n_tokens, n_grams, top_gram_freq, dup_cov_e4
         |FROM dcout""".stripMargin,

    "q_weighted_sample" ->
      s"""WITH $qualityCtes
         |SELECT doc_id, quality,
         |  ${dhSalted("wsample")} % 10000 AS draw_e4
         |FROM qout
         |WHERE ${dhSalted("wsample")} % 10000 <
         |  least(greatest(quality * 2500, 0), 10000)""".stripMargin,

    "q_ngram_diversity" ->
      s"""WITH toks AS (
         |  SELECT source, string_split(text, ' ') AS w FROM documents),
         |g AS (
         |  SELECT source, unnest(list_transform(range(greatest(len(w)-2, 0)),
         |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
         |  FROM toks),
         |c AS (
         |  SELECT source, ${dh("sh")} AS h, count(*) AS c
         |  FROM g GROUP BY 1, 2)
         |SELECT source,
         |  CAST(sum(c) AS BIGINT) AS n_grams,
         |  count(*) AS n_distinct_grams,
         |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_singleton_grams,
         |  count(*) * 10000 // CAST(sum(c) AS BIGINT) AS diversity_e4
         |FROM c GROUP BY 1""".stripMargin,

    "q_temperature_mix" ->
      """WITH d AS (
        |  SELECT source, len(string_split(text, ' ')) AS n_toks
        |  FROM documents),
        |p AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens
        |  FROM d GROUP BY 1),
        |i AS (
        |  SELECT source, n_docs, n_tokens,
        |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
        |      AS isqrt_tokens
        |  FROM p),
        |t AS (
        |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
        |    CAST(SUM(isqrt_tokens) AS BIGINT) AS tot_i FROM i)
        |SELECT source, n_docs, n_tokens, isqrt_tokens,
        |  n_tokens * 1000000 // tot AS share_e6,
        |  isqrt_tokens * 1000000 // tot_i AS weight_e6
        |FROM i CROSS JOIN t""".stripMargin,

    "q_minhash_verified" -> minhashVerifiedOracle,

    "q_luhn_redact" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN text || ' ' ||
        |        lpad(CAST((doc_id * 7919) % 1000000000 AS VARCHAR), 16, '4')
        |      ELSE text END AS text2
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text2,
        |    list_filter(regexp_extract_all(text2, '\b[0-9]{13,19}\b'),
        |      s -> list_sum(list_transform(range(1, strlen(s) + 1), i ->
        |        CASE WHEN i % 2 = 0
        |          THEN CASE
        |            WHEN 2 * (ascii(substr(s, strlen(s) - i + 1, 1)) - 48) > 9
        |            THEN 2 * (ascii(substr(s, strlen(s) - i + 1, 1)) - 48) - 9
        |            ELSE 2 * (ascii(substr(s, strlen(s) - i + 1, 1)) - 48) END
        |          ELSE ascii(substr(s, strlen(s) - i + 1, 1)) - 48 END))
        |        % 10 = 0) AS valid
        |  FROM d)
        |SELECT doc_id, CAST(len(valid) AS BIGINT) AS n_card_numbers,
        |  list_reduce(list_prepend(text2, valid),
        |    (acc, s) -> regexp_replace(acc, '\b' || s || '\b', '<CARD>', 'g'))
        |    AS redacted_cards
        |FROM c""".stripMargin,

    "q_blocklist" ->
      // IS NULL arm mirrors blocklistFilter's pinned NULL semantics
      // (unknown domains are kept; NOT IN alone would drop them)
      """SELECT doc_id, source FROM documents
        |WHERE source IS NULL
        |   OR source NOT IN ('src0', 'src7', 'src14')""".stripMargin,

    "q_quality_ensemble" ->
      s"""WITH $qualityCtes,
         |$lmCtes,
         |$oovCtes,
         |$dupCovCtes,
         |scored AS (
         |  SELECT q.doc_id, q.quality,
         |    coalesce(l.lm_score_e6, 0) AS lm_score_e6,
         |    o.rare_rate_e6, d.dup_cov_e4
         |  FROM qout q
         |  LEFT JOIN lmout l USING (doc_id)
         |  JOIN ovout o USING (doc_id)
         |  JOIN dcout d USING (doc_id))
         |SELECT doc_id, quality, lm_score_e6, rare_rate_e6, dup_cov_e4,
         |  CASE WHEN quality < 3 THEN 'quality'
         |       WHEN lm_score_e6 < 34000 THEN 'lm_score'
         |       WHEN rare_rate_e6 > 20000 THEN 'oov'
         |       WHEN dup_cov_e4 > 500 THEN 'repetition'
         |       ELSE 'kept' END AS reject_reason,
         |  CASE WHEN quality >= 3 AND lm_score_e6 >= 34000
         |        AND rare_rate_e6 <= 20000 AND dup_cov_e4 <= 500
         |       THEN 1 ELSE 0 END AS keep
         |FROM scored""".stripMargin,

    "q_vocab_coverage" -> {
      val tops = Seq(10, 100, 1000).map { n =>
        s"""SELECT $n AS n_top, CAST(count(*) AS BIGINT) AS n_terms,
           |    CAST(sum(cnt) AS BIGINT) AS covered
           |  FROM (SELECT cnt, tw FROM v ORDER BY cnt DESC, tw LIMIT $n)"""
          .stripMargin
      }.mkString("\n  UNION ALL ")
      s"""WITH t AS (
         |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |v AS (SELECT ${dh("w")} AS tw, count(*) AS cnt FROM t GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM v),
         |tops AS (
         |  $tops)
         |SELECT n_top, n_terms, covered, tot,
         |  covered * 1000000 // tot AS coverage_e6
         |FROM tops CROSS JOIN tot""".stripMargin
    },

    "q_kmeans_assign" ->
      s"""${quantCte.trim},
         |${kmeansCtes(k = 4, iters = 2, dims = 64)}
         |SELECT vec_id, kk % 4 AS cid, kk // 4 AS dist FROM af""".stripMargin,

    "q_pq_adc" -> {
      val m = 4; val sub = 16; val ksub = 8; val iters = 2
      def dist(dims: Int, a: String, b: String) =
        s"CAST(list_sum(list_transform(range($dims), " +
          s"i -> ($a[i+1] - $b[i+1]) * ($a[i+1] - $b[i+1]))) AS BIGINT)"
      val subspaces = (0 until m).map { i =>
        s"""e$i AS (SELECT vec_id,
           |  list_transform(range($sub), j -> qe[${i * sub} + j + 1]) AS qe
           |  FROM e),
           |${kmeansCtes(ksub, iters, sub, src = s"e$i", p = s"s${i}_")},
           |t$i AS (
           |  SELECT c.cid, ${dist(sub, "c.cen", "q.qe")} AS d
           |  FROM s${i}_c$iters c
           |  CROSS JOIN (SELECT qe FROM e$i WHERE vec_id = 0) q)""".stripMargin
      }.mkString(",\n")
      val codeCols = (0 until m)
        .map(i => s"s${i}_af.kk % $ksub AS c$i").mkString(", ")
      val codeJoins = (0 until m)
        .map(i => s"JOIN s${i}_af ON e.vec_id = s${i}_af.vec_id").mkString(" ")
      val tblJoins = (0 until m)
        .map(i => s"JOIN t$i ON codes.c$i = t$i.cid").mkString(" ")
      val adcSum = (0 until m).map(i => s"t$i.d").mkString(" + ")
      s"""${quantCte.trim},
         |$subspaces,
         |codes AS (SELECT e.vec_id, $codeCols FROM e $codeJoins)
         |SELECT codes.vec_id, $adcSum AS adc
         |FROM codes $tblJoins
         |WHERE codes.vec_id != 0
         |ORDER BY adc, codes.vec_id LIMIT 10""".stripMargin
    },

    "q_ivfpq_adc" ->
      s"""${ivfPqCtes()}
         |SELECT vec_id, cell, adc FROM adc
         |ORDER BY adc, vec_id LIMIT 10""".stripMargin,

    // the at-rest-index serve returns exactly the train-and-search
    // rows (the index persists the same trajectory's artifacts), so
    // the oracle replays the same CTE chain
    "q_ivfpq_index" ->
      s"""${ivfPqCtes()}
         |SELECT vec_id, cell, adc FROM adc
         |ORDER BY adc, vec_id LIMIT 10""".stripMargin,

    "q_ivfpq_rerank" ->
      s"""${ivfPqCtes()},
         |short AS (SELECT vec_id FROM adc ORDER BY adc, vec_id LIMIT 40),
         |rr AS (
         |  SELECT e.vec_id,
         |    CAST(${dotSql("e.qe", "q.qe")} AS DOUBLE)
         |      / sqrt(CAST(${dotSql("e.qe", "e.qe")} AS DOUBLE)
         |             * CAST(${dotSql("q.qe", "q.qe")} AS DOUBLE)) AS cos
         |  FROM e JOIN short USING (vec_id) CROSS JOIN q)
         |SELECT vec_id, round(cos, 6) AS cosine_r FROM rr
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,

    "q_semdedup" ->
      s"""${quantCte.trim},
         |${kmeansCtes(k = 4, iters = 2, dims = 64)},
         |m AS (SELECT e.vec_id, af.kk % 4 AS cid, e.qe
         |  FROM e JOIN af USING (vec_id)),
         |p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${dotSql("a.qe", "b.qe")} AS dot,
         |    ${dotSql("a.qe", "a.qe")} AS na,
         |    ${dotSql("b.qe", "b.qe")} AS nb
         |  FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |d AS (SELECT DISTINCT id_b FROM p
         |  WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) >= 0.4)
         |SELECT m.cid, count(*) AS n_members,
         |  CAST(sum(CASE WHEN d.id_b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  count(*) - CAST(sum(CASE WHEN d.id_b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  bit_xor(CASE WHEN d.id_b IS NULL THEN m.vec_id ELSE 0 END) AS xor_kept
         |FROM m LEFT JOIN d ON m.vec_id = d.id_b
         |GROUP BY 1""".stripMargin,

    "q_cluster_balance" ->
      s"""${quantCte.trim},
         |${kmeansCtes(k = 4, iters = 2, dims = 64)},
         |a AS (SELECT vec_id, kk % 4 AS cid, kk // 4 AS dist FROM af)
         |SELECT vec_id, cid, dist, sample_rank FROM (
         |  SELECT vec_id, cid, dist, row_number() OVER (PARTITION BY cid
         |    ORDER BY ${dh("'cbal|' || CAST(vec_id AS VARCHAR)")}, vec_id)
         |    AS sample_rank
         |  FROM a)
         |WHERE sample_rank <= 80""".stripMargin,

    "q_importance_weight" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |i AS (SELECT doc_id, source = 'src1' AS tgt, ${dh("w")} AS tw FROM t),
         |bd AS (SELECT doc_id, tgt, tw, count(*) AS m FROM i GROUP BY 1, 2, 3),
         |raw AS (SELECT tw, CAST(sum(m) AS BIGINT) AS tf_r FROM bd GROUP BY 1),
         |tg AS (SELECT tw, CAST(sum(m) AS BIGINT) AS tf_t
         |  FROM bd WHERE tgt GROUP BY 1),
         |tot AS (SELECT CAST(sum(tf_r) AS BIGINT) AS tot_r,
         |  count(*) AS v FROM raw),
         |tt AS (SELECT CAST(sum(m) AS BIGINT) AS tot_t FROM bd WHERE tgt),
         |ratio AS (
         |  SELECT raw.tw,
         |    ((COALESCE(tf_t, 0) + 1) * (tot_r + v) * 1000000)
         |      // ((tf_r + 1) * (tot_t + v)) AS ratio_e6
         |  FROM raw LEFT JOIN tg ON raw.tw = tg.tw
         |  CROSS JOIN tot CROSS JOIN tt)
         |SELECT bd.doc_id, CAST(sum(m) AS BIGINT) AS n_tokens,
         |  CAST(sum(m * ratio_e6) // sum(m) AS BIGINT) AS weight_e6
         |FROM bd JOIN ratio ON bd.tw = ratio.tw
         |GROUP BY 1""".stripMargin,

    "q_emb_decontaminate" -> {
      val cell = (0 until 2)
        .map(i => s"(CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH e AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS qe,
         |    CAST($cell AS BIGINT) AS cell
         |  FROM embeddings),
         |p AS (
         |  SELECT c.vec_id,
         |    CAST(${dotSql("c.qe", "b.qe")} AS DOUBLE)
         |      / sqrt(CAST(${dotSql("c.qe", "c.qe")} AS DOUBLE)
         |             * CAST(${dotSql("b.qe", "b.qe")} AS DOUBLE)) AS cos
         |  FROM e c JOIN e b ON c.cell = b.cell
         |  WHERE c.vec_id % 40 <> 0 AND b.vec_id % 40 = 0),
         |h AS (
         |  SELECT vec_id, count(*) AS n_bench_hits,
         |    round(max(cos), 6) AS max_cosine_r
         |  FROM p WHERE cos >= 0.4 GROUP BY 1)
         |SELECT e.vec_id,
         |  CAST(COALESCE(n_bench_hits, 0) AS BIGINT) AS n_bench_hits,
         |  COALESCE(max_cosine_r, 0.0) AS max_cosine_r,
         |  CASE WHEN COALESCE(n_bench_hits, 0) > 0 THEN 1 ELSE 0 END
         |    AS contaminated
         |FROM e LEFT JOIN h USING (vec_id)
         |WHERE e.vec_id % 40 <> 0""".stripMargin
    },

    "q_bpe_merges" -> {
      val ranks = (1 to 4).map { r =>
        if (r == 1)
          s"SELECT $r AS merge_rank, a AS token_a, b AS token_b, freq FROM m$r"
        else s"SELECT $r, a, b, freq FROM m$r"
      }.mkString("\nUNION ALL ")
      s"""WITH ${bpeCtes(4)}
         |$ranks""".stripMargin
    },

    "q_wp_merges" -> {
      val ranks = (1 to 4).map { r =>
        if (r == 1)
          s"SELECT $r AS merge_rank, a AS token_a, b AS token_b, freq," +
            s" CAST(score_e12 AS BIGINT) AS score_e12 FROM m$r"
        else s"SELECT $r, a, b, freq, CAST(score_e12 AS BIGINT) FROM m$r"
      }.mkString("\nUNION ALL ")
      s"""WITH ${bpeCtes(4, wpScore = true)}
         |$ranks""".stripMargin
    },

    // the same 4-round replay over the GPT-2 byte symbolization
    "q_bbpe_merges" -> {
      val ranks = (1 to 4).map { r =>
        if (r == 1)
          s"SELECT $r AS merge_rank, a AS token_a, b AS token_b, freq FROM m$r"
        else s"SELECT $r, a, b, freq FROM m$r"
      }.mkString("\nUNION ALL ")
      s"""WITH ${bpeCtes(4, wpScore = false, s0Override = Some(byteS0))}
         |$ranks""".stripMargin
    },

    "q_bbpe_encode" ->
      s"""WITH ${bpeCtes(4, wpScore = false, s0Override = Some(byteS0))},
         |wenc AS (
         |  SELECT word, count(*) AS n_syms,
         |    sum(CASE WHEN s LIKE '% %' THEN 1 ELSE 0 END) AS w_merged,
         |    sum(length(s)) AS w_len
         |  FROM s4 GROUP BY 1),
         |inst AS (
         |  SELECT doc_id,
         |    unnest(string_split(text || $byteTailSql, ' ')) AS word
         |  FROM documents)
         |SELECT doc_id, CAST(sum(n_syms) AS BIGINT) AS n_tokens,
         |  CAST(sum(w_merged) AS BIGINT) AS n_merged,
         |  CAST(sum(w_len) AS BIGINT) AS total_len
         |FROM inst JOIN wenc USING (word) GROUP BY 1""".stripMargin,

    "q_bpe_encode" -> bpeEncodeOracle,

    // the index serve is row-identical to the direct encode (frozen
    // merges, same kernel), so the SAME replay pins it
    "q_bpe_index" -> bpeEncodeOracle,

    // every hash-derived resample replayed: same draws, same replicate
    // means, same percentile ranks (loR = 25*200/1000 = 5, hiR = 196)
    "q_bootstrap_ci" ->
      s"""WITH ev AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS s,
         |    ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS i
         |  FROM documents WHERE doc_id < 200),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ev),
         |draws AS (
         |  SELECT b, unnest(range(n)) AS j, n
         |  FROM range(200) t(b), nn),
         |dt AS (SELECT b,
         |  ${dh("'bs|' || b || '|' || j")} % n AS t FROM draws),
         |means AS (
         |  SELECT b, sum(s) * 1000000 // count(*) AS mean_e6
         |  FROM dt JOIN ev ON ev.i = dt.t GROUP BY b),
         |ranked AS (SELECT *,
         |  ROW_NUMBER() OVER (ORDER BY mean_e6, b) AS r FROM means),
         |pt AS (SELECT CAST(count(*) AS BIGINT) AS n_eval,
         |  CAST(sum(s) * 1000000 // count(*) AS BIGINT) AS point_e6
         |  FROM ev)
         |SELECT pt.n_eval, CAST(200 AS BIGINT) AS n_boot, pt.point_e6,
         |  CAST(lo.mean_e6 AS BIGINT) AS lo_e6,
         |  CAST(hi.mean_e6 AS BIGINT) AS hi_e6
         |FROM pt,
         |  (SELECT mean_e6 FROM ranked WHERE r = 5) lo,
         |  (SELECT mean_e6 FROM ranked WHERE r = 196) hi""".stripMargin,

    // clipped bigram overlap replayed on the same 60-bit gram hashes;
    // totals are pure arithmetic on token counts (len - n + 1)
    "q_rouge_bigram" ->
      s"""WITH $evalPairCtes,
         |cg AS (
         |  SELECT pair_id, ${dh("g")} AS h, count(*) AS c FROM (
         |    SELECT pair_id, unnest(list_transform(
         |      range(greatest(len(cw) - 1, 0)),
         |      i -> cw[i+1] || ' ' || cw[i+2])) AS g FROM pr)
         |  GROUP BY 1, 2),
         |rg AS (
         |  SELECT pair_id, ${dh("g")} AS h, count(*) AS c FROM (
         |    SELECT pair_id, unnest(list_transform(
         |      range(greatest(len(rw) - 1, 0)),
         |      i -> rw[i+1] || ' ' || rw[i+2])) AS g FROM pr)
         |  GROUP BY 1, 2),
         |mm AS (
         |  SELECT cg.pair_id, CAST(sum(least(cg.c, rg.c)) AS BIGINT) AS m
         |  FROM cg JOIN rg ON cg.pair_id = rg.pair_id AND cg.h = rg.h
         |  GROUP BY 1),
         |base AS (
         |  SELECT pr.pair_id, coalesce(mm.m, 0) AS m,
         |    greatest(len(cw) - 1, 0) AS t_cand,
         |    greatest(len(rw) - 1, 0) AS t_ref
         |  FROM pr LEFT JOIN mm ON mm.pair_id = pr.pair_id),
         |sc AS (
         |  SELECT pair_id, m, t_cand, t_ref,
         |    CASE WHEN t_cand > 0 THEN m * 1000000 // t_cand ELSE 0 END
         |      AS p_e6,
         |    CASE WHEN t_ref > 0 THEN m * 1000000 // t_ref ELSE 0 END
         |      AS r_e6
         |  FROM base)
         |SELECT pair_id, m, CAST(t_cand AS BIGINT) AS t_cand,
         |  CAST(t_ref AS BIGINT) AS t_ref,
         |  CAST(p_e6 AS BIGINT) AS p_e6, CAST(r_e6 AS BIGINT) AS r_e6,
         |  CAST(CASE WHEN p_e6 + r_e6 > 0
         |    THEN 2 * p_e6 * r_e6 // (p_e6 + r_e6) ELSE 0 END AS BIGINT)
         |    AS f1_e6
         |FROM sc""".stripMargin,

    // one clipped-count block per n; the precision product runs in
    // HUGEINT (t^4 * 1e6 passes 2^63) and lands back in BIGINT
    "q_bleu" ->
      s"""WITH $evalPairCtes,
         |${(1 to 4).map(bleuClipCte).mkString(",\n")},
         |base AS (
         |  SELECT pr.pair_id,
         |    ${(1 to 4).map(n =>
              s"coalesce(mm$n.m, 0) AS m$n, " +
                s"greatest(len(cw) - ${n - 1}, 0) AS t$n").mkString(",\n    ")},
         |    CAST(len(cw) AS BIGINT) AS cand_len,
         |    CAST(len(rw) AS BIGINT) AS ref_len
         |  FROM pr ${(1 to 4).map(n =>
              s"LEFT JOIN mm$n ON mm$n.pair_id = pr.pair_id")
              .mkString(" ")})
         |SELECT pair_id, m1, CAST(t1 AS BIGINT) AS t1, m2,
         |  CAST(t2 AS BIGINT) AS t2, m3, CAST(t3 AS BIGINT) AS t3, m4,
         |  CAST(t4 AS BIGINT) AS t4, cand_len, ref_len,
         |  greatest(ref_len - cand_len, 0) AS bp_deficit,
         |  CAST(CASE WHEN t1 > 0 AND t2 > 0 AND t3 > 0 AND t4 > 0
         |    THEN CAST(m1 AS HUGEINT) * m2 * m3 * m4 * 1000000 //
         |      (CAST(t1 AS HUGEINT) * t2 * t3 * t4)
         |    ELSE 0 END AS BIGINT) AS bleu_prod_e6
         |FROM base""".stripMargin,

    // the falling-factorial quotient is exact (k! cancels); any factor
    // <= 0 zeroes the product, which is C(a, 4)'s own boundary
    "q_pass_at_k" ->
      """WITH s AS (
        |  SELECT doc_id // 8 AS problem_id,
        |    CASE WHEN strlen(text) % 97 > 48 THEN 1 ELSE 0 END AS ok
        |  FROM documents),
        |g AS (
        |  SELECT problem_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(ok) AS BIGINT) AS c
        |  FROM s GROUP BY 1),
        |f AS (
        |  SELECT problem_id, n, c,
        |    greatest(n-c, 0) * greatest(n-c-1, 0) * greatest(n-c-2, 0) *
        |      greatest(n-c-3, 0) AS ffnc,
        |    greatest(n, 0) * greatest(n-1, 0) * greatest(n-2, 0) *
        |      greatest(n-3, 0) AS ffn
        |  FROM g WHERE n >= 4)
        |SELECT problem_id, n, c,
        |  CAST(1000000 - (1000000 * ffnc) // ffn AS BIGINT)
        |    AS pass_at_k_e6
        |FROM f""".stripMargin,

    // the Mann-Whitney halves trick keeps the tie term integral:
    // (2·gt + eq)·1e6 // (2·np·nq)
    "q_auc" ->
      """WITH s AS (
        |  SELECT n_chars % 97 AS score,
        |    CASE WHEN n_chars % 89 > 44 THEN 1 ELSE 0 END AS lab
        |  FROM documents),
        |g AS (
        |  SELECT score, CAST(sum(lab) AS BIGINT) AS p,
        |    CAST(count(*) - sum(lab) AS BIGINT) AS q
        |  FROM s GROUP BY 1),
        |w AS (
        |  SELECT score, p, q,
        |    CAST(coalesce(sum(q) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cq
        |  FROM g),
        |t AS (
        |  SELECT CAST(sum(p * cq) AS BIGINT) AS gt,
        |    CAST(sum(p * q) AS BIGINT) AS eq,
        |    CAST(sum(p) AS BIGINT) AS np, CAST(sum(q) AS BIGINT) AS nq
        |  FROM w)
        |SELECT np AS n_pos, nq AS n_neg,
        |  CAST(CASE WHEN np > 0 AND nq > 0
        |    THEN (2 * gt + eq) * 1000000 // (2 * np * nq)
        |    ELSE NULL END AS BIGINT) AS auc_e6
        |FROM t""".stripMargin,

    // concordant/discordant pair counting over the bounded cell table;
    // both engines truncate the signed numerator toward zero
    "q_rank_corr" ->
      s"""WITH $qualityCtes,
         |s AS (
         |  SELECT qout.quality AS x, qs.n_chars_m % 61 AS y
         |  FROM qout JOIN qs USING (doc_id)),
         |cells AS (
         |  SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY 1, 2),
         |p AS (
         |  SELECT
         |    CAST(coalesce(sum(CASE WHEN b.y > a.y THEN a.c * b.c
         |      ELSE 0 END), 0) AS BIGINT) AS con,
         |    CAST(coalesce(sum(CASE WHEN b.y < a.y THEN a.c * b.c
         |      ELSE 0 END), 0) AS BIGINT) AS dis
         |  FROM cells a JOIN cells b ON b.x > a.x),
         |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells)
         |SELECT n, con AS concordant, dis AS discordant,
         |  CAST(CASE WHEN n >= 2
         |    THEN (con - dis) * 1000000 // ((n * (n - 1)) // 2)
         |    ELSE NULL END AS BIGINT) AS tau_a_e6
         |FROM t, p""".stripMargin,

    // po and pe ride un-divided integer sums (pe over n^2); kappa's one
    // signed DIV truncates identically in both engines
    "q_cohen_kappa" ->
      """WITH s AS (
        |  SELECT CASE WHEN n_chars % 89 > 44 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN n_chars % 97 > 48 THEN 1 ELSE 0 END AS b
        |  FROM documents),
        |conf AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(sum(c) AS BIGINT) AS na FROM conf GROUP BY 1),
        |mb AS (SELECT b, CAST(sum(c) AS BIGINT) AS nb FROM conf GROUP BY 1),
        |pe AS (
        |  SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT) AS pe_num
        |  FROM ma JOIN mb ON ma.a = mb.b),
        |t AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(coalesce(sum(CASE WHEN a = b THEN c END), 0) AS BIGINT)
        |      AS n_agree
        |  FROM conf),
        |r AS (
        |  SELECT n, n_agree,
        |    n_agree * 1000000 // n AS po_e6,
        |    pe_num * 1000000 // (n * n) AS pe_e6
        |  FROM t, pe)
        |SELECT n, n_agree, po_e6, pe_e6,
        |  CAST(CASE WHEN pe_e6 < 1000000
        |    THEN (po_e6 - pe_e6) * 1000000 // (1000000 - pe_e6)
        |    ELSE NULL END AS BIGINT) AS kappa_e6
        |FROM r""".stripMargin,

    // gap mass stays an un-divided sum until the single final DIV, so
    // no per-bin rounding leaks into the global ECE
    "q_calibration" ->
      """WITH s AS (
        |  SELECT (n_chars % 101) * 1000000 // 100 AS conf,
        |    CASE WHEN (CASE WHEN n_chars % 101 >= 50 THEN 1 ELSE 0 END) =
        |      (CASE WHEN n_chars % 89 > 44 THEN 1 ELSE 0 END)
        |      THEN 1 ELSE 0 END AS ok
        |  FROM documents),
        |b AS (
        |  SELECT least((conf * 10) // 1000000, 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(ok) AS BIGINT) AS n_correct,
        |    CAST(sum(conf) AS BIGINT) AS sum_conf
        |  FROM s GROUP BY 1),
        |g AS (SELECT *, abs(n_correct * 1000000 - sum_conf) AS gm FROM b),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |  CAST(sum(gm) AS BIGINT) AS tgm FROM g)
        |SELECT bin, n, n_correct,
        |  n_correct * 1000000 // n AS acc_e6,
        |  sum_conf // n AS avg_conf_e6,
        |  CAST(gm // n AS BIGINT) AS gap_e6,
        |  CAST(tgm // nn AS BIGINT) AS ece_e6
        |FROM g, t""".stripMargin,

    // 3 MM rounds replayed in e6 fixed point — every DIV truncation
    // identical, so the strengths match bit for bit
    "q_bradley_terry" ->
      s"""WITH resp AS (
         |  SELECT doc_id // 4 AS prompt_id, doc_id % 4 AS resp_id,
         |    strlen(text) % 97 AS score
         |  FROM documents),
         |pm AS (
         |  SELECT a.resp_id AS i, b.resp_id AS j,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN a.score > b.score THEN 1 ELSE 0 END)
         |      AS BIGINT) AS wi
         |  FROM resp a JOIN resp b ON a.prompt_id = b.prompt_id
         |    AND a.resp_id < b.resp_id
         |  WHERE a.score != b.score GROUP BY 1, 2),
         |dir AS (
         |  SELECT i AS player, j AS other, n FROM pm
         |  UNION ALL SELECT j, i, n FROM pm),
         |w AS (
         |  SELECT player, CAST(sum(wins) AS BIGINT) AS wins,
         |    CAST(sum(games) AS BIGINT) AS games
         |  FROM (SELECT i AS player, wi AS wins, n AS games FROM pm
         |        UNION ALL SELECT j, n - wi, n FROM pm)
         |  GROUP BY 1),
         |p0 AS (SELECT player, CAST(1000000 AS BIGINT) AS p FROM w),
         |${(1 to 3).map(btIterCtes).mkString(",\n")}
         |SELECT w.player, w.wins, w.games, CAST(p3.p AS BIGINT)
         |  AS strength_e6
         |FROM w JOIN p3 ON p3.player = w.player""".stripMargin,

    "q_epoch_schedule" ->
      """WITH s AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |    MAX(CAST(substring(source, 4) AS BIGINT) % 3 + 1) AS u
        |  FROM documents GROUP BY 1),
        |w1 AS (SELECT *, u * 1000000 // sum(u) OVER () AS target_e6 FROM s),
        |w2 AS (SELECT *, (60000 * target_e6) // 1000000 AS want,
        |  (300 * n_tokens) // 100 AS cap_tokens FROM w1),
        |w3 AS (SELECT *, CASE WHEN want > cap_tokens THEN 1 ELSE 0 END
        |    AS capped,
        |  least(want, cap_tokens) AS alloc1 FROM w2),
        |w4 AS (SELECT *, 60000 - sum(alloc1) OVER () AS leftover,
        |  sum(CASE WHEN capped = 0 THEN u ELSE 0 END) OVER () AS uncapped_u
        |  FROM w3),
        |w5 AS (SELECT *, alloc1 + (CASE WHEN capped = 0 AND uncapped_u > 0
        |    THEN (leftover * u) // uncapped_u ELSE 0 END) AS alloc_tokens
        |  FROM w4)
        |SELECT source, n_tokens, CAST(target_e6 AS BIGINT) AS target_e6,
        |  CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
        |  CAST((alloc_tokens * 100) // n_tokens AS BIGINT) AS epochs_e2,
        |  capped
        |FROM w5""".stripMargin,

    "q_source_divergence" ->
      s"""WITH t AS (
         |  SELECT source AS src, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |tf AS (SELECT src, ${dh("w")} AS tw, count(*) AS tf
         |  FROM t GROUP BY 1, 2),
         |tot AS (SELECT src, CAST(sum(tf) AS BIGINT) AS t FROM tf GROUP BY 1),
         |co AS (
         |  SELECT a.src AS source_a, b.src AS source_b,
         |    ta.t AS t_a, tb.t AS t_b,
         |    count(*) AS n_shared_tokens,
         |    CAST(sum(abs(a.tf * tb.t - b.tf * ta.t)) AS HUGEINT) AS co_diff,
         |    CAST(sum(a.tf) AS BIGINT) AS m_a,
         |    CAST(sum(b.tf) AS BIGINT) AS m_b
         |  FROM tf a JOIN tf b ON a.tw = b.tw AND a.src < b.src
         |  JOIN tot ta ON ta.src = a.src
         |  JOIN tot tb ON tb.src = b.src
         |  GROUP BY 1, 2, 3, 4)
         |SELECT source_a, source_b, n_shared_tokens,
         |  CAST(((co_diff + (t_a - m_a) * t_b + (t_b - m_b) * t_a) * 1000000)
         |    // (CAST(t_a AS HUGEINT) * t_b * 2) AS BIGINT) AS tv_e6
         |FROM co""".stripMargin,

    "q_embed_pipeline" ->
      s"""${quantCte.trim},
         |${kmeansCtes(k = 4, iters = 2, dims = 64)},
         |m AS (SELECT e.vec_id, af.kk % 4 AS cid, e.qe
         |  FROM e JOIN af USING (vec_id)),
         |p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${dotSql("a.qe", "b.qe")} AS dot,
         |    ${dotSql("a.qe", "a.qe")} AS na,
         |    ${dotSql("b.qe", "b.qe")} AS nb
         |  FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |d AS (SELECT DISTINCT id_b FROM p
         |  WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) >= 0.4),
         |surv AS (SELECT m.vec_id, m.cid FROM m
         |  LEFT JOIN d ON m.vec_id = d.id_b WHERE d.id_b IS NULL)
         |SELECT vec_id, cid, kept_rank FROM (
         |  SELECT vec_id, cid, row_number() OVER (PARTITION BY cid
         |    ORDER BY ${dh("'cbal|' || CAST(vec_id AS VARCHAR)")}, vec_id)
         |    AS kept_rank
         |  FROM surv)
         |WHERE kept_rank <= 60""".stripMargin,

    "q_curriculum" -> {
      val h = dhSalted("curriculum")
      s"""SELECT doc_id, least(n_chars // 100, 5) AS stage,
         |  CAST(row_number() OVER (
         |    ORDER BY least(n_chars // 100, 5), $h, doc_id) - 1 AS BIGINT)
         |    AS curriculum_pos
         |FROM documents""".stripMargin
    },

    // argmax over h60(shard|salt|id) with shard-name tie-break — the
    // window replay of the Spark side's struct array_max
    "q_hrw_assign" -> {
      val vals = HrwShards.map(s => s"('$s')").mkString(", ")
      s"""WITH sh(s) AS (VALUES $vals),
         |a AS (
         |  SELECT doc_id, s,
         |    ${dh("s || '|hrw|' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents CROSS JOIN sh),
         |r AS (
         |  SELECT doc_id, s, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
         |  FROM a)
         |SELECT s AS shard, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(bit_xor(${dh("CAST(doc_id AS VARCHAR)")}) AS BIGINT)
         |    AS checksum
         |FROM r WHERE rn = 1 GROUP BY 1""".stripMargin
    },

    // the same 6-word line fold + salts, then the C4 decision table:
    // line rules (>=3 words, terminal punct, no 'javascript'), page
    // rules (brace > lorem > too-few-kept-lines precedence)
    "q_c4_filter" ->
      s"""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |built AS (
         |  SELECT doc_id, array_to_string(list_concat(
         |    list_transform(range((len(ws) + 5) // 6), i ->
         |      array_to_string(ws[i*6+1 : i*6+6], ' ') ||
         |      CASE WHEN (doc_id + i) % 11 = 0 THEN ' javascript'
         |        ELSE '' END ||
         |      CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END),
         |    list_concat(
         |      CASE WHEN doc_id % 17 = 0
         |        THEN ['lorem ipsum dolor sit.']
         |        ELSE CAST([] AS VARCHAR[]) END,
         |      CASE WHEN doc_id % 13 = 0 THEN ['config { x }.']
         |        ELSE CAST([] AS VARCHAR[]) END)), chr(10)) AS t0
         |  FROM w),
         |crlf AS (
         |  SELECT doc_id, CASE WHEN doc_id % 7 = 0
         |    THEN replace(t0, chr(10), chr(13) || chr(10))
         |    ELSE t0 END AS t2
         |  FROM built),
         |f AS (
         |  SELECT doc_id, t2,
         |    len(string_split_regex(t2, '\r?\n')) AS n_lines,
         |    list_filter(string_split_regex(t2, '\r?\n'), l ->
         |      len(string_split(l, ' ')) >= 3
         |      AND regexp_matches(l, '[.!?"]$$')
         |      AND NOT contains(l, 'javascript')) AS kept
         |  FROM crlf),
         |d AS (
         |  SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
         |    CAST(len(kept) AS BIGINT) AS n_kept,
         |    CASE WHEN contains(t2, '{') THEN 'brace'
         |      WHEN contains(t2, 'lorem ipsum') THEN 'lorem'
         |      WHEN len(kept) < 5 THEN 'too_few_lines'
         |      ELSE 'kept' END AS reject_reason,
         |    array_to_string(kept, chr(10)) AS ktext
         |  FROM f)
         |SELECT doc_id, n_lines, n_kept, reject_reason,
         |  CAST(CASE WHEN reject_reason = 'kept' THEN 1 ELSE 0 END
         |    AS BIGINT) AS keep,
         |  ${dh("CASE WHEN reject_reason = 'kept' THEN ktext ELSE '' END")}
         |    AS kept_h
         |FROM d""".stripMargin,

    // the Gopher decision table replayed: same planted pages, same
    // integer cross-multiplied ratio rules, same first-failure order
    "q_gopher_filter" ->
      """WITH planted AS (
        |  SELECT doc_id, CASE
        |    WHEN doc_id % 23 = 0
        |      THEN rtrim(repeat('• alpha beta point' || chr(10), 60),
        |        chr(10))
        |    WHEN doc_id % 19 = 0
        |      THEN rtrim(repeat(
        |        'the data of that run went on and on and on then...'
        |        || chr(10), 10), chr(10))
        |    WHEN doc_id % 17 = 0
        |      THEN repeat('the quick data of that batch have gone with them ',
        |        5) || '# # # # # # # # # #'
        |    WHEN doc_id % 13 = 0
        |      THEN repeat('the quick data of that batch have gone with them ',
        |        5) || '1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20'
        |    WHEN doc_id % 29 = 0 THEN rtrim(repeat('reconfiguration ', 50), ' ')
        |    WHEN doc_id % 11 = 0 THEN text || ' ' || text || ' ' || text ||
        |      ' ' || text || ' ' || text || ' ' || text
        |    WHEN doc_id % 7 = 0 THEN 'tiny doc of the sort.'
        |    ELSE text || ' ' || text || ' ' || text || ' ' || text ||
        |      chr(10) ||
        |      'the rest of that batch have come with them to be safe.'
        |    END AS t
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, t,
        |    list_filter(string_split_regex(t, '[ \t\n\f\r]+'), x -> len(x) > 0)
        |      AS words,
        |    string_split_regex(t, '\r?\n') AS lines
        |  FROM planted),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(words) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(words, x -> len(x))) AS BIGINT)
        |      AS word_len_sum,
        |    CAST((len(t) - len(replace(t, '...', ''))) // 3
        |      + (len(t) - len(replace(t, '…', '')))
        |      + (len(t) - len(replace(t, '#', ''))) AS BIGINT) AS n_symbols,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(lines, l -> starts_with(l, '•')
        |      OR starts_with(l, '- ') OR starts_with(l, '* '))) AS BIGINT)
        |      AS bullet_lines,
        |    CAST(len(list_filter(lines, l -> ends_with(l, '...')
        |      OR ends_with(l, '…'))) AS BIGINT) AS ellipsis_lines,
        |    CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
        |      AS BIGINT) AS alpha_words,
        |    CAST(len(list_filter(
        |      ['the','be','to','of','and','that','have','with'],
        |      m -> list_contains(words, m))) AS BIGINT) AS stop_kinds
        |  FROM w),
        |r AS (
        |  SELECT *, CASE
        |    WHEN n_words < 50 OR n_words > 100000 THEN 'word_count'
        |    WHEN word_len_sum < 3 * n_words OR word_len_sum > 10 * n_words
        |      THEN 'mean_word_len'
        |    WHEN n_symbols * 10 > n_words THEN 'symbol_ratio'
        |    WHEN bullet_lines * 10 > n_lines * 9 THEN 'bullet_lines'
        |    WHEN ellipsis_lines * 10 > n_lines * 3 THEN 'ellipsis_lines'
        |    WHEN alpha_words * 5 < n_words * 4 THEN 'alpha_words'
        |    WHEN stop_kinds < 2 THEN 'stopwords'
        |    ELSE 'kept' END AS reject_reason
        |  FROM c)
        |SELECT doc_id, n_words, word_len_sum, n_symbols, n_lines,
        |  bullet_lines, ellipsis_lines, alpha_words, stop_kinds,
        |  reject_reason,
        |  CAST(CASE WHEN reject_reason = 'kept' THEN 1 ELSE 0 END AS BIGINT)
        |    AS keep
        |FROM r""".stripMargin,

    // shard = salted-hash mod 16; checksum = order-insensitive xor over
    // (id, length) — the manifest a shard consumer re-verifies
    "q_shard_manifest" ->
      s"""SELECT ${dhSalted("shard")} % 16 AS shard,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |  CAST(bit_xor(${dh("CAST(doc_id AS VARCHAR) || '|' || CAST(length(text) AS VARCHAR)")}) AS BIGINT)
         |    AS checksum
         |FROM documents GROUP BY 1""".stripMargin,

    // the BMP decode replayed from first principles: pixel byte j of the
    // display-order image is text char (j mod len)+1 (ASCII corpus:
    // byte == char code); display row 0 is chars 1..21 (w=7 -> 21 row
    // bytes). The Spark side must survive bottom-up storage and stride
    // padding to reproduce these sums.
    "q_bmp_decode" -> pixelSumsOracleSql,

    // GIF's LZW+palette round trip is LOSSLESS for the <= 28-color
    // fixtures, so the ImageIO decode replays the SAME first-principles
    // pixel sums as the BMP byte walk
    "q_gif_decode" -> pixelSumsOracleSql,

    // JPEG is lossy: the oracle checks the exactly-reproducible fields
    // (dims + pixel count); sums are spec-pinned with tolerance
    "q_jpeg_decode" ->
      """SELECT doc_id AS media_id, CAST(1 AS BIGINT) AS ok,
        |  CAST(7 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
        |  CAST(28 AS BIGINT) AS n_pixels
        |FROM documents WHERE length(text) > 0""".stripMargin,


    // the MP4 demux replayed from first principles: sample i is text
    // chars [start_i+1, start_i+len_i] of the repeated corpus text (the
    // VALUES render from the Mp4Starts/Mp4Lens Seqs the muxer consumed),
    // so the checksum over mdat-extracted bytes replays as an xor of
    // substring hashes; counts/duration are the muxed constants
    "q_mp4_demux" -> {
      val vals = (0 until 9)
        .map(i => s"(${Mp4Starts(i)}, ${Mp4Lens(i)})").mkString(", ")
      s"""WITH d AS (SELECT doc_id,
         |    repeat(text, $Mp4Total // length(text) + 1) AS r
         |  FROM documents WHERE length(text) > 0),
         |s AS (SELECT doc_id, substr(r, st + 1, ln) AS smp
         |  FROM d CROSS JOIN (VALUES $vals) t(st, ln))
         |SELECT doc_id AS media_id, CAST(1 AS BIGINT) AS ok,
         |  CAST(9 AS BIGINT) AS n_samples, CAST(3 AS BIGINT) AS n_keyframes,
         |  CAST(360 AS BIGINT) AS duration_ms,
         |  CAST($Mp4Total AS BIGINT) AS total_sample_bytes,
         |  CAST(bit_xor(${dh("smp")}) AS BIGINT) AS samples_checksum
         |FROM s GROUP BY 1""".stripMargin
    },

    // the stss keyframes (samples 0/3/6) replayed as the same slices
    "q_mp4_keyframes" -> {
      val vals = (0 until 9 by 3)
        .map(i => s"($i, ${Mp4Starts(i)}, ${Mp4Lens(i)})").mkString(", ")
      s"""WITH d AS (SELECT doc_id,
         |    repeat(text, $Mp4Total // length(text) + 1) AS r
         |  FROM documents WHERE length(text) > 0)
         |SELECT doc_id AS media_id, CAST(i AS BIGINT) AS frame_idx,
         |  CAST(ln AS BIGINT) AS frame_bytes,
         |  ${dh("substr(r, st + 1, ln)")} AS frame_h
         |FROM d CROSS JOIN (VALUES $vals) t(i, st, ln)""".stripMargin
    },

    // the truncated rankings replayed per width: the dot AND both norms
    // run over the first `dims` components (range(dims) is the slice)
    "q_mrl_retention" -> {
      def dotD(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(d.dims), i -> $a[i+1] * $b[i+1])) AS BIGINT)"
      val cos = s"round(CAST(${dotD("e.qe", "q.qq")} AS DOUBLE) / " +
        s"sqrt(CAST(${dotD("e.qe", "e.qe")} AS DOUBLE) * " +
        s"CAST(${dotD("q.qq", "q.qq")} AS DOUBLE)), 6)"
      s"""${quantCte.trim},
         |q AS (SELECT qe AS qq FROM e WHERE vec_id = 0),
         |d(dims) AS (VALUES (8), (16), (32), (64)),
         |s AS (
         |  SELECT d.dims, e.vec_id, $cos AS c
         |  FROM e CROSS JOIN q CROSS JOIN d WHERE e.vec_id != 0),
         |r AS (SELECT dims, vec_id, ROW_NUMBER() OVER (
         |    PARTITION BY dims ORDER BY c DESC, vec_id) AS rn FROM s),
         |t AS (SELECT dims, vec_id FROM r WHERE rn <= 10),
         |f AS (SELECT vec_id FROM t WHERE dims = 64),
         |o AS (SELECT t.dims, count(*) AS ov
         |  FROM t JOIN f USING (vec_id) GROUP BY 1)
         |SELECT CAST(d.dims AS BIGINT) AS dims,
         |  CAST(coalesce(o.ov, 0) AS BIGINT) AS overlap
         |FROM d LEFT JOIN o ON d.dims = o.dims""".stripMargin
    },

    // heldout n-grams replayed width by width against the train set
    "q_ngram_novelty" -> {
      def side(cond: String) =
        s"""SELECT DISTINCT n, ${dh("g")} AS h FROM (
           |  SELECT n.n AS n, unnest(list_transform(
           |    range(len(ws) - n.n + 1),
           |    i -> array_to_string(list_slice(ws, i + 1, i + n.n), ' ')))
           |    AS g
           |  FROM (SELECT string_split(text, ' ') AS ws FROM documents
           |        WHERE $cond)
           |  CROSS JOIN (VALUES (1), (2), (3), (4)) n(n))""".stripMargin
      s"""WITH hg AS (${side("doc_id % 10 = 9")}),
         |tg AS (${side("doc_id % 10 != 9")}),
         |ov AS (SELECT hg.n, count(*) AS overlap_ngrams
         |  FROM hg SEMI JOIN tg ON hg.n = tg.n AND hg.h = tg.h GROUP BY 1),
         |hh AS (SELECT n, count(*) AS heldout_ngrams FROM hg GROUP BY 1)
         |SELECT CAST(hh.n AS BIGINT) AS n,
         |  CAST(hh.heldout_ngrams AS BIGINT) AS heldout_ngrams,
         |  CAST(coalesce(ov.overlap_ngrams, 0) AS BIGINT) AS overlap_ngrams,
         |  CAST((hh.heldout_ngrams - coalesce(ov.overlap_ngrams, 0)) *
         |    1000000 // hh.heldout_ngrams AS BIGINT) AS novelty_e6
         |FROM hh LEFT JOIN ov ON hh.n = ov.n""".stripMargin
    },

    // the growth curve replayed slice by slice: same integer prefix
    // buckets, same first-sighting-bucket vocabulary attribution
    "q_vocab_growth" ->
      """WITH n AS (SELECT max(doc_id) + 1 AS nn FROM documents),
        |b AS (SELECT doc_id, text,
        |    CAST(doc_id * 16 // nn AS BIGINT) AS bucket
        |  FROM documents, n),
        |pt AS (SELECT bucket,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
        |  FROM b GROUP BY 1),
        |fs AS (SELECT w, min(bucket) AS fb FROM (
        |    SELECT bucket, unnest(string_split(text, ' ')) AS w FROM b)
        |  GROUP BY 1),
        |nv AS (SELECT fb, count(*) AS newv FROM fs GROUP BY 1)
        |SELECT pt.bucket,
        |  CAST(sum(pt.toks) OVER (ORDER BY pt.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens,
        |  CAST(sum(coalesce(nv.newv, 0)) OVER (ORDER BY pt.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_vocab
        |FROM pt LEFT JOIN nv ON pt.bucket = nv.fb""".stripMargin,

    // rank-frequency replay: same vocab counts, same (n DESC, w) total
    // order, the power-of-two mask as the identical bitwise test
    "q_zipf" ->
      """WITH tk AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS n FROM tk WHERE w != '' GROUP BY 1),
        |top AS (SELECT w, n,
        |    ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rank
        |  FROM wc ORDER BY n DESC, w LIMIT 256)
        |SELECT CAST(rank AS BIGINT) AS rank, w AS word,
        |  CAST(n AS BIGINT) AS freq, CAST(n * rank AS BIGINT) AS freq_rank
        |FROM top WHERE (rank & (rank - 1)) = 0""".stripMargin,

    // preference extremes replayed as two rank windows over the same
    // deterministic scores; the tie-to-lower-id contract on both sides
    // makes all-equal prompts self-identical -> margin 0 -> dropped
    "q_pref_pairs" ->
      """WITH resp AS (
        |  SELECT doc_id // 4 AS prompt_id, doc_id % 4 AS resp_id,
        |    strlen(text) % 97 AS score, strlen(text) AS len
        |  FROM documents),
        |c AS (
        |  SELECT prompt_id, resp_id, score, len,
        |    ROW_NUMBER() OVER (PARTITION BY prompt_id
        |      ORDER BY score DESC, resp_id) AS rc,
        |    ROW_NUMBER() OVER (PARTITION BY prompt_id
        |      ORDER BY score ASC, resp_id) AS rr,
        |    count(*) OVER (PARTITION BY prompt_id) AS n
        |  FROM resp)
        |SELECT ch.prompt_id, ch.resp_id AS chosen_id,
        |  rj.resp_id AS rejected_id,
        |  CAST(ch.score - rj.score AS BIGINT) AS margin,
        |  CAST(ch.len AS BIGINT) AS len_chosen,
        |  CAST(rj.len AS BIGINT) AS len_rejected,
        |  CAST(CASE WHEN ch.len > rj.len THEN 1 ELSE 0 END AS BIGINT)
        |    AS len_bias
        |FROM (SELECT * FROM c WHERE rc = 1) ch
        |JOIN (SELECT * FROM c WHERE rr = 1) rj USING (prompt_id)
        |WHERE ch.n >= 2 AND ch.score > rj.score""".stripMargin,

    // the robots decision replayed from the SAME rules table the Spark
    // side must recover by parsing the fixture text (OpsSpec pins the
    // parse == the Seq, so the decision comparison covers both halves)
    "q_robots" -> {
      val vals = RobotRules
        .map { case (a, al, p) => s"('$a', $al, '$p')" }.mkString(", ")
      s"""WITH rules(agent, allow, prefix) AS (VALUES $vals),
         |u AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 2 = 0 THEN 'graftbot'
         |      ELSE 'otherbot' END AS agent,
         |    CASE CAST(doc_id % 4 AS INT)
         |      WHEN 0 THEN '/private/' || w1
         |      WHEN 1 THEN '/private/ok/' || w1
         |      WHEN 2 THEN '/tmp/x'
         |      ELSE '/' || w1 END AS path
         |  FROM (SELECT doc_id, string_split(text, ' ')[1] AS w1
         |        FROM documents)),
         |e AS (SELECT u.*, CASE WHEN u.agent IN (SELECT agent FROM rules)
         |    THEN u.agent ELSE '*' END AS agent_eff FROM u),
         |m AS (SELECT e.doc_id, r.allow, strlen(r.prefix) AS plen
         |  FROM e JOIN rules r ON r.agent = e.agent_eff
         |    AND substr(e.path, 1, strlen(r.prefix)) = r.prefix),
         |w AS (SELECT doc_id, allow, plen, ROW_NUMBER() OVER (
         |    PARTITION BY doc_id ORDER BY plen DESC, allow DESC) AS rn
         |  FROM m)
         |SELECT e.doc_id, e.agent, e.path,
         |  CAST(coalesce(w.allow, 1) AS BIGINT) AS allowed,
         |  CAST(coalesce(w.plen, 0) AS BIGINT) AS winner_len
         |FROM e LEFT JOIN (SELECT doc_id, allow, plen FROM w WHERE rn = 1) w
         |  USING (doc_id)""".stripMargin
    },

    // the chat fixture's planted malformations make every validation
    // verdict a pure function of doc_id — the Spark side must PARSE the
    // flat transcript (incl. regrouping the %5 continuation lines) to
    // reproduce them
    "q_chat_turns" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 13 = 0 THEN 3 ELSE 4 END AS BIGINT)
        |    AS n_turns,
        |  CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS role_violations,
        |  CAST(CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS empty_turns,
        |  CAST(CASE WHEN doc_id % 13 = 0 THEN
        |      CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END
        |    ELSE 1 END AS BIGINT) AS ends_assistant,
        |  CASE WHEN doc_id % 7 = 0 THEN 'role_order'
        |    WHEN doc_id % 11 = 0 THEN 'empty_turn'
        |    WHEN doc_id % 13 = 0 THEN 'ends_user'
        |    ELSE 'kept' END AS reject_reason,
        |  CAST(CASE WHEN doc_id % 7 = 0 OR doc_id % 11 = 0
        |    OR doc_id % 13 = 0 THEN 0 ELSE 1 END AS BIGINT) AS keep
        |FROM documents
        |WHERE len(string_split(text, ' ')) >= 8""".stripMargin,

    // the kept dialogues' rendered strings reconstructed turn by turn
    "q_chat_render" -> {
      s"""WITH f AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws,
         |    len(string_split(text, ' ')) // 4 AS q
         |  FROM documents
         |  WHERE len(string_split(text, ' ')) >= 8
         |    AND doc_id % 7 != 0 AND doc_id % 11 != 0 AND doc_id % 13 != 0),
         |c AS (
         |  SELECT doc_id,
         |    array_to_string(list_slice(ws, 1, q), ' ') ||
         |      CASE WHEN doc_id % 5 = 0
         |        THEN chr(10) || 'see details below.' ELSE '' END AS c0,
         |    array_to_string(list_slice(ws, q + 1, 2 * q), ' ') AS c1,
         |    array_to_string(list_slice(ws, 2 * q + 1, 3 * q), ' ') AS c2,
         |    array_to_string(list_slice(ws, 3 * q + 1, 4 * q), ' ') AS c3
         |  FROM f),
         |r AS (
         |  SELECT doc_id, c0, c1, c2, c3,
         |    '<|user|>' || chr(10) || c0 || '<|end|>' || chr(10) ||
         |    '<|assistant|>' || chr(10) || c1 || '<|end|>' || chr(10) ||
         |    '<|user|>' || chr(10) || c2 || '<|end|>' || chr(10) ||
         |    '<|assistant|>' || chr(10) || c3 || '<|end|>' || chr(10)
         |      AS render
         |  FROM c)
         |SELECT doc_id, ${dh("render")} AS rendered_h,
         |  CAST(strlen(render) AS BIGINT) AS rendered_chars,
         |  CAST(len(string_split(c1, ' ')) + len(string_split(c3, ' '))
         |    AS BIGINT) AS assistant_tokens,
         |  CAST(len(string_split(c0, ' ')) + len(string_split(c1, ' ')) +
         |    len(string_split(c2, ' ')) + len(string_split(c3, ' '))
         |    AS BIGINT) AS total_tokens
         |FROM r""".stripMargin
    },

    // the WARC parse replayed from first principles: every field of the
    // 3-record fixture reconstructs directly from (doc_id, text) — the
    // Spark side must frame records by Content-Length and split the
    // two header levels to reproduce these hashes
    "q_warc_parse" -> {
      val crlf = "chr(13) || chr(10)"
      s"""WITH r AS (
         |  SELECT doc_id, i, text,
         |    CASE i WHEN 0 THEN 'warcinfo' WHEN 1 THEN 'request'
         |      ELSE 'response' END AS warc_type,
         |    CASE WHEN i = 0 THEN ''
         |      ELSE 'http://example.com/doc/' || doc_id END AS target_uri,
         |    CASE i
         |      WHEN 0 THEN 'software: graft' || $crlf
         |      WHEN 1 THEN 'GET /doc/' || doc_id || ' HTTP/1.1' || $crlf ||
         |        'Host: example.com' || $crlf || $crlf
         |      ELSE 'HTTP/1.1 200 OK' || $crlf ||
         |        'Content-Type: text/plain' || $crlf || $crlf || text
         |    END AS body
         |  FROM documents CROSS JOIN range(3) t(i))
         |SELECT doc_id AS warc_id, CAST(i AS BIGINT) AS rec_idx, warc_type,
         |  target_uri, CAST(strlen(body) AS BIGINT) AS content_length,
         |  ${dh("body")} AS body_h,
         |  CAST(CASE WHEN i = 2 THEN 200 ELSE 0 END AS BIGINT) AS http_status,
         |  CASE WHEN i = 2 THEN ${dh("text")} ELSE CAST(0 AS BIGINT) END
         |    AS http_body_h
         |FROM r""".stripMargin
    },

    // the PNG decode replayed from first principles: the fixtures carry
    // the SAME display-order pixel bytes as q_bmp_decode (char (j mod
    // len)+1), so the sums replay identically — the Spark side must
    // inflate the IDAT, pass the chunk CRCs, and undo the five cycled
    // scanline filters to reproduce them. Row 0 is TOP-down (PNG order).
    "q_png_decode" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  WHERE length(text) > 0),
        |px AS (
        |  SELECT media_id,
        |    CAST(sum(c) AS BIGINT) AS pixel_sum,
        |    CAST(sum(CASE WHEN j < 21 THEN c ELSE 0 END) AS BIGINT)
        |      AS row0_sum
        |  FROM (
        |    SELECT d.media_id, t.j,
        |      ascii(substr(d.text, CAST(j % length(d.text) AS INT) + 1, 1))
        |        AS c
        |    FROM d CROSS JOIN range(84) t(j))
        |  GROUP BY media_id)
        |SELECT media_id, CAST(1 AS BIGINT) AS ok, CAST(7 AS BIGINT) AS width,
        |  CAST(4 AS BIGINT) AS height, CAST(3 AS BIGINT) AS channels,
        |  CAST(28 AS BIGINT) AS n_pixels, pixel_sum, row0_sum
        |FROM px""".stripMargin,

    // the PNG NN resize replayed byte by byte — identical floor mapping
    // to q_bmp_resize, with the round trip re-entropy-coded on the way
    "q_png_resize" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  WHERE length(text) > 0),
        |px AS (
        |  SELECT media_id,
        |    CAST(sum(c) AS BIGINT) AS pixel_sum,
        |    CAST(sum(CASE WHEN y = 0 THEN c ELSE 0 END) AS BIGINT)
        |      AS row0_sum
        |  FROM (
        |    SELECT d.media_id, y.y,
        |      ascii(substr(d.text,
        |        CAST(((y.y * 4 // 2) * 21 + (x.x * 7 // 3) * 3 + ch.ch)
        |          % length(d.text) AS INT) + 1, 1)) AS c
        |    FROM d CROSS JOIN range(2) y(y) CROSS JOIN range(3) x(x)
        |    CROSS JOIN range(3) ch(ch))
        |  GROUP BY media_id)
        |SELECT media_id, CAST(1 AS BIGINT) AS ok, CAST(3 AS BIGINT) AS width,
        |  CAST(2 AS BIGINT) AS height, CAST(3 AS BIGINT) AS channels,
        |  CAST(6 AS BIGINT) AS n_pixels, pixel_sum, row0_sum
        |FROM px""".stripMargin,

    // the WAV decode replayed from first principles: sample j is
    // c_(j mod len)*129 + j*7 - 8192 (sign-extended PCM16 on the Spark
    // side); 96 data bytes over the 32000 B/s byte rate -> 3 ms
    "q_wav_decode" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  WHERE length(text) > 0),
        |s AS (
        |  SELECT media_id,
        |    CAST(sum(v) AS BIGINT) AS sum_amp,
        |    CAST(sum(v * v) AS BIGINT) AS sum_sq
        |  FROM (
        |    SELECT d.media_id,
        |      ascii(substr(d.text, CAST(j % length(d.text) AS INT) + 1, 1))
        |        * 129 + j * 7 - 8192 AS v
        |    FROM d CROSS JOIN range(48) t(j))
        |  GROUP BY media_id)
        |SELECT media_id, CAST(1 AS BIGINT) AS ok,
        |  CAST(16000 AS BIGINT) AS sample_rate, CAST(48 AS BIGINT) AS n_samples,
        |  sum_amp, sum_sq, CAST(3 AS BIGINT) AS duration_ms
        |FROM s""".stripMargin,

    // the frame features replayed sample by sample: v_j from the
    // generative formula, zero-cross = sign flip vs v_{j-1} (counted in
    // the SECOND sample's frame; j=0 contributes none), frames of 16
    "q_wav_frames" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  WHERE length(text) > 0),
        |s AS (
        |  SELECT d.media_id, t.j,
        |    ascii(substr(d.text, CAST(j % length(d.text) AS INT) + 1, 1))
        |      * 129 + j * 7 - 8192 AS v,
        |    CASE WHEN j = 0 THEN 0 ELSE
        |      CASE WHEN (ascii(substr(d.text,
        |          CAST((j - 1) % length(d.text) AS INT) + 1, 1))
        |          * 129 + (j - 1) * 7 - 8192) *
        |        (ascii(substr(d.text, CAST(j % length(d.text) AS INT) + 1, 1))
        |          * 129 + j * 7 - 8192) < 0 THEN 1 ELSE 0 END
        |    END AS zc
        |  FROM d CROSS JOIN range(48) t(j))
        |SELECT media_id, CAST(j // 16 AS BIGINT) AS frame_idx,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(v) AS BIGINT) AS sum_amp,
        |  CAST(sum(v * v) AS BIGINT) AS sum_sq,
        |  CAST(sum(zc) AS BIGINT) AS n_zero_cross,
        |  CAST(sum(CASE WHEN abs(v) >= 7800 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped
        |FROM s GROUP BY 1, 2""".stripMargin,

    // the nearest-neighbor resize replayed byte by byte: display pixel
    // (x, y) of the 3x2 output draws source pixel (x*7//3, y*4//2) of
    // the 7x4 input, whose channel bytes sit at j = sy*21 + sx*3 + ch
    // in the display-order pixel array = text char (j mod len)
    "q_bmp_resize" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  WHERE length(text) > 0),
        |px AS (
        |  SELECT media_id,
        |    CAST(sum(c) AS BIGINT) AS pixel_sum,
        |    CAST(sum(CASE WHEN y = 0 THEN c ELSE 0 END) AS BIGINT)
        |      AS row0_sum
        |  FROM (
        |    SELECT d.media_id, y.y,
        |      ascii(substr(d.text,
        |        CAST(((y.y * 4 // 2) * 21 + (x.x * 7 // 3) * 3 + ch.ch)
        |          % length(d.text) AS INT) + 1, 1)) AS c
        |    FROM d CROSS JOIN range(2) y(y) CROSS JOIN range(3) x(x)
        |    CROSS JOIN range(3) ch(ch))
        |  GROUP BY media_id)
        |SELECT media_id, CAST(1 AS BIGINT) AS ok, CAST(3 AS BIGINT) AS width,
        |  CAST(2 AS BIGINT) AS height, CAST(6 AS BIGINT) AS n_pixels,
        |  pixel_sum, row0_sum
        |FROM px""".stripMargin,

    // the box-filter downscale replayed: dst pixel (x, y, ch) is the
    // truncating integer mean over its floor-partitioned source block
    // [x*7//3,(x+1)*7//3) x [y*4//2,(y+1)*4//2) of the same j-indexed
    // display bytes (DuckDB // and the kernel's Scala / agree)
    "q_bmp_resize_area" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  WHERE length(text) > 0),
        |cells AS (
        |  SELECT media_id, y, x, ch,
        |    CAST(sum(c) AS BIGINT) // CAST(count(*) AS BIGINT) AS v
        |  FROM (
        |    SELECT d.media_id, y.y AS y, x.x AS x, ch.ch AS ch,
        |      ascii(substr(d.text,
        |        CAST((ys.ys * 21 + xs.xs * 3 + ch.ch)
        |          % length(d.text) AS INT) + 1, 1)) AS c
        |    FROM d
        |    CROSS JOIN range(2) y(y) CROSS JOIN range(3) x(x)
        |    CROSS JOIN range(3) ch(ch)
        |    CROSS JOIN range(4) ys(ys) CROSS JOIN range(7) xs(xs)
        |    WHERE ys.ys >= y.y * 4 // 2 AND ys.ys < (y.y + 1) * 4 // 2
        |      AND xs.xs >= x.x * 7 // 3 AND xs.xs < (x.x + 1) * 7 // 3)
        |  GROUP BY 1, 2, 3, 4),
        |px AS (
        |  SELECT media_id, CAST(sum(v) AS BIGINT) AS pixel_sum,
        |    CAST(sum(CASE WHEN y = 0 THEN v ELSE 0 END) AS BIGINT)
        |      AS row0_sum
        |  FROM cells GROUP BY 1)
        |SELECT media_id, CAST(1 AS BIGINT) AS ok, CAST(3 AS BIGINT) AS width,
        |  CAST(2 AS BIGINT) AS height, CAST(6 AS BIGINT) AS n_pixels,
        |  pixel_sum, row0_sum
        |FROM px""".stripMargin,

    // the mean decimation replayed: output sample j is the truncating
    // integer mean of source window 4j..4j+3 (negative sums: DuckDB //
    // truncates toward zero exactly like the kernel's Scala /)
    "q_wav_downsample_mean" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  WHERE length(text) > 0),
        |m AS (
        |  SELECT media_id,
        |    CAST(sum(v) AS BIGINT) // 4 AS mv
        |  FROM (
        |    SELECT d.media_id, i // 4 AS j,
        |      ascii(substr(d.text, CAST(i % length(d.text) AS INT) + 1,
        |          1)) * 129 + i * 7 - 8192 AS v
        |    FROM d CROSS JOIN range(48) t(i))
        |  GROUP BY media_id, j),
        |s AS (
        |  SELECT media_id,
        |    CAST(sum(mv) AS BIGINT) AS sum_amp,
        |    CAST(sum(mv * mv) AS BIGINT) AS sum_sq
        |  FROM m GROUP BY 1)
        |SELECT media_id, CAST(1 AS BIGINT) AS ok,
        |  CAST(4000 AS BIGINT) AS sample_rate, CAST(12 AS BIGINT) AS n_samples,
        |  sum_amp, sum_sq, CAST(3 AS BIGINT) AS duration_ms
        |FROM s""".stripMargin,

    // the 4x decimation replayed from first principles: kept sample j
    // is source sample 4j = c_(4j mod len)*129 + 4j*7 - 8192; 24 data
    // bytes over the new 8000 B/s byte rate -> 3 ms
    "q_wav_downsample" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  WHERE length(text) > 0),
        |s AS (
        |  SELECT media_id,
        |    CAST(sum(v) AS BIGINT) AS sum_amp,
        |    CAST(sum(v * v) AS BIGINT) AS sum_sq
        |  FROM (
        |    SELECT d.media_id,
        |      ascii(substr(d.text, CAST((4 * j) % length(d.text) AS INT) + 1,
        |          1)) * 129 + 4 * j * 7 - 8192 AS v
        |    FROM d CROSS JOIN range(12) t(j))
        |  GROUP BY media_id)
        |SELECT media_id, CAST(1 AS BIGINT) AS ok,
        |  CAST(4000 AS BIGINT) AS sample_rate, CAST(12 AS BIGINT) AS n_samples,
        |  sum_amp, sum_sq, CAST(3 AS BIGINT) AS duration_ms
        |FROM s""".stripMargin,

    // the frame slicer replayed in the VARCHAR domain (ASCII corpus:
    // byte offsets == character offsets); strlen = octet_length
    "q_frame_sample" ->
      s"""SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
         |  CAST(strlen(text) // 4 AS BIGINT) AS frame_bytes,
         |  ${dh("substr(text, CAST(f * (strlen(text) // 4) + 1 AS BIGINT), strlen(text) // 4)")}
         |    AS frame_h
         |FROM documents CROSS JOIN range(4) t(f)""".stripMargin,

    // every-end-position occurrence counting (the Aho–Corasick contract,
    // overlaps included) replayed as a position scan per (doc, phrase)
    "q_phrase_blocklist" -> {
      val vals = BlockPhrases.zipWithIndex
        .map { case (p, i) => s"($i, '$p')" }.mkString(", ")
      s"""WITH ph(pid, p) AS (VALUES $vals),
         |m AS (
         |  SELECT doc_id, pid,
         |    CAST(len(list_filter(
         |      range(1, length(text) - length(p) + 2),
         |      i -> substr(text, i, length(p)) = p)) AS BIGINT) AS cnt
         |  FROM documents CROSS JOIN ph)
         |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_hits,
         |  CAST(count(*) FILTER (WHERE cnt > 0) AS BIGINT) AS n_phrases,
         |  CAST(coalesce(bit_xor(CASE WHEN cnt > 0 THEN
         |    ${dh("CAST(pid AS VARCHAR) || '|' || CAST(cnt AS VARCHAR)")}
         |    ELSE 0 END), 0) AS BIGINT) AS checksum
         |FROM m GROUP BY 1""".stripMargin
    },

    // sign-bit packing into 2x32-bit words (positive, so DuckDB's
    // HUGEINT-widening list_sum compares exactly), then popcount(xor)
    "q_hamming_topk" ->
      """WITH s AS (
        |  SELECT vec_id, list_transform(range(2), w ->
        |    CAST(list_sum(list_transform(range(32), i ->
        |      CASE WHEN embedding[w * 32 + i + 1] > 0
        |        THEN CAST(1 AS BIGINT) << i ELSE 0 END)) AS BIGINT)) AS sig
        |  FROM embeddings),
        |q AS (SELECT sig AS qsig FROM s WHERE vec_id = 0)
        |SELECT vec_id,
        |  CAST(bit_count(xor(sig[1], qsig[1])) +
        |       bit_count(xor(sig[2], qsig[2])) AS BIGINT) AS hamming
        |FROM s CROSS JOIN q WHERE vec_id != 0
        |ORDER BY hamming, vec_id LIMIT 10""".stripMargin,

    // reciprocal-rank fusion of the SHARED bm25 chain (top-20) and the
    // exact-cosine chain (top-20): 1e6 // (60 + rank) contributions
    "q_rrf_fusion" ->
      s"""WITH $bm25ScoredCtes,
         |bl AS (SELECT doc_id, rank FROM (
         |  SELECT doc_id, row_number() OVER (
         |    ORDER BY score_e6 DESC, doc_id) AS rank FROM bmscore)
         |  WHERE rank <= 20),
         |${quantCte.trim.stripPrefix("WITH ")},
         |vq AS (SELECT qe AS query_qe FROM e WHERE vec_id = 0),
         |vd AS (
         |  SELECT vec_id,
         |    round(CAST(${dotSql("qe", "query_qe")} AS DOUBLE) /
         |      sqrt(CAST(${dotSql("qe", "qe")} AS DOUBLE) *
         |           CAST(${dotSql("query_qe", "query_qe")} AS DOUBLE)), 6)
         |      AS cosine_r
         |  FROM e CROSS JOIN vq WHERE vec_id != 0),
         |vl AS (SELECT doc_id, rank FROM (
         |  SELECT vec_id AS doc_id, row_number() OVER (
         |    ORDER BY cosine_r DESC, vec_id) AS rank FROM vd)
         |  WHERE rank <= 20),
         |un AS (
         |  SELECT doc_id, 1000000 // (60 + rank) AS c FROM bl
         |  UNION ALL
         |  SELECT doc_id, 1000000 // (60 + rank) AS c FROM vl)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists,
         |  CAST(sum(c) AS BIGINT) AS rrf_e6
         |FROM un GROUP BY 1
         |ORDER BY rrf_e6 DESC, doc_id LIMIT 10""".stripMargin,

    // the exact canonicalization chain of TextAnalysis.urlParts over the
    // same templated frontier (regex subset identical in RE2 and Java)
    "q_url_canon" ->
      """WITH u AS (
        |  SELECT doc_id, CASE WHEN doc_id % 19 = 0
        |    THEN 'relative/path-' || CAST(doc_id % 5 AS VARCHAR) ||
        |      '?b=2&a=1#frag'
        |    ELSE
        |    'HTTPS://WWW.' || source || '.Example.COM:443/docs/item' ||
        |    CAST(doc_id // 100 AS VARCHAR) || '/?utm_campaign=spring&ref=' ||
        |    source || '&b=2&a=1&utm_source=feed#sec-' ||
        |    CAST(doc_id % 7 AS VARCHAR) END AS url
        |  FROM documents),
        |p AS (SELECT doc_id, url,
        |  regexp_replace(url, '#.*$', '') AS nofrag FROM u),
        |parts AS (
        |  SELECT doc_id, url,
        |    lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
        |      AS scheme,
        |    lower(regexp_extract(nofrag,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)) AS hostraw,
        |    regexp_replace(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*', '')
        |      AS pathq
        |  FROM p),
        |hp AS (
        |  SELECT doc_id, url, scheme, pathq,
        |    regexp_replace(CASE
        |      WHEN scheme = 'https' THEN regexp_replace(hostraw, ':443$', '')
        |      WHEN scheme = 'http' THEN regexp_replace(hostraw, ':80$', '')
        |      ELSE hostraw END, '^(www\.)+', '') AS host
        |  FROM parts),
        |pc AS (
        |  SELECT doc_id, url, scheme, host,
        |    CASE WHEN regexp_replace(
        |        regexp_extract(pathq, '^([^?]*)', 1), '/+$', '') = ''
        |      THEN '/'
        |      ELSE regexp_replace(
        |        regexp_extract(pathq, '^([^?]*)', 1), '/+$', '') END AS path,
        |    array_to_string(list_sort(list_filter(
        |      string_split(regexp_extract(pathq, '\?(.*)$', 1), '&'),
        |      x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&') AS qs
        |  FROM hp),
        |canon AS (
        |  SELECT doc_id,
        |    CASE WHEN scheme = '' THEN url ELSE
        |      scheme || '://' || host || path ||
        |      CASE WHEN qs = '' THEN '' ELSE '?' || qs END END AS canon_url,
        |    regexp_extract(regexp_replace(host, ':[0-9]+$', ''),
        |      '([^.]+\.[^.]+)$', 1) AS domain
        |  FROM pc)
        |SELECT canon_url, domain, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS first_doc
        |FROM canon GROUP BY 1, 2""".stripMargin,

    // WordPiece greedy longest-match replay: per distinct word, bl[p]
    // = longest matching piece's bare length at 1-based position p,
    // chain = the greedy position walk (list_reduce fold; -1 = failed
    // word -> whole-word [UNK]), pieces decoded from consecutive chain
    // positions. Validated against an independent Python reference
    // before landing (0/500 doc mismatches).
    "q_wordpiece" -> {
      val vs = WpVocab.map(p => s"'$p'").mkString(", ")
      s"""WITH words AS (
         |  SELECT doc_id, generate_subscripts(w, 1) AS wi, unnest(w) AS w
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         |dict AS (SELECT DISTINCT w FROM words WHERE w <> ''),
         |seg AS (
         |  SELECT w,
         |    list_transform(range(1, length(w) + 1), p ->
         |      coalesce(list_max(list_transform(list_filter([$vs], v ->
         |        CASE WHEN p = 1
         |          THEN v NOT LIKE '##%' AND v = substr(w, 1, length(v))
         |          ELSE v LIKE '##%' AND length(v) > 2
         |            AND substr(v, 3) = substr(w, p, length(v) - 2)
         |        END),
         |        v -> CASE WHEN p = 1 THEN length(v) ELSE length(v) - 2 END)),
         |      0)) AS bl,
         |    list_reduce(
         |      list_prepend([CAST(1 AS BIGINT)],
         |        list_transform(range(length(w)), i -> [CAST(-1 AS BIGINT)])),
         |      (acc, x) -> CASE
         |        WHEN acc[len(acc)] < 0 OR acc[len(acc)] > length(w) THEN acc
         |        WHEN bl[acc[len(acc)]] = 0 THEN list_append(acc, CAST(-1 AS BIGINT))
         |        ELSE list_append(acc, acc[len(acc)] + bl[acc[len(acc)]]) END) AS chain,
         |    CASE WHEN length(w) > 100 OR chain[len(chain)] < 0 THEN ['[UNK]']
         |      ELSE list_transform(range(len(chain) - 1), i ->
         |        CASE WHEN chain[i + 1] = 1
         |          THEN substr(w, 1, chain[i + 2] - 1)
         |          ELSE '##' || substr(w, chain[i + 1], chain[i + 2] - chain[i + 1])
         |        END) END AS pieces
         |  FROM dict),
         |flat AS (
         |  SELECT ws.doc_id, ws.wi, generate_subscripts(s.pieces, 1) AS pi,
         |    unnest(s.pieces) AS piece
         |  FROM words ws JOIN seg s ON ws.w = s.w),
         |po AS (
         |  SELECT doc_id, piece,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY wi, pi) - 1 AS pos
         |  FROM flat)
         |SELECT d.doc_id,
         |  CAST(count(o.piece) AS BIGINT) AS n_pieces,
         |  CAST(count(*) FILTER (WHERE o.piece = '[UNK]') AS BIGINT) AS n_unk,
         |  CAST(count(*) FILTER (WHERE o.piece LIKE '##%') AS BIGINT) AS n_cont,
         |  CAST(coalesce(bit_xor(
         |    ${dh("CAST(o.pos AS VARCHAR) || '|' || o.piece")}), 0) AS BIGINT)
         |    AS checksum
         |FROM documents d LEFT JOIN po o ON d.doc_id = o.doc_id
         |GROUP BY d.doc_id""".stripMargin
    },

    // the exact regex/replace chain of TextAnalysis.stripHtml — RE2
    // and Java read these patterns identically (non-greedy + (?s), no
    // lookaround); entity decode order matters (&amp; LAST)
    // the invisible-char strip replayed with the SAME \x{...} class
    // (RE2 == Java regex here); clean_text compared byte-for-byte
    "q_clean_text" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN
        |      substr(text, 1, 1) || chr(8203) || substr(text, 2)
        |        || chr(8207) || chr(173)
        |    ELSE text END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t,
        |    '[\x{200B}-\x{200F}\x{202A}-\x{202E}\x{2060}\x{FEFF}\x{00AD}]'))
        |    AS BIGINT) AS n_invisible,
        |  regexp_replace(t,
        |    '[\x{200B}-\x{200F}\x{202A}-\x{202E}\x{2060}\x{FEFF}\x{00AD}]',
        |    '', 'g') AS clean_text,
        |  CAST(length(regexp_replace(t,
        |    '[\x{200B}-\x{200F}\x{202A}-\x{202E}\x{2060}\x{FEFF}\x{00AD}]',
        |    '', 'g')) AS BIGINT) AS n_chars_clean
        |FROM d""".stripMargin,

    // the per-line boilerplate classifier replayed with DuckDB list
    // lambdas: visible text via the same strip chain as q_strip_html,
    // anchor length from the <a> captures, keep = word axis AND link
    // axis, content = the kept lines' visible text in order
    "q_extract_content" -> {
      def vis(v: String): String =
        s"""trim(regexp_replace(
           |      replace(replace(replace(replace(replace(replace(
           |        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           |          $v,
           |          '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
           |          '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
           |          '(?s)<!--.*?-->', ' ', 'g'),
           |          '<[^>]*>', ' ', 'g'),
           |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
           |        '&nbsp;', ' '), '&amp;', '&'),
           |      '[ \\t\\r\\n\\f]+', ' ', 'g'))""".stripMargin
      val alen =
        """coalesce(list_sum(list_transform(
          |      regexp_extract_all(l, '(?is)<a[^>]*>(.*?)</a>', 1),
          |      x -> length(trim(regexp_replace(
          |        regexp_replace(x, '<[^>]*>', ' ', 'g'),
          |        '[ \\t\\r\\n\\f]+', ' ', 'g'))))), 0)""".stripMargin
      val keep =
        s"""(CASE WHEN length(${vis("l")}) = 0 THEN 0
           |      ELSE len(string_split(${vis("l")}, ' ')) END) >= 5
           |  AND $alen * 1000 <= 330 * length(${vis("l")})""".stripMargin
      s"""WITH src AS (
         |  SELECT doc_id,
         |    '<div class="nav"><a href="/">Home page</a> ' ||
         |    '<a href="/a">About our site</a> ' ||
         |    '<a href="/c">Contact</a></div>' || chr(10) ||
         |    '<p>' || text || '</p>' || chr(10) ||
         |    '<footer><a href="/p">Privacy policy</a> ' ||
         |    '(c) example site</footer>' || chr(10) ||
         |    '<p>Too short.</p>' AS html
         |  FROM documents),
         |k AS (
         |  SELECT doc_id,
         |    len(string_split(html, chr(10))) AS n_lines,
         |    list_filter(string_split(html, chr(10)), l -> $keep) AS kept
         |  FROM src)
         |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
         |  CAST(len(kept) AS BIGINT) AS n_content,
         |  CAST((1000 * (n_lines - len(kept))) // n_lines AS BIGINT)
         |    AS boiler_permille,
         |  array_to_string(list_transform(kept, l -> ${vis("l")}), chr(10))
         |    AS content
         |FROM k""".stripMargin
    },

    "q_strip_html" -> {
      val html =
        "'<html><head><style>p{color:red}</style></head><body><h1>' || " +
          "substr(text, 1, 40) || '</h1><!-- boilerplate note --><p>' || " +
          "text || ' &amp; &lt;b&gt; x&nbsp;&#39;y&quot;</p>" +
          "<script>if (a<b) { alert(''x''); }</script></body></html>'"
      s"""WITH cleaned AS (
         |  SELECT doc_id,
         |    trim(regexp_replace(
         |      replace(replace(replace(replace(replace(replace(
         |        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |          $html,
         |          '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
         |          '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
         |          '(?s)<!--.*?-->', ' ', 'g'),
         |          '<[^>]*>', ' ', 'g'),
         |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
         |        '&nbsp;', ' '), '&amp;', '&'),
         |      '[ \\t\\r\\n\\f]+', ' ', 'g')) AS clean
         |  FROM documents)
         |SELECT doc_id, clean,
         |  CAST(length(clean) AS BIGINT) AS n_chars_clean
         |FROM cleaned""".stripMargin
    },

    // priority = h60('prio|'||id) // weight, keep the 100 smallest —
    // integer floor division on both engines (positive operands)
    "q_priority_sample" ->
      s"""SELECT doc_id,
         |  ${dhSalted("prio")} // greatest(n_chars, 1) AS priority
         |FROM documents
         |ORDER BY priority, doc_id
         |LIMIT 100""".stripMargin
  )
}
