package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Numeric determinism: embeddings are quantized to fixed-point longs
  * (floor(x * 1e7)) before the dot product, so the sum is exact integer
  * arithmetic — identical across engines and across partition orders.
  * The final cosine is one double division/sqrt over exact integers,
  * which IEEE-754 rounds identically everywhere.
  *
  * Scale path: brute force is O(N) per query with a single pass and no
  * shuffle (the query vector broadcasts); the bucketed variant prunes to
  * one coarse cell, which is the IVF pattern — at 100 TB the cell id is a
  * partition column so the scan prunes to one directory.
  */
object Similarity {

  /** Quantize a float-array column to fixed-point longs (1e7 scale).
    *
    * RANGE CONTRACT: the exact-integer dot product accumulates
    * (1e7·x)² terms in a long, so at 64 dims component magnitudes must
    * stay under ~38 RMS (unit-normalized embeddings — the standard for
    * cosine search — are far inside this). Unnormalized model outputs
    * beyond it should be L2-normalized first or the accumulator
    * overflows (ANSI error, not silent wrap).
    */
  def quantize(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * 10000000d).cast("long"))

  /** L2-normalize a float-array column (double math, re-cast to float).
    * Run this ahead of [[quantize]] for unnormalized model outputs — it
    * brings any embedding inside the fixed-point range contract; a zero
    * vector passes through unchanged.
    */
  def l2Normalize(emb: Column): Column = {
    val norm = sqrt(aggregate(emb,
      lit(0d), (acc, x) => acc + x.cast("double") * x.cast("double")))
    when(norm === 0d, emb)
      .otherwise(transform(emb, x => (x.cast("double") / norm).cast("float")))
  }

  /** Exact integer dot product of two quantized vectors — a native
    * codegen'd kernel (see [[graft.functions.VectorKernels]] for why
    * neither HOF lambdas nor an unrolled sum chain survive on the
    * pair-join hot path).
    */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotq(a, b)

  /** Cosine similarity between quantized vectors, as double. */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      sqrt(dotQ(a, a).cast("double") * dotQ(b, b).cast("double"))

  /** Brute-force top-k by cosine against the vector of `queryId`.
    * The 1-row query side broadcasts; one scan, no shuffle until the
    * final top-k (which is a TakeOrdered, not a sort).
    */
  def cosineTopK(embeddings: DataFrame, queryId: Long, k: Int,
                 idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = embeddings.filter(col(idCol) === queryId)
      .select(quantize(col(embCol)).as("q_emb"))
    // carry the label through when present (the bench table has one);
    // an embeddings-only table must not crash on a hardcoded column
    val carried =
      if (embeddings.columns.contains("label")) Seq(col("label")) else Nil
    embeddings.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cosine", cosineQ(quantize(col(embCol)), col("q_emb")))
      .select(col(idCol) +: carried :+ round(col("cosine"), 6).as("cosine_r"): _*)
      .orderBy(col("cosine_r").desc, col(idCol))
      .limit(k)
  }

  /** Batch kNN JOIN — the retrieval-indexing shape: top-k corpus
    * neighbors for EVERY vector of a query SET (not one probe), e.g.
    * building a nearest-neighbor table for a RAG index or labeling a
    * batch by vote. The query set broadcasts (it is the small side by
    * construction); the corpus streams through ONE pass with a
    * |queries|-way fan-out, and the per-query top-k resolves in a
    * window PARTITIONED BY QUERY — parallel across queries, never a
    * global sort. Cost is |queries| × |corpus| comparisons: right for
    * query batches up to the broadcast limit; for larger query sets use
    * [[knnJoinBucketed]], whose candidate set is cell-bounded.
    * A corpus row sharing the query's id is excluded (self-match).
    * Returns (queryIdCol, idCol, cosine_r, rn) with rn ∈ [1, k].
    */
  def knnJoin(queries: DataFrame, corpus: DataFrame, k: Int,
              queryIdCol: String = "q_id", idCol: String = "vec_id",
              embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(queryIdCol),
      quantize(col(embCol)).as("__q_emb"))
    rankTopK(
      corpus.select(col(idCol), quantize(col(embCol)).as("__c_emb"))
        .join(broadcast(q), col(idCol) =!= col(queryIdCol)),
      k, queryIdCol, idCol)
  }

  /** Shared epilogue of the kNN joins: exact fixed-point cosine over
    * the candidate set, top-k per query via a QUERY-PARTITIONED window.
    * One definition so the ranking contract (tie-break on the id,
    * 6-decimal rounding) cannot drift between the exact and bucketed
    * paths — the bits=0-equals-exact property depends on it.
    */
  private def rankTopK(cands: DataFrame, k: Int, queryIdCol: String,
                       idCol: String): DataFrame = {
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cosine_r").desc, col(idCol))
    cands
      .withColumn("cosine_r",
        round(cosineQ(col("__c_emb"), col("__q_emb")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(queryIdCol), col(idCol), col("cosine_r"), col("rn"))
  }

  /** [[knnJoin]]'s scale path: queries and corpus both land in
    * sign-bucket cells and candidates come from an EQUI-join on the
    * cell — the per-query candidate set is cell-bounded, so the window
    * sorts candidates, not the corpus. Recall < 1 (a true neighbor in
    * another cell is unseen — the standard IVF trade); bits = 0
    * degenerates to one cell = exact [[knnJoin]], the property the
    * spec pins.
    */
  def knnJoinBucketed(queries: DataFrame, corpus: DataFrame, k: Int,
                      bits: Int, queryIdCol: String = "q_id",
                      idCol: String = "vec_id",
                      embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(queryIdCol),
      quantize(col(embCol)).as("__q_emb"),
      signBucket(col(embCol), bits).as("__cell"))
    rankTopK(
      corpus.select(col(idCol), quantize(col(embCol)).as("__c_emb"),
        signBucket(col(embCol), bits).as("__cell"))
        .join(broadcast(q), Seq("__cell"))
        .filter(col(idCol) =!= col(queryIdCol)),
      k, queryIdCol, idCol)
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
    * Parallel Corpus Mining with Multilingual Sentence Embeddings"):
    * candidate pair score = cos(x, y) normalized by the mean cosine of
    * BOTH sides' k-NN neighborhoods — the ratio margin that suppresses
    * hubs (vectors close to everything score high on raw cosine but
    * their neighborhood mean is high too, so the ratio stays ~1).
    * Emits each source vector's best target with
    * `margin_e6 = cos_e6 · (k_fwd + k_bwd) · 1e6 DIV (Σfwd + Σbwd)`
    * — all-integer fixed-point over the 6-decimal-rounded cosines, so
    * any engine reproduces it bit for bit — filtered to
    * `margin_e6 ≥ minMarginE6` and positive cosine (a negative-cosine
    * "translation" is garbage, and staying positive keeps trunc- and
    * floor-division engines identical).
    *
    * Scale shape: two kNN joins ([[knnJoinBucketed]]; `bits = 0` is the
    * exact path for graded scales, > 0 cell-bounds the candidates at
    * corpus scale) + two per-id neighborhood aggregates + one equi-join
    * — never an unbounded all-pairs product.
    */
  def bitextMine(src: DataFrame, tgt: DataFrame, k: Int, minMarginE6: Long,
                 bits: Int = 0, srcIdCol: String = "src_id",
                 tgtIdCol: String = "tgt_id",
                 embCol: String = "embedding"): DataFrame = {
    // the pair-cosine set is computed ONCE and ranked in BOTH directions
    // by stacked windows over the same stream — the naive form (one kNN
    // join per direction) evaluates the expensive dot-product join
    // twice for the same pairs. The two aggregate consumers share the
    // window stack's exchanges (ReusedExchange; PlanSpec pins it), so
    // the join runs once per query, not once per consumer. Note ids are
    // NOT cross-excluded: src and tgt are different corpora, so equal
    // ids are distinct documents (a kNN-join reuse would silently drop
    // the src5–tgt5 pair).
    val q = src.select(col(srcIdCol), quantize(col(embCol)).as("__se"),
      signBucket(col(embCol), bits).as("__cell"))
    val c = tgt.select(col(tgtIdCol), quantize(col(embCol)).as("__te"),
      signBucket(col(embCol), bits).as("__cell"))
    // broadcast ONLY on the bits = 0 exact path: there __cell is a
    // constant, so a shuffle join would funnel everything into one
    // partition — and a caller choosing exact all-pairs search has
    // already asserted the source side is small. On the bucketed scale
    // path (bits > 0) a shuffle join on __cell keeps each executor's
    // working set to its own cells instead of shipping the full source
    // corpus to every executor.
    val cands = (if (bits == 0) c.join(broadcast(q), Seq("__cell"))
                 else c.join(q, Seq("__cell")))
      .select(col(srcIdCol), col(tgtIdCol),
        round(round(cosineQ(col("__te"), col("__se")), 6) * 1e6)
          .cast("long").as("cos_e6"))
    val wF = Window.partitionBy(col(srcIdCol))
      .orderBy(col("cos_e6").desc, col(tgtIdCol))
    val wB = Window.partitionBy(col(tgtIdCol))
      .orderBy(col("cos_e6").desc, col(srcIdCol))
    val ranked = cands
      .withColumn("rn_f", row_number().over(wF))
      .withColumn("rn_b", row_number().over(wB))
    // effective neighborhood size rides along: a corpus smaller than k
    // (or a sparse cell at bits > 0) must scale the margin by the
    // neighbors it actually found, not the k it asked for. The best
    // pair folds into the SAME forward aggregate (the rn_f = 1 row is
    // its group's single non-null struct), so the forward side is one
    // consumer, not two.
    val fwdAgg = ranked.filter(col("rn_f") <= k)
      .groupBy(col(srcIdCol))
      .agg(sum(col("cos_e6")).as("__fs"), count(lit(1)).as("__fk"),
        max(when(col("rn_f") === 1,
          struct(col(tgtIdCol), col("cos_e6")))).as("__best"))
      .select(col(srcIdCol), col("__fs"), col("__fk"),
        col(s"__best.$tgtIdCol").as(tgtIdCol),
        col("__best.cos_e6").as("cos_e6"))
    val bwdAgg = ranked.filter(col("rn_b") <= k)
      .groupBy(col(tgtIdCol))
      .agg(sum(col("cos_e6")).as("__bs"), count(lit(1)).as("__bk"))
    fwdAgg
      .join(bwdAgg, tgtIdCol)
      .filter(col("cos_e6") > 0 && col("__fs") + col("__bs") > 0)
      .withColumn("margin_e6", expr(
        "cos_e6 * (__fk + __bk) * 1000000L DIV (__fs + __bs)"))
      .filter(col("margin_e6") >= minMarginE6)
      .select(col(srcIdCol), col(tgtIdCol), col("cos_e6"), col("margin_e6"))
  }

  /** Matryoshka-truncation retention audit (Kusupati et al. 2022,
    * "Matryoshka Representation Learning"): how much of the full-width
    * top-k survives when the embedding is truncated to its first `d`
    * components — the measurement behind choosing a cheaper serving
    * width. One corpus pass scores EVERY width (the per-width cosines
    * explode from one row), one window partitioned by width ranks them,
    * and the truncated lists join the full-width list for the overlap
    * count. Returns (dims, overlap) with overlap ∈ [0, k]; the full
    * width rides along as the =k sanity row.
    *
    * Scale note: an audit runs on a probe sample by design; the window
    * sorts |dims| cells of the scored sample, never the raw corpus.
    */
  def matryoshkaRetention(embeddings: DataFrame, queryId: Long, k: Int,
                          dims: Seq[Int], fullDims: Int = 64,
                          idCol: String = "vec_id",
                          embCol: String = "embedding"): DataFrame = {
    require(dims.nonEmpty && dims.forall(d => d >= 1 && d <= fullDims),
      s"bad widths: $dims (full $fullDims)")
    val widths = (dims :+ fullDims).distinct
    val q = embeddings.filter(col(idCol) === queryId)
      .select(quantize(col(embCol)).as("__q"))
    def cosAt(d: Int) = {
      val a = slice(col("__e"), 1, d)
      val b = slice(col("__q"), 1, d)
      round(dotQ(a, b).cast("double") /
        sqrt(dotQ(a, a).cast("double") * dotQ(b, b).cast("double")), 6)
    }
    val scored = embeddings.filter(col(idCol) =!= queryId)
      .select(col(idCol), quantize(col(embCol)).as("__e"))
      .crossJoin(broadcast(q))
      .select(col(idCol), explode(array(widths.map(d =>
        struct(lit(d).cast("long").as("dims"), cosAt(d).as("__cos"))): _*))
        .as("__dc"))
      .select(col(idCol), col("__dc.dims").as("dims"),
        col("__dc.__cos").as("__cos"))
    val w = Window.partitionBy(col("dims"))
      .orderBy(col("__cos").desc, col(idCol))
    val tops = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("dims"), col(idCol))
    val full = tops.filter(col("dims") === fullDims)
      .select(col(idCol).as("__full_id"))
    val counts = tops
      .join(broadcast(full), col(idCol) === col("__full_id"), "left_semi")
      .groupBy(col("dims")).agg(count(lit(1)).as("__ov"))
    // a width whose truncated top-k shares NOTHING with the full-width
    // list emits no group above — left-join from the width list and
    // coalesce to 0 so the documented `overlap ∈ [0, k]` contract holds
    // for every requested width (a missing row would read as an absent
    // width, not a zero-retention one)
    embeddings.sparkSession
      .createDataFrame(widths.map(d => Tuple1(d.toLong))).toDF("dims")
      .join(counts, Seq("dims"), "left")
      .select(col("dims"), coalesce(col("__ov"), lit(0L)).as("overlap"))
  }

  /** [[bitextMine]] with the blocking factor derived from the larger
    * side's size (one count job per side) — the form to use at scale:
    * within-cell pair cost is quadratic in cell cardinality, so a fixed
    * `bits` (or the bits=0 exact path) grows the pair set quadratically
    * with the corpus while [[blockBitsFor]] holds cells ~constant.
    */
  def bitextMineAuto(src: DataFrame, tgt: DataFrame, k: Int,
                     minMarginE6: Long, targetCellSize: Long = 1024L,
                     srcIdCol: String = "src_id",
                     tgtIdCol: String = "tgt_id",
                     embCol: String = "embedding"): DataFrame = {
    val bits = blockBitsFor(math.max(src.count(), tgt.count()),
      targetCellSize)
    bitextMine(src, tgt, k, minMarginE6, bits, srcIdCol, tgtIdCol, embCol)
  }

  /** Coarse cell id for IVF-style bucketing: sign bits of the first
    * `bits` dimensions (a deterministic stand-in for trained centroids —
    * the plumbing, partition pruning and join shape are identical).
    */
  def signBucket(emb: Column, bits: Int): Column =
    if (bits == 0) lit(0L) // one cell — the exact-search degenerate
    else (0 until bits)
      .map(i => when(element_at(emb, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** IVF-style ANN: restrict the scan to the query's coarse cell, then
    * exact cosine within the cell. At scale the cell id is a partition
    * column → the scan reads 1/2^bits of the data.
    */
  def annBucketed(embeddings: DataFrame, queryId: Long, k: Int, bits: Int,
                  idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val withCell = embeddings.withColumn("cell", signBucket(col(embCol), bits))
    val q = withCell.filter(col(idCol) === queryId)
      .select(quantize(col(embCol)).as("q_emb"), col("cell").as("q_cell"))
    withCell.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .filter(col("cell") === col("q_cell"))
      .withColumn("cosine", cosineQ(quantize(col(embCol)), col("q_emb")))
      .select(col(idCol), col("cell"), round(col("cosine"), 6).as("cosine_r"))
      .orderBy(col("cosine_r").desc, col(idCol))
      .limit(k)
  }

  /** Sign-bit binary signature of an embedding: bit i of word w is set
    * iff component `32w + i` is positive — `dims` float dims pack into
    * ceil(dims/32) longs (64 dims: 256 B of floats → 16 B; 768 dims:
    * 3 072 B → 96 B — a 32× cut, 64× against double-width storage of
    * the packed words). The packing is a
    * statically unrolled sum of `when` terms, fully codegen'd — no
    * higher-order lambda on the hot path. 32 bits per word (not 64)
    * keeps every word positive, so the DuckDB oracle's `list_sum`
    * (which widens to HUGEINT) compares exactly.
    */
  def packSignBits(emb: Column, dims: Int, wordBits: Int = 32): Column = {
    require(dims > 0 && wordBits > 0 && wordBits <= 32, "bad pack shape")
    val nWords = (dims + wordBits - 1) / wordBits
    array((0 until nWords).map { w =>
      (0 until math.min(wordBits, dims - w * wordBits)).map { i =>
        when(element_at(emb, w * wordBits + i + 1) > 0f,
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }

  /** Hamming distance between two packed signatures of `nWords` words:
    * sum of popcounts of per-word XORs — integer-exact in any engine.
    */
  def hammingDist(a: Column, b: Column, nWords: Int): Column =
    (0 until nWords).map { w =>
      call_function("bit_count",
        element_at(a, w + 1).bitwiseXOR(element_at(b, w + 1)))
    }.map(_.cast("long")).reduce(_ + _)

  /** Binary-signature ANN: top-k by Hamming distance over sign-packed
    * embeddings — the binary-quantization serving path (Indyk–Motwani
    * SimHash family: sign-random-projection Hamming distance estimates
    * angular distance; with identity "projections" the signature doubles
    * as the [[signBucket]] cell id, so the same bits drive both pruning
    * and ranking).
    *
    * Scale shape: the corpus is scanned ONCE reading only the 16-byte
    * signature column (at rest, store signatures as their own parquet
    * column — column pruning means the 100 TB of float vectors never
    * leaves disk); distance is a handful of XOR+POPCNT instructions per
    * row inside whole-stage codegen, and the top-k is a TakeOrdered.
    * The standard production pattern is Hamming shortlist → exact
    * re-rank of survivors, which composes as
    * `hammingTopK(..., k = 10 * k)` joined back through [[knnJoin]].
    */
  def hammingTopK(embeddings: DataFrame, queryId: Long, k: Int, dims: Int,
                  idCol: String = "vec_id",
                  embCol: String = "embedding"): DataFrame =
    hammingTopKPacked(
      embeddings.select(col(idCol), packSignBits(col(embCol), dims).as("sig")),
      queryId, k, nWords = (dims + 31) / 32, idCol = idCol)

  /** [[hammingTopK]] over a table that already CARRIES the packed
    * signature column — the at-rest serving shape: the signature is its
    * own parquet column, so the scan's column pruning never touches the
    * float vectors (PlanSpec pins ReadSchema = (id, sig) only).
    */
  def hammingTopKPacked(sigs: DataFrame, queryId: Long, k: Int, nWords: Int,
                        idCol: String = "vec_id",
                        sigCol: String = "sig"): DataFrame = {
    val base = sigs.select(col(idCol), col(sigCol).as("__sig"))
    val q = base.filter(col(idCol) === queryId)
      .select(col("__sig").as("__q_sig"))
    base.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        hammingDist(col("__sig"), col("__q_sig"), nWords).as("hamming"))
      .orderBy(col("hamming"), col(idCol))
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack–Clarke–Buettcher 2009) of ranked
    * retrieval lists — the standard hybrid-search combiner (BM25 ∪
    * vector ANN in one ranking). Each list contributes
    * `1e6 DIV (kRrf + rank)` to its documents (integer fixed point —
    * no doubles, engine-deterministic); documents absent from a list
    * contribute nothing there. Inputs are (id, rank) frames with rank
    * 1-based; ranks beyond a list's cut simply don't appear.
    *
    * Scale shape: each input list is already top-n (k rows, not corpus
    * rows), so the fusion is a union + groupBy over O(lists × n) rows —
    * driver-free, broadcast-free, and independent of corpus size. The
    * expensive parts are the upstream retrievals, which keep their own
    * scale paths.
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int, kRrf: Long = 60L,
              idCol: String = "doc_id"): DataFrame = {
    require(lists.nonEmpty && k > 0 && kRrf >= 0, "bad rrf inputs")
    val contribs = lists.map(_.select(col(idCol),
      expr(s"${1000000L} DIV ($kRrf + rank)").as("__c")))
    contribs.reduce(_ unionAll _)
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_lists"),
        sum(col("__c")).cast("long").as("rrf_e6"))
      .orderBy(col("rrf_e6").desc, col(idCol))
      .limit(k)
  }

  /** Trained IVF — the production ANN shape ([[annBucketed]]'s sign-bit
    * cells are the deterministic stand-in; this is the real thing):
    * k-means coarse centroids (MLlib, seed-pinned), every vector
    * assigned to its nearest centroid's cell, search probes the
    * `nProbe` cells nearest the query and runs exact cosine inside
    * them.
    *
    * Scale: train on a sample (`trainFraction` — centroid quality needs
    * thousands of points per cell, not the corpus), assignment is one
    * partition-local pass, and at rest `cell` is a partition column so
    * a search reads nProbe/nCells of the data. Probing more cells
    * trades scan for recall; nProbe = nCells degenerates to exact
    * search (the property the spec pins).
    */
  def annIvfTrained(embeddings: DataFrame, queryId: Long, k: Int,
                    nCells: Int, nProbe: Int, seed: Long = 42L,
                    trainFraction: Double = 1.0,
                    idCol: String = "vec_id",
                    embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = embeddings.withColumn("__features",
      array_to_vector(col(embCol).cast("array<double>")))
    val trainDf =
      if (trainFraction < 1.0) feats.sample(trainFraction, seed) else feats
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("__features").fit(trainDf)
    val assigned = model.transform(feats)
      .withColumnRenamed("prediction", "cell").drop("__features")

    // the 1-row query vector on the driver picks the probe cells
    // (same bounded-collect class as the broadcast query side)
    val qRow = embeddings.filter(col(idCol) === queryId)
      .select(col(embCol).cast("array<double>")).head()
    val qVec = qRow.getSeq[Double](0).toArray
    val probed = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        var d = 0d
        var j = 0
        while (j < qVec.length && j < c.size) {
          val diff = c(j) - qVec(j); d += diff * diff; j += 1
        }
        (d, i)
      }
      .sortBy(_._1).take(math.max(1, nProbe)).map(_._2)

    val q = embeddings.filter(col(idCol) === queryId)
      .select(quantize(col(embCol)).as("q_emb"))
    assigned
      .filter(col(idCol) =!= queryId && col("cell").isin(probed.toSeq: _*))
      .crossJoin(broadcast(q))
      .withColumn("cosine", cosineQ(quantize(col(embCol)), col("q_emb")))
      .select(col(idCol), col("cell"), round(col("cosine"), 6).as("cosine_r"))
      .orderBy(col("cosine_r").desc, col(idCol))
      .limit(k)
  }

  /** Two-stage IVF-PQ search — the production serving pattern: the
    * m-byte-code ADC scan shortlists `shortlist` candidates, then ONLY
    * those are re-ranked by exact cosine against their full vectors.
    * The expensive exact pass is bounded to a constant-size set
    * regardless of corpus size, and the shortlist rides back into the
    * corpus as a broadcast semi-join on the id (never a shuffle).
    * Recall improves monotonically with `shortlist` at fixed scan cost
    * shape. Returns (idCol, cosine_r), the exact-cosine top-k of the
    * shortlist.
    */
  def annIvfPqRerank(embeddings: DataFrame, queryId: Long, k: Int,
                     shortlist: Int = 40, nCells: Int = 4, nProbe: Int = 2,
                     m: Int = 4, ksub: Int = 8, iters: Int = 2,
                     dims: Int = 64, idCol: String = "vec_id",
                     embCol: String = "embedding"): DataFrame = {
    val cand = annIvfPq(embeddings, queryId, shortlist, nCells, nProbe,
      m, ksub, iters, dims, idCol, embCol).select(col(idCol))
    val q = embeddings.filter(col(idCol) === queryId)
      .select(quantize(col(embCol)).as("q_emb"))
    embeddings
      .join(broadcast(cand), Seq(idCol), "left_semi")
      .crossJoin(broadcast(q))
      .withColumn("cosine", cosineQ(quantize(col(embCol)), col("q_emb")))
      .select(col(idCol), round(col("cosine"), 6).as("cosine_r"))
      .orderBy(col("cosine_r").desc, col(idCol))
      .limit(k)
  }

  /** Blocking width sized to the corpus: the smallest `bits` such that the
    * expected cell cardinality n / 2^bits stays at or under
    * `targetCellSize`. Within-cell pair cost is QUADRATIC (~c²/2 per
    * cell), so holding c constant as the corpus grows keeps total pair
    * work linear in n — a fixed `bits` would grow it quadratically.
    */
  def blockBitsFor(n: Long, targetCellSize: Long = 1024L, maxBits: Int = 24): Int = {
    if (n <= targetCellSize) 0
    else {
      val cells = (n + targetCellSize - 1) / targetCellSize
      math.min(maxBits, 64 - java.lang.Long.numberOfLeadingZeros(cells - 1))
    }
  }

  /** [[cosineNearDupPairs]] with the blocking factor derived from the
    * corpus size (one count job) instead of caller-pinned — the form to
    * use at scale, where a fixed cell count is the quadratic trap.
    */
  def cosineNearDupPairsAuto(embeddings: DataFrame, minCosine: Double,
                             targetCellSize: Long = 1024L, dims: Int = 64,
                             idCol: String = "vec_id",
                             embCol: String = "embedding"): DataFrame = {
    val bits = math.min(dims, blockBitsFor(embeddings.count(), targetCellSize))
    cosineNearDupPairs(embeddings, minCosine, bits, dims, idCol, embCol)
  }

  /** All-pairs near-duplicate detection by embedding cosine >= minCosine,
    * blocked by coarse cell (equi-join, not cartesian).
    *
    * Scale note: within-cell cost is quadratic in cell cardinality, so
    * `bits` MUST grow with the corpus (bits ≈ log2(n / targetCellSize));
    * use [[cosineNearDupPairsAuto]] unless pinning cells for a known n.
    */
  def cosineNearDupPairs(embeddings: DataFrame, minCosine: Double, bits: Int,
                         dims: Int = 64,
                         idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val withCell = embeddings
      .select(col(idCol), quantize(col(embCol)).as("qe"),
        signBucket(col(embCol), bits).as("cell"))
      .withColumn("norm", dotQ(col("qe"), col("qe")).cast("double"))
    cellPairs(withCell, idCol)
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cell"),
        round(col("cosine"), 6).as("cosine_r"))
  }

  /** Within-cell candidate pairs with exact-integer cosine. Expects
    * (idCol, qe, cell, norm); emits (id_a, id_b, cell, cosine).
    *
    * Two pair-count optimizations: norms are computed ONCE per vector,
    * and the per-pair dot product is the [[dotQ]] kernel — a tight
    * JIT-friendly loop. (Earlier forms — HOF lambdas, then an unrolled
    * `dims`-term multiply-add chain — both lose by ~100× on the pair
    * hot path: lambdas interpret per element, and the unrolled chain
    * pushes the generated method past HotSpot's JIT size limit. See
    * [[graft.functions.VectorKernels]].)
    */
  private def cellPairs(withCell: DataFrame, idCol: String): DataFrame = {
    val a = withCell.select(col(idCol).as("id_a"), col("norm").as("norm_a"),
      col("cell"), col("qe").as("qe_a"))
    val b = withCell.select(col(idCol).as("id_b"), col("norm").as("norm_b"),
      col("cell"), col("qe").as("qe_b"))
    a.join(b, "cell")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", dotQ(col("qe_a"), col("qe_b")).cast("double") /
        sqrt(col("norm_a") * col("norm_b")))
  }

  /** Relational Lloyd k-means over the quantized embeddings — every step
    * exact integer (or IEEE-identical double) arithmetic, so the full
    * trajectory is ENGINE-DETERMINISTIC and a SQL oracle can replay it
    * bit-for-bit (contrast the seed-pinned MLlib trainer in
    * [[annIvfTrained]], whose centroids only a degenerate full-probe
    * query can check). Seeds are the `k` smallest-id vectors (cid = rank
    * in id order); each round assigns every vector to the centroid
    * minimizing the exact squared fixed-point distance (ties break to
    * the smaller cid — the kernel scans cid-sorted centroids with a
    * strict comparison, the same winner as the oracle's min(dist*k+cid)
    * key but with no k·dist product to overflow at large k) and
    * recomputes centroids as
    * floor(sum/count) per dimension — floor over one exact-integer
    * double division, identical in any IEEE engine. A cluster that
    * loses all members vanishes (no re-seeding), deterministically in
    * both engines.
    *
    * Returns the assignment AFTER `iters` update rounds: (idCol, cid,
    * dist) with dist the exact squared distance to the final centroid.
    *
    * Scale: the assignment is a SHUFFLE-FREE narrow map — centroids ride
    * into the executors as ONE reference object consumed by the native
    * [[graft.functions.NearestCentroid]] argmin kernel (k·dims
    * multiply-adds per row in a tight JIT'd loop — not k·dims literal
    * plan nodes, which bloat plan compile and overflow the generated
    * method), and each update is one map-side-
    * combining aggregate whose result is k rows on the driver (the same
    * bounded collect MLlib's trainer does per iteration). Nothing in the
    * loop is proportional to N except the per-row map work, so the shape
    * survives any corpus size; `iters` and `k` bound the job count.
    * Range contract: same as [[quantize]] — squared diffs accumulate
    * (2·1e7·x)²·dims per DISTANCE (the struct argmin carries no k
    * factor — the retired dist·k+cid key encoding did, and overflowed
    * past k ≈ 23,000), so unit-normalized embeddings are safe at 64
    * dims for any k.
    */
  def kmeansAssign(embeddings: DataFrame, k: Int, iters: Int, dims: Int = 64,
                   idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    kmeansAssignQ(embeddings, k, iters, dims, idCol, embCol)
      .select(col(idCol), col("cid"), col("dist"))

  /** [[kmeansAssign]] carrying the quantized vector (`qe`) through —
    * shared with [[semDedup]], which needs both the cell and the vector
    * for the within-cell pair join.
    */
  private[graft] def kmeansAssignQ(embeddings: DataFrame, k: Int, iters: Int,
                                 dims: Int, idCol: String, embCol: String): DataFrame = {
    require(k > 0 && iters >= 0 && dims > 0,
      s"bad kmeans params: k=$k iters=$iters dims=$dims")
    val v = quantizedOrFail(embeddings, idCol, embCol)
    val cents = lloydCentroids(v, k, iters, dims, idCol)
    v.withColumn("__nc",
        graft.functions.VectorExpressions.nearestCentroid(col("qe"), cents))
      .withColumn("cid", col("__nc.cid"))
      .withColumn("dist", col("__nc.dist"))
      .drop("__nc")
  }

  /** (idCol, qe) projection with the loud-NULL policy: a NULL embedding
    * must fail at the assignment input (the kernel would otherwise emit
    * a NULL cid that either NPEs the centroid update opaquely or rolls
    * into a garbage NULL cluster); null ELEMENTS fail inside the kernel
    * with the same policy.
    */
  private def quantizedOrFail(embeddings: DataFrame, idCol: String,
                              embCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val qeNotNull = ColumnBridge.column(AssertNotNull(
      ColumnBridge.expression(quantize(col(embCol))),
      Seq("nearest_centroid: null embedding — clean or filter the corpus first")))
    embeddings.select(col(idCol), qeNotNull.as("qe"))
  }

  /** The deterministic Lloyd loop over `v` = (idCol, qe): seed with the
    * k smallest-id vectors, `iters` rounds of assign + floor-mean
    * update, return the FINAL centroids sorted by cid (sparse once
    * clusters vanish). Each round is one map-side-combining aggregate
    * collecting k rows — nothing driver-side is proportional to N.
    */
  private def lloydCentroids(v: DataFrame, k: Int, iters: Int, dims: Int,
                             idCol: String): Seq[(Long, IndexedSeq[Long])] = {
    // seeds: the k smallest-id vectors — a TakeOrdered collecting k rows
    var cents: Seq[(Long, IndexedSeq[Long])] =
      v.orderBy(col(idCol)).limit(k).collect().toSeq.zipWithIndex.map {
        case (r, i) => i.toLong -> r.getSeq[Long](1).toIndexedSeq
      }
    for (_ <- 0 until iters) {
      // one broadcast per iteration, destroyed once the k-row aggregate
      // is on the driver — a long Lloyd run leaks no broadcast blocks
      val bc = graft.functions.VectorExpressions.broadcastCentroids(cents)
      val sums = v.withColumn("__nc",
          graft.functions.VectorExpressions.nearestCentroidBc(col("qe"), bc))
        .groupBy(col("__nc.cid").as("cid"))
        .agg(count(lit(1)).as("cnt"),
          (0 until dims).map(i => sum(element_at(col("qe"), i + 1)).as(s"s$i")): _*)
        .collect()
      bc.destroy()
      cents = sums.map { r =>
        val cnt = r.getLong(1)
        r.getLong(0) -> (0 until dims)
          .map(i => math.floor(r.getLong(i + 2).toDouble / cnt).toLong)
      }.sortBy(_._1).toSeq
    }
    cents
  }

  /** Train SEVERAL Lloyd codebooks in lockstep — one tagged-union job
    * per iteration instead of one full loop per book. The m
    * per-subspace PQ codebooks all scan the SAME corpus, and at fixed
    * data size the cost of m independent loops is JOB COUNT
    * (m·(1+iters) sequential jobs, each re-deriving its input), not
    * data volume: round 13 measured q_ivfpq_adc at ~2.5 s with ~17
    * driver-coordinated jobs, dominated by exactly this loop. Each
    * book's trajectory stays BIT-IDENTICAL to [[lloydCentroids]] over
    * its own slice — same smallest-id seeds (ids are shared across
    * books, so one per-book window yields all seed rows in one job),
    * same integer floor means — so every PQ oracle replay is
    * unaffected. The tagged input is cached for the (eager) training
    * loop and released before return.
    */
  private def lloydCentroidsMulti(subs: IndexedSeq[DataFrame], k: Int,
                                  iters: Int, dims: Int, idCol: String)
      : IndexedSeq[Seq[(Long, IndexedSeq[Long])]] = {
    val tagged = subs.zipWithIndex.map { case (df, i) =>
      df.select(lit(i).as("__bk"), col(idCol).as("__id"), col("qe"))
    }.reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__bk")).orderBy(col("__id"))
      var cents: IndexedSeq[Seq[(Long, IndexedSeq[Long])]] = {
        val seedRows = tagged.withColumn("__r", row_number().over(w))
          .filter(col("__r") <= k)
          .select(col("__bk"), col("__id"), col("qe")).collect()
        subs.indices.map { b =>
          seedRows.filter(_.getInt(0) == b).sortBy(_.getLong(1))
            .zipWithIndex.map { case (r, i) =>
              i.toLong -> r.getSeq[Long](2).toIndexedSeq
            }.toSeq
        }
      }
      for (_ <- 0 until iters) {
        // one broadcast per book per iteration, destroyed once the
        // (m·k)-row aggregate is on the driver — no leaked blocks
        val bcs = cents.map(
          graft.functions.VectorExpressions.broadcastCentroids)
        val nc = bcs.zipWithIndex.tail.foldLeft(
          graft.functions.VectorExpressions
            .nearestCentroidBc(col("qe"), bcs.head)) {
          case (acc, (bc, i)) =>
            when(col("__bk") === i, graft.functions.VectorExpressions
              .nearestCentroidBc(col("qe"), bc)).otherwise(acc)
        }
        val sums = tagged.withColumn("__nc", nc)
          .groupBy(col("__bk"), col("__nc.cid").as("cid"))
          .agg(count(lit(1)).as("cnt"),
            (0 until dims).map(i =>
              sum(element_at(col("qe"), i + 1)).as(s"s$i")): _*)
          .collect()
        bcs.foreach(_.destroy())
        cents = subs.indices.map { b =>
          sums.filter(_.getInt(0) == b).map { r =>
            val cnt = r.getLong(2)
            r.getLong(1) -> (0 until dims)
              .map(i => math.floor(r.getLong(i + 3).toDouble / cnt).toLong)
          }.sortBy(_._1).toSeq
        }
      }
      cents
    } finally { tagged.unpersist(blocking = false); () }
  }

  /** Product-quantization codebooks (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): the embedding space is
    * split into `m` equal subspaces of dims/m dimensions and an
    * independent [[lloydCentroids]] codebook of `ksub` centroids is
    * trained per subspace — so a vector compresses to m small codes
    * (m·log2(ksub) bits) instead of dims floats. At production shape
    * (m=8, ksub=256 over 256-dim floats) that is 8 bytes per vector vs
    * 1 KiB raw: the index for a 100 TB corpus fits in cluster RAM,
    * which is the entire point of PQ at scale.
    *
    * Training cost: m independent Lloyd loops, each a corpus scan per
    * iteration. FAISS trains codebooks on a corpus SAMPLE for exactly
    * this reason — at scale pass a sampled DataFrame here; the encode
    * step below applies the books to the full corpus in one pass.
    * Deterministic end-to-end (integer trajectory, see
    * [[kmeansAssign]]), so the whole PQ pipeline is oracle-checkable.
    */
  def pqCodebooks(embeddings: DataFrame, m: Int, ksub: Int, iters: Int,
                  dims: Int = 64, idCol: String = "vec_id",
                  embCol: String = "embedding")
      : IndexedSeq[Seq[(Long, IndexedSeq[Long])]] = {
    require(m > 0 && dims % m == 0,
      s"dims=$dims must split into m=$m equal subspaces")
    require(ksub > 0 && iters >= 0, s"bad pq params: ksub=$ksub iters=$iters")
    val sub = dims / m
    val v = quantizedOrFail(embeddings, idCol, embCol)
    lloydCentroidsMulti((0 until m).map { i =>
      v.select(col(idCol), slice(col("qe"), i * sub + 1, sub).as("qe"))
    }.toIndexedSeq, ksub, iters, sub, idCol)
  }

  /** Encode each vector as its m per-subspace nearest-codebook codes —
    * a SHUFFLE-FREE narrow map (the codebooks ride into the executors
    * inside the m argmin kernels; nothing joins, nothing aggregates).
    * Output: (idCol, code array<long> of length m).
    */
  def pqEncode(embeddings: DataFrame,
               books: IndexedSeq[Seq[(Long, IndexedSeq[Long])]],
               dims: Int = 64, idCol: String = "vec_id",
               embCol: String = "embedding"): DataFrame = {
    val m = books.length
    require(m > 0 && dims % m == 0,
      s"dims=$dims must split into m=$m equal subspaces")
    val sub = dims / m
    quantizedOrFail(embeddings, idCol, embCol)
      .select(col(idCol), codesColumn(col("qe"), books, sub).as("code"))
  }

  /** Per-subspace ADC lookup tables for one query-space vector `q`
    * (raw for PQ-flat, the cell residual for IVF-PQ): table(i)(cid) =
    * exact squared distance from q's i-th subvector to that codeword.
    * Vanished clusters never appear as codes; their cells stay unread.
    */
  private def adcTables(books: IndexedSeq[Seq[(Long, IndexedSeq[Long])]],
                        q: Seq[Long], sub: Int): IndexedSeq[Array[Long]] =
    books.indices.map { i =>
      val t = Array.fill((books(i).map(_._1).max + 1).toInt)(0L)
      books(i).foreach { case (cid, cen) =>
        var d = 0L
        var j = 0
        while (j < sub) {
          val diff = q(i * sub + j) - cen(j)
          d = Math.addExact(d, Math.multiplyExact(diff, diff))
          j += 1
        }
        t(cid.toInt) = d
      }
      t
    }.toIndexedSeq

  /** Sum of the m table lookups over a `code` array column — the
    * per-candidate ADC distance.
    */
  private def adcColumn(tables: IndexedSeq[Array[Long]]): Column =
    tables.indices.map { i =>
      element_at(lit(tables(i)),
        (element_at(col("code"), i + 1) + 1).cast("int"))
    }.reduce(_ + _)

  /** The m per-subspace nearest-codeword ids of `vec` as one array
    * column (the PQ code) — shared by raw-space and residual-space
    * encodes so the tie-break/table-sizing rules cannot drift.
    */
  private def codesColumn(vec: Column,
                          books: IndexedSeq[Seq[(Long, IndexedSeq[Long])]],
                          sub: Int): Column =
    array(books.indices.map { i =>
      graft.functions.VectorExpressions
        .nearestCentroid(slice(vec, i * sub + 1, sub), books(i))
        .getField("cid")
    }: _*)

  /** PQ top-k by asymmetric distance (ADC): the query stays exact while
    * every corpus vector is approximated by its codebook
    * reconstruction, so per-candidate distance is m table lookups —
    * table(i)(code_i) = squared distance from the query's i-th
    * subvector to that code's centroid, computed ONCE per query
    * driver-side (m·ksub cells) and shipped as literal arrays.
    *
    * Plan shape: encode (narrow map) → per-row sum of m element_at
    * lookups → TakeOrdered. No join, no shuffle beyond the final top-k
    * — the scan reads m codes per vector, not dims floats, which is
    * the 10-100× I/O cut PQ exists for. Compose with a coarse
    * partitioner (the IVF cell as a partition column) to prune the
    * scan itself at 100 TB.
    *
    * Returns (idCol, adc) — the k smallest exact-integer ADC distances,
    * ties to the smaller id, query row excluded.
    */
  def pqSearchAdc(embeddings: DataFrame,
                  books: IndexedSeq[Seq[(Long, IndexedSeq[Long])]],
                  queryId: Long, k: Int, dims: Int = 64,
                  idCol: String = "vec_id",
                  embCol: String = "embedding"): DataFrame = {
    val m = books.length
    require(m > 0 && dims % m == 0,
      s"dims=$dims must split into m=$m equal subspaces")
    val sub = dims / m
    val q = quantizedOrFail(embeddings, idCol, embCol)
      .filter(col(idCol) === queryId)
      .select(col("qe")).head().getSeq[Long](0)
    require(q.length == dims, s"query vector has ${q.length} dims, want $dims")
    val adc = adcColumn(adcTables(books, q, sub))
    pqEncode(embeddings, books, dims, idCol, embCol)
      .filter(col(idCol) =!= queryId)
      .withColumn("adc", adc)
      .select(col(idCol), col("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(k)
  }

  /** Train-and-search convenience: PQ codebooks on the corpus itself,
    * then ADC top-k — the one-call form the q_pq_adc oracle replays.
    */
  def pqTopK(embeddings: DataFrame, queryId: Long, k: Int, m: Int = 4,
             ksub: Int = 8, iters: Int = 2, dims: Int = 64,
             idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    pqSearchAdc(embeddings,
      pqCodebooks(embeddings, m, ksub, iters, dims, idCol, embCol),
      queryId, k, dims, idCol, embCol)

  /** IVF-PQ — the FAISS production index, composed relationally: a
    * coarse deterministic-Lloyd quantizer splits the corpus into
    * `nCells` lists, each vector's RESIDUAL (vector − its cell
    * centroid) is product-quantized (residuals cluster far tighter
    * than raw vectors, so the same codebook budget buys much lower
    * distortion), and a query probes only the `nProbe` nearest cells
    * with a per-cell ADC table computed from ITS residual against the
    * query.
    *
    * Scale shape: at 100 TB the cell id is a partition column — the
    * probe prunes the scan to nProbe directories — and each scanned
    * row costs m table lookups over an m-byte code. Everything here is
    * exact integer arithmetic end-to-end, so results are
    * engine-deterministic like the rest of the family.
    *
    * Returns (idCol, cell, adc): the k smallest ADC distances over the
    * probed cells, ties to the smaller id, query excluded.
    */
  def annIvfPq(embeddings: DataFrame, queryId: Long, k: Int,
               nCells: Int = 4, nProbe: Int = 2, m: Int = 4, ksub: Int = 8,
               iters: Int = 2, dims: Int = 64, idCol: String = "vec_id",
               embCol: String = "embedding"): DataFrame = {
    // fail BEFORE training: a bad nProbe rejected only inside the search
    // would burn the whole Lloyd loop first
    require(nProbe > 0, s"bad ivf params: nProbe=$nProbe")
    val model = ivfPqTrain(embeddings, nCells, m, ksub, iters, dims,
      idCol, embCol)
    val q = quantizedOrFail(embeddings, idCol, embCol)
      .filter(col(idCol) === queryId).select(col("qe"))
      .head().getSeq[Long](0)
    ivfPqSearchEncoded(ivfPqEncode(embeddings, model, idCol, embCol),
      model, q, k, nProbe, excludeId = queryId, idCol = idCol)
  }

  /** A trained IVF-PQ model: the coarse quantizer's centroids plus the
    * m residual codebooks — everything a serving path needs to encode
    * new vectors or search, small enough to live on the driver
    * (nCells + m·ksub rows of `dims`/`sub` longs).
    */
  final case class IvfPqModel(coarse: Seq[(Long, IndexedSeq[Long])],
                              books: IndexedSeq[Seq[(Long, IndexedSeq[Long])]],
                              dims: Int) {
    require(books.nonEmpty && dims % books.length == 0,
      s"dims=$dims must split into m=${books.length} equal subspaces")
    def m: Int = books.length
    def sub: Int = dims / books.length
  }

  /** Train the IVF-PQ structures (the front half of [[annIvfPq]],
    * trajectory-identical): deterministic-Lloyd coarse cells, then the
    * m residual codebooks in lockstep.
    */
  def ivfPqTrain(embeddings: DataFrame, nCells: Int, m: Int, ksub: Int,
                 iters: Int, dims: Int = 64, idCol: String = "vec_id",
                 embCol: String = "embedding"): IvfPqModel = {
    require(m > 0 && dims % m == 0,
      s"dims=$dims must split into m=$m equal subspaces")
    require(nCells > 0, s"bad ivf params: nCells=$nCells")
    val sub = dims / m
    val v = quantizedOrFail(embeddings, idCol, embCol)
    val coarse = lloydCentroids(v, nCells, iters, dims, idCol)
    val assigned = ivfPqAssigned(v, coarse)
    // PQ books trained on the residual space — all m in lockstep (the
    // tagged cache also means the coarse-assign + residual chain runs
    // once, not once per book job)
    val books = lloydCentroidsMulti((0 until m).map { i =>
      assigned.select(col(idCol), slice(col("resid"), i * sub + 1, sub)
        .as("qe"))
    }.toIndexedSeq, ksub, iters, sub, idCol)
    IvfPqModel(coarse, books, dims)
  }

  /** (idCol, qe, cell, resid): coarse assignment plus the residual —
    * residual = qe − centroid(cell), branch-selected per row; this is
    * the train/encode pass (once per corpus), so the interpreted
    * zip_with is off the per-candidate hot path by construction.
    */
  private def ivfPqAssigned(v: DataFrame,
                            coarse: Seq[(Long, IndexedSeq[Long])]): DataFrame = {
    def residualOf(qe: Column, cid: Column): Column =
      coarse.tail.foldLeft(
        zip_with(qe, lit(coarse.head._2.toArray), (a, b) => a - b)) {
        case (acc, (c, cen)) =>
          when(cid === c, zip_with(qe, lit(cen.toArray), (a, b) => a - b))
            .otherwise(acc)
      }
    v.withColumn("cell",
        graft.functions.VectorExpressions.nearestCentroid(col("qe"), coarse)
          .getField("cid"))
      .withColumn("resid", residualOf(col("qe"), col("cell")))
  }

  /** Encode each vector as (idCol, cell, code) under a FROZEN model —
    * a shuffle-free narrow map (centroids and books ride inside the
    * argmin kernels), the pass both the at-rest index build and its
    * incremental maintenance run.
    */
  def ivfPqEncode(embeddings: DataFrame, model: IvfPqModel,
                  idCol: String = "vec_id",
                  embCol: String = "embedding"): DataFrame = {
    val assigned = ivfPqAssigned(
      quantizedOrFail(embeddings, idCol, embCol), model.coarse)
    assigned.select(col(idCol), col("cell"),
      codesColumn(col("resid"), model.books, model.sub).as("code"))
  }

  /** The nProbe cells nearest to `q` by exact integer centroid
    * distance (ties to the smaller cid via the (d, c) sort) — ONE
    * definition shared by the search filter and the at-rest file-prune,
    * so a distance or tie-break tweak can never desynchronize them.
    */
  private def probeCells(model: IvfPqModel, q: Seq[Long],
                         nProbe: Int): Seq[Long] =
    model.coarse.map { case (c, cen) =>
      var d = 0L
      var j = 0
      while (j < model.dims) {
        val diff = q(j) - cen(j)
        d = Math.addExact(d, Math.multiplyExact(diff, diff))
        j += 1
      }
      (d, c)
    }.sortBy(identity).take(nProbe).map(_._2)

  /** Top-k ADC search over already-encoded (idCol, cell, code) rows —
    * the shared back half of [[annIvfPq]] and [[ivfPqTopKOverIndex]],
    * so the tie-break and table-indexing rules cannot drift between
    * the train-and-search and the at-rest-index paths.
    */
  private def ivfPqSearchEncoded(encoded: DataFrame, model: IvfPqModel,
                                 q: Seq[Long], k: Int, nProbe: Int,
                                 excludeId: Long,
                                 idCol: String): DataFrame = {
    require(nProbe > 0, s"bad ivf params: nProbe=$nProbe")
    require(q.length == model.dims,
      s"query vector has ${q.length} dims, want ${model.dims}")
    val centMap = model.coarse.toMap
    val probed = probeCells(model, q, nProbe)
    // one ADC table set per probed cell, from the QUERY's residual in
    // it — the same shared table/lookup/encode helpers as PQ-flat, so
    // the tie-break and indexing rules cannot drift between the paths
    def adcFor(cell: Long): Column = {
      val cen = centMap(cell)
      adcColumn(adcTables(model.books,
        IndexedSeq.tabulate(model.dims)(j => q(j) - cen(j)), model.sub))
    }
    val adc = probed.tail.foldLeft(adcFor(probed.head)) { (acc, c) =>
      when(col("cell") === c, adcFor(c)).otherwise(acc)
    }
    encoded
      .filter(col(idCol) =!= excludeId && col("cell").isin(probed: _*))
      .withColumn("adc", adc)
      .select(col(idCol), col("cell"), col("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(k)
  }

  /** Persist a trained IVF-PQ index at rest as TxLog tables (the
    * bm25IndexWrite pattern, lifted to the ACID log so the CDC
    * maintainer can update it):
    *
    *   `index/codebooks`: (kind, book, cid, vec) — the model, a
    *     (nCells + m·ksub)-row table read back in one bounded collect.
    *   `index/coded`: (idCol, cell, code) — the corpus's m-byte-scale
    *     codes, range-clustered by cell at write so the manifest's
    *     per-file min/max on `cell` prunes a probe's scan to the few
    *     files whose range overlaps its cells ([[graft.lake.TxLog]]
    *     footer-stats skipping — at 100 TB the probe opens nProbe
    *     cells' files, never the corpus).
    *
    * Serving then touches codes only — ZERO corpus re-encoding per
    * query — and new/changed/deleted vectors ride the CDC feed through
    * [[graft.streaming.Streaming.incrementalIvfPqIndex]] with the
    * codebooks FROZEN (the standard ANN-serving split: lists update
    * online, codebooks retrain offline).
    */
  def ivfPqIndexWrite(embeddings: DataFrame, index: String,
                      nCells: Int = 4, m: Int = 4, ksub: Int = 8,
                      iters: Int = 2, dims: Int = 64,
                      idCol: String = "vec_id",
                      embCol: String = "embedding"): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val model = ivfPqTrain(embeddings, nCells, m, ksub, iters, dims,
      idCol, embCol)
    val rows =
      model.coarse.map { case (cid, cen) => ("coarse", -1L, cid, cen.toArray) } ++
        model.books.zipWithIndex.flatMap { case (book, b) =>
          book.map { case (cid, cen) => ("book", b.toLong, cid, cen.toArray) }
        }
    graft.lake.TxLog.append(
      rows.toDF("kind", "book", "cid", "vec").coalesce(1),
      s"$index/codebooks")
    graft.lake.TxLog.append(
      ivfPqEncode(embeddings, model, idCol, embCol)
        .repartitionByRange(col("cell"), col(idCol)),
      s"$index/coded")
  }

  /** Read the model back from `index/codebooks` — one bounded collect
    * (nCells + m·ksub rows); dims/m/sub are recovered from the stored
    * vector widths, so a reader needs no out-of-band parameters.
    */
  def ivfPqModelRead(spark: org.apache.spark.sql.SparkSession,
                     index: String): IvfPqModel = {
    val rows = graft.lake.TxLog.read(spark, s"$index/codebooks").collect()
    val coarse = rows.filter(_.getString(0) == "coarse")
      .map(r => r.getLong(2) -> r.getSeq[Long](3).toIndexedSeq)
      .sortBy(_._1).toSeq
    require(coarse.nonEmpty, s"$index/codebooks has no coarse centroids")
    val books = rows.filter(_.getString(0) == "book")
      .groupBy(_.getLong(1)).toIndexedSeq.sortBy(_._1)
      .map { case (_, rs) =>
        rs.map(r => r.getLong(2) -> r.getSeq[Long](3).toIndexedSeq)
          .sortBy(_._1).toSeq
      }
    IvfPqModel(coarse, books, coarse.head._2.length)
  }

  /** Top-k ADC search served ENTIRELY from the at-rest index: model
    * from `index/codebooks` (bounded collect), candidates from
    * `index/coded` read through the stats-pruned range scan — one
    * [[graft.lake.TxLog.readRange]] per probed cell, so only files
    * whose cell range overlaps a probe are opened. The corpus table is
    * never touched and nothing re-encodes. Row-identical to
    * [[annIvfPq]] over the same corpus/params when `q` is the stored
    * vector of `excludeId` (the spec pins that equality).
    */
  def ivfPqTopKOverIndex(spark: org.apache.spark.sql.SparkSession,
                         index: String, q: Seq[Long], k: Int,
                         nProbe: Int = 2, excludeId: Long = Long.MinValue,
                         idCol: String = "vec_id"): DataFrame = {
    require(k > 0 && nProbe > 0, s"bad params: k=$k nProbe=$nProbe")
    val model = ivfPqModelRead(spark, index)
    // the probe set is decided driver-side from the model alone; each
    // probed cell becomes one stats-pruned range read of the coded
    // table — the SAME probeCells the search filter uses, so the files
    // read and the cells filtered can never desynchronize
    val probedCells = probeCells(model, q, nProbe)
    val coded = probedCells.map(c =>
        graft.lake.TxLog.readRange(spark, s"$index/coded", "cell", c, c))
      .reduce(_ unionByName _)
    ivfPqSearchEncoded(coded, model, q, k, nProbe, excludeId, idCol)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by clustering embeddings, then comparing pairs ONLY
    * within a cluster. Near-dups (cosine >= minCosine) keep their
    * smallest-id member; a doc is dropped when ANY smaller-id near-dup
    * exists — the same greedy chain-drop rule the exact-substring
    * pipeline uses, engine-deterministic. Emits per-cluster audit rows:
    * members, drops, keeps, and the XOR of kept ids (an order-free
    * checksum of exactly which docs survive).
    *
    * Scale: the k-means assignment is a shuffle-free map (see
    * [[kmeansAssign]]); the pair join is keyed by cluster, so pair cost
    * is Σ c_i² over cluster sizes — k must grow with the corpus exactly
    * like [[blockBitsFor]] grows LSH cells, and the paper's regime
    * (50k clusters for 5B docs) is the same constant-cell-size rule.
    */
  def semDedup(embeddings: DataFrame, k: Int, iters: Int, minCosine: Double,
               dims: Int = 64, idCol: String = "vec_id",
               embCol: String = "embedding"): DataFrame = {
    // lineage-truncate the assignment (lazy local checkpoint, the same
    // pattern connectedComponents uses): it feeds THREE consumers (both
    // pair-join sides and the membership roll-up); without the barrier,
    // each consumer would recompute the assignment map from the scan.
    // One materialization, three cheap readers.
    val assigned = kmeansAssignQ(embeddings, k, iters, dims, idCol, embCol)
      .select(col(idCol), col("qe"), col("cid"))
      .localCheckpoint(false)
    // Per-cluster roll-up WITHOUT a corpus-size join: members and drops
    // aggregate independently to k rows each and merge there, using
    // xor(kept) = xor(members) ⊕ xor(dropped) (xor is self-inverse, and
    // the min-id member of a cluster never drops so kept is non-empty).
    // Joining the drop set back to the N membership rows would shuffle
    // the corpus again.
    val dropStats = semDrops(assigned, minCosine, idCol)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_dropped"),
        expr("bit_xor(id_b)").as("xor_dropped"))
    val memberStats = assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        expr(s"bit_xor($idCol)").as("xor_members"))
    memberStats.join(dropStats, Seq("cid"), "left")
      .select(col("cid"), col("n_members"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        (col("n_members") - coalesce(col("n_dropped"), lit(0L))).as("n_kept"),
        col("xor_members").bitwiseXOR(coalesce(col("xor_dropped"), lit(0L)))
          .as("xor_kept"))
  }

  /** Cluster count for a corpus of `n` vectors holding the expected
    * cluster size near `targetClusterSize` — the paper's regime (50k
    * clusters for 5B docs ≈ 100k docs/cluster targets are far coarser;
    * dedup wants cells small enough that the within-cluster pair join
    * stays near-linear, the same constant-cell rule as
    * [[blockBitsFor]]).
    */
  def kFor(n: Long, targetClusterSize: Long = 1024L): Int =
    math.max(1L, math.min(1000000L,
      (n + targetClusterSize - 1) / targetClusterSize)).toInt

  /** [[semDedup]] with k derived from the corpus size (one count job)
    * instead of caller-pinned — the form to use at scale, where a fixed
    * k is the quadratic trap.
    */
  def semDedupAuto(embeddings: DataFrame, iters: Int, minCosine: Double,
                   targetClusterSize: Long = 1024L, dims: Int = 64,
                   idCol: String = "vec_id",
                   embCol: String = "embedding"): DataFrame =
    semDedup(embeddings, kFor(embeddings.count(), targetClusterSize),
      iters, minCosine, dims, idCol, embCol)

  /** The SemDeDup drop set over a checkpointed (idCol, qe, cid)
    * assignment: distinct (cid, id_b) pairs where id_b has a
    * smaller-id near-dup (cosine >= minCosine) in its cluster. Shared
    * by [[semDedup]] (stats roll-up) and [[embedCurationPipeline]]
    * (anti join) so the drop rule cannot drift between them.
    */
  private def semDrops(assigned: DataFrame, minCosine: Double,
                       idCol: String): DataFrame = {
    val withCell = assigned
      .select(col(idCol), col("qe"), col("cid").as("cell"))
      .withColumn("norm", dotQ(col("qe"), col("qe")).cast("double"))
    cellPairs(withCell, idCol)
      .filter(col("cosine") >= minCosine)
      .select(col("cell").as("cid"), col("id_b")).distinct()
  }

  /** Composed embedding-curation pipeline: ONE k-means assignment feeds
    * both the SemDeDup drop decision and the per-cluster quota on the
    * survivors — the fusion a production pipeline runs (assigning twice
    * would double the dominant scan+argmin cost; the checkpointed
    * assignment is shared, the same fusion argument as the text
    * curation pipeline). Emits (idCol, cid, kept_rank) for every vector
    * that survives dedup AND the quota, kept_rank <= maxPerCluster.
    *
    * Scale: the drop set is pair-table-sized and AQE broadcasts it into
    * the anti join at small SF (at scale it shuffles on the id — the
    * corpus-keyed join every dedup epilogue pays once); the quota
    * window partitions on cid.
    */
  def embedCurationPipeline(embeddings: DataFrame, k: Int, iters: Int,
                            minCosine: Double, maxPerCluster: Int,
                            dims: Int = 64, idCol: String = "vec_id",
                            embCol: String = "embedding",
                            seed: String = "cbal"): DataFrame = {
    val assigned = kmeansAssignQ(embeddings, k, iters, dims, idCol, embCol)
      .select(col(idCol), col("qe"), col("cid"))
      .localCheckpoint(false)
    val drops = semDrops(assigned, minCosine, idCol)
      .select(col("id_b").as(idCol))
    val rankHash = Dedup.h60(concat(lit(seed + "|"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("cid")).orderBy(rankHash.asc, col(idCol).asc)
    assigned.select(col(idCol), col("cid"))
      .join(drops, Seq(idCol), "left_anti")
      .withColumn("kept_rank", row_number().over(w))
      .filter(col("kept_rank") <= maxPerCluster)
  }

  /** Cluster-balanced sampling: keep at most `maxPerCluster` vectors per
    * k-means cluster, chosen by deterministic hash rank — the semantic
    * analogue of [[Curation.domainCapSample]] (topic balance instead of
    * domain balance): a corpus dominated by one semantic cluster (the
    * boilerplate-product-page problem) is capped at the cluster level
    * regardless of which domains it came from. Rerun-stable: same
    * corpus in, same sample out.
    *
    * Scale: cluster sizes are k-bounded and balanced by construction
    * (the k-grows-with-corpus rule shared with [[semDedup]]), but a
    * degenerate clustering CAN collapse mass into one cid — so the
    * quota runs as [[Skew.saltedTopK]] (rank per (cid, salt) cell, keep
    * the quota, final rank over the bounded survivors), bit-identical
    * to the one-window form and straggler-free even when a cluster
    * goes hot. Everything else is the shuffle-free assignment map.
    */
  def clusterBalancedSample(embeddings: DataFrame, k: Int, iters: Int,
                            maxPerCluster: Int, dims: Int = 64,
                            idCol: String = "vec_id",
                            embCol: String = "embedding",
                            seed: String = "cbal"): DataFrame = {
    val rankHash = Dedup.h60(concat(lit(seed + "|"), col(idCol).cast("string")))
    Skew.saltedTopK(
      kmeansAssign(embeddings, k, iters, dims, idCol, embCol),
      col("cid"), Seq(rankHash.asc, col(idCol).asc), maxPerCluster,
      saltBy = col(idCol), rankCol = "sample_rank")
  }

  /** Embedding-space benchmark decontamination — the semantic
    * complement of [[Curation.decontaminate]]'s n-gram overlap: a
    * PARAPHRASED eval item shares no 8-gram with the benchmark but
    * still sits next to it in embedding space. Flags every corpus
    * vector whose cosine against ANY benchmark vector in its sign-
    * bucket cell reaches `minCosine`.
    *
    * Shape: bipartite cell equi-join (corpus × benchmark — the same
    * blocking as [[cosineNearDupPairs]]; `bits` is the recall knob,
    * and the benchmark side is eval-set-sized so AQE broadcasts it),
    * hits aggregate per corpus vector (a hit-table-sized aggregate),
    * then LEFT-join back so every corpus id appears flagged or clean —
    * the [[Curation.decontaminate]] output contract. max(cosine) over
    * exact-integer-derived doubles is order-independent, so the audit
    * column is engine-deterministic.
    */
  def embDecontaminate(corpus: DataFrame, bench: DataFrame,
                       minCosine: Double, bits: Int,
                       idCol: String = "vec_id",
                       embCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol), quantize(col(embCol)).as("qe_c"),
        signBucket(col(embCol), bits).as("cell"))
      .withColumn("norm_c", dotQ(col("qe_c"), col("qe_c")).cast("double"))
    val b = bench.select(col(idCol).as("bench_id"),
        quantize(col(embCol)).as("qe_b"),
        signBucket(col(embCol), bits).as("cell"))
      .withColumn("norm_b", dotQ(col("qe_b"), col("qe_b")).cast("double"))
    val hits = c.join(b, "cell")
      .withColumn("cosine", dotQ(col("qe_c"), col("qe_b")).cast("double") /
        sqrt(col("norm_c") * col("norm_b")))
      .filter(col("cosine") >= minCosine)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bench_hits"),
        round(max(col("cosine")), 6).as("max_cosine_r"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bench_hits"), lit(0L)).as("n_bench_hits"),
        coalesce(col("max_cosine_r"), lit(0d)).as("max_cosine_r"),
        (coalesce(col("n_bench_hits"), lit(0L)) > 0)
          .cast("int").as("contaminated"))
  }

  /** Symmetric int8 quantization of the embedding column — the storage
    * compression step an embedding index runs before serving (4x smaller
    * than float32, dot products in integer SIMD). Per vector:
    * scale = max|x| / 127, q_i = round(x_i * 127 / max|x|), clamped to
    * [-127, 127]; a zero vector quantizes to zeros. Per-row narrow
    * transform, no shuffle — scan-speed at any corpus size.
    *
    * Determinism: max|x| is a float comparison (exact), the scale math
    * runs in double (IEEE-identical everywhere), and round() is
    * half-away-from-zero in both Spark and DuckDB, so the int8 vector is
    * engine-exact. Returns (idCol, amax, q) with q = array<long>.
    */
  def quantizeInt8(embeddings: DataFrame, idCol: String = "vec_id",
                   embCol: String = "embedding"): DataFrame = {
    val amax = array_max(transform(col(embCol), x => abs(x)))
    val q = when(col("amax") === 0f,
        transform(col(embCol), _ => lit(0L)))
      .otherwise(transform(col(embCol), x =>
        greatest(lit(-127L), least(lit(127L),
          round(x.cast("double") * 127d / col("amax").cast("double"))
            .cast("long")))))
    embeddings
      .withColumn("amax", amax)
      .withColumn("q", q)
  }

  /** Per-label embedding centroid, exact and order-independent: each
    * component is quantized to a fixed-point long, then integer-SUMmed
    * per (label, dimension) — float addition order across partitions can
    * never wobble the result. The data-selection primitive behind
    * cluster-balanced sampling and domain drift checks.
    *
    * Scale: posexplode makes n×dims rows, but the partial aggregate
    * compresses every partition to |labels|×dims before the exchange —
    * the reduce side of a 100 TB corpus sees only the tiny label×dim
    * grid. No corpus-wide window, no driver collect.
    */
  def labelCentroids(embeddings: DataFrame, labelCol: String = "label",
                     embCol: String = "embedding"): DataFrame =
    embeddings
      .select(col(labelCol),
        posexplode(quantize(col(embCol))).as(Seq("pos", "q")))
      .groupBy(col(labelCol), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_q"))
      .withColumn("mean_r",
        round(col("sum_q").cast("double") / col("n") / 1e7, 6))

  /** Sparse sign random projection (Achlioptas 2003 / JL): project the
    * embedding onto `outDims` pseudo-random axes whose entries are
    * `{+1, 0, -1}` with density 1/3, DERIVED from the [[Dedup
    * .minhashFamily]] LCG on (axis, component) — no stored matrix, no
    * broadcast, no driver state: any executor (or any other engine)
    * reconstructs entry (j, i) from the two indices alone. Components
    * ride the 1e7 fixed-point domain of [[quantize]], so each projected
    * coordinate is an EXACT integer (|proj| ≤ dims·1e7 — no overflow
    * until ~9e11 dims) and the DuckDB oracle replays it bit-for-bit.
    *
    * The JL use: distances/dot products are preserved in expectation
    * (E[⟨Px,Py⟩] = (outDims/3)·⟨x,y⟩ for density-1/3 signs), so dedup /
    * clustering / ANN prefilters can run on `outDims` ints instead of
    * `dims` floats. Shuffle-free narrow map: one row in, `outDims`
    * coordinates out, all codegen'd integer arithmetic.
    */
  def randomProjection(embeddings: DataFrame, outDims: Int,
                       idCol: String = "vec_id",
                       embCol: String = "embedding"): DataFrame =
    // native kernel, not aggregate(zip_with(sequence)) lambdas: HOFs
    // are interpreted per ELEMENT, and outDims·dims interpreted ops per
    // row dominated the whole query (measured ~5×; see VectorKernels)
    embeddings.withColumn("proj",
      graft.functions.VectorExpressions.randproj(
        quantize(col(embCol)), outDims))

  /** Hard-negative mining for retrieval training data (Karpukhin et al.
    * 2020, DPR §4.2: the strongest training negatives are the passages
    * a retriever RANKS HIGHEST among the non-positives — random
    * negatives are too easy and the contrastive gradient vanishes).
    * Each query retrieves a `shortlist`-deep cosine top list; candidates
    * sharing the query's label are positives (the relevance proxy here)
    * and drop; the top `k` survivors re-rank 1..k as that query's hard
    * negatives. Returns (q_id, q_label, neg_id, neg_label, cosine_r, rn).
    *
    * Scale shape: ONE corpus pass with the [[knnJoin]] broadcast
    * fan-out; both windows partition BY QUERY (parallel across queries,
    * never a global sort), and the second window re-ranks only the
    * ≤ `shortlist` survivors of the first — no new exchange, the
    * partitioning carries. For query sets past the broadcast ceiling
    * the candidate stage swaps to [[knnJoinBucketed]]'s cell equi-join;
    * the label filter and re-rank are unchanged.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
                    shortlist: Int, k: Int,
                    queryIdCol: String = "q_id", idCol: String = "vec_id",
                    labelCol: String = "label",
                    embCol: String = "embedding",
                    excludeSelf: Boolean = true): DataFrame = {
    // `excludeSelf` assumes queryIdCol SHARES the corpus id space
    // (queries ARE corpus rows — the usual DPR setup): the id
    // inequality then drops exactly the query's own row. With a
    // SEPARATE query-id space a numeric collision would silently drop
    // one unrelated candidate per query — pass excludeSelf = false
    // there (the label filter still removes positives).
    val q = queries.select(col(queryIdCol), col(labelCol).as("q_label"),
      quantize(col(embCol)).as("__q_emb"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cosine_r").desc, col(idCol))
    corpus
      .select(col(idCol), col(labelCol).as("neg_label"),
        quantize(col(embCol)).as("__c_emb"))
      .join(broadcast(q),
        if (excludeSelf) col(idCol) =!= col(queryIdCol) else lit(true))
      .withColumn("cosine_r",
        round(cosineQ(col("__c_emb"), col("__q_emb")), 6))
      .withColumn("srn", row_number().over(w))
      .filter(col("srn") <= shortlist && col("neg_label") =!= col("q_label"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(queryIdCol), col("q_label"), col(idCol).as("neg_id"),
        col("neg_label"), col("cosine_r"), col("rn"))
  }

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998):
    * greedy diversified top-k over a relevance shortlist —
    * `argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` — the standard
    * redundancy killer for RAG context assembly, where the plain top-k
    * hands the model k near-copies of the same passage. λ = 0.7 in
    * ×10-scaled exact integers: `score_e6 = 7·rel_e6 − 3·maxsim_e6`
    * over 6-decimal-rounded cosines (the [[bitextMine]] e6 idiom), so
    * any engine replays every greedy step bit for bit. Ties break on
    * the id. The first pick has no selected set: maxsim_e6 = 0, i.e.
    * pure relevance, per the paper.
    *
    * Scale shape: the corpus is touched ONCE — a broadcast-query scan
    * into a TakeOrdered top-`shortlist` (k-bounded, never a global
    * sort). Everything after operates on the shortlist: the pairwise
    * sims are `shortlist²` rows and the greedy walk runs over those
    * collected integers — ≤ ~10⁴ values for any sane rerank window,
    * the serving shape (rerankers run on shortlists by definition; at
    * 100 TB the shortlist is still 12 rows). Returns one row per greedy
    * step: (step, vec_id, rel_e6, maxsim_e6, score_e6).
    */
  def mmrRerank(embeddings: DataFrame, queryId: Long, shortlist: Int,
                k: Int, idCol: String = "vec_id",
                embCol: String = "embedding"): DataFrame = {
    require(k >= 1 && shortlist >= 1,
      s"need shortlist >= 1 and k >= 1, got shortlist=$shortlist k=$k")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val q = embeddings.filter(col(idCol) === queryId)
      .select(quantize(col(embCol)).as("__q_emb"))
    val sl = embeddings.filter(col(idCol) =!= queryId)
      .select(col(idCol), quantize(col(embCol)).as("__e"))
      .crossJoin(broadcast(q))
      .withColumn("rel_e6",
        round(round(cosineQ(col("__e"), col("__q_emb")), 6) * 1e6)
          .cast("long"))
      .select(col(idCol), col("__e"), col("rel_e6"))
      .orderBy(col("rel_e6").desc, col(idCol))
      .limit(shortlist)
      .cache() // three consumers (rels + both pair sides) — cached so
               // the corpus scan + TakeOrdered run once, not per branch;
               // unpersisted before return (shortlist rows, trivial)
    val a = sl.select(col(idCol).as("a"), col("__e").as("__ea"))
    val b = sl.select(col(idCol).as("b"), col("__e").as("__eb"))
    val pairSims = a.join(broadcast(b), col("a") =!= col("b"))
      .select(col("a"), col("b"),
        round(round(cosineQ(col("__ea"), col("__eb")), 6) * 1e6)
          .cast("long").as("sim_e6"))
    // bounded collects: |shortlist| rels + |shortlist|² sims — the
    // greedy walk is inherently sequential (step t needs the argmax of
    // step t-1), so it runs over these collected integers, like the
    // Lloyd k-row centroid collects
    val rels: Seq[(Long, Long)] = sl
      .select(col(idCol).cast("long"), col("rel_e6")).as[(Long, Long)]
      .collect().toSeq.sortBy { case (id, rel) => (-rel, id) }
    val sims: Map[(Long, Long), Long] = pairSims
      .select(col("a").cast("long"), col("b").cast("long"), col("sim_e6"))
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, s) => (x, y) -> s }.toMap
    sl.unpersist(false)
    val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long)]
    val remaining = scala.collection.mutable.LinkedHashMap(rels: _*)
    var step = 1L
    while (step <= k && remaining.nonEmpty) {
      val scored = remaining.iterator.map { case (id, rel) =>
        val ms =
          if (selected.isEmpty) 0L
          else selected.iterator.map(s => sims((id, s))).max
        (id, rel, ms, 7L * rel - 3L * ms)
      }.toSeq
      val (id, rel, ms, sc) = scored
        .minBy { case (i, _, _, s) => (-s, i) }
      out += ((step, id, rel, ms, sc))
      selected += id
      remaining.remove(id)
      step += 1
    }
    out.toSeq.toDF("step", "vec_id", "rel_e6", "maxsim_e6", "score_e6")
  }
}
