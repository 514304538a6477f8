package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

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

  /** Coarse cell id for IVF-style bucketing: sign bits of the first
    * `bits` dimensions (a deterministic stand-in for trained centroids —
    * the plumbing, partition pruning and join shape are identical).
    */
  def signBucket(emb: Column, bits: Int): Column =
    (0 until bits)
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
    // Two pair-count optimizations: norms are computed ONCE per vector,
    // and the per-pair dot product is unrolled into `dims` scalar-column
    // multiply-adds. Higher-order-function lambdas (zip_with/aggregate)
    // are interpreted, not codegen'd — the unrolled form stays inside
    // whole-stage codegen, which is what matters when pairs >> vectors.
    val withCell = embeddings
      .select(col(idCol), quantize(col(embCol)).as("qe"),
        signBucket(col(embCol), bits).as("cell"))
      .withColumn("norm", dotQ(col("qe"), col("qe")).cast("double"))
    val aCols = col(idCol).as("id_a") +: col("norm").as("norm_a") +: col("cell") +:
      (0 until dims).map(i => element_at(col("qe"), i + 1).as(s"a$i"))
    val bCols = col(idCol).as("id_b") +: col("norm").as("norm_b") +: col("cell") +:
      (0 until dims).map(i => element_at(col("qe"), i + 1).as(s"b$i"))
    val dot = (0 until dims).map(i => col(s"a$i") * col(s"b$i")).reduce(_ + _)
    withCell.select(aCols: _*)
      .join(withCell.select(bCols: _*), "cell")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", dot.cast("double") / sqrt(col("norm_a") * col("norm_b")))
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cell"),
        round(col("cosine"), 6).as("cosine_r"))
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
}
