package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable sketch aggregations — the cardinality/frequency pattern
  * that actually scales to 100 TB: sketch each shard (source, day,
  * partition) ONCE at ingest, persist the tiny sketch rows, and answer
  * corpus-wide questions later by MERGING sketches instead of
  * re-scanning the corpus. Exact distinct over a 100 TB column is a
  * full shuffle of every distinct value; the sketch path moves kilobytes.
  *
  * Both sketches ride Spark's codegen'd built-ins (Apache DataSketches
  * HLL and the classic count-min), so the per-shard pass is one
  * map-side-combining aggregate.
  *
  * The algebraic property the spec pins: HLL register-max union means
  * union-of-shard-sketches equals the sketch of the whole corpus — not
  * approximately, EXACTLY (same registers, same estimate). That is what
  * makes incremental maintenance sound: yesterday's sketches never need
  * recomputation when today's shard arrives.
  */
object Sketches {

  /** One HLL sketch + estimate per group (the per-shard ingest pass).
    * Output: (groupCol, sketch binary, n_distinct estimate).
    */
  def distinctPerGroup(df: DataFrame, groupCol: String, valueCol: String,
                       lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))
      .withColumn("n_distinct", hll_sketch_estimate(col("sketch")))

  /** Merge per-group sketches to ONE corpus-wide estimate — kilobytes
    * of input, no corpus rescan. `allowDifferentLgK` stays false: a
    * mixed-precision union silently degrades to the coarsest sketch,
    * which should be an explicit decision, not an accident.
    */
  def mergedDistinct(perGroup: DataFrame): DataFrame =
    perGroup.agg(
      hll_sketch_estimate(
        hll_union_agg(col("sketch"), lit(false))).as("n_distinct"))

  /** Whole-corpus sketch in one pass (the baseline the union must
    * match).
    */
  def distinctAll(df: DataFrame, valueCol: String, lgK: Int = 12): DataFrame =
    df.agg(hll_sketch_estimate(
      hll_sketch_agg(col(valueCol), lit(lgK))).as("n_distinct"))

  /** Count-min frequency sketch of a column, returned as the serialized
    * sketch bytes (one row). Point lookups deserialize driver-side via
    * [[frequencyOf]] — the heavy-hitter screening pattern: the sketch
    * never under-counts, so `frequencyOf(x) < threshold` definitively
    * clears x without a corpus group-by.
    */
  def cmSketch(df: DataFrame, valueCol: String, eps: Double = 0.0001,
               confidence: Double = 0.99, seed: Int = 42): Array[Byte] =
    df.agg(count_min_sketch(col(valueCol), lit(eps), lit(confidence),
      lit(seed)).as("cms"))
      .head().getAs[Array[Byte]]("cms")

  /** Estimated frequency of one value in a serialized count-min sketch
    * (never an under-count; over-counts bounded by eps·N at the chosen
    * confidence).
    */
  def frequencyOf(sketch: Array[Byte], value: String): Long = {
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketch))
    // the agg side adds StringType values as their UTF-8 bytes
    cms.estimateCount(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  // ------------------------------------------------------- quantile sketch

  /** Reserved bucket index for non-positive values (log buckets cover
    * v > 0 only; zeros are common in latency/size metrics and must not
    * vanish). Int.MinValue can never collide with a real log bucket.
    */
  val NonPositiveBucket: Int = Int.MinValue

  private def gammaFor(alpha: Double): Double = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    (1 + alpha) / (1 - alpha)
  }

  /** Mergeable QUANTILE sketch (the DDSketch construction, Masson et
    * al., VLDB 2019): values land in log-γ buckets, γ = (1+α)/(1−α),
    * bucket i covering (γ^(i−1), γ^i] — so any value in a bucket is
    * within relative error α of the bucket's midpoint estimate. The
    * sketch IS the (bucket, cnt) histogram: per-shard sketches merge by
    * bucket-wise ADDITION, exactly — union-of-shards equals the
    * whole-corpus sketch row for row, the same incremental-maintenance
    * algebra the HLL/CMS specs pin. Bucket count is logarithmic in the
    * value range (~2k buckets spanning 9 decades at α=1%), so a
    * per-(source, day) sketch is kilobytes.
    *
    * One map-side-combining aggregate on (groupCols, bucket); no UDF —
    * the bucket index is a codegen'd `ceil(ln v / ln γ)`.
    * Output: (groupCols..., bucket, cnt).
    */
  def quantileSketch(df: DataFrame, valueCol: String,
                     groupCols: Seq[String] = Nil,
                     alpha: Double = 0.01): DataFrame = {
    val gamma = gammaFor(alpha)
    val v = col(valueCol).cast("double")
    val bucket = when(v > 0,
      ceil(log(v) / math.log(gamma)).cast("int"))
      .otherwise(lit(NonPositiveBucket))
    // NaN carries no orderable magnitude; NaN > 0 is TRUE in Spark and
    // the int cast would silently file it as bucket 0 (≈ value 1.0),
    // shifting quantiles — excluded like NULL, explicitly
    df.filter(col(valueCol).isNotNull && !isnan(v))
      // alpha rides IN the sketch rows: decode reads it back, so a
      // sketch can never be mis-decoded with a different gamma than it
      // was built with
      .groupBy((groupCols.map(col) ++ Seq(bucket.as("bucket"),
        lit(alpha).as("alpha"))): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Tag a LEGACY (bucket, cnt) quantile sketch — persisted before
    * alpha rode in-row — with the alpha it was built with, making it
    * readable by [[mergeQuantileSketches]]/[[quantileFromSketch]]
    * again. Only the owner knows the historical alpha; tagging an
    * already-tagged sketch is refused rather than silently overwritten.
    */
  def tagAlpha(sketch: DataFrame, alpha: Double): DataFrame = {
    require(!sketch.columns.contains("alpha"),
      "sketch already carries an alpha column — tagAlpha is only for " +
        "legacy (bucket, cnt) sketches")
    gammaFor(alpha) // validate range
    sketch.withColumn("alpha", lit(alpha))
  }

  /** Merge sketches across (a subset of) their grouping — bucket-wise
    * addition, the exact-union property. Dropping all group columns
    * yields the corpus-wide sketch. Alpha stays a grouping key: only
    * same-alpha buckets are addable, and an accidental mixed-alpha
    * merge surfaces as multiple alpha values that
    * [[quantileFromSketch]] refuses, never as silently-added
    * incompatible buckets.
    */
  def mergeQuantileSketches(sketches: DataFrame,
                            keepGroupCols: Seq[String] = Nil): DataFrame =
    sketches.groupBy((keepGroupCols.map(col) ++
      Seq(col("bucket"), col("alpha"))): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimate from a (bucket, alpha, cnt) sketch, driver-side
    * (the sketch is ~2k rows — the whole point is that THIS is all that
    * is left of the corpus). The decode gamma comes from the sketch's
    * own alpha column; a sketch mixing alphas is refused. Non-positive
    * values estimate as 0.0 (their bucket is counted in the rank walk
    * but carries no magnitude). Guarantee: for positive data, within
    * relative error α of the exact q-quantile.
    */
  def quantileFromSketch(sketch: DataFrame, q: Double): Double = {
    require(q >= 0 && q <= 1, s"q must be in [0,1]: $q")
    val rows = sketch.select(col("bucket"), col("alpha"), col("cnt"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    require(rows.nonEmpty, "empty sketch")
    val alphas = rows.map(_._2).distinct
    require(alphas.length == 1,
      s"sketch mixes alphas ${alphas.mkString(",")} — merge only " +
        "same-alpha sketches")
    val gamma = gammaFor(alphas.head)
    val buckets = rows.map(r => (r._1, r._3)).sortBy(_._1)
    val n = buckets.map(_._2).sum
    val targetRank = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    for ((b, cnt) <- buckets) {
      cum += cnt
      if (cum >= targetRank)
        return if (b == NonPositiveBucket) 0.0
        else 2.0 * math.pow(gamma, b) / (gamma + 1) // bucket midpoint
    }
    throw new IllegalStateException("unreachable: rank walk exhausted")
  }

  // ----------------------------------------------------------- bloom filter

  /** Bloom bitmap word width. 32 bits per word keeps every mask value
    * in non-negative BIGINT range in BOTH engines — a 64-bit word's top
    * bit (1L << 63) is negative in two's complement and its SQL
    * replay would need signed-overflow care. The layout math below
    * derives from this constant (the oracle SQL in TrainingQueries
    * hardcodes the same 32/5 pair — change both together).
    */
  val BloomWordBits = 32

  private val BloomWordShift = Integer.numberOfTrailingZeros(BloomWordBits)

  private def bloomMask = expr(
    s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $BloomWordBits AS INT))")

  /** The k probe positions of one key, as an array column — double
    * hashing over the shared 60-bit md5 (Kirsch–Mitzenmacher 2006:
    * pos_i = h1 + i·h2 mod m needs ONE strong hash, not k). h2 is
    * forced odd so a power-of-two m is fully cycled. Pure integer
    * arithmetic on [[Dedup.h60]] — deterministic and replayable in the
    * oracle engine (shiftright instead of division: a double-precision
    * divide would lose bits above 2^53).
    */
  def bloomPositions(key: org.apache.spark.sql.Column, mBits: Int,
                     k: Int): org.apache.spark.sql.Column =
    positionsOfHash(Dedup.h60(key), mBits, k)

  private def positionsOfHash(h: org.apache.spark.sql.Column, mBits: Int,
                              k: Int): org.apache.spark.sql.Column = {
    val h1 = h % lit(mBits.toLong)
    val h2 = shiftright(h, 30) * lit(2L) + lit(1L)
    array((0 until k).map(i => (h1 + lit(i.toLong) * h2) % lit(mBits.toLong)): _*)
  }

  /** Build a Bloom filter over a key column as a DATAFRAME of
    * (word, bits) rows — the membership sketch that answers "might this
    * key exist in a corpus too big to join" (incremental dedup of a new
    * crawl batch against years of history). m bits cost m/32 rows ≈
    * kilobytes-to-megabytes against a corpus of billions; k hash probes
    * per key.
    *
    * Scale: one explode (k rows per key) into one map-side-combining
    * bit_or aggregate — each task pre-folds its keys' bits into ≤ m/32
    * partial words, so the shuffle moves words, never keys. Mergeable
    * by construction: bit_or is idempotent-associative, so
    * union-of-shard-blooms EQUALS the whole-corpus bloom, row for row
    * ([[bloomMerge]] — the same incremental-maintenance algebra the
    * HLL/CMS/quantile specs pin). NULL keys are skipped (NULL is not a
    * member of anything).
    */
  def bloomBuild(df: DataFrame, keyCol: String, mBits: Int = 1 << 20,
                 k: Int = 5): DataFrame = {
    require(mBits % BloomWordBits == 0 && mBits > 0,
      s"mBits must be a positive multiple of $BloomWordBits: $mBits")
    require(k >= 1 && k <= 16, s"k out of range: $k")
    df.filter(col(keyCol).isNotNull)
      .select(explode(bloomPositions(col(keyCol), mBits, k)).as("pos"))
      .groupBy(shiftright(col("pos"), BloomWordShift).as("word"))
      .agg(bit_or(bloomMask).as("bits"))
  }

  /** OR-merge per-shard blooms (built with the SAME mBits and k) into
    * one — kilobytes of input, no corpus rescan.
    */
  def bloomMerge(blooms: DataFrame): DataFrame =
    blooms.groupBy(col("word")).agg(bit_or(col("bits")).as("bits"))

  /** The OFFLINE REBUILD the bloom's delete semantics promise: a bloom
    * cannot unset bits, so deleted keys stay "maybe present" until the
    * view is rebuilt from the live corpus — this does that in ONE
    * committed version (fresh words upsert, words the fresh bloom no
    * longer touches delete), so a reader never sees an empty or
    * half-built bloom (a truncate-then-append would open exactly that
    * false-negative window). Stop the view's maintaining stream first —
    * single-maintainer, like the incremental path.
    *
    * (mBits, k) MUST equal the view's original build geometry — the
    * table stores no geometry, and a mismatched rebuild would commit
    * positions the resuming stream and probes then misread as missing
    * bits (false negatives). A view whose words exceed the given mBits
    * is refused (catches a too-small rebuild; an oversized one is
    * undetectable from the words alone). Returns the committed version.
    */
  def bloomRebuild(spark: org.apache.spark.sql.SparkSession,
                   liveKeys: DataFrame, view: String, keyCol: String,
                   mBits: Int = 1 << 20, k: Int = 5): Long = {
    import graft.lake.TxLog
    val maxWord = TxLog.read(spark, view).agg(max(col("word")))
      .head().getLong(0)
    require(maxWord < mBits / BloomWordBits,
      s"view has word $maxWord beyond mBits=$mBits/$BloomWordBits words — " +
        "rebuild with the view's ORIGINAL (mBits, k) geometry")
    // persist both layers: `fresh` appears on two sides (the union and
    // stale's exceptAll), and mergeApply executes its source several
    // times (dup-key check, touched-file probe, rewrite) — uncached,
    // the corpus-wide build would run ~4x
    val fresh = bloomBuild(liveKeys, keyCol, mBits, k).persist()
    val stale = TxLog.read(spark, view).select(col("word"))
      .exceptAll(fresh.select(col("word")))
      .select(col("word"), lit(0L).as("bits"), lit(true).as("__del"))
    val source = fresh.withColumn("__del", lit(false)).unionByName(stale)
      .persist()
    try TxLog.mergeApply(spark, view, source, Seq("word"),
      deleteCol = Some("__del"))
    finally { source.unpersist(); fresh.unpersist(); () }
  }

  /** Membership probe: one verdict per distinct (idCol, keyCol) pair of
    * `probes` — true iff ALL k of the key's bits are set in the bloom:
    * "maybe present" (false positives at the designed rate, NEVER
    * false negatives; a true answer still needs exact verification if
    * the use is destructive). Grouping internally carries the key's
    * hash, so an id that maps to SEVERAL keys gets several independent
    * verdicts — folding them together would let an unseen key mask a
    * member key's true as false, a false negative through the API.
    * Output: (idCol, maybe_present).
    *
    * Scale: the bloom broadcasts (m/32 rows — a 2^30-bit bloom is 32 MB
    * of words) and the probe is a map-side broadcast join + one
    * id-keyed aggregate; set `hintBroadcast = false` for blooms past
    * the broadcast budget and the word equi-join shuffles instead.
    * Probes with a NULL key report false (nothing NULL was ever added).
    */
  def bloomProbe(bloom: DataFrame, probes: DataFrame, keyCol: String,
                 idCol: String, mBits: Int = 1 << 20, k: Int = 5,
                 hintBroadcast: Boolean = true): DataFrame = {
    val b = if (hintBroadcast) broadcast(bloom) else bloom
    probes
      .select(col(idCol), Dedup.h60(col(keyCol)).as("__h"))
      .select(col(idCol), col("__h"),
        explode_outer(when(col("__h").isNotNull,
          positionsOfHash(col("__h"), mBits, k))).as("pos"))
      .withColumn("word", shiftright(col("pos"), BloomWordShift))
      .withColumn("mask", bloomMask)
      .join(b, Seq("word"), "left")
      .groupBy(col(idCol), col("__h"))
      .agg(bool_and(col("pos").isNotNull &&
        (coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) =!= 0L))
        .as("maybe_present"))
      .select(col(idCol), col("maybe_present"))
  }

  /** h60's domain size — KMV order statistics scale against it. */
  private val KmvDomain = 1L << 60

  /** K-minimum-values distinct sketch per group (Bar-Yossef et al. 2002;
    * Beyer et al. 2007 for the set operations): the k SMALLEST h60
    * hashes of the group's distinct values. Unlike HLL it supports
    * INTERSECTION estimation ([[kmvPairOverlap]]), and unlike both it is
    * fully DETERMINISTIC given the hash — the oracle replays the sketch
    * bit for bit, so the estimates themselves are engine-exact.
    *
    * Scale shape: ONE partial-aggregable pass — the bounded
    * [[graft.functions.KmvMinK]] buffer holds at most k longs per
    * group per map task, so the build shuffle moves O(groups·k·tasks)
    * serialized longs, never the corpus's distinct value set (the
    * earlier distinct + salted-window formulation shuffled and sorted
    * the full distinct set twice and owned the top probe decade's
    * exponent). The sketch is k rows per group at rest; corpus-wide
    * questions merge sketches, never rescan.
    */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String,
                k: Int = 256): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2: $k")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val h = df.select(col(groupCol),
        graft.ops.Dedup.h60(col(valueCol)).as("h"))
      .filter(col("h").isNotNull)
    h.groupBy(col(groupCol))
      .agg(ColumnBridge.column(
        graft.functions.KmvMinK(ColumnBridge.expression(col("h")), k)
          .toAggregateExpression()).as("__hs"))
      .select(col(groupCol), explode(col("__hs")).as("h"))
  }

  /** Distinct-count estimate from a KMV sketch: groups holding fewer
    * than k hashes are EXACT (the sketch is the whole distinct set);
    * full sketches estimate (k-1)·2^60 DIV h_(k) — exact integer
    * arithmetic in the DECIMAL(38,0)/HUGEINT twin domain.
    */
  def kmvDistinct(sketch: DataFrame, groupCol: String,
                  k: Int = 256): DataFrame =
    sketch.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), max(col("h")).as("__kth"))
      .select(col(groupCol),
        when(col("__n") < k, col("__n")).otherwise(expr(
          s"cast((cast(${KmvDomain}L as decimal(38,0)) * ${k - 1}) " +
            "DIV __kth as bigint)")).as("est_distinct"))

  /** Pairwise union / intersection / Jaccard estimates across every
    * group pair from one sketch table (Beyer et al. 2007): per pair,
    * the k smallest hashes of the SKETCH UNION form a KMV sketch of the
    * set union (k-min of k-mins is the union's k-min); the fraction of
    * them present in BOTH sides estimates Jaccard, and intersection =
    * jaccard · union. Emits (grp_a, grp_b, union_est, inter_est,
    * jaccard_e6) for grp_a < grp_b — all from k-row sketches, the
    * corpus untouched.
    */
  def kmvPairOverlap(sketch: DataFrame, groupCol: String,
                     k: Int = 256): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2: $k")
    import org.apache.spark.sql.expressions.Window
    val groups = sketch.select(col(groupCol)).distinct()
    val gpairs = groups.select(col(groupCol).as("grp_a"))
      .crossJoin(broadcast(groups.select(col(groupCol).as("grp_b"))))
      .filter(col("grp_a") < col("grp_b"))
    // both sides' sketch rows per pair, membership-tagged, h-deduped
    val tagged = gpairs
      .join(sketch.select(col(groupCol).as("grp_a"), col("h"),
        lit(1).as("__a")), Seq("grp_a"))
      .select(col("grp_a"), col("grp_b"), col("h"), col("__a"),
        lit(0).as("__b"))
      .unionByName(gpairs
        .join(sketch.select(col(groupCol).as("grp_b"), col("h"),
          lit(1).as("__b")), Seq("grp_b"))
        .select(col("grp_a"), col("grp_b"), col("h"), lit(0).as("__a"),
          col("__b")))
      .groupBy(col("grp_a"), col("grp_b"), col("h"))
      .agg(max(col("__a")).as("__ina"), max(col("__b")).as("__inb"))
    val w = Window.partitionBy(col("grp_a"), col("grp_b")).orderBy(col("h"))
    val kmin = tagged.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
    kmin.groupBy(col("grp_a"), col("grp_b"))
      .agg(count(lit(1)).as("__n"), max(col("h")).as("__kth"),
        sum((col("__ina") * col("__inb")).cast("long")).as("__both"))
      .withColumn("union_est",
        when(col("__n") < k, col("__n")).otherwise(expr(
          s"cast((cast(${KmvDomain}L as decimal(38,0)) * ${k - 1}) " +
            "DIV __kth as bigint)")))
      .select(col("grp_a"), col("grp_b"), col("union_est"),
        expr("(__both * union_est) DIV __n").as("inter_est"),
        expr("(__both * 1000000L) DIV __n").as("jaccard_e6"))
  }
}
