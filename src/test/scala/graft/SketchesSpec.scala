package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches

class SketchesSpec extends SparkSpec with PropSupport {

  test("bloom positions: always k in-range slots, odd stride, null-safe") {
    import spark.implicits._
    import org.scalacheck.Gen
    val m = 1 << 14
    val k = 7
    forAllGen(Gen.listOfN(20, Gen.alphaNumStr.suchThat(_.nonEmpty)),
      cases = 20) { keys =>
      val rows = keys.toDF("key")
        .select(Sketches.bloomPositions(col("key"), m, k).as("pos"))
        .collect().map(_.getSeq[Long](0))
      rows.foreach { ps =>
        assert(ps.length === k)
        assert(ps.forall(p => p >= 0 && p < m),
          s"position out of [0, $m): $ps")
      }
      ()
    }
    // double hashing with an ODD stride cycles a power-of-two m: the k
    // positions of one key are DISTINCT whenever k <= the cycle (no
    // wasted probes). Verified on a fixed key set large enough to catch
    // a broken stride parity.
    val dup = (1 to 500).map(i => s"key-$i").toDF("key")
      .select(Sketches.bloomPositions(col("key"), m, k).as("pos"))
      .collect().map(_.getSeq[Long](0))
      .count(ps => ps.distinct.length != ps.length)
    assert(dup === 0, s"$dup keys had colliding probe slots")
  }

  private lazy val events = Tables.load(spark, sf, "events").cache()

  test("HLL: union of per-group sketches EQUALS the whole-corpus sketch") {
    val perType = Sketches.distinctPerGroup(events, "event_type", "user_id")
    val merged = Sketches.mergedDistinct(perType)
      .head().getLong(0)
    val whole = Sketches.distinctAll(events, "user_id")
      .head().getLong(0)
    assert(merged === whole) // register-max union: exact, not approximate
  }

  test("HLL estimate lands within 5% of the exact distinct count") {
    val est = Sketches.distinctAll(events, "event_id").head().getLong(0)
    val exact = events.select("event_id").distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"estimate $est vs exact $exact")
  }

  test("incremental maintenance: new shard's sketch folds in, old ones unread") {
    val old = Sketches.distinctPerGroup(
      events.filter(col("event_id") < 500), "event_type", "user_id")
    // persist-and-reload simulation: sketches survive as plain binary rows
    val oldRows = old.select("event_type", "sketch").collect()
    import spark.implicits._
    val reloaded = oldRows.map(r =>
      (r.getString(0), r.getAs[Array[Byte]](1))).toSeq
      .toDF("event_type", "sketch")
    val newShard = Sketches.distinctPerGroup(
      events.filter(col("event_id") >= 500), "event_type", "user_id")
      .select("event_type", "sketch")
    val merged = Sketches.mergedDistinct(reloaded.union(newShard))
      .head().getLong(0)
    val whole = Sketches.distinctAll(events, "user_id").head().getLong(0)
    assert(merged === whole)
  }

  test("count-min: never under-counts; absent values stay under eps*N") {
    val toks = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w")).cache()
    val n = toks.count()
    val sketch = Sketches.cmSketch(toks, "w")
    val exact = toks.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the heavy hitter and a mid-frequency token: estimate >= exact,
    // over-count bounded by eps*N = 0.0001*N
    val slack = math.max(1L, (0.0001 * n).toLong)
    Seq(exact.maxBy(_._2)._1, exact.keys.head).foreach { w =>
      val est = Sketches.frequencyOf(sketch, w)
      assert(est >= exact(w), s"under-count for $w")
      assert(est <= exact(w) + slack, s"over-count for $w: $est vs ${exact(w)}")
    }
    assert(Sketches.frequencyOf(sketch, "zz-not-a-token-zz") <= slack)
  }

  test("quantile sketch: per-source merge EQUALS the corpus sketch, bucket for bucket") {
    val vals = events.select(col("event_type"), col("value"))
    val perType = Sketches.quantileSketch(vals, "value", Seq("event_type"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("bucket", "alpha", "cnt").collect()
        .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
    val merged = rows(Sketches.mergeQuantileSketches(perType))
    val whole = rows(Sketches.quantileSketch(vals, "value"))
    assert(merged === whole) // bucket-wise addition: exact, not approximate
  }

  test("quantile sketch: estimates land within alpha relative error of exact") {
    val alpha = 0.01
    val pos = events.filter(col("value") > 0).select(col("value"))
    val sketch = Sketches.quantileSketch(pos, "value", alpha = alpha)
    val sorted = pos.collect().map(_.getDouble(0)).sorted
    val n = sorted.length
    Seq(0.1, 0.5, 0.9, 0.99).foreach { q =>
      val est = Sketches.quantileFromSketch(sketch, q)
      val exact = sorted(math.max(0, math.ceil(q * n).toInt - 1))
      assert(math.abs(est - exact) <= alpha * exact + 1e-12,
        s"q=$q: est $est vs exact $exact exceeds alpha=$alpha")
    }
  }

  test("quantile sketch: zeros counted, NaN excluded, mixed alphas refused") {
    import spark.implicits._
    val df = Seq(0.0, 0.0, 0.0, 5.0, 10.0, Double.NaN).toDF("v")
    val sketch = Sketches.quantileSketch(df, "v")
    // NaN carries no magnitude and must NOT land in a bucket (it would
    // count as a ~1.0 sample); zeros all land in the reserved bucket
    assert(sketch.agg(sum("cnt")).head().getLong(0) === 5L)
    // majority zeros: the median IS zero, and must report as such
    assert(Sketches.quantileFromSketch(sketch, 0.5) === 0.0)
    // the top of the distribution still resolves to the positive tail
    assert(Sketches.quantileFromSketch(sketch, 1.0) > 9.0)
    // a sketch accidentally unioned across alphas is refused at decode
    // (the buckets are incompatible; adding them would be silent garbage)
    val mixed = sketch.unionByName(
      Sketches.quantileSketch(df, "v", alpha = 0.05))
    val e = intercept[IllegalArgumentException] {
      Sketches.quantileFromSketch(mixed, 0.5)
    }
    assert(e.getMessage.contains("alpha"), e.getMessage)
    // a legacy (bucket, cnt) sketch persisted before alpha rode in-row
    // becomes readable again via tagAlpha; double-tagging is refused
    val legacy = sketch.drop("alpha")
    assert(Sketches.quantileFromSketch(
      Sketches.tagAlpha(legacy, 0.01), 0.5) === 0.0)
    val e2 = intercept[IllegalArgumentException] {
      Sketches.tagAlpha(sketch, 0.01)
    }
    assert(e2.getMessage.contains("already"), e2.getMessage)
  }

  test("bloom: no false negatives; FPR in bound; shard-merge equals whole") {
    val d = Tables.load(spark, sf, "documents").cache()
    val m = 1 << 16
    val k = 5
    val bloom = Sketches.bloomBuild(d.select(col("text")), "text", m, k)
      .cache()
    // even ids probe their TRUE text (members), odd ids a perturbed one
    // (non-members) — both verdict paths exercised, deterministically
    val probes = d.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, col("text"))
        .otherwise(concat(col("text"), lit("~"))).as("text"))
    val verdicts = Sketches.bloomProbe(bloom, probes, "text", "doc_id", m, k)
    val rows = verdicts.collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rows.size === d.count())
    // NEVER a false negative — the defining bloom guarantee
    val truth = rows.keySet.filter(_ % 2 == 0)
    assert(truth.nonEmpty)
    truth.foreach(id => assert(rows(id), s"false negative for doc $id"))
    // false-positive rate within 5x the design bound (small-sample slack)
    val nSeen = d.count()
    val expFpr = math.pow(1 - math.exp(-k.toDouble * nSeen / m), k)
    val negatives = rows.filterNot { case (id, _) => truth(id) }
    val fp = negatives.count(_._2)
    assert(fp <= math.max(2.0, 5 * expFpr * negatives.size),
      s"$fp false positives over ${negatives.size} (design fpr $expFpr)")
    // exact-union algebra: per-source blooms OR-merged == whole, row for row
    val bySource = d.select("source").distinct().collect().map(_.getString(0))
    val shards = bySource.map(src => Sketches.bloomBuild(
      d.filter(col("source") === src).select(col("text")), "text", m, k))
      .reduce(_ unionByName _)
    def wordSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wordSet(Sketches.bloomMerge(shards)) === wordSet(bloom))
    // a NULL probe key is "not present", never an error or a dropped row
    import spark.implicits._
    val withNull = Seq((999999L, null: String)).toDF("doc_id", "text")
    val nv = Sketches.bloomProbe(bloom, withNull, "text", "doc_id", m, k)
      .collect()
    assert(nv.length === 1 && !nv(0).getBoolean(1))
    // duplicate ids with DIFFERENT keys: independent verdicts — the
    // unseen key must never mask the member key's true (that would be
    // a false negative smuggled through the aggregation)
    val seenText = d.select("text").head().getString(0)
    val dup = Seq((7L, seenText), (7L, "zzz-never-inserted"))
      .toDF("doc_id", "text")
    val dv = Sketches.bloomProbe(bloom, dup, "text", "doc_id", m, k)
      .collect().map(_.getBoolean(1)).sorted
    assert(dv.toSeq === Seq(false, true),
      "one verdict per (id, key): member true, unseen false")
    bloom.unpersist(); d.unpersist()
    ()
  }

  test("KMV: exact below k, bounded relative error above, sketches merge") {
    import spark.implicits._
    import graft.ops.Sketches
    // group "small" has 100 distinct values (< k=256): sketch IS the
    // set, estimate exact; "big" has 20000: estimate within the KMV
    // error envelope (~1/sqrt(k-2) ~= 6.3%; assert a loose 20%)
    val vals = (1 to 100).map(i => ("small", s"s$i")) ++
      (1 to 20000).map(i => ("big", s"b$i"))
    val df = vals.toDF("g", "v")
    val sk = Sketches.kmvSketch(df, "g", "v", k = 256).persist()
    val est = Sketches.kmvDistinct(sk, "g", k = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("small") === 100L, "below-k groups must be EXACT")
    assert(math.abs(est("big") - 20000L) < 4000L,
      s"k=256 estimate out of envelope: ${est("big")}")
    // mergeability: the k-min of the two sketches' union equals the
    // sketch of the union group — the property that lets shard
    // sketches answer corpus questions
    val unionSketch = Sketches.kmvSketch(
      df.withColumn("g", lit("all")), "g", "v", k = 256)
      .collect().map(_.getLong(1)).sorted.toSeq
    val mergedKmin = sk.collect().map(_.getLong(1))
      .distinct.sorted.take(256).toSeq
    assert(unionSketch === mergedKmin, "k-min of k-mins != union k-min")
    sk.unpersist()
    ()
  }

  test("KMV pair overlap: estimates track true jaccard for planted sets") {
    import spark.implicits._
    import graft.ops.Sketches
    // A = 1..8000, B = 4001..12000 -> |A∩B| = 4000, |A∪B| = 12000,
    // jaccard = 1/3
    val vals = (1 to 8000).map(i => ("A", s"x$i")) ++
      (4001 to 12000).map(i => ("B", s"x$i"))
    val sk = Sketches.kmvSketch(vals.toDF("g", "v"), "g", "v", k = 256)
    val r = Sketches.kmvPairOverlap(sk, "g", k = 256).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getString(0) === "A" && row.getString(1) === "B")
    val (u, i, j) = (row.getLong(2), row.getLong(3), row.getLong(4))
    assert(math.abs(u - 12000L) < 2400L, s"union estimate off: $u")
    assert(math.abs(i - 4000L) < 1600L, s"intersection estimate off: $i")
    assert(math.abs(j - 333333L) < 120000L, s"jaccard estimate off: $j")
    // disjoint pair: intersection and jaccard must be exactly 0
    val d = (1 to 500).map(i => ("C", s"c$i")) ++
      (1 to 500).map(i => ("D", s"d$i"))
    val r2 = Sketches.kmvPairOverlap(
      Sketches.kmvSketch(d.toDF("g", "v"), "g", "v", k = 256), "g", 256)
      .collect().head
    assert(r2.getLong(3) === 0L && r2.getLong(4) === 0L)
    ()
  }
}
