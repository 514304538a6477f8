package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextAnalysis}

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents").cache()

  test("shingles: short docs produce empty arrays, not reversed sequences") {
    val df = Seq((1L, "one two"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).isEmpty)
    assert(out(2L) === Seq("a b c", "b c d"))
  }

  test("exactGroups: all docs distinct => every group size 1") {
    val g = Dedup.exactGroups(docs)
    assert(g.count() === docs.count())
    assert(g.filter(col("n_copies") > 1).count() === 0)
  }

  test("exactGroups: duplicated content collapses to one group") {
    val dup = docs.limit(5).union(docs.limit(5).withColumn("doc_id", col("doc_id") + 1000))
    val g = Dedup.exactGroups(dup)
    assert(g.count() === 5)
    assert(g.filter(col("n_copies") === 2).count() === 5)
    // canonical is the min id (the original, not the +1000 copy)
    assert(g.filter(col("canonical_id") >= 1000).count() === 0)
  }

  test("minhash LSH finds the planted near-duplicate") {
    // plant a near-dup: copy doc 0 with one word changed
    val base = docs.filter(col("doc_id") === 0)
    val nearDup = base.withColumn("doc_id", lit(9999L))
      .withColumn("text", concat(col("text"), lit(" extra")))
    val sig = Dedup.minhashSignatures(docs.union(nearDup), 8, 3)
    val pairs = Dedup.lshCandidatePairs(sig, 8, 2)
    assert(pairs.filter(col("doc_a") === 0 && col("doc_b") === 9999).count() === 1)
  }

  test("simhash of identical docs is identical; hamming 0") {
    val two = docs.limit(1).union(docs.limit(1).withColumn("doc_id", lit(777L)))
    val sk = Dedup.simhash(two)
    val pairs = Dedup.simhashPairs(sk, maxHamming = 0)
    assert(pairs.count() === 1)
    assert(pairs.head().getAs[Long]("hamming") === 0L)
  }

  test("cosine: vector with itself is 1.0; top-k is ordered desc") {
    val e = Tables.load(spark, sf, "embeddings")
    val self = e.select(Similarity.cosineQ(
      Similarity.quantize(col("embedding")),
      Similarity.quantize(col("embedding"))).as("c"))
    assert(self.agg(min("c"), max("c")).head().toSeq
      .forall(v => math.abs(v.asInstanceOf[Double] - 1.0) < 1e-12))
    val top = Similarity.cosineTopK(e, 0L, 10).collect().map(_.getAs[Double]("cosine_r"))
    assert(top.sameElements(top.sorted.reverse))
  }

  test("annBucketed results are a subset of brute-force candidates' cell") {
    val e = Tables.load(spark, sf, "embeddings")
    val ann = Similarity.annBucketed(e, 0L, 5, 3)
    val cells = ann.select("cell").distinct().collect()
    assert(cells.length === 1) // all hits in the query's cell
  }

  test("text stats: counts are consistent") {
    val st = TextAnalysis.stats(docs).select("doc_id", "n_tokens", "n_chars_m").collect()
    st.foreach { r => assert(r.getAs[Int]("n_tokens") > 0) }
  }

  test("qualityScore bounded 0..4 and keep = quality>=3") {
    val q = TextAnalysis.qualityScore(docs)
    assert(q.filter(col("quality") < 0 || col("quality") > 4).count() === 0)
    assert(q.filter(col("keep") =!= (col("quality") >= 3)).count() === 0)
  }

  test("languageId picks a language with marker hits or 'und'") {
    val l = TextAnalysis.languageId(docs)
    assert(l.filter(col("predicted_lang") === "und" && col("score_en") > 0).count() === 0)
  }
}
