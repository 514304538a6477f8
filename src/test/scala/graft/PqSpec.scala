package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Product quantization: codebook shape, encode/ADC exactness against a
  * by-hand replay, and the no-shuffle plan contract.
  */
class PqSpec extends SparkSpec {

  import spark.implicits._

  private val Dims = 64
  private lazy val embs = Tables.load(spark, sf, "embeddings").cache()

  test("codebooks: m books, <= ksub sorted centroids of dims/m each") {
    val books = Similarity.pqCodebooks(embs, m = 4, ksub = 8, iters = 1)
    assert(books.length === 4)
    books.foreach { b =>
      assert(b.nonEmpty && b.size <= 8)
      assert(b.map(_._1) === b.map(_._1).sorted)
      assert(b.forall(_._2.length === Dims / 4))
      assert(b.map(_._1).forall(cid => cid >= 0 && cid < 8))
    }
  }

  test("encode: m codes per vector, all inside the codebook domain") {
    val books = Similarity.pqCodebooks(embs, m = 4, ksub = 8, iters = 1)
    val valid = books.map(_.map(_._1).toSet)
    val codes = Similarity.pqEncode(embs, books)
      .select("code").as[Seq[Long]].collect()
    assert(codes.length === embs.count())
    codes.foreach { c =>
      assert(c.length === 4)
      c.zipWithIndex.foreach { case (cid, i) => assert(valid(i)(cid)) }
    }
  }

  test("ADC equals the by-hand reconstruction distance for every row") {
    val books = Similarity.pqCodebooks(embs, m = 4, ksub = 8, iters = 2)
    val sub = Dims / 4
    // quantized corpus + codes, replayed driver-side
    val q = embs.select(col("vec_id"), Similarity.quantize(col("embedding")))
      .as[(Long, Seq[Long])].collect().toMap
    val codes = Similarity.pqEncode(embs, books)
      .as[(Long, Seq[Long])].collect().toMap
    val query = q(0L)
    def expectedAdc(id: Long): Long =
      (0 until 4).map { i =>
        val cen = books(i).find(_._1 == codes(id)(i)).get._2
        (0 until sub).map { j =>
          val d = query(i * sub + j) - cen(j); d * d
        }.sum
      }.sum
    // the operator's k = N top list IS the full ADC table
    val got = Similarity.pqSearchAdc(embs, books, queryId = 0L,
      k = q.size).as[(Long, Long)].collect().toMap
    assert(got.size === q.size - 1 && !got.contains(0L))
    got.foreach { case (id, adc) => assert(adc === expectedAdc(id), s"id=$id") }
  }

  test("identical vectors share codes; ADC is zero for the query's twin") {
    // 8 distinct orthogonal-ish vectors duplicated: Lloyd converges to
    // the vectors themselves, so the twin reconstructs exactly
    val base = (0 until 8).map(v =>
      Array.tabulate(Dims)(j => if (j % 8 == v) 0.5f else 0.01f * v))
    val rows = (0 until 16).map(i => (i.toLong, base(i % 8)))
    val df = rows.toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(df, m = 4, ksub = 8, iters = 2)
    val codes = Similarity.pqEncode(df, books)
      .as[(Long, Seq[Long])].collect().toMap
    (0 until 8).foreach(v => assert(codes(v.toLong) === codes(v.toLong + 8)))
    val top = Similarity.pqSearchAdc(df, books, queryId = 0L, k = 1)
      .as[(Long, Long)].collect()
    assert(top === Array((8L, 0L))) // the twin at ADC 0
  }

  test("plan: encode is a narrow map; search adds only the top-k, no join") {
    val books = Similarity.pqCodebooks(embs, m = 4, ksub = 8, iters = 0)
    val enc = Similarity.pqEncode(embs, books)
    enc.collect()
    val encPlan = enc.queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange"),
      s"pqEncode shuffled:\n${encPlan.take(400)}")
    val search = Similarity.pqSearchAdc(embs, books, queryId = 0L, k = 10)
    search.collect()
    val sPlan = search.queryExecution.executedPlan.toString
    assert(!sPlan.contains("Join") && !sPlan.contains("CartesianProduct"),
      s"ADC planned a join:\n${sPlan.take(400)}")
    assert(sPlan.contains("TakeOrderedAndProject"), sPlan.take(400))
  }

  test("IVF-PQ: duplicated corpus reconstructs exactly — the twin lands at 0") {
    // 8 distinct vectors duplicated: residual codebooks converge to the
    // residuals themselves, so ADC distances are EXACT squared
    // distances and the query's twin is the unambiguous top-1
    val base = (0 until 8).map(v =>
      Array.tabulate(Dims)(j => if (j % 8 == v) 0.5f else 0.01f * v))
    val df = (0 until 16).map(i => (i.toLong, base(i % 8)))
      .toDF("vec_id", "embedding")
    val top = Similarity.annIvfPq(df, queryId = 0L, k = 1,
      nCells = 4, nProbe = 4)
      .select("vec_id", "adc").as[(Long, Long)].collect()
    assert(top === Array((8L, 0L)))
  }

  test("IVF-PQ on real embeddings: k sorted rows, query excluded, cells probed") {
    val out = Similarity.annIvfPq(embs, queryId = 0L, k = 10,
      nCells = 4, nProbe = 2).collect()
    assert(out.length === 10)
    assert(!out.exists(_.getLong(0) === 0L))
    val adcs = out.map(_.getLong(2)).toSeq
    assert(adcs === adcs.sorted)
    assert(out.map(_.getLong(1)).distinct.length <= 2) // ≤ nProbe cells
    // narrowing the probe can only lose candidates, never invent them
    val one = Similarity.annIvfPq(embs, queryId = 0L, k = 10,
      nCells = 4, nProbe = 1).collect()
    assert(one.map(_.getLong(1)).distinct.length === 1)
    val twoCells = out.map(r => (r.getLong(1))).toSet
    assert(one.map(_.getLong(1)).toSet.subsetOf(twoCells) ||
      one.isEmpty)
  }

  test("rerank: exact cosine over the shortlist only, broadcast back-join") {
    val out = Similarity.annIvfPqRerank(embs, queryId = 0L, k = 10,
      shortlist = 40)
    val rows = out.collect()
    assert(rows.length === 10 && !rows.exists(_.getLong(0) === 0L))
    val cos = rows.map(_.getDouble(1)).toSeq
    assert(cos === cos.sorted.reverse) // exact-cosine order, descending
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"),
      s"rerank shuffled the corpus:\n${plan.take(500)}")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
  }

  test("bad subspace split is refused") {
    intercept[IllegalArgumentException] {
      Similarity.pqCodebooks(embs, m = 5, ksub = 8, iters = 1)
    }
  }

  test("at-rest index: model round-trips; index serve is row-identical " +
    "to the train-and-search path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-idx")
      .toString
    Similarity.ivfPqIndexWrite(embs, dir, nCells = 4, m = 4, ksub = 8,
      iters = 2)
    val model = Similarity.ivfPqModelRead(spark, dir)
    assert(model.dims === Dims && model.m === 4 && model.sub === Dims / 4)
    assert(model.coarse.nonEmpty && model.coarse.size <= 4)
    assert(model.books.forall(b => b.nonEmpty && b.size <= 8))
    // the stored model IS the trained model, bit for bit
    val trained = Similarity.ivfPqTrain(embs, nCells = 4, m = 4, ksub = 8,
      iters = 2)
    assert(model.coarse === trained.coarse)
    assert(model.books === trained.books)

    val direct = Similarity.annIvfPq(embs, queryId = 0L, k = 10,
      nCells = 4, nProbe = 2, m = 4, ksub = 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val q = embs.filter(col("vec_id") === 0L)
      .select(Similarity.quantize(col("embedding"))).as[Seq[Long]].head()
    val served = Similarity.ivfPqTopKOverIndex(spark, dir, q, k = 10,
      nProbe = 2, excludeId = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(served === direct,
      "at-rest serve must reproduce the direct search row for row")
  }
}
