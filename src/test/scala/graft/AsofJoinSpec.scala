package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  // quotes/trades fixture: state rows (quotes) and probe rows (trades)
  private lazy val quotes = Seq(
    // key, ts, px
    (1L, 10L, 100.0), (1L, 20L, 101.0), (1L, 30L, 102.0),
    (2L, 15L, 200.0),
    (3L, 99L, 300.0)
  ).toDF("k", "qts", "px")
    .withColumn("qts", timestamp_micros(col("qts") * 1000000L))

  private lazy val trades = Seq(
    (1L, 5L), (1L, 10L), (1L, 25L), (1L, 30L), (1L, 40L),
    (2L, 14L), (2L, 16L),
    (4L, 50L)
  ).toDF("k", "tts")
    .withColumn("trade_id", monotonically_increasing_id())
    .withColumn("tts", timestamp_micros(col("tts") * 1000000L))

  private def carriedPx(df: DataFrame): Map[(Long, Long), Option[Double]] =
    df.collect().map { r =>
      (r.getAs[Long]("k"),
        r.getAs[java.sql.Timestamp]("tts").getTime / 1000L) ->
        Option(r.getAs[Any]("px")).map(_.asInstanceOf[Double])
    }.toMap

  test("backward as-of carries the latest quote at or before each trade") {
    val out = carriedPx(
      AsofJoin.asofBackward(trades, quotes, Seq("k"), "tts", "qts"))
    assert(out((1L, 5L)) === None) // before any quote
    assert(out((1L, 10L)) === Some(100.0)) // equal ts matches
    assert(out((1L, 25L)) === Some(101.0))
    assert(out((1L, 30L)) === Some(102.0))
    assert(out((1L, 40L)) === Some(102.0)) // carried past last quote
    assert(out((2L, 14L)) === None)
    assert(out((2L, 16L)) === Some(200.0))
    assert(out((4L, 50L)) === None) // key with no state at all
  }

  test("strict backward excludes the equal-timestamp state row") {
    val out = carriedPx(AsofJoin.asofBackward(
      trades, quotes, Seq("k"), "tts", "qts", allowEqual = false))
    assert(out((1L, 10L)) === None) // the 10-ts quote no longer matches
    assert(out((1L, 30L)) === Some(101.0)) // falls back to the prior one
    assert(out((1L, 40L)) === Some(102.0)) // strictly-before still carries
  }

  test("forward as-of finds the earliest quote at or after each trade") {
    val out = carriedPx(
      AsofJoin.asofForward(trades, quotes, Seq("k"), "tts", "qts"))
    assert(out((1L, 5L)) === Some(100.0))
    assert(out((1L, 30L)) === Some(102.0)) // equal ts matches
    assert(out((1L, 40L)) === None) // nothing after
    assert(out((2L, 14L)) === Some(200.0))
    assert(out((4L, 50L)) === None)
    val strict = carriedPx(AsofJoin.asofForward(
      trades, quotes, Seq("k"), "tts", "qts", allowEqual = false))
    assert(strict((1L, 30L)) === None) // equal-ts quote excluded, none after
    assert(strict((1L, 10L)) === Some(101.0)) // skips the equal, takes next
  }

  test("tolerance voids matches farther than the window, keeps the row") {
    val out = carriedPx(AsofJoin.asofBackward(
      trades, quotes, Seq("k"), "tts", "qts",
      toleranceMs = Some(5000L))) // 5 s
    assert(out((1L, 25L)) === Some(101.0)) // 5 s gap: inside
    assert(out((1L, 40L)) === None) // 10 s gap: voided
    val n = AsofJoin.asofBackward(trades, quotes, Seq("k"), "tts", "qts",
      toleranceMs = Some(5000L)).count()
    assert(n === trades.count()) // left-outer: every trade kept
  }

  test("matches a brute-force range-join oracle on random data") {
    val r = new scala.util.Random(42)
    val st = Seq.tabulate(300)(i =>
      (r.nextInt(5).toLong, r.nextInt(1000).toLong, i.toDouble))
      .distinct
      // unique state per (key, ts) — the documented as-of contract
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      .toDF("k", "sts", "v")
    val pr = Seq.tabulate(200)(i =>
      (r.nextInt(6).toLong, r.nextInt(1000).toLong, i.toLong))
      .toDF("k", "pts", "id")
    val got = AsofJoin.asofBackward(pr, st, Seq("k"), "pts", "sts")
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    val brute = pr.as[(Long, Long, Long)].collect().map { case (k, pts, id) =>
      val cand = st.as[(Long, Long, Double)].collect()
        .filter(s => s._1 == k && s._2 <= pts)
      id -> (if (cand.isEmpty) None
             else Some(cand.maxBy(_._2)._3))
    }.toMap
    assert(got === brute)
  }

  test("NULL payload on the matched state row stays NULL (no stitching)") {
    // the ts=20 quote has px=NULL; a per-column carry would "fill" it
    // from the ts=10 row — the row-wise ASOF contract says NULL
    val q = Seq((1L, 10L, Some(100.0)), (1L, 20L, None))
      .toDF("k", "qts", "px")
      .withColumn("qts", timestamp_micros(col("qts") * 1000000L))
    val t = Seq((1L, 25L)).toDF("k", "tts")
      .withColumn("tts", timestamp_micros(col("tts") * 1000000L))
    val out = AsofJoin.asofBackward(t, q, Seq("k"), "tts", "qts").collect()
    assert(out.length === 1 && out(0).isNullAt(out(0).fieldIndex("px")))
    // and a tolerance measured against the MATCHED row's ts: the ts=20
    // match is 5 s away (inside), even though its payload is NULL
    val tol = AsofJoin.asofBackward(t, q, Seq("k"), "tts", "qts",
      toleranceMs = Some(6000L)).collect()
    assert(tol(0).isNullAt(tol(0).fieldIndex("px")))
  }

  test("NULL-ts state rows are dropped; NULL-ts probes match nothing") {
    val q = Seq((1L, Option(10L), 100.0), (1L, Option.empty[Long], 999.0))
      .toDF("k", "qts", "px")
      .withColumn("qts", timestamp_micros(col("qts") * 1000000L))
    val t = Seq((1L, Option(25L)), (1L, Option.empty[Long]))
      .toDF("k", "tts")
      .withColumn("tts", timestamp_micros(col("tts") * 1000000L))
    val out = AsofJoin.asofBackward(t, q, Seq("k"), "tts", "qts")
      .collect().map(r => Option(r.getAs[java.sql.Timestamp]("tts")).map(_.getTime) ->
        (if (r.isNullAt(r.fieldIndex("px"))) None else Some(r.getDouble(r.fieldIndex("px")))))
      .toMap
    assert(out(Some(25000L)) === Some(100.0)) // never the NULL-ts 999 row
    assert(out(None) === None) // NULL-ts probe kept, unmatched
  }

  test("state payload colliding with a probe column is refused") {
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(trades, quotes.withColumnRenamed("px", "trade_id"),
        Seq("k"), "tts", "qts")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("plan: one hash exchange per side on the key, no join operator") {
    val df = AsofJoin.asofBackward(trades, quotes, Seq("k"), "tts", "qts")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"),
      s"as-of planned a join:\n${plan.take(600)}")
    assert(!plan.contains("SinglePartition"),
      "as-of window lost its key partitioning")
    assert(plan.contains("Window"), plan.take(400))
  }
}
