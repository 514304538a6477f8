package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  test("matches a brute-force range predicate on random keyed data") {
    val r = new scala.util.Random(7)
    val pts = Seq.tabulate(400)(i =>
      (i.toLong, r.nextInt(4).toLong, r.nextInt(2000).toLong - 500))
      .toDF("pid", "k", "v")
    val ivsRaw = Seq.tabulate(80) { i =>
      val s = r.nextInt(2000).toLong - 500
      (i.toLong, r.nextInt(4).toLong, s, s + r.nextInt(120))
    }
    val ivs = ivsRaw.toDF("iid", "k", "s", "e")
    val got = RangeJoin.pointInInterval(pts, ivs, "v", "s", "e",
        keyCols = Seq("k"), bucketWidth = 64)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val p = pts.as[(Long, Long, Long)].collect()
    val brute = (for {
      (pid, pk, v) <- p
      (iid, ik, s, e) <- ivsRaw
      if pk == ik && v >= s && v <= e
    } yield (pid, iid)).toSet
    assert(got === brute)
    assert(brute.nonEmpty) // the fixture actually exercises matches
  }

  test("each qualifying pair appears exactly once (no cross-bucket dupes)") {
    val pts = Seq((1L, 100L)).toDF("pid", "v")
    // interval spans 5 buckets of width 50; the point is inside
    val ivs = Seq((9L, 0L, 240L)).toDF("iid", "s", "e")
    val out = RangeJoin.pointInInterval(pts, ivs, "v", "s", "e",
      keyCols = Nil, bucketWidth = 50)
    assert(out.count() === 1)
  }

  test("plan: equi-join on (key, bucket), never a nested loop") {
    val pts = Seq.tabulate(50)(i => (i.toLong, i.toLong % 3, i.toLong * 7))
      .toDF("pid", "k", "v")
    val ivs = Seq.tabulate(10)(i => (i.toLong, i.toLong % 3, i * 30L, i * 30L + 40))
      .toDF("iid", "k", "s", "e")
    val df = RangeJoin.pointInInterval(pts, ivs, "v", "s", "e",
      keyCols = Seq("k"), bucketWidth = 32)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range join planned a nested loop:\n${plan.take(500)}")
  }

  test("an inverted interval (end < start) matches nothing, never explodes") {
    val pts = Seq((1L, 5L)).toDF("pid", "v")
    // end < start by a span that would be millions of DESCENDING
    // buckets if it slipped past the guard into sequence()
    val ivs = Seq((1L, 50000000L, 0L)).toDF("iid", "s", "e")
    val out = RangeJoin.pointInInterval(pts, ivs, "v", "s", "e",
      keyCols = Nil, bucketWidth = 10, maxBucketsPerInterval = 100)
    assert(out.count() === 0) // SQL BETWEEN with start > end: empty
  }

  test("an interval spanning too many buckets fails loudly") {
    val pts = Seq((1L, 5L)).toDF("pid", "v")
    val ivs = Seq((1L, 0L, 10000000L)).toDF("iid", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(pts, ivs, "v", "s", "e",
        keyCols = Nil, bucketWidth = 10, maxBucketsPerInterval = 100).count()
    }
    assert(e.getMessage.contains("buckets") ||
      Option(e.getCause).exists(_.getMessage.contains("buckets")))
  }

  test("negative domain values bucket correctly (floor, not truncate)") {
    val pts = Seq((1L, -75L), (2L, -10L)).toDF("pid", "v")
    val ivs = Seq((1L, -80L, -70L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, ivs, "v", "s", "e",
        keyCols = Nil, bucketWidth = 64)
      .select("pid").as[Long].collect().toSeq
    assert(got === Seq(1L))
  }

  test("colliding payload names are refused") {
    val pts = Seq((1L, 5L)).toDF("pid", "v")
    val ivs = Seq((1L, 0L, 10L)).toDF("pid", "s", "e")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, ivs, "v", "s", "e", Nil, 10)
    }
    assert(e.getMessage.contains("collide"))
  }
}
