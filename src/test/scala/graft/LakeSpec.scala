package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lake.Lake

class LakeSpec extends SparkSpec {
  import spark.implicits._

  test("withMeta injects partition/timestamp/year/month/day (F4)") {
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-03-05 10:00:00")))
      .toDF("k", "ts")
    val out = Lake.withMeta(df, lit(3), col("ts")).select("meta.*").head()
    assert(out.getAs[Int]("partition") === 3)
    assert(out.getAs[Int]("year") === 2024)
    assert(out.getAs[Int]("month") === 3)
    assert(out.getAs[Int]("day") === 5)
  }

  test("normalize flattens nested structs with separator (F6)") {
    val df = Seq((1L, ("x", (2.5, "y")))).toDF("id", "a")
      .select(col("id"), col("a._1").as("s"),
        struct(col("a._2._1").as("f"), col("a._2._2").as("g")).as("n"))
    val out = Lake.normalize(df.select(col("id"), struct(col("s"), col("n")).as("v")), "_")
    assert(out.columns.toSeq === Seq("id", "v_s", "v_n_f", "v_n_g"))
  }

  test("withGenerated evaluates SQL exprs incl. struct dot access (F5)") {
    val df = Seq((java.sql.Timestamp.valueOf("2024-03-05 10:00:00"), 12.3))
      .toDF("ts", "v")
      .select(struct(col("ts").as("timestamp")).as("meta"), col("v"))
    val out = Lake.withGenerated(df, Map(
      "date" -> "cast(meta.timestamp as date)",
      "bucket" -> "cast(floor(v / 10) as int)"))
    val r = out.head()
    assert(r.getAs[java.sql.Date]("date").toString === "2024-03-05")
    assert(r.getAs[Int]("bucket") === 1)
  }

  test("alignSchema adds missing table columns as nulls (SO3)") {
    val batch = Seq((1L, "a")).toDF("id", "x")
    val tableSchema = StructType(Seq(
      StructField("id", LongType), StructField("x", StringType),
      StructField("added_later", DoubleType)))
    val out = Lake.alignSchema(batch, tableSchema)
    assert(out.columns.contains("added_later"))
    assert(out.head().isNullAt(out.columns.indexOf("added_later")))
  }

  test("zorderKey clusters both dimensions (T9)") {
    val df = spark.range(256).select(
      (col("id") % 16).as("x"), (col("id") / 16).cast("long").as("y"))
    val keyedDf = df.withColumn("z", Lake.zorderKey(df, Seq("x", "y"), 4))
    // the key must be pure map-side arithmetic: no window, no
    // single-partition funnel in the plan (the old ntile-over-global-
    // window form moved the whole table through one partition)
    val plan = keyedDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert(!plan.contains("SinglePartition"))
    val keyed = keyedDf.orderBy("z").collect()
    // points adjacent in z-order should be near in (x, y): max step bounded
    val steps = keyed.sliding(2).map { w =>
      math.abs(w(1).getAs[Long]("x") - w(0).getAs[Long]("x")) +
        math.abs(w(1).getAs[Long]("y") - w(0).getAs[Long]("y"))
    }.toSeq
    // average step in manhattan distance stays small vs random ordering (~10)
    assert(steps.sum.toDouble / steps.size < 4.0)
  }

  test("optimize sizes the rewrite from real bytes, not file count (T9)") {
    val path = java.nio.file.Files.createTempDirectory("graft-lakeopt")
      .toString + "/t"
    // 64 tiny files, well under 1 MB total: the old files×32MB estimate
    // would have planned a 2048-way rewrite of a sub-megabyte table
    spark.range(1000).repartition(64).write.parquet(path)
    Lake.optimize(spark, path, partitionCols = Nil, targetFileMB = 1)
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
    val outFiles = try s.iterator().asScala
      .count(_.toString.endsWith(".parquet")) finally s.close()
    assert(outFiles <= 2, s"tiny table rewritten into $outFiles files")
    assert(spark.read.parquet(path).count() === 1000)
  }

  test("co-bucketed tables join with zero Exchange") {
    import spark.implicits._
    val facts = (0 until 2000).map(i => (i.toLong % 97, i.toLong, i * 2.5))
      .toDF("k", "seq", "amount")
    val dims = (0 until 500).map(i => (i.toLong % 97, s"name$i"))
      .toDF("k", "name")
    Lake.writeBucketed(facts, "bk_facts", Seq("k"), nBuckets = 8,
      sortCols = Seq("k"))
    Lake.writeBucketed(dims, "bk_dims", Seq("k"), nBuckets = 8,
      sortCols = Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the SMJ path: broadcast would hide the layout win
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bk_facts").join(spark.table("bk_dims"), "k")
      val expect = facts.join(dims, "k").count()
      assert(joined.count() === expect)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange"),
        s"co-bucketed join still shuffled:\n${plan.take(600)}")
      // the per-bucket Sort stays (SPARK-28595: file order untrusted by
      // default); the scan must still be bucket-aware on both sides
      assert("Bucketed: true".r.findAllIn(plan).size === 2, plan.take(600))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_facts")
      spark.sql("DROP TABLE IF EXISTS bk_dims")
    }
  }
}
