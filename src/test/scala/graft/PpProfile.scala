package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scratch profiler for prefixFilteredJaccard's stages (test scope). */
object PpProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.silenceExpectedWindowWarnings()
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pp] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // warm
    docs.count()
    val n = 3; val tauE6 = 350000L
    val spread = docs.select(col("doc_id"), col("text"))
      .repartition(32)
    val grams = Dedup.explodedShingles(spread, n, "text", "doc_id")
      .select(col("doc_id"), Dedup.h60(col("sh")).as("g"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("grams materialize")(grams.count())
    val df = grams.groupBy(col("g")).agg(count(lit(1)).as("__df"))
    time("df agg")(df.queryExecution.toRdd.count())
    val wPrefix = Window.partitionBy(col("doc_id"))
      .orderBy(col("__df"), col("g"))
    val wDoc = Window.partitionBy(col("doc_id"))
    val prefix = grams.join(df, "g")
      .withColumn("__rk", row_number().over(wPrefix))
      .withColumn("sz", count(lit(1)).over(wDoc))
      .filter(col("__rk") <=
        col("sz") - expr(s"($tauE6 * sz + 999999) DIV 1000000") + 1)
      .select(col("doc_id"), col("g"), col("sz"))
    val pc = prefix.persist()
    time("prefix window")(println("  prefix rows " + pc.count()))
    val cand = pc.select(col("doc_id").as("doc_a"), col("g"),
        col("sz").as("size_a"))
      .join(pc.select(col("doc_id").as("doc_b"), col("g"),
        col("sz").as("size_b")), "g")
      .filter(col("doc_a") < col("doc_b"))
      .filter(least(col("size_a"), col("size_b")) * 1000000L >=
        greatest(col("size_a"), col("size_b")) * tauE6)
      .select("doc_a", "doc_b", "size_a", "size_b")
    time("cand join raw")(println("  raw cand rows " + cand.count()))
    val candD = cand.distinct().persist()
    time("cand distinct")(println("  cand rows " + candD.count()))
    val arrs = grams.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("g"))).as("__gs"))
    time("arrs agg")(arrs.queryExecution.toRdd.count())
    val out = candD
      .join(arrs.select(col("doc_id").as("doc_a"), col("__gs").as("__ga")),
        "doc_a")
      .join(arrs.select(col("doc_id").as("doc_b"), col("__gs").as("__gb")),
        "doc_b")
      .withColumn("n_common",
        size(array_intersect(col("__ga"), col("__gb"))).cast("long"))
      .withColumn("j_e6",
        expr("(n_common * 1000000) DIV (size_a + size_b - n_common)"))
      .filter(col("j_e6") >= tauE6)
    time("verify")(println("  out rows " + out.count()))
    time("whole op, fresh")(
      Dedup.prefixFilteredJaccard(docs, 3, 350000L)
        .queryExecution.toRdd.count())
    time("whole op, again")(
      Dedup.prefixFilteredJaccard(docs, 3, 350000L)
        .queryExecution.toRdd.count())
    spark.stop()
  }
}
