package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decade measurement of the `prunedGramIntersections` cache trade-off
  * (test-scope main): the pruned posting list feeds FOUR consumers (df
  * filter, both join sides, per-doc sizes) and ships UNCACHED — the
  * round-13 measurement said codegen fusion beats materialization by
  * ~35% at sf0.1, but that was one decade. This probe times the shipped
  * uncached op against a persist(MEMORY_AND_DISK) variant of the same
  * plan at sf0.01 / sf0.1 / 10x / 100x, so the ship-or-cache decision
  * rests on the decades where the recompute multiplies real work.
  *
  * Run: `sbt "Test/runMain graft.GramCacheProbe [deep]"`.
  */
object GramCacheProbe {

  /** Probe-local copy of the ngramJaccardPairs front half WITH a
    * persist on the pruned posting list — kept here, not as an option
    * on the op, so the shipped plan stays single-shape; if this probe
    * ever flips the decision, the op gains the conditional persist and
    * this copy becomes its regression pin.
    */
  private def cachedJaccard(docs: DataFrame, n: Int, minJaccard: Double,
                            maxDocFreqFraction: Double): Long = {
    import graft.ops.Dedup
    val spread = docs.select(col("doc_id"), col("text"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
    val allGrams = Dedup.explodedShingles(spread, n, "text", "doc_id")
      .select(col("doc_id"), Dedup.h60(col("sh")).as("g"))
      .distinct()
    val nDocs = docs.count()
    val maxDf = (nDocs * maxDocFreqFraction).toLong
    val rare = allGrams.groupBy(col("g"))
      .agg(count(lit(1)).as("df")).filter(col("df") <= maxDf)
      .select("g")
    val grams = allGrams.join(rare, "g")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      val a = grams.select(col("doc_id").as("doc_a"), col("g"))
      val b = grams.select(col("doc_id").as("doc_b"), col("g"))
      val inter = a.join(b, "g").filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
      inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("n_grams", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("n_grams", "size_b"), "doc_b")
        .withColumn("jaccard1e4",
          expr("(n_common * 10000) DIV (size_a + size_b - n_common)"))
        .filter(col("jaccard1e4") >= (minJaccard * 10000).toLong)
        .queryExecution.toRdd.count()
    } finally { grams.unpersist(blocking = true); () }
  }

  def main(args: Array[String]): Unit = {
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MAX", "256"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probeDir = "/tmp/graft-sfprobe"
    ScaleProbe.synthesize(spark, "/root/testdata/sf0.1", probeDir, copies = 10)
    val deep = args.contains("deep")
    val deepDir = "/tmp/graft-sfprobe100"
    if (deep) ScaleProbe.synthesize(spark, "/root/testdata/sf0.1", deepDir,
      copies = 100)
    val dirs = Seq("sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1", "sf1x" -> probeDir) ++
      (if (deep) Seq("sf10x" -> deepDir) else Nil)
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    dirs.foreach { case (name, dir) =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      // warm the source file into the page cache once so both variants
      // measure compute, not first-touch disk
      docs.queryExecution.toRdd.count()
      // the shipped op now persists conditionally ABOVE the threshold
      // this probe measured — disable it for the uncached arm so the
      // probe keeps measuring uncached-vs-cached, not cached-vs-cached
      val prevThreshold = graft.ops.Dedup.gramCacheThresholdDocs
      graft.ops.Dedup.gramCacheThresholdDocs = Long.MaxValue
      val tU = try time {
        graft.ops.Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.3,
          maxDocFreqFraction = 0.02).queryExecution.toRdd.count()
      } finally graft.ops.Dedup.gramCacheThresholdDocs = prevThreshold
      val tC = time {
        cachedJaccard(docs, n = 3, minJaccard = 0.3,
          maxDocFreqFraction = 0.02)
      }
      println(f"GRAMCACHE $name uncached=$tU%.2f cached=$tC%.2f " +
        f"ratio=${tC / tU}%.2f")
    }
    spark.stop()
  }
}
