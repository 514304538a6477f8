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
      .select(col("doc_id"), col("g"), col("sz"), col("__rk"))
    val pc = prefix.persist()
    time("prefix window")(println("  prefix rows " + pc.count()))
    val cand = pc.select(col("doc_id").as("doc_a"), col("g"),
        col("sz").as("size_a"), col("__rk").as("__ra"))
      .join(pc.select(col("doc_id").as("doc_b"), col("g"),
        col("sz").as("size_b"), col("__rk").as("__rb")), "g")
      .filter(col("doc_a") < col("doc_b"))
      .filter(least(col("size_a"), col("size_b")) * 1000000L >=
        greatest(col("size_a"), col("size_b")) * tauE6)
      .groupBy(col("doc_a"), col("doc_b"), col("size_a"), col("size_b"))
      .agg(count(lit(1)).as("__c"),
        max(col("__ra")).as("__pa"), max(col("__rb")).as("__pb"))
    val candAll = cand.persist()
    time("cand agg (pre-pos)")(println("  cand rows " + candAll.count()))
    val candP = candAll
      .filter((col("__c") +
          least(col("size_a") - col("__pa"), col("size_b") - col("__pb")))
        * lit(1000000L + tauE6) >=
        (col("size_a") + col("size_b")) * tauE6)
      .persist()
    time("positional filter")(println("  pos-kept rows " + candP.count()))
    val arrs = grams.join(df, "g").groupBy(col("doc_id"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(__df, g))), x -> x.g)")
        .as("__gs"))
    time("arrs agg")(arrs.queryExecution.toRdd.count())
    val out = candP
      .join(broadcast(arrs.select(col("doc_id").as("doc_a"),
        col("__gs").as("__ga"))), "doc_a")
      .join(broadcast(arrs.select(col("doc_id").as("doc_b"),
        col("__gs").as("__gb"))), "doc_b")
      .withColumn("n_common",
        (col("__c") + size(array_intersect(
          slice(col("__ga"), col("__pa") + 1,
            greatest(col("size_a") - col("__pa"), lit(0L)).cast("int")),
          slice(col("__gb"), col("__pb") + 1,
            greatest(col("size_b") - col("__pb"), lit(0L)).cast("int")))))
          .cast("long"))
      .withColumn("j_e6",
        expr("(n_common * 1000000) DIV (size_a + size_b - n_common)"))
      .filter(col("j_e6") >= tauE6)
    time("verify")(println("  out rows " + out.count()))
    for (r <- 1 to 5) {
      time(s"whole op, run $r")(
        Dedup.prefixFilteredJaccard(docs, 3, 350000L)
          .queryExecution.toRdd.count())
      val rdds = spark.sparkContext.getPersistentRDDs
      val mem = spark.sparkContext.getExecutorMemoryStatus.values.head
      println(s"  persisted RDDs: ${rdds.size}, block mem free " +
        s"${mem._2 / 1024 / 1024} / ${mem._1 / 1024 / 1024} MB")
    }
    spark.stop()
  }
}
