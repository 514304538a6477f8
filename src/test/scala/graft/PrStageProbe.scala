package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: per-stage task counts inside the pageRank loop
  * (test scope).
  */
object PrStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.silenceExpectedWindowWarnings()
    @volatile var show = false
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStart.put(j.jobId, (System.nanoTime(),
            Option(j.properties).map(_.getProperty("callSite.short", "?"))
              .getOrElse("?")))
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, site) = jobStart.getOrDefault(j.jobId, (0L, "?"))
          if (show)
            println(f"[jb] job ${j.jobId}%3d ${(System.nanoTime()-t0)/1e6}%8.1f ms  $site")
        }
      })
    val d = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val n = d.count()
    val edges = d
      .select(col("doc_id").as("src"),
        explode(sequence(lit(1), lit(3))).as("j"))
      .select(col("src"),
        ((col("src") * 31 + col("j") * 7 + 1) % n).as("dst"))
    for (_ <- 1 to 2)
      graft.ops.Graph.pageRank(edges, iters = 5)
        .queryExecution.toRdd.count()
    show = true
    println("[st] ==== pageRank starts ====")
    val t0 = System.nanoTime()
    graft.ops.Graph.pageRank(edges, iters = 5)
      .queryExecution.toRdd.count()
    println(f"[st] ==== pageRank done ${(System.nanoTime()-t0)/1e9}%.2f s ====")
    spark.stop()
  }
}
