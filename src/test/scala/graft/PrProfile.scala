package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the pageRank loop (test scope). */
object PrProfile {
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
    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    val taskCount = new java.util.concurrent.atomic.AtomicInteger
    val taskMillis = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCount.incrementAndGet()
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          taskCount.incrementAndGet()
          if (t.taskInfo != null)
            taskMillis.addAndGet(t.taskInfo.duration)
        }
      })
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val j0 = jobCount.get; val k0 = taskCount.get
      val m0 = taskMillis.get
      val r = f
      println(f"[pr] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        s"(jobs ${jobCount.get - j0}, tasks ${taskCount.get - k0}, " +
        s"taskSec ${(taskMillis.get - m0) / 1000.0})")
      r
    }
    // warm-up like the bench
    SparkEntry.queries("q_pagerank")(spark, "/root/testdata/sf0.001")
      .queryExecution.toRdd.count()
    println("[pr] warmup done")
    for (r <- 1 to 3) {
      time(s"q_pagerank run $r")(
        SparkEntry.queries("q_pagerank")(spark, "/root/testdata/sf0.1")
          .queryExecution.toRdd.count())
    }
    // piecewise: edges build vs loop
    val d = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val n = time("docs count")(d.count())
    val edges = d
      .select(col("doc_id").as("src"),
        explode(sequence(lit(1), lit(3))).as("j"))
      .select(col("src"),
        ((col("src") * 31 + col("j") * 7 + 1) % n).as("dst"))
    time("edges noop")(
      edges.write.format("noop").mode("overwrite").save())
    time("pageRank loop only")(
      graft.ops.Graph.pageRank(edges, iters = 5)
        .queryExecution.toRdd.count())
    for (r <- 1 to 3) {
      time(s"loop run $r")(
        graft.ops.Graph.pageRank(edges, iters = 5)
          .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
