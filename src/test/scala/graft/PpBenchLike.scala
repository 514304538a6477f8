package graft

import org.apache.spark.sql.SparkSession

/** Replicates the bench's exact environment for q_ppjoin, printing
  * PER-RUN times (the bench prints only the median). Test scope.
  */
object PpBenchLike {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
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
    // warm-up pass at sf0.001 exactly like the bench
    SparkEntry.queries("q_ppjoin")(spark, "/root/testdata/sf0.001")
      .queryExecution.toRdd.count()
    println("[ppb] warmup done")
    for (r <- 1 to 5) {
      val t0 = System.nanoTime()
      SparkEntry.queries("q_ppjoin")(spark, "/root/testdata/sf0.1")
        .queryExecution.toRdd.count()
      println(f"[ppb] run $r ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        s"(persisted=${spark.sparkContext.getPersistentRDDs.size})")
    }
    spark.stop()
  }
}
