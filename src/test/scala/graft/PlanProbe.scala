package graft

/** Ad-hoc perf probe (not a test; run via Test/runMain): times one query
  * twice (cold + warm) and prints its executed plan.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("q_dedup_ngram")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("plan-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"RUN$i rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    println("PLAN_START")
    println(df.queryExecution.executedPlan.toString.take(8000))
    println("PLAN_END")
    spark.stop()
  }
}
