package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the
  * before/after plan evidence for optimization rounds. Test scope: a
  * measurement tool, not a driver surface.
  *
  *   PLAN_QUERIES=q_a,q_b PLAN_SUFFIX=before PLAN_DIR=plans/r15 \
  *     sbt "Test/runMain graft.PlanDump"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MAX", "256"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.silenceExpectedWindowWarnings()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("PLAN_DIR", "plans/r15")
    val suffix = sys.env.getOrElse("PLAN_SUFFIX", "before")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = sys.env.getOrElse("PLAN_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      // executedPlan AFTER an action so AQE finalizes join strategies
      df.queryExecution.toRdd.count()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val finalPlan = df.queryExecution.executedPlan.toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        s"== $name ($suffix, sf=$dir) ==\n\n" + formatted +
          "\n\n== AQE final executed plan ==\n\n" + finalPlan + "\n")
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
