package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: does SessionBridge.transplant re-root execution conf?
  * (test scope)
  */
object SessProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.graftshim.SessionBridge
    val df = spark.range(100000).select(col("id") % 97 as "k")
    val child = SessionBridge.childSessionLike(spark)
    child.conf.set("spark.sql.shuffle.partitions", "2")
    child.conf.set("spark.sql.adaptive.enabled", "false")
    val t = SessionBridge.transplant(df, child)
    println("[sp] parent session id " + System.identityHashCode(df.sparkSession))
    println("[sp] child  session id " + System.identityHashCode(child))
    println("[sp] transp session id " + System.identityHashCode(t.sparkSession))
    val agg = t.groupBy("k").count()
    val parts = agg.queryExecution.toRdd.getNumPartitions
    println(s"[sp] child-agg partitions = $parts (want 2)")
    val aggP = df.groupBy("k").count()
    println(s"[sp] parent-agg partitions = ${aggP.queryExecution.toRdd.getNumPartitions} (AQE plan, initial 64)")
    // cache survival across the hop
    val c = df.groupBy("k").count().cache()
    c.count()
    val tc = SessionBridge.transplant(c, child)
    val plan = tc.queryExecution.executedPlan.toString
    println("[sp] cache hit across hop = " + plan.contains("InMemoryTableScan"))
    spark.stop()
  }
}
