package graft
import org.apache.spark.sql.SparkSession
/** Plan-quality probe: verifies scan pushdown/pruning and join strategy
  * choices on the headline queries. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def plan(name: String) = {
      val p = SparkEntry.queries(name)(s, dir).queryExecution.executedPlan.toString
      println(s"=== $name")
      println("  broadcasts=" + "BroadcastHashJoin".r.findAllIn(p).length +
        " smj=" + "SortMergeJoin".r.findAllIn(p).length +
        " shuffles=" + "Exchange hashpartitioning".r.findAllIn(p).length)
      p.split('\n').filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .take(4).foreach(l => println("  " + l.trim.take(160)))
    }
    sys.env.get("PROBE_QUERIES").map(_.split(",").toSeq).getOrElse(Seq("q5_nation_revenue", "q3_top_revenue", "q_fetch_budget", "q1_pricing_summary")).foreach(plan)
    s.stop()
  }
}
