package graft
import org.apache.spark.sql.SparkSession
/** Simulates the driver's smoke-check: plain session, no custom configs. */
object EntryProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    val df = SparkEntry.entry(s)
    println("ENTRY_ROWS=" + df.count())
    println("ENTRY_COLS=" + df.columns.sorted.mkString(","))
    s.stop()
  }
}
