package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup
object HashProfile {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
    docs.count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    val sh = docs.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
    time("explode_only")(sh.count())
    time("explode+md5")(sh.withColumn("h", md5(col("sh").cast("binary"))).filter(col("h").isNotNull).count())
    time("explode+h60(conv)")(sh.withColumn("h", Dedup.h60(col("sh"))).filter(col("h") > 0).count())
    time("explode+xxhash64")(sh.withColumn("h", xxhash64(col("sh"))).filter(col("h").isNotNull).count())
    time("fingerprint_full")(graft.ops.TextAnalysis.fingerprint(docs).count())
    s.stop()
  }
}
// (re-run object is above; edits here force recompile)
