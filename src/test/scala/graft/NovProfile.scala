package graft
import org.apache.spark.sql.functions._
import graft.ops.{Curation, Dedup}
object NovProfile {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("novprof")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-40s ${(System.nanoTime()-t0)/1e9}%6.2f s  rows=$n")
    }
    // warm
    docs.count()
    time("raw gram explode count (1 pass, 4n)") {
      docs.select(explode(flatten(array((1 to 4).map(n =>
        Dedup.shingles(col("text"), n)): _*))).as("g")).count()
    }
    time("gram explode + h60 count") {
      docs.select(explode(flatten(array((1 to 4).map(n =>
        Dedup.shingles(col("text"), n)): _*))).as("g"))
        .select(Dedup.h60(col("g")).as("h")).agg(sum("h")).count()
    }
    time("heldout distinct only") {
      docs.filter(col("doc_id") % 10 === 9)
        .select(explode(flatten(array((1 to 4).map(n =>
          transform(Dedup.shingles(col("text"), n),
            g => struct(lit(n.toLong).as("n"), g.as("g")))): _*))).as("__g"))
        .select(col("__g.n").as("n"), Dedup.h60(col("__g.g")).as("h"))
        .distinct().count()
    }
    time("full ngramNovelty") {
      Curation.ngramNovelty(docs.filter(col("doc_id") % 10 =!= 9),
        docs.filter(col("doc_id") % 10 === 9), 4).count()
    }
    spark.stop()
  }
}
