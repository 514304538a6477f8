package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CCProfile {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val pairs = TrainingQueries.qDedupMinhash(s, "/root/testdata/sf0.1").cache()
    println(f"PAIRS n=${pairs.count()}")
    // instrumented copy of the loop
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().repartition(2, col("dst")).cache()
    edges.count()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id")).cache()
    var changed = 1L; var iter = 0
    val t0 = System.nanoTime()
    while (changed > 0 && iter < 30) {
      val ti = System.nanoTime()
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("doc_id", "dst").withColumnRenamed("cluster", "n_cluster"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("n_cluster")).as("min_neighbor"))
      val next = labels.join(viaNeighbor, Seq("doc_id"), "left")
        .select(col("doc_id"), least(col("cluster"), coalesce(col("min_neighbor"), col("cluster"))).as("cluster"))
        .cache()
      changed = next.join(labels.withColumnRenamed("cluster", "old"), "doc_id")
        .filter(col("cluster") =!= col("old")).count()
      labels = next; iter += 1
      println(f"ITER $iter changed=$changed t=${(System.nanoTime()-ti)/1e9}%.2fs")
    }
    println(f"CC total=${(System.nanoTime()-t0)/1e9}%.1fs iters=$iter")
    s.stop()
  }
}
