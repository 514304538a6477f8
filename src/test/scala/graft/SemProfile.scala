package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for semDedup phases (not a spec). */
object SemProfile {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val e = Tables.load(spark, dir, "embeddings")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warm scan")(e.count())
    val assigned = time("kmeansAssignQ build+loop") {
      ops.Similarity.kmeansAssignQ(e, 4, 2, 64, "vec_id", "embedding")
        .select(col("vec_id"), col("qe"), col("cid"))
    }
    val cp = time("checkpoint materialize")(assigned.localCheckpoint(true))
    time("memberStats") {
      cp.groupBy(col("cid")).agg(count(lit(1))).queryExecution.toRdd.count()
    }
    val withCell = cp.select(col("vec_id"), col("qe"), col("cid").as("cell"))
      .withColumn("norm", lit(1.0))
    val aSide = withCell.select(col("vec_id").as("id_a"), col("cell"), col("qe").as("qe_a"))
    val bSide = withCell.select(col("vec_id").as("id_b"), col("cell"), col("qe").as("qe_b"))
    val dot = functions.VectorExpressions.dotq(col("qe_a"), col("qe_b"))
    time("pair join no dot") {
      println("PAIRS " + aSide.join(bSide, "cell").filter(col("id_a") < col("id_b"))
        .queryExecution.toRdd.count())
    }
    val joined = aSide.join(bSide, "cell").filter(col("id_a") < col("id_b"))
      .withColumn("c", dot.cast("double")).filter(col("c") > 0)
    time("pair join + dotq exec") { joined.queryExecution.toRdd.count() }
    time("full semDedup") {
      ops.Similarity.semDedup(e, 4, 2, 0.4).queryExecution.toRdd.count()
    }
    time("full semDedup again") {
      ops.Similarity.semDedup(e, 4, 2, 0.4).queryExecution.toRdd.count()
    }
    time("kmeansAssign full") {
      ops.Similarity.kmeansAssign(e, 4, 2).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
