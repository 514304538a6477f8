package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for bradleyTerry's stages (test scope). */
object BtProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.silenceExpectedWindowWarnings()
    val dir = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bt] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    val taskCount = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCount.incrementAndGet()
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          taskCount.incrementAndGet()
      })
    def counters(tag: String): Unit =
      println(s"[bt] $tag jobs=${jobCount.get} tasks=${taskCount.get}")
    val docs = Tables.load(spark, dir, "documents")
    time("warm docs count")(docs.count())

    val resp = docs.select(
      (col("doc_id") / 4).cast("long").as("prompt_id"),
      (col("doc_id") % 4).as("resp_id"),
      (length(col("text")) % 97).cast("long").as("score"))
    val a = resp.select(col("prompt_id"), col("resp_id").as("i"),
      col("score").as("si"))
    val b = resp.select(col("prompt_id"), col("resp_id").as("j"),
      col("score").as("sj"))
    val games = a.join(b, Seq("prompt_id"))
      .filter(col("i") < col("j") && col("si") =!= col("sj"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("si") > col("sj"), 1L).otherwise(0L)).as("wi"))
    time("games agg alone (noop)")(
      games.write.format("noop").mode("overwrite").save())
    time("games agg again")(
      games.write.format("noop").mode("overwrite").save())
    for (r <- 1 to 3) {
      time(s"full bradleyTerry run $r")(
        graft.ops.EvalMetrics.bradleyTerry(games, iters = 3)
          .queryExecution.toRdd.count())
    }

    // piecewise replication of the internals
    val pm = games.filter(col("n") > 0)
      .select(col("i"), col("j"), col("n").cast("long").as("n"),
        col("wi").cast("long").as("wi"))
      .cache()
    time("pm cache count")(pm.count())
    val dirT = pm.select(col("i").as("player"), col("j").as("other"), col("n"))
      .unionByName(pm.select(col("j").as("player"), col("i").as("other"),
        col("n")))
    val w = pm.select(col("i").as("player"), col("wi").as("wins"),
        col("n").as("games"))
      .unionByName(pm.select(col("j").as("player"),
        (col("n") - col("wi")).as("wins"), col("n").as("games")))
      .groupBy("player")
      .agg(sum("wins").as("wins"), sum("games").as("games"))
    var p = w.select(col("player"), lit(1000000L).as("p"))
    for (it <- 1 to 3) {
      val denom = dirT
        .join(broadcast(p.select(col("player"), col("p").as("__pi"))),
          "player")
        .join(broadcast(p.select(col("player").as("other"),
          col("p").as("__pj"))), "other")
        .groupBy("player")
        .agg(sum(expr("n * 1000000000000L DIV (__pi + __pj)")).as("__den"))
      val raw = w.join(broadcast(denom), "player")
        .select(col("player"),
          expr("wins * 1000000000000L DIV __den").as("__praw"))
      val norm = raw.agg(count(lit(1)).as("__np"), sum("__praw").as("__sp"))
      val pNext = raw.crossJoin(broadcast(norm))
        .select(col("player"),
          expr("__praw * (__np * 1000000L) DIV __sp").as("p"))
      counters(s"before round $it")
      p = time(s"round $it checkpoint")(pNext.localCheckpoint(true))
      counters(s"after round $it")
    }
    time("final join")(
      w.join(broadcast(p), "player").queryExecution.toRdd.count())
    spark.stop()
  }
}
