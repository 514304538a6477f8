package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"runs":R,"sf":...}.
  *
  * A warm-up pass (tiny sf0.001 run of each query) is executed first so
  * JVM/codegen/session startup is not charged to the first measured
  * query; measured numbers are cold-cache per query but warm-process.
  *
  * SPARK_GRAFT_RUNS (default 5): each query is timed that many times
  * and the MEDIAN reported — the box is load-noisy (the same code has
  * benched 33-44 s across rounds, and r13's graded run diverged 7x on
  * two queries whose whole 3-run window was slow), so the artifact
  * carries its own noise correction instead of leaving it to
  * cross-round comparison; 5 runs halve the odds a transient slow
  * window owns a query's median.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_RUNS", "5").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Size shuffles to the DATA, not the core count: the gram-explode
      // family funnels a ~4·|words| stream through distinct/aggregate,
      // and at a fixed 32 partitions each reduce task holds 1/32 of the
      // gram stream in its hash map — under box memory pressure that
      // spills and the family degrades 3-7× (driver's BENCH_r13 vs the
      // committed artifact). With a high AQE initial partition count
      // the big shuffles get data-proportional task counts (smaller
      // per-task working sets, graceful under pressure) while AQE
      // coalesces every small shuffle back down, so the rest of the
      // board pays nothing. This is the in-session analogue of the
      // SPARK_GRAFT_SHUFFLE=256 fix from the r12 deep probe.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MAX", "256"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.silenceExpectedWindowWarnings()

    // SPARK_GRAFT_ONLY=q_a,q_b limits the run to a subset (local iteration).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // warm-up at the smallest scale: triggers classloading + codegen
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      // same toRdd path as the measured loop, so the generated code the
      // warm-up compiles is the code the measurement runs
      try SparkEntry.queries(n)(spark, warmDir).queryExecution.toRdd.count()
      catch { case _: Throwable => }
    }

    val results = names.map { name =>
      // evaluate through toRdd.count(), NOT Dataset.count(): an
      // Aggregate(count(1)) consumer lets Catalyst column-prune every
      // projection out of map-only queries, so the bench would time a
      // bare row-count scan instead of the operator. toRdd's consumer is
      // the full output row, so every expression really executes (and no
      // external-row conversion is paid).
      val times = (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        } catch {
          // a failing query must surface as the -1 sentinel, never as a
          // success-shaped near-zero timing that rewards breakage
          case _: Throwable => -1.0
        }
      }
      // ANY failed run fails the query — a median must not mask breakage
      val t =
        if (times.exists(_ < 0)) -1.0
        else {
          val s = times.sorted
          if (runs % 2 == 1) s(runs / 2)
          else (s(runs / 2 - 1) + s(runs / 2)) / 2.0
        }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"runs":$runs,"sf":"$sfDir"}"""
    println(line)
    // ALSO write the line to a file: the driver captures stdout through a
    // pipe that has truncated the tail of long lines (BENCH_r09.json came
    // back unparseable) — a file write cannot be cut mid-line.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
