package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe (test-scope main): measures the five heaviest bench
  * queries at sf0.01, sf0.1, and a synthesized 10×-sf0.1 corpus, and
  * prints the per-decade scaling exponent — turning the "this plan is
  * scale-safe" claims into measured evidence.
  *
  * The 10× corpus replicates sf0.1 documents/embeddings with per-copy
  * id offsets; each copy's TOKENS are suffixed `_<copy>` so copies are
  * textually independent (no cross-copy near-dups — the corpus grows
  * horizontally, the per-copy duplicate structure is preserved, and
  * dedup-family growth measures the PLAN, not a synthetic dup
  * explosion). Embeddings perturb per copy to keep vectors distinct.
  *
  * Run: `sbt "Test/runMain graft.ScaleProbe"`.
  */
object ScaleProbe {

  private val Queries = Seq("q_quality_ensemble", "q_ivfpq_adc",
    "q_dedup_clusters", "q_keep_canonical", "q_dedup_ngram")

  private def synthesize(spark: SparkSession, src: String, dst: String,
                         copies: Int): Unit = {
    val root = java.nio.file.Paths.get(dst)
    if (java.nio.file.Files.exists(root.resolve("documents.parquet")) &&
        java.nio.file.Files.exists(root.resolve("embeddings.parquet"))) return
    java.nio.file.Files.createDirectories(root)
    val k = explode(sequence(lit(0), lit(copies - 1))).as("copy")
    spark.read.parquet(s"$src/documents.parquet")
      .select(col("*"), k)
      .select(
        (col("doc_id") + col("copy") * 10000000L).as("doc_id"),
        when(col("copy") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit("_"), col("copy"))), " ")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("*"), k)
      .select(
        (col("vec_id") + col("copy") * 10000000L).as("vec_id"),
        when(col("copy") === 0, col("embedding")).otherwise(
          transform(col("embedding"),
            (x, i) => x + (col("copy").cast("float") *
              ((i % 7).cast("float") - lit(3.0f)) / lit(10000.0f))))
          .as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.silenceExpectedWindowWarnings()
    val probeDir = "/tmp/graft-sfprobe"
    synthesize(spark, "/root/testdata/sf0.1", probeDir, copies = 10)
    val dirs = Seq("sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1", "sf1x" -> probeDir)
    // warm classloading/codegen on the smallest scale first
    Queries.foreach { q =>
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.toRdd.count()
    }
    val times = Queries.map { q =>
      q -> dirs.map { case (name, dir) =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.count()
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    times.foreach { case (q, ts) =>
      val m = ts.toMap
      // exponent per decade of data: log10(t_next / t_prev)
      val e1 = math.log10(m("sf0.1") / m("sf0.01"))
      val e2 = math.log10(m("sf1x") / m("sf0.1"))
      println(f"PROBE $q%-20s sf0.01=${m("sf0.01")}%6.2fs sf0.1=${m("sf0.1")}%6.2fs " +
        f"sf1x=${m("sf1x")}%7.2fs exp(0.01->0.1)=$e1%5.2f exp(0.1->1x)=$e2%5.2f")
    }
    spark.stop()
  }
}
