package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Model._
/** One-off ingest/fetch/maintenance throughput probe for BASELINE.md. */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft-ibench").toString
    val rdir = java.nio.file.Files.createTempDirectory("graft-ibench-reg")
    java.nio.file.Files.writeString(rdir.resolve("json_topic.json"),
      """{"type":"object","properties":{"k":{"type":"integer","minimum":0}},"required":["k"]}""")
    val st = new graft.storage.ParquetStorage(s, root,
      Some(new graft.schema.SchemaRegistry(rdir.toString)))
    st.createTopic("plain", 1)
    st.createTopic("json_topic", 1, Map(ConfigKey.GeneratedPrefix + "day" ->
      "cast(meta.timestamp as date)"))
    // SPARK_GRAFT_SF_DIR selects the source scale (default sf0.1; point
    // it at the ScaleProbe corpus for a 10x storage-path probe)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val events = Tables.log(s, srcDir)
      .select(col("timestamp"), col("key").cast("string").as("key"),
        col("value")).cache()
    val n = events.count()
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // produce to plain log (one batch = one commit, like a big producer push)
    val tProd = time(st.produce(Topition("plain", 0), events))
    // produce to schema-backed topic: validate + meta + generated + lake
    val tLake = time(st.produce(Topition("json_topic", 0), events))
    // fetch full scan
    var bytes = 0L
    val tFetch = time {
      bytes = st.fetch(Topition("plain", 0), 0, Long.MaxValue)
        .agg(sum(octet_length(col("value").cast("binary")))).head().getLong(0)
    }
    // multi-partition routed produce (the streaming micro-batch path):
    // constant job count regardless of fan-out
    st.createTopic("fan8", 8)
    val routed = events
      .withColumn("partition", pmod(hash(col("key")), lit(8))).cache()
    routed.count()
    val tFan = time(st.produceAll("fan8", routed))
    routed.unpersist()
    // maintenance: compact the schema topic
    st.createTopic("compact_t", 1, Map(ConfigKey.CleanupPolicy -> "compact"))
    st.produce(Topition("compact_t", 0), events)
    val tMaint = time(st.maintain())
    println(f"INGEST n=$n produce_rows_s=${n / tProd}%.0f lake_rows_s=${n / tLake}%.0f " +
      f"fan8_rows_s=${n / tFan}%.0f " +
      f"fetch_MB_s=${bytes / 1e6 / tFetch}%.1f fetch_rows_s=${n / tFetch}%.0f maintain_s=$tMaint%.1f")
    s.stop()
  }
}
