package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Package-boundary probe: Kafka wire batch -> decode -> Spark rows ->
  * crc32c expression -> assignor handoff, end to end in one flow. */
object WireProbe {
  def main(args: Array[String]): Unit = {
    import graft.functions.{RecordBatchCodec => C}
    val wire = C.encode(C.Batch(100L, 0, C.CodecGzip.toShort, 0L, 0L, -1L, -1, -1,
      (0 until 5).map(i => C.Record(i, i.toLong, s"k$i".getBytes, s"v$i".getBytes, Nil))))
    val batch = C.decode(wire)
    val s = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    import s.implicits._
    val df = batch.records.map(r => (batch.baseOffset + r.offsetDelta,
      new String(r.key), new String(r.value))).toDF("offset", "key", "value")
      .withColumn("crc", graft.functions.Crc32C.crc32c(col("value").cast("binary")))
    println("WIRE_ROWS=" + df.count() + " DISTINCT_CRC=" + df.select("crc").distinct().count())
    val assign = graft.coordinator.Assignors.roundRobin(
      Map("c0" -> Set("events"), "c1" -> Set("events")), Map("events" -> 8))
    println("ASSIGN=" + assign.map { case (m, tps) => m + ":" + tps.size }.toSeq.sorted.mkString(","))
    s.stop()
  }
}
