package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven synthetic data generator (S12) — the Spark analog of the
  * reference's `Generator` trait (`nisshi-schema/src/lib.rs:258-263`,
  * engine `nisshi-generator/src/lib.rs:129-460`) with per-field range
  * scripts like the proto field options `rand(1000..=2000)`
  * (`etc/schema/taxi.proto:22-26`).
  *
  * Fully distributed: `spark.range(n)` drives generation, every field is
  * a codegen'd expression — no driver-side loops, scales to any row
  * count.
  */
object Generator {

  /** Per-field generation hints: fieldName -> (min, max) for numerics. */
  type Ranges = Map[String, (Double, Double)]

  private val randScriptRe =
    """rand\((-?[0-9.]+)\s*\.\.=?\s*(-?[0-9.]+)\)""".r

  /** Derive ranges from proto generator scripts — the reference's field
    * options `[(generate).script = "rand(1000..=2000)"]`
    * (`etc/schema/taxi.proto:22-26`, engine
    * `nisshi-generator/src/lib.rs:129-460`): a proto-schema'd topic
    * generates within its declared ranges with no extra config.
    */
  def rangesFromProto(parsed: graft.schema.ProtoSchema.Parsed,
                      messageName: String): Ranges =
    parsed.messages(messageName).fields.flatMap { f =>
      f.options.collectFirst {
        case (k, randScriptRe(lo, hi)) if k.endsWith("script") =>
          f.name -> (lo.toDouble, hi.toDouble)
      }
    }.toMap

  /** Generate rows for a proto message: schema types from the parsed
    * proto, ranges from its generator scripts.
    */
  def generateForProto(spark: SparkSession,
                       parsed: graft.schema.ProtoSchema.Parsed,
                       messageName: String, n: Long,
                       seed: Long = 42L): DataFrame =
    generate(spark, parsed.toStructType(messageName), n, seed,
      rangesFromProto(parsed, messageName))

  def generate(spark: SparkSession, schema: StructType, n: Long,
               seed: Long = 42L, ranges: Ranges = Map.empty): DataFrame = {
    val base = spark.range(n)
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      fieldExpr(f.name, f.dataType, col("id"), seed + i, ranges).as(f.name)
    }
    base.select(cols.toIndexedSeq: _*)
  }

  private def fieldExpr(name: String, dt: DataType, id: Column, seed: Long,
                        ranges: Ranges): Column = {
    val (lo, hi) = ranges.getOrElse(name, (0d, 1000d))
    dt match {
      case LongType | IntegerType =>
        // rand() is [0,1): +1 makes the declared range INCLUSIVE of hi,
        // matching the proto script syntax rand(lo..=hi) this implements
        (floor(rand(seed) * (hi - lo + 1)) + lo).cast(dt)
      case DoubleType | FloatType =>
        (rand(seed) * (hi - lo) + lo).cast(dt)
      case BooleanType => rand(seed) > 0.5
      case StringType =>
        concat(lit(name + "-"), conv((rand(seed) * 1e9).cast("long").cast("string"), 10, 36))
      case TimestampType =>
        timestamp_millis((lit(1704067200000L) + (rand(seed) * 86400000L * 60).cast("long")))
      case DateType =>
        date_add(lit(java.sql.Date.valueOf("2024-01-01")), (rand(seed) * 365).cast("int"))
      case BinaryType =>
        sha2(concat(lit(name), id.cast("string")), 256).cast("binary")
      case s: StructType =>
        struct(s.fields.zipWithIndex.map { case (f, i) =>
          fieldExpr(s"$name.${f.name}", f.dataType, id, seed + 31 * (i + 1), ranges)
            .as(f.name)
        }.toIndexedSeq: _*)
      case ArrayType(et, _) =>
        array((0 until 3).map(i => fieldExpr(name, et, id, seed + 7 * (i + 1), ranges)): _*)
      case d: DecimalType =>
        (rand(seed) * (hi - lo) + lo).cast(d)
      case _ => lit(null).cast(dt)
    }
  }
}
