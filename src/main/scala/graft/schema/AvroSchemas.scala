package graft.schema

import org.apache.avro.{LogicalTypes, Schema => ASchema}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Avro `.avsc` → Spark StructType, following the reference's Avro→Arrow
  * mapping (`nisshi-schema/src/avro/arrow.rs:111-247`; SURVEY §1.3):
  *
  *  - null/boolean/int/long/float/double → corresponding Spark types
  *  - bytes/fixed → BinaryType; string/uuid/enum → StringType
  *  - array → ArrayType, map → MapType, record → StructType
  *  - decimal → DecimalType(p,s)
  *  - date → DateType; time-millis/micros → LongType (Spark lacks a time
  *    type; the reference uses Arrow Time32/64 — documented divergence)
  *  - timestamp-millis/micros/nanos → TimestampType; local → NTZ
  *  - duration → struct<months,days,milliseconds> (reference
  *    `avro/arrow.rs:244-247`)
  *  - union [null, T] → nullable T; general unions → struct of nullable
  *    variants `member{i}` + `tag` (Spark has no dense-union type —
  *    documented divergence, SURVEY §7 "hard parts")
  */
object AvroSchemas {

  def parse(avsc: String): ASchema = new ASchema.Parser().parse(avsc)

  def toStructType(avsc: String): StructType =
    toDataType(parse(avsc)) match {
      case s: StructType => s
      case other => StructType(Seq(StructField("value", other)))
    }

  def toDataType(s: ASchema): DataType = s.getType match {
    case ASchema.Type.NULL => NullType
    case ASchema.Type.BOOLEAN => BooleanType
    case ASchema.Type.INT =>
      s.getLogicalType match {
        case _: LogicalTypes.Date => DateType
        case _: LogicalTypes.TimeMillis => LongType
        case _ => IntegerType
      }
    case ASchema.Type.LONG =>
      s.getLogicalType match {
        case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros |
             _: LogicalTypes.TimestampNanos => TimestampType
        case _: LogicalTypes.LocalTimestampMillis | _: LogicalTypes.LocalTimestampMicros |
             _: LogicalTypes.LocalTimestampNanos => TimestampNTZType
        case _: LogicalTypes.TimeMicros => LongType
        case _ => LongType
      }
    case ASchema.Type.FLOAT => FloatType
    case ASchema.Type.DOUBLE => DoubleType
    case ASchema.Type.BYTES =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
    case ASchema.Type.FIXED =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
        // gate on the declared logical type, not the size — a plain
        // fixed(12) with no annotation is ordinary binary
        case _ if s.getProp("logicalType") == "duration" =>
          StructType(Seq(
            StructField("months", IntegerType),
            StructField("days", IntegerType),
            StructField("milliseconds", IntegerType)))
        case _ => BinaryType
      }
    case ASchema.Type.STRING | ASchema.Type.ENUM => StringType
    case ASchema.Type.ARRAY => ArrayType(toDataType(s.getElementType))
    case ASchema.Type.MAP => MapType(StringType, toDataType(s.getValueType))
    case ASchema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        StructField(f.name, toDataType(f.schema), nullable = isNullable(f.schema))
      })
    case ASchema.Type.UNION =>
      val members = s.getTypes.asScala.toSeq
      val nonNull = members.filter(_.getType != ASchema.Type.NULL)
      nonNull match {
        case Seq(one) => toDataType(one) // [null, T] → nullable T
        case many =>
          // general union → tagged struct of nullable variants
          StructType(
            StructField("tag", IntegerType) +:
            many.zipWithIndex.map { case (m, i) =>
              StructField(s"member$i", toDataType(m), nullable = true)
            })
      }
  }

  def isNullable(s: ASchema): Boolean =
    s.getType == ASchema.Type.NULL ||
      (s.getType == ASchema.Type.UNION &&
        s.getTypes.asScala.exists(_.getType == ASchema.Type.NULL))
}
