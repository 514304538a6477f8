package graft.schema

import org.apache.spark.sql.types._
import graft.functions.Varint
import java.nio.ByteBuffer

/** Minimal proto3 support without a protobuf runtime: a schema-text
  * parser (message/enum/scalar/repeated/map/nested subset) mapped to
  * Spark types per the reference's proto→Arrow table
  * (`nisshi-schema/src/proto/arrow.rs:152-163, 223, 252-257`; SURVEY
  * §1.3), plus a wire-format decoder for flat messages built on the
  * zigzag varint codec.
  *
  * Field options like the reference's generator scripts
  * (`etc/schema/taxi.proto:22-26`, `[(generate).script = "rand(...)"]`)
  * are parsed and exposed so [[graft.sources.Generator]] ranges can be
  * derived from them.
  *
  * Not supported (documented): imports, extensions, oneof (mapped to
  * nullable members), services, groups. The reference's own registry
  * uses self-contained per-topic files, so this subset covers its fixture
  * corpus.
  */
object ProtoSchema {

  final case class Field(name: String, number: Int, protoType: String,
                         repeated: Boolean, options: Map[String, String])
  final case class Message(name: String, fields: Seq[Field])

  final case class Parsed(messages: Map[String, Message],
                          enums: Map[String, Seq[String]]) {
    /** Spark type for one message (enums → StringType like Avro enums —
      * divergence from the reference's Int32 dictionary encoding,
      * documented: the *symbol* is the analytic value).
      */
    def toStructType(messageName: String): StructType = {
      val m = messages.getOrElse(messageName,
        throw new IllegalArgumentException(s"no message $messageName"))
      StructType(m.fields.map { f =>
        val base = scalarType(f.protoType)
        StructField(f.name, if (f.repeated) ArrayType(base) else base)
      })
    }

    private def scalarType(t: String): DataType = t match {
      case "int32" | "sint32" | "sfixed32" | "fixed32" | "uint32" => IntegerType
      case "int64" | "sint64" | "sfixed64" | "fixed64" | "uint64" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "bool" => BooleanType
      case "string" => StringType
      case "bytes" => BinaryType
      case "google.protobuf.Timestamp" => TimestampType
      case other if enums.contains(other) => StringType
      case other if messages.contains(other) => toStructType(other)
      case _ => StringType
    }
  }

  private val messageFlatRe = """message\s+(\w+)\s*\{([^{}]*)\}""".r
  private val messageRe = """(?s)message\s+(\w+)\s*\{(.*?)\n\}""".r
  private val enumRe = """(?s)enum\s+(\w+)\s*\{(.*?)\}""".r
  private val fieldRe =
    """(repeated\s+)?([\w.]+)\s+(\w+)\s*=\s*(\d+)\s*(\[[^\]]*\])?\s*;""".r
  private val optionRe = """\(([\w.]+)\)(?:\.(\w+))?\s*=\s*"((?:[^"\\]|\\.)*)"""".r
  private val enumValRe = """(\w+)\s*=\s*\d+\s*;""".r

  def parse(text: String): Parsed = {
    val noComments = text.replaceAll("//[^\n]*", "")
    val enums = enumRe.findAllMatchIn(noComments).map { m =>
      m.group(1) -> enumValRe.findAllMatchIn(m.group(2)).map(_.group(1)).toSeq
    }.toMap
    // flat single-line messages first; remove them so the multi-line
    // pass (which needs the closing brace at line start) sees the rest
    val flatMatches = messageFlatRe.findAllMatchIn(noComments).map(m =>
      m.group(1) -> m.group(2)).toSeq
    val remainder = messageFlatRe.replaceAllIn(noComments, "")
    val multiMatches = messageRe.findAllMatchIn(remainder).map(m =>
      m.group(1) -> m.group(2)).toSeq
    val messages = (multiMatches ++ flatMatches).map { case (name, body) =>
      val fields = fieldRe.findAllMatchIn(body).flatMap { fm =>
        val tpe = fm.group(2)
        // skip oneof bodies' duplicates crudely: oneof members parse fine
        val opts = Option(fm.group(5)).map { o =>
          optionRe.findAllMatchIn(o).map { om =>
            (Option(om.group(2)).map(s => om.group(1) + "." + s)
              .getOrElse(om.group(1))) -> om.group(3)
          }.toMap
        }.getOrElse(Map.empty)
        Some(Field(fm.group(3), fm.group(4).toInt, tpe,
          fm.group(1) != null, opts))
      }.toSeq
      name -> Message(name, fields)
    }.toMap
    Parsed(messages, enums)
  }

  /** Decode a flat proto3 wire message (no nesting) into fieldName →
    * value, using the parsed schema for types. Unknown fields skipped
    * per proto semantics.
    */
  def decodeFlat(parsed: Parsed, messageName: String,
                 bytes: Array[Byte]): Map[String, Any] = {
    val msg = parsed.messages(messageName)
    val byNumber = msg.fields.map(f => f.number -> f).toMap
    val buf = ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.Map.empty[String, Any]
    while (buf.hasRemaining) {
      val tag = readRawVarint(buf)
      val fieldNum = (tag >>> 3).toInt
      val wireType = (tag & 7).toInt
      val fieldOpt = byNumber.get(fieldNum)
      wireType match {
        case 0 => // varint
          val raw = readRawVarint(buf)
          fieldOpt.foreach { f =>
            out(f.name) = f.protoType match {
              case "sint32" | "sint64" => Varint.unzigzag(raw)
              case "bool" => raw != 0
              case t if parsed.enums.contains(t) =>
                parsed.enums(t).lift(raw.toInt).getOrElse(raw.toString)
              case "int32" | "uint32" => raw.toInt
              case _ => raw
            }
          }
        case 1 => // 64-bit
          val v = buf.getLong
          fieldOpt.foreach { f =>
            out(f.name) = f.protoType match {
              case "double" => java.lang.Double.longBitsToDouble(v)
              case _ => v
            }
          }
        case 2 => // length-delimited
          val len = readRawVarint(buf).toInt
          val a = new Array[Byte](len)
          buf.get(a)
          fieldOpt.foreach { f =>
            out(f.name) = f.protoType match {
              case "string" => new String(a, "UTF-8")
              case _ => a
            }
          }
        case 5 => // 32-bit
          val v = buf.getInt
          fieldOpt.foreach { f =>
            out(f.name) = f.protoType match {
              case "float" => java.lang.Float.intBitsToFloat(v)
              case _ => v
            }
          }
        case other =>
          throw new IllegalArgumentException(s"unsupported wire type $other")
      }
    }
    out.toMap
  }

  /** Encode a flat message (test/ingest helper, inverse of decodeFlat). */
  def encodeFlat(parsed: Parsed, messageName: String,
                 values: Map[String, Any]): Array[Byte] = {
    val msg = parsed.messages(messageName)
    val buf = ByteBuffer.allocate(1 << 16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    msg.fields.filter(f => values.contains(f.name)).foreach { f =>
      val v = values(f.name)
      f.protoType match {
        case "double" =>
          writeRawVarint((f.number.toLong << 3) | 1, buf)
          buf.putLong(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
        case "float" =>
          writeRawVarint((f.number.toLong << 3) | 5, buf)
          buf.putInt(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
        case "string" =>
          val a = v.asInstanceOf[String].getBytes("UTF-8")
          writeRawVarint((f.number.toLong << 3) | 2, buf)
          writeRawVarint(a.length.toLong, buf)
          buf.put(a)
        case "bytes" =>
          val a = v.asInstanceOf[Array[Byte]]
          writeRawVarint((f.number.toLong << 3) | 2, buf)
          writeRawVarint(a.length.toLong, buf)
          buf.put(a)
        case "sint32" | "sint64" =>
          writeRawVarint((f.number.toLong << 3) | 0, buf)
          writeRawVarint(Varint.zigzag(v.asInstanceOf[Number].longValue()), buf)
        case "bool" =>
          writeRawVarint((f.number.toLong << 3) | 0, buf)
          writeRawVarint(if (v.asInstanceOf[Boolean]) 1L else 0L, buf)
        case t if parsed.enums.contains(t) =>
          writeRawVarint((f.number.toLong << 3) | 0, buf)
          writeRawVarint(parsed.enums(t).indexOf(v.toString).toLong, buf)
        case _ => // int32/64, uint
          writeRawVarint((f.number.toLong << 3) | 0, buf)
          writeRawVarint(v.asInstanceOf[Number].longValue(), buf)
      }
    }
    buf.flip()
    val out = new Array[Byte](buf.remaining())
    buf.get(out)
    out
  }

  private def readRawVarint(buf: ByteBuffer): Long = {
    var value = 0L
    var shift = 0
    var b = buf.get()
    while ((b & 0x80) != 0) {
      value |= (b & 0x7fL) << shift
      shift += 7
      b = buf.get()
    }
    value | ((b & 0x7fL) << shift)
  }

  private def writeRawVarint(v0: Long, buf: ByteBuffer): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      buf.put(((v & 0x7f) | 0x80).toByte)
      v >>>= 7
    }
    buf.put(v.toByte)
  }
}
