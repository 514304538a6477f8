package graft.schema

import org.apache.spark.sql.types._
import graft.functions.Varint
import java.nio.ByteBuffer

/** Minimal proto3 support without a protobuf runtime: a schema-text
  * parser (message/enum/scalar/repeated/map/nested subset) mapped to
  * Spark types per the reference's proto→Arrow table
  * (`nisshi-schema/src/proto/arrow.rs:152-163, 223, 252-257`; SURVEY
  * §1.3), plus a recursive wire-format codec (nested messages, repeated
  * incl. packed numerics, proto maps, google.protobuf.Timestamp) built
  * on the zigzag varint codec, and a distributed [[decodeColumn]] that
  * turns a binary proto column into a typed struct column.
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

    private[ProtoSchema] def scalarType(t: String): DataType = t match {
      case "int32" | "sint32" | "sfixed32" => IntegerType
      // unsigned 32-bit carriers widen to LONG (the reference's Arrow
      // UInt32): values past Int.MaxValue must not wrap negative.
      // uint64/fixed64 stay LongType — Spark has no unsigned 64 — so the
      // top bit reads back negative (documented, matches spark-protobuf)
      case "fixed32" | "uint32" => LongType
      case "int64" | "sint64" | "sfixed64" | "fixed64" | "uint64" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "bool" => BooleanType
      case "string" => StringType
      case "bytes" => BinaryType
      case "google.protobuf.Timestamp" => TimestampType
      case MapKV(k, v) => MapType(scalarType(k), scalarType(v))
      case other if enums.contains(other) => StringType
      case other if messages.contains(other) => toStructType(other)
      case _ => StringType
    }
  }

  /** `map<K,V>` proto-type extractor. The regex is compiled once — the
    * extractor sits on the per-row, per-field decode/encode hot path.
    */
  private[schema] object MapKV {
    private val re = """map\s*<\s*([\w.]+)\s*,\s*([\w.]+)\s*>""".r
    def unapply(t: String): Option[(String, String)] =
      // cheap reject first: almost every field type is NOT a map
      if (!t.startsWith("map")) None
      else t match {
        case re(k, v) => Some((k, v))
        case _ => None
      }
  }

  private val messageFlatRe = """message\s+(\w+)\s*\{([^{}]*)\}""".r
  private val messageRe = """(?s)message\s+(\w+)\s*\{(.*?)\n\}""".r
  private val enumRe = """(?s)enum\s+(\w+)\s*\{(.*?)\}""".r
  private val fieldRe =
    """(repeated\s+)?([\w.]+)\s+(\w+)\s*=\s*(\d+)\s*(\[[^\]]*\])?\s*;""".r
  private val mapFieldRe =
    """(map\s*<\s*[\w.]+\s*,\s*[\w.]+\s*>)\s+(\w+)\s*=\s*(\d+)\s*(\[[^\]]*\])?\s*;""".r
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
      def parseOpts(g: String): Map[String, String] =
        Option(g).map { o =>
          optionRe.findAllMatchIn(o).map { om =>
            (Option(om.group(2)).map(s => om.group(1) + "." + s)
              .getOrElse(om.group(1))) -> om.group(3)
          }.toMap
        }.getOrElse(Map.empty)
      // map fields first (fieldRe can't match the angle-bracket type),
      // then plain fields on the map-stripped body
      val mapFields = mapFieldRe.findAllMatchIn(body).map { fm =>
        val MapKV(k, v) = fm.group(1): @unchecked
        Field(fm.group(2), fm.group(3).toInt, s"map<$k,$v>",
          repeated = false, parseOpts(fm.group(4)))
      }.toSeq
      val plainBody = mapFieldRe.replaceAllIn(body, "")
      val fields = fieldRe.findAllMatchIn(plainBody).map { fm =>
        // oneof members parse fine; oneof grouping itself is ignored
        Field(fm.group(3), fm.group(4).toInt, fm.group(2),
          fm.group(1) != null, parseOpts(fm.group(5)))
      }.toSeq
      name -> Message(name, (fields ++ mapFields).sortBy(_.number))
    }.toMap
    Parsed(messages, enums)
  }

  /** Decode a proto3 wire message into fieldName → value, recursively:
    * nested messages become Map[String, Any], repeated fields (expanded
    * or packed) become Vector, proto maps become Map[Any, Any],
    * google.protobuf.Timestamp becomes java.sql.Timestamp. Unknown
    * fields are skipped per proto semantics.
    */
  def decode(parsed: Parsed, messageName: String,
             bytes: Array[Byte]): Map[String, Any] =
    decodeBuf(parsed, parsed.messages(messageName), wrap(bytes))

  /** Back-compat alias (the decoder is no longer flat-only). */
  def decodeFlat(parsed: Parsed, messageName: String,
                 bytes: Array[Byte]): Map[String, Any] =
    decode(parsed, messageName, bytes)

  private def wrap(a: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(a).order(java.nio.ByteOrder.LITTLE_ENDIAN)

  private def mapEntryMessage(k: String, v: String): Message =
    Message("$entry", Seq(
      Field("key", 1, k, repeated = false, Map.empty),
      Field("value", 2, v, repeated = false, Map.empty)))

  /** proto3 default for an absent map-entry field. */
  private def defaultFor(parsed: Parsed, t: String): Any = t match {
    case "string" => ""
    case "bool" => false
    case "float" => 0f
    case "double" => 0d
    case "bytes" => Array.empty[Byte]
    case "int32" | "sint32" | "sfixed32" => 0
    case "fixed32" | "uint32" => 0L // LongType carriers (unsigned range)
    case e if parsed.enums.contains(e) => parsed.enums(e).headOption.orNull
    case m if parsed.messages.contains(m) => Map.empty[String, Any]
    case _ => 0L
  }

  private def varintValue(parsed: Parsed, t: String, raw: Long): Any = t match {
    case "sint32" => Varint.unzigzag(raw).toInt
    case "sint64" => Varint.unzigzag(raw)
    case "bool" => raw != 0
    case e if parsed.enums.contains(e) =>
      parsed.enums(e).lift(raw.toInt).getOrElse(raw.toString)
    case "int32" => raw.toInt
    case "uint32" => raw & 0xFFFFFFFFL // unsigned range, LongType carrier
    case _ => raw
  }

  /** Declared types legitimately carried by varint (wire type 0). */
  private def varintCarried(parsed: Parsed, t: String): Boolean = t match {
    case "int32" | "int64" | "uint32" | "uint64" | "sint32" | "sint64" |
         "bool" => true
    case e => parsed.enums.contains(e)
  }

  /** Nested-decode depth cap: a RECURSIVE message type (Node { Node
    * next = 1; }) lets a hostile payload nest one level per ~2 wire
    * bytes, and unbounded recursion there is a StackOverflowError — an
    * Error, which escapes decodeColumn's per-row Exception catch and
    * kills the whole produce task instead of yielding INVALID_RECORD.
    * 64 matches protobuf-java's default recursion limit.
    */
  private val MaxNestingDepth = 64

  private def decodeBuf(parsed: Parsed, msg: Message,
                        buf: ByteBuffer, depth: Int = 0): Map[String, Any] = {
    if (depth > MaxNestingDepth)
      throw new IllegalArgumentException(
        s"message nesting exceeds $MaxNestingDepth levels")
    val byNumber = msg.fields.map(f => f.number -> f).toMap
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    def put(f: Field, v: Any): Unit =
      if (f.repeated)
        out(f.name) = out.getOrElse(f.name, Vector.empty)
          .asInstanceOf[Vector[Any]] :+ v
      else out(f.name) = v
    while (buf.hasRemaining) {
      val tag = readRawVarint(buf)
      val fieldNum = (tag >>> 3).toInt
      val wireType = (tag & 7).toInt
      val fieldOpt = byNumber.get(fieldNum)
      // a KNOWN field on the wrong wire type is a malformed message:
      // throwing here lands in decodeColumn's per-row try -> null ->
      // INVALID_RECORD, instead of a mis-typed value crossing into the
      // Row and crashing the encoder OUTSIDE the try (a task failure
      // that aborts the whole produce job)
      def mismatch(f: Field): Nothing =
        throw new IllegalArgumentException(
          s"field ${f.name} (${f.protoType}) on wire type $wireType")
      wireType match {
        case 0 => // varint
          val raw = readRawVarint(buf)
          fieldOpt.foreach { f =>
            if (!varintCarried(parsed, f.protoType)) mismatch(f)
            put(f, varintValue(parsed, f.protoType, raw))
          }
        case 1 => // 64-bit
          val v = buf.getLong
          fieldOpt.foreach { f =>
            put(f, f.protoType match {
              case "double" => java.lang.Double.longBitsToDouble(v)
              case "fixed64" | "sfixed64" => v
              case _ => mismatch(f)
            })
          }
        case 2 => // length-delimited
          val len = readRawVarint(buf).toInt
          // fail BEFORE allocating on a hostile declared length
          if (len < 0 || len > buf.remaining())
            throw new IllegalArgumentException(
              s"declared length $len exceeds remaining ${buf.remaining()}")
          val a = new Array[Byte](len)
          buf.get(a)
          fieldOpt.foreach { f =>
            f.protoType match {
              case "string" => put(f, new String(a, "UTF-8"))
              case "bytes" => put(f, a)
              case MapKV(k, v) =>
                val entry = decodeBuf(parsed, mapEntryMessage(k, v), wrap(a), depth + 1)
                val m = out.getOrElse(f.name, Map.empty)
                  .asInstanceOf[Map[Any, Any]]
                out(f.name) = m +
                  (entry.getOrElse("key", defaultFor(parsed, k)) ->
                    entry.getOrElse("value", defaultFor(parsed, v)))
              case "google.protobuf.Timestamp" =>
                val fields = decodeBuf(parsed, Message("$ts", Seq(
                  Field("seconds", 1, "int64", repeated = false, Map.empty),
                  Field("nanos", 2, "int32", repeated = false, Map.empty))),
                  wrap(a), depth + 1)
                val secs = fields.getOrElse("seconds", 0L).asInstanceOf[Long]
                val nanos = fields.getOrElse("nanos", 0).asInstanceOf[Int]
                val ts = new java.sql.Timestamp(secs * 1000L)
                ts.setNanos(nanos)
                put(f, ts)
              case t if parsed.messages.contains(t) =>
                put(f, decodeBuf(parsed, parsed.messages(t), wrap(a), depth + 1))
              case t if f.repeated => // packed numeric repeated
                val b2 = wrap(a)
                while (b2.hasRemaining) put(f, t match {
                  case "float" => java.lang.Float.intBitsToFloat(b2.getInt)
                  case "double" => java.lang.Double.longBitsToDouble(b2.getLong)
                  case "fixed32" => b2.getInt.toLong & 0xFFFFFFFFL
                  case "sfixed32" => b2.getInt
                  case "fixed64" | "sfixed64" => b2.getLong
                  case t2 if varintCarried(parsed, t2) =>
                    varintValue(parsed, t2, readRawVarint(b2))
                  case _ => mismatch(f)
                })
              case _ => mismatch(f) // scalar numeric on wire type 2
            }
          }
        case 5 => // 32-bit
          val v = buf.getInt
          fieldOpt.foreach { f =>
            put(f, f.protoType match {
              case "float" => java.lang.Float.intBitsToFloat(v)
              case "fixed32" => v.toLong & 0xFFFFFFFFL
              case "sfixed32" => v
              case _ => mismatch(f)
            })
          }
        case other =>
          throw new IllegalArgumentException(s"unsupported wire type $other")
      }
    }
    out.toMap
  }

  /** Decoded value map → Spark Row in [[Parsed.toStructType]] field
    * order (nested messages become nested Rows).
    */
  def toRow(parsed: Parsed, messageName: String,
            values: Map[String, Any]): org.apache.spark.sql.Row = {
    val msg = parsed.messages(messageName)
    org.apache.spark.sql.Row.fromSeq(msg.fields.map { f =>
      values.get(f.name).map(v => toSpark(parsed, f, v)).orNull
    })
  }

  private def toSpark(parsed: Parsed, f: Field, v: Any): Any =
    if (f.repeated) v.asInstanceOf[Vector[Any]].map(convertScalar(parsed, f.protoType, _))
    else convertScalar(parsed, f.protoType, v)

  private def convertScalar(parsed: Parsed, t: String, v: Any): Any = t match {
    case MapKV(k, mv) =>
      v.asInstanceOf[Map[Any, Any]].map { case (mk, mvv) =>
        convertScalar(parsed, k, mk) -> convertScalar(parsed, mv, mvv)
      }
    case m if parsed.messages.contains(m) =>
      toRow(parsed, m, v.asInstanceOf[Map[String, Any]])
    case _ => v
  }

  /** Distributed decode of a binary proto column into a typed struct
    * column `<outputCol>` — the proto counterpart of
    * [[AvroDecoder.decodeColumn]]: one parsed schema per partition, no
    * shuffle, undecodable payloads yield null (the INVALID_RECORD
    * signal).
    */
  def decodeColumn(df: org.apache.spark.sql.DataFrame, binaryCol: String,
                   protoText: String, messageName: String,
                   outputCol: String): org.apache.spark.sql.DataFrame = {
    val sparkType = parse(protoText).toStructType(messageName)
    val outSchema = StructType(df.schema.fields :+
      StructField(outputCol, sparkType, nullable = true))
    val inputIdx = df.schema.fieldIndex(binaryCol)
    // Dataset.mapPartitions + codegen'd row encoder (not df.rdd +
    // createDataFrame's reflective converters) — same plan-integrated
    // shape as AvroDecoder.decodeColumn
    df.mapPartitions { it =>
      val parsed = parse(protoText)
      it.map { row =>
        val bytes = if (row.isNullAt(inputIdx)) null
                    else row.getAs[Array[Byte]](inputIdx)
        val decoded =
          if (bytes == null) null
          else try toRow(parsed, messageName, decode(parsed, messageName, bytes))
          catch { case _: Exception => null }
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ decoded)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Encode a message (test/ingest helper, inverse of [[decode]]):
    * nested messages from Map[String, Any], repeated from Seq, proto
    * maps from Map, google.protobuf.Timestamp from java.sql.Timestamp.
    */
  def encode(parsed: Parsed, messageName: String,
             values: Map[String, Any]): Array[Byte] = {
    val msg = parsed.messages(messageName)
    // growable: oversized documents (> any fixed cap) must encode, not
    // throw BufferOverflow mid-produce
    var buf = ByteBuffer.allocate(1 << 12).order(java.nio.ByteOrder.LITTLE_ENDIAN)

    def ensure(n: Int): Unit = if (buf.remaining() < n) {
      val need = buf.position() + n
      var cap = buf.capacity().toLong
      while (cap < need) cap <<= 1
      val bigger = ByteBuffer.allocate(math.min(cap, Int.MaxValue.toLong).toInt)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.flip(); bigger.put(buf); buf = bigger
    }

    def writeLenDelimited(number: Int, a: Array[Byte]): Unit = {
      ensure(20 + a.length)
      writeRawVarint((number.toLong << 3) | 2, buf)
      writeRawVarint(a.length.toLong, buf)
      buf.put(a)
      ()
    }

    def writeOne(f: Field, v: Any): Unit = f.protoType match {
      case "double" =>
        ensure(18)
        writeRawVarint((f.number.toLong << 3) | 1, buf)
        buf.putLong(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
        ()
      case "float" =>
        ensure(14)
        writeRawVarint((f.number.toLong << 3) | 5, buf)
        buf.putInt(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
        ()
      case "fixed32" | "sfixed32" =>
        ensure(14)
        writeRawVarint((f.number.toLong << 3) | 5, buf)
        buf.putInt(v.asInstanceOf[Number].intValue())
        ()
      case "fixed64" | "sfixed64" =>
        ensure(18)
        writeRawVarint((f.number.toLong << 3) | 1, buf)
        buf.putLong(v.asInstanceOf[Number].longValue())
        ()
      case "string" =>
        writeLenDelimited(f.number, v.asInstanceOf[String].getBytes("UTF-8"))
      case "bytes" =>
        writeLenDelimited(f.number, v.asInstanceOf[Array[Byte]])
      case "sint32" | "sint64" =>
        ensure(20)
        writeRawVarint((f.number.toLong << 3) | 0, buf)
        writeRawVarint(Varint.zigzag(v.asInstanceOf[Number].longValue()), buf)
      case "bool" =>
        ensure(20)
        writeRawVarint((f.number.toLong << 3) | 0, buf)
        writeRawVarint(if (v.asInstanceOf[Boolean]) 1L else 0L, buf)
      case "google.protobuf.Timestamp" =>
        val ts = v.asInstanceOf[java.sql.Timestamp]
        val tsParsed = Parsed(Map("$ts" -> Message("$ts", Seq(
          Field("seconds", 1, "int64", repeated = false, Map.empty),
          Field("nanos", 2, "int32", repeated = false, Map.empty)))), Map.empty)
        writeLenDelimited(f.number, encode(tsParsed, "$ts", Map(
          "seconds" -> Math.floorDiv(ts.getTime, 1000L),
          "nanos" -> ts.getNanos)))
      case MapKV(k, mv) =>
        val entryMsg = mapEntryMessage(k, mv)
        val entryParsed = Parsed(
          parsed.messages + ("$entry" -> entryMsg), parsed.enums)
        v.asInstanceOf[Map[Any, Any]].foreach { case (mk, mvv) =>
          writeLenDelimited(f.number,
            encode(entryParsed, "$entry", Map("key" -> mk, "value" -> mvv)))
        }
      case t if parsed.enums.contains(t) =>
        ensure(20)
        writeRawVarint((f.number.toLong << 3) | 0, buf)
        writeRawVarint(parsed.enums(t).indexOf(v.toString).toLong, buf)
      case t if parsed.messages.contains(t) =>
        writeLenDelimited(f.number,
          encode(parsed, t, v.asInstanceOf[Map[String, Any]]))
      case _ => // int32/64, uint
        ensure(20)
        writeRawVarint((f.number.toLong << 3) | 0, buf)
        writeRawVarint(v.asInstanceOf[Number].longValue(), buf)
    }

    msg.fields.filter(f => values.contains(f.name)).foreach { f =>
      values(f.name) match {
        case s: Seq[_] if f.repeated => s.foreach(writeOne(f, _))
        case v => writeOne(f, v)
      }
    }
    buf.flip()
    val out = new Array[Byte](buf.remaining())
    buf.get(out)
    out
  }

  /** Back-compat alias (the codec is no longer flat-only). */
  def encodeFlat(parsed: Parsed, messageName: String,
                 values: Map[String, Any]): Array[Byte] =
    encode(parsed, messageName, values)

  /** Spark Row (in [[Parsed.toStructType]] field order) → the value map
    * [[encode]] consumes; absent/null fields are omitted (proto3
    * defaults).
    */
  def rowToValues(parsed: Parsed, messageName: String,
                  row: org.apache.spark.sql.Row): Map[String, Any] = {
    val msg = parsed.messages(messageName)
    msg.fields.zipWithIndex.flatMap { case (f, i) =>
      if (i >= row.length || row.isNullAt(i)) None
      else Some(f.name -> fromSparkValue(parsed, f.protoType, row.get(i),
        repeated = f.repeated))
    }.toMap
  }

  private def fromSparkValue(parsed: Parsed, t: String, v: Any,
                             repeated: Boolean): Any =
    if (repeated) v.asInstanceOf[scala.collection.Seq[Any]].toSeq
      .map(fromSparkValue(parsed, t, _, repeated = false))
    else t match {
      case MapKV(k, mv) =>
        v.asInstanceOf[scala.collection.Map[Any, Any]].toMap.map {
          case (mk, mvv) => fromSparkValue(parsed, k, mk, repeated = false) ->
            fromSparkValue(parsed, mv, mvv, repeated = false)
        }
      case m if parsed.messages.contains(m) =>
        rowToValues(parsed, m, v.asInstanceOf[org.apache.spark.sql.Row])
      case _ => v
    }

  /** Distributed encode of same-named DataFrame columns into a binary
    * proto column — the encode half of the `AsKafkaRecord` pair for
    * proto topics (used by the cat CLI to produce JSON docs into a
    * proto-schema'd topic). Columns must already carry the schema's
    * Spark types ([[Parsed.toStructType]]); cast first if they came
    * from JSON inference.
    */
  def encodeColumn(df: org.apache.spark.sql.DataFrame, protoText: String,
                   messageName: String,
                   outputCol: String): org.apache.spark.sql.DataFrame = {
    val driverParsed = parse(protoText)
    val fieldNames = driverParsed.messages(messageName).fields.map(_.name)
    val fieldIdx = fieldNames.map(df.schema.fieldIndex)
    val outSchema = StructType(df.schema.fields :+
      StructField(outputCol, BinaryType, nullable = true))
    df.mapPartitions { it =>
      val parsed = parse(protoText)
      it.map { row =>
        val ordered = org.apache.spark.sql.Row.fromSeq(fieldIdx.map { i =>
          if (row.isNullAt(i)) null else row.get(i)
        })
        val bytes = encode(parsed, messageName,
          rowToValues(parsed, messageName, ordered))
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ bytes)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
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
