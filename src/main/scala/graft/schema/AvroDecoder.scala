package graft.schema

import java.io.ByteArrayOutputStream
import org.apache.avro.{Schema => ASchema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Avro binary payload <-> Spark rows (the reference's `AsArrow` /
  * `AsKafkaRecord` pair for Avro topics, `nisshi-schema/src/avro.rs:
  * 330-363, 507-537`), built on avro-core (no spark-avro connector in
  * this build).
  *
  * Decode runs partition-local inside mapPartitions with one reusable
  * reader per partition — no shuffle, no driver involvement; at 100 TB
  * decode throughput scales with input splits.
  */
object AvroDecoder {

  /** avro-java allocates a DECLARED bytes/string length before checking
    * it against the remaining input, and its SystemLimitException caps
    * default to ~2 GiB — so a 6-byte hostile payload declaring a 2 GiB
    * bytes field costs a 2 GiB allocation attempt per row (a memory
    * bomb; an OutOfMemoryError would also escape the per-row Exception
    * catch). Cap the limits at 64 MiB / 1 M items before any avro class
    * initializes in this JVM — far above any real record payload (the
    * broker's frame cap is orders of magnitude smaller) and small
    * enough that a hostile declaration fails typed instead of
    * allocating. Best-effort: the properties are read in avro's static
    * init, so this only binds if AvroDecoder loads before other avro
    * use (true for every graft decode path, driver and executor — the
    * closure references this object). An operator can pre-set the
    * properties to override.
    */
  private def capLimit(prop: String, cap: Long): Unit =
    if (System.getProperty(prop) == null) {
      System.setProperty(prop, cap.toString); ()
    }
  capLimit("org.apache.avro.limits.bytes.maxLength", 64L << 20)
  capLimit("org.apache.avro.limits.string.maxLength", 64L << 20)
  capLimit("org.apache.avro.limits.collectionItems.maxLength", 1L << 20)

  /** Decode a binary Avro column into a typed struct column appended as
    * `<outputCol>`; undecodable payloads yield null (the INVALID_RECORD
    * signal for the produce path to count).
    */
  def decodeColumn(df: DataFrame, binaryCol: String, avsc: String,
                   outputCol: String): DataFrame = {
    val sparkType = AvroSchemas.toDataType(AvroSchemas.parse(avsc))
    val outSchema = StructType(df.schema.fields :+
      StructField(outputCol, sparkType, nullable = true))
    val inputIdx = df.schema.fieldIndex(binaryCol)
    // Dataset.mapPartitions (not df.rdd + createDataFrame): the output
    // side serializes through a codegen'd row encoder instead of per-row
    // reflective CatalystTypeConverters, and the whole codec stays one
    // logical plan — measurably faster and no extra RDD boundary.
    df.mapPartitions { it =>
      // parse once per partition; Schema isn't serializable-stable.
      // Decoder and datum are REUSED across rows (toSpark copies
      // everything out eagerly, so recycling the datum is safe) — per-row
      // allocation is the decode loop's dominant JVM cost.
      val schema = new ASchema.Parser().parse(avsc)
      val reader = new GenericDatumReader[Any](schema)
      var reuseDecoder: org.apache.avro.io.BinaryDecoder = null
      var reuseDatum: Any = null
      it.map { row =>
        val bytes = if (row.isNullAt(inputIdx)) null
                    else row.getAs[Array[Byte]](inputIdx)
        val decoded =
          if (bytes == null) null
          else try {
            reuseDecoder = DecoderFactory.get().binaryDecoder(bytes, reuseDecoder)
            reuseDatum = reader.read(reuseDatum, reuseDecoder)
            toSpark(reuseDatum, schema)
          } catch { case _: Exception => reuseDatum = null; null }
        Row.fromSeq(row.toSeq :+ decoded)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Avro runtime value -> Spark external type, following the §1.3 map. */
  private[schema] def toSpark(v: Any, schema: ASchema): Any = v match {
    case null => null
    // UNION resolves FIRST: a nullable nested record arrives as a
    // GenericRecord whose declared schema HERE is the union — matching
    // the record case first would call getFields on the union and throw
    case u if schema.getType == ASchema.Type.UNION =>
      val nonNull = schema.getTypes.asScala.filter(_.getType != ASchema.Type.NULL)
      if (nonNull.size == 1) toSpark(u, nonNull.head)
      else { // tagged struct encoding
        val idx = GenericData.get().resolveUnion(schema, u)
        val member = schema.getTypes.get(idx)
        val memberIdx = nonNull.indexOf(member)
        Row.fromSeq(memberIdx +:
          nonNull.toSeq.zipWithIndex.map { case (m, i) =>
            if (i == memberIdx) toSpark(u, m) else null
          })
      }
    case r: GenericRecord =>
      Row.fromSeq(schema.getFields.asScala.toSeq.map { f =>
        toSpark(r.get(f.name), f.schema)
      })
    case s: org.apache.avro.util.Utf8 => s.toString
    case e: org.apache.avro.generic.GenericData.EnumSymbol => e.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a)
      schema.getLogicalType match {
        // unscaled big-endian two's-complement per the Avro spec
        case d: org.apache.avro.LogicalTypes.Decimal =>
          new java.math.BigDecimal(new java.math.BigInteger(a), d.getScale)
        case _ => a
      }
    case f: org.apache.avro.generic.GenericData.Fixed =>
      schema.getLogicalType match {
        case d: org.apache.avro.LogicalTypes.Decimal =>
          new java.math.BigDecimal(
            new java.math.BigInteger(f.bytes()), d.getScale)
        // only the declared logical type makes a fixed(12) a duration —
        // a plain 12-byte fixed (a 96-bit hash, say) stays binary
        case _ if schema.getProp("logicalType") == "duration" =>
          // three little-endian uint32s: months, days, milliseconds
          val bb = java.nio.ByteBuffer.wrap(f.bytes())
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          Row(bb.getInt, bb.getInt, bb.getInt)
        case _ => f.bytes()
      }
    case l: java.util.Collection[_] =>
      l.asScala.toSeq.map(toSpark(_, schema.getElementType))
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) =>
        k.toString -> toSpark(vv, schema.getValueType)
      }.toMap
    case l: Long if isTimestamp(schema) =>
      // full sub-millisecond fidelity (reference avro/arrow.rs:205-247
      // keeps micros/nanos) — no truncation through the millis ctor
      val micros = schema.getLogicalType.getName match {
        case n if n.endsWith("-nanos") => Math.floorDiv(l, 1000L)
        case n if n.endsWith("-micros") => l
        case _ => Math.multiplyExact(l, 1000L)
      }
      if (schema.getLogicalType.getName.startsWith("local-")) {
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      } else {
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      }
    case i: Int if schema.getLogicalType != null &&
      schema.getLogicalType.getName == "date" =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.toLong))
    case i: Int if schema.getLogicalType != null &&
      schema.getLogicalType.getName == "time-millis" =>
      i.toLong // schema maps time-millis to LongType
    case other => other
  }

  private def isTimestamp(s: ASchema): Boolean =
    s.getType == ASchema.Type.LONG && s.getLogicalType != null &&
      (s.getLogicalType.getName.startsWith("timestamp-") ||
        s.getLogicalType.getName.startsWith("local-timestamp-"))

  /** Test/ingest helper: encode a map of field values as Avro binary. */
  def encode(avsc: String, values: Map[String, Any]): Array[Byte] = {
    val schema = new ASchema.Parser().parse(avsc)
    val rec = new GenericData.Record(schema)
    values.foreach { case (k, v) => rec.put(k, v) }
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** Encode same-named DataFrame columns as an Avro binary column — the
    * distributed inverse of [[decodeColumn]] (the `AsKafkaRecord` half,
    * `nisshi-schema/src/avro.rs:507-537`): one writer per partition,
    * partition-local, no shuffle. Logical types round-trip with full
    * fidelity: decimal (unscaled two's-complement bytes), date (epoch
    * days), timestamp-millis/micros.
    */
  def encodeColumn(df: DataFrame, avsc: String, outputCol: String): DataFrame = {
    val parsed = AvroSchemas.parse(avsc)
    val fieldNames = parsed.getFields.asScala.map(_.name).toSeq
    val fieldIdx = fieldNames.map(df.schema.fieldIndex)
    val outSchema = StructType(df.schema.fields :+
      StructField(outputCol, BinaryType, nullable = true))
    df.mapPartitions { it =>
      val schema = new ASchema.Parser().parse(avsc)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val fields = schema.getFields.asScala.toSeq
      // stream + encoder reused across rows (reset per row); the record
      // is rebuilt because field values escape into the writer
      val out = new ByteArrayOutputStream(256)
      var reuseEncoder: org.apache.avro.io.BinaryEncoder = null
      it.map { row =>
        val rec = new GenericData.Record(schema)
        fields.zip(fieldIdx).foreach { case (f, i) =>
          rec.put(f.name,
            toAvro(if (row.isNullAt(i)) null else row.get(i), f.schema))
        }
        out.reset()
        reuseEncoder = EncoderFactory.get().binaryEncoder(out, reuseEncoder)
        writer.write(rec, reuseEncoder)
        reuseEncoder.flush()
        Row.fromSeq(row.toSeq :+ out.toByteArray)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Spark external value -> Avro runtime value (inverse of [[toSpark]]
    * over the encodable subset).
    */
  private[schema] def toAvro(v: Any, schema: ASchema): Any = v match {
    case null => null
    case _ if schema.getType == ASchema.Type.UNION =>
      val nonNull = schema.getTypes.asScala.filter(_.getType != ASchema.Type.NULL)
      v match {
        // general union: the tagged-struct encoding toSpark produces —
        // Row(tag, member0, member1, ...) picks the member by tag
        case r: Row if nonNull.size > 1 =>
          val tag = r.getInt(0)
          require(tag >= 0 && tag < nonNull.size,
            s"union tag $tag out of range for ${nonNull.size} members")
          toAvro(if (r.isNullAt(tag + 1)) null else r.get(tag + 1), nonNull(tag))
        case other => toAvro(other, nonNull.head)
      }
    // nested shapes — encodeColumn is decodeColumn's inverse, so every
    // external type toSpark can produce must encode back
    case r: Row if schema.getType == ASchema.Type.RECORD =>
      val rec = new GenericData.Record(schema)
      schema.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
        rec.put(f.name, toAvro(if (r.isNullAt(i)) null else r.get(i), f.schema))
      }
      rec
    case s: scala.collection.Seq[_] if schema.getType == ASchema.Type.ARRAY =>
      val out = new java.util.ArrayList[Any](s.size)
      s.foreach(e => out.add(toAvro(e, schema.getElementType)))
      out
    case m: scala.collection.Map[_, _] if schema.getType == ASchema.Type.MAP =>
      val out = new java.util.HashMap[String, Any]()
      m.foreach { case (k, vv) =>
        out.put(String.valueOf(k), toAvro(vv, schema.getValueType))
      }
      out
    case s: String if schema.getType == ASchema.Type.ENUM =>
      new GenericData.EnumSymbol(schema, s)
    // time-millis maps to LongType on the Spark side (see toSpark) but
    // its Avro carrier is an int
    case l: Long if schema.getType == ASchema.Type.INT &&
      schema.getLogicalType != null &&
      schema.getLogicalType.getName == "time-millis" => l.toInt
    case d: java.math.BigDecimal =>
      schema.getLogicalType match {
        case lt: org.apache.avro.LogicalTypes.Decimal =>
          // HALF_UP instead of the throwing default: values with more
          // fractional digits than the schema scale round, not abort
          val unscaled = d.setScale(lt.getScale, java.math.RoundingMode.HALF_UP)
            .unscaledValue.toByteArray
          if (schema.getType == ASchema.Type.FIXED) {
            // left-pad with the sign byte to the fixed size
            val size = schema.getFixedSize
            if (unscaled.length > size)
              throw new org.apache.avro.AvroTypeException(
                s"decimal $d needs ${unscaled.length} bytes, fixed(${size}) too small")
            val pad: Byte = if (unscaled.head < 0) -1 else 0
            val padded = Array.fill[Byte](size - unscaled.length)(pad) ++ unscaled
            new GenericData.Fixed(schema, padded)
          } else java.nio.ByteBuffer.wrap(unscaled)
        case _ => java.nio.ByteBuffer.wrap(d.unscaledValue.toByteArray)
      }
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case t: java.sql.Timestamp =>
      // floorDiv, not truncation: pre-epoch timestamps have a negative
      // getTime whose sub-second part is already in getNanos
      val micros =
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      if (schema.getLogicalType != null &&
          schema.getLogicalType.getName.endsWith("-millis"))
        Math.floorDiv(micros, 1000L)
      else micros
    case s: String => s
    case b: Array[Byte] =>
      if (schema.getType == ASchema.Type.FIXED) new GenericData.Fixed(schema, b)
      else java.nio.ByteBuffer.wrap(b)
    case other => other // int/long/float/double/boolean pass through
  }
}
