package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType}

/** WARC (Web ARChive, ISO 28500) record framing — the container format
  * web corpora actually arrive in (Common Crawl ships `.warc.gz`). A
  * WARC file is a concatenation of records, each
  * `WARC/1.x\r\n<headers>\r\n\r\n<Content-Length payload bytes>\r\n\r\n`,
  * optionally with every record its own gzip member. The FRAMING walk
  * is the one part builtins can't express (Content-Length drives a
  * stateful cursor); it lives here as a native kernel returning the
  * record slices, and everything downstream — header fields, HTTP
  * status, body split — stays declarative `regexp_extract`/`substring`
  * over the exploded records (see TrainingQueries.qWarcParse).
  *
  * Reference behavior: the reference has no archive-ingest surface;
  * this extends the training-data pipeline the same way the media
  * codecs do — source-format plumbing a 100-TB crawl pipeline needs
  * before any text filter can run.
  */
object WarcKernels {

  /** Hostile-input caps: records per file and decompressed bytes. */
  private val MaxRecords = 1 << 20
  private val MaxInflated = 1 << 28

  private val Magic = "WARC/".getBytes("US-ASCII")

  /** Split a (plain or per-record-gzip) WARC file into its record
    * slices, each `WARC/…` through the end of its declared payload.
    * Null on any malformed framing (corrupt blobs are data at corpus
    * scale, not exceptions) — a file either parses whole or not at all,
    * so a truncated shard is caught, not silently half-read.
    */
  def warcRecords(p0: Array[Byte]): Array[Array[Byte]] = {
    if (p0 == null || p0.length < 8) return null
    // gzip magic: 0x1f 0x8b — CC-style member-per-record; the JDK's
    // GZIPInputStream reads concatenated members to EOF transparently
    val p: Array[Byte] =
      if ((p0(0) & 0xff) == 0x1f && (p0(1) & 0xff) == 0x8b) gunzip(p0)
      else p0
    if (p == null || p.length < 8) return null

    val out = Vector.newBuilder[Array[Byte]]
    var i = 0
    var n = 0
    while (i < p.length) {
      if (n >= MaxRecords) return null
      // tolerate trailing CRLF padding between records
      while (i + 1 < p.length && p(i) == '\r' && p(i + 1) == '\n') i += 2
      if (i >= p.length) {
        val r = out.result()
        return if (r.isEmpty) null else r.toArray
      }
      if (i + Magic.length > p.length) return null
      var m = 0
      while (m < Magic.length) {
        if (p(i + m) != Magic(m)) return null
        m += 1
      }
      val headerEnd = indexOfCrlfCrlf(p, i)
      if (headerEnd < 0) return null
      val len = contentLength(p, i, headerEnd)
      if (len < 0 || headerEnd + 4 + len > p.length) return null
      val recEnd = headerEnd + 4 + len
      out += java.util.Arrays.copyOfRange(p, i, recEnd.toInt)
      i = recEnd.toInt
      n += 1
    }
    val r = out.result()
    if (r.isEmpty) null else r.toArray
  }

  private def gunzip(p: Array[Byte]): Array[Byte] = {
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(p))
      val out = new java.io.ByteArrayOutputStream(math.min(p.length * 4, 1 << 16))
      val buf = new Array[Byte](8192)
      var r = in.read(buf)
      while (r >= 0) {
        out.write(buf, 0, r)
        if (out.size() > MaxInflated) return null // zip-bomb cap
        r = in.read(buf)
      }
      out.toByteArray
    } catch {
      case _: java.io.IOException => null // corrupt stream = hostile input
    }
  }

  private def indexOfCrlfCrlf(p: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < p.length) {
      if (p(i) == '\r' && p(i + 1) == '\n' && p(i + 2) == '\r' &&
          p(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Parse the Content-Length header (case-insensitive per RFC) out of
    * the record's header block; -1 when absent or non-numeric.
    */
  private def contentLength(p: Array[Byte], from: Int, headerEnd: Int): Long = {
    val name = "content-length:"
    var i = from
    while (i < headerEnd) {
      // at a line start: try a case-insensitive match of the name
      var j = 0
      while (j < name.length && i + j < headerEnd &&
          lower(p(i + j)) == name.charAt(j)) j += 1
      if (j == name.length) {
        var k = i + j
        while (k < headerEnd && p(k) == ' ') k += 1
        var v = -1L
        while (k < headerEnd && p(k) >= '0' && p(k) <= '9') {
          v = (if (v < 0) 0L else v) * 10 + (p(k) - '0')
          if (v > MaxInflated) return -1
          k += 1
        }
        return v
      }
      // advance to the next line
      while (i < headerEnd && p(i) != '\n') i += 1
      i += 1
    }
    -1
  }

  private def lower(b: Byte): Char = {
    val c = (b & 0xff).toChar
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
  }
}

/** `warc_records(payload)` → array<binary> record slices; null on
  * malformed framing (the BmpResizeNn null contract).
  */
case class WarcRecords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "warc_records"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"warc_records requires binary, got ${t.catalogString}")
  }
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val r = WarcKernels.warcRecords(v.asInstanceOf[Array[Byte]])
    if (r == null) null
    else new GenericArrayData(r.asInstanceOf[Array[AnyRef]])
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { v =>
      val r = ctx.freshName("warcRecords")
      s"""byte[][] $r = graft.functions.WarcKernels.warcRecords($v);
         |${ev.isNull} = $r == null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util
         |    .GenericArrayData((Object[]) $r);
         |}""".stripMargin
    })
  override protected def withNewChildInternal(
      newChild: Expression): WarcRecords = copy(child = newChild)
}

object WarcExpressions {
  def warcRecords(payload: Column): Column =
    ColumnBridge.column(WarcRecords(ColumnBridge.expression(payload)))
}
