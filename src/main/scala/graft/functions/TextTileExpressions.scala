package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** TextTiling gap scoring as ONE per-doc kernel (Hearst 1997) — the
  * shuffle-free form of [[graft.ops.TextAnalysis.textTiles]].
  *
  * Why a native kernel: the relational form explodes every gap into
  * 2·blockK (doc, gap, side, word-hash) rows and funnels them through
  * a micro-group count, a left×right hash join, two norm aggregates and
  * a per-doc window — four exchanges carrying ~(|tokens|/step)·2k rows
  * off every scan. But the computation is per-doc local by definition
  * (a gap's cosine reads only its own doc's tokens), so one pass over
  * the token array computes every gap's cosine AND the valley depths
  * with ZERO shuffle — at 100 TB the whole operator is a narrow map
  * (the measured relational form ran 105 s at the 100x decade entirely
  * on those exchanges).
  *
  * Numeric parity with the relational form (and the DuckDB oracle) is
  * bit-exact: tokens hash with the engine-portable h60 (top 60 bits of
  * md5), bag counts/dot/norms are exact longs, and the one cosine
  * replays Spark's own double rounding — `round(x, 6)` is
  * BigDecimal(Double.toString(x)).setScale(6, HALF_UP) (what Catalyst's
  * Round does for DoubleType), then `round(r6 * 1e6)` the same at scale
  * 0. The relational implementation stays as the spec's reference twin.
  */
object TextTileKernels {

  private def h60(md: java.security.MessageDigest, s: org.apache.spark.unsafe.types.UTF8String): Long = {
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Spark Round(DoubleType) replica: decimal HALF_UP at `scale` over
    * the double's shortest decimal representation.
    */
  private def roundD(x: Double, scale: Int): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(scale, RoundingMode.HALF_UP).doubleValue()

  private val Struct = new StructType()
    .add("gap_pos", LongType, nullable = false)
    .add("cos_e6", LongType, nullable = false)
    .add("depth_e6", LongType, nullable = false)
    .add("boundary", LongType, nullable = false)
  val OutType: DataType = ArrayType(Struct, containsNull = false)

  /** All gap rows for one doc's token array: (gap_pos, cos_e6,
    * depth_e6, boundary), gaps at every `step` tokens, block bags of up
    * to `blockK` tokens a side, valley depth against the 2-gap
    * neighborhood maxima. Docs with <= step tokens emit no gaps (the
    * relational filter's semantics — explode of the empty array drops
    * the doc).
    */
  def gaps(tokens: ArrayData, blockK: Int, step: Int,
           depthMinE6: Long): ArrayData = {
    val n = tokens.numElements()
    if (n <= step) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    // null tokens (possible for a caller-built array; split() never
    // makes one) hash to NULL relationally: they group among themselves
    // into the norms but the dot join on a null key never matches —
    // replicated here with a null-marker count kept out of the dot
    val h = new Array[Long](n)
    val isNull = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) isNull(i) = true
      else h(i) = h60(md, tokens.getUTF8String(i))
      i += 1
    }
    val gMax = ((n - 1) / step) * step
    val nGaps = gMax / step
    val cos = new Array[Long](nGaps)
    val left = new java.util.HashMap[java.lang.Long, Long]()
    val right = new java.util.HashMap[java.lang.Long, Long]()
    var gi = 0
    while (gi < nGaps) {
      val g = (gi + 1) * step
      left.clear(); right.clear()
      var nullL = 0L
      var nullR = 0L
      var j = math.max(0, g - blockK)
      while (j < g) {
        if (isNull(j)) nullL += 1 else left.merge(h(j), 1L, _ + _)
        j += 1
      }
      j = g
      val rEnd = math.min(n, g + blockK)
      while (j < rEnd) {
        if (isNull(j)) nullR += 1 else right.merge(h(j), 1L, _ + _)
        j += 1
      }
      var dot = 0L
      var na = nullL * nullL
      var nb = nullR * nullR
      val lIt = left.entrySet().iterator()
      while (lIt.hasNext) {
        val e = lIt.next()
        val cl = e.getValue
        na += cl * cl
        val cr = right.get(e.getKey)
        if (cr != null) dot += cl * cr.longValue()
      }
      val rIt = right.values().iterator()
      while (rIt.hasNext) { val cr = rIt.next(); nb += cr * cr }
      val v = dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
      cos(gi) = roundD(roundD(v, 6) * 1e6, 0).toLong
      gi += 1
    }
    val out = new Array[Any](nGaps)
    gi = 0
    while (gi < nGaps) {
      var prevMax = Long.MinValue
      if (gi >= 1) prevMax = math.max(prevMax, cos(gi - 1))
      if (gi >= 2) prevMax = math.max(prevMax, cos(gi - 2))
      var nextMax = Long.MinValue
      if (gi + 1 < nGaps) nextMax = math.max(nextMax, cos(gi + 1))
      if (gi + 2 < nGaps) nextMax = math.max(nextMax, cos(gi + 2))
      val c = cos(gi)
      val p = if (prevMax == Long.MinValue) c else prevMax
      val x = if (nextMax == Long.MinValue) c else nextMax
      val depth = (p - c) + (x - c)
      out(gi) = InternalRow((gi + 1).toLong * step, c, depth,
        if (depth >= depthMinE6) 1L else 0L)
      gi += 1
    }
    new GenericArrayData(out)
  }
}

/** `text_tile_gaps(tokens)`: every TextTiling gap of a doc's token
  * array as (gap_pos, cos_e6, depth_e6, boundary) structs. NULL in →
  * NULL out; docs with <= step tokens yield the empty array.
  */
case class TextTileGaps(child: Expression, blockK: Int, step: Int,
                        depthMinE6: Long) extends UnaryExpression {

  // analysis-time rejection, shared by the Column API and the SQL
  // registry path: step=0 would divide by zero in the kernel, step<0
  // a negative gap array, blockK<1 an empty bag (0/0 cosine) — all
  // untyped per-row crashes if they reached execution
  require(blockK >= 1 && step >= 1 && depthMinE6 >= 0,
    s"text_tile_gaps: need blockK >= 1, step >= 1, depth_min_e6 >= 0 " +
      s"(got k=$blockK step=$step depth=$depthMinE6)")

  override def dataType: DataType = TextTileKernels.OutType
  override def prettyName: String = "text_tile_gaps"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"text_tile_gaps requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextTileKernels.gaps(v.asInstanceOf[ArrayData], blockK, step, depthMinE6)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.TextTileKernels.gaps($v, $blockK, $step, ${depthMinE6}L)")

  override protected def withNewChildInternal(
      newChild: Expression): TextTileGaps = copy(child = newChild)
}

object TextTileExpressions {
  /** Column API over [[TextTileKernels.gaps]]. */
  def textTileGaps(tokens: Column, blockK: Int, step: Int,
                   depthMinE6: Long): Column =
    ColumnBridge.column(TextTileGaps(
      ColumnBridge.expression(tokens), blockK, step, depthMinE6))
}
