package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}

/** Clipped n-gram overlap counting between a candidate and a reference
  * token array — the shared integer core of ROUGE-N (Lin 2004) and
  * BLEU's modified n-gram precision (Papineni et al. 2002), as ONE
  * per-pair kernel.
  *
  * Why a native kernel: the metric is per-(candidate, reference)-row
  * local by definition — exploding both sides' n-grams into rows and
  * funnelling them through a (pair, gram) join + per-pair aggregate
  * would pay two corpus-scale exchanges for a computation each row can
  * finish alone in one pass. At 100 TB the whole eval sweep stays a
  * narrow map over the pairs table, shuffle-free.
  *
  * Numeric contract: n-grams hash with the engine-portable h60 (top 60
  * bits of the md5 of the space-joined gram, the same definition every
  * dedup oracle replays), counting is exact longs on the hashes.
  * Hash collisions would need two distinct grams within ONE row pair
  * sharing 60 bits — ~(400 choose 2)·2^-60 per pair, mirrored exactly
  * by the DuckDB oracle either way since it hashes identically.
  */
object NgramOverlapKernels {

  /** Output schema: token lengths, then per n in 1..maxN the clipped
    * match count `m_n`, candidate gram total `tc_n`, reference gram
    * total `tr_n`.
    */
  def outType(maxN: Int): StructType = {
    var s = new StructType()
      .add("cand_len", LongType, nullable = false)
      .add("ref_len", LongType, nullable = false)
    (1 to maxN).foreach { n =>
      s = s.add(s"m$n", LongType, nullable = false)
        .add(s"tc$n", LongType, nullable = false)
        .add(s"tr$n", LongType, nullable = false)
    }
    s
  }

  private def h60(md: java.security.MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** All n-gram h60 hashes of `toks` for one n, in sequence order. */
  private def gramHashes(md: java.security.MessageDigest,
                         toks: Array[Array[Byte]], n: Int): Array[Long] = {
    val count = math.max(0, toks.length - n + 1)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var len = n - 1 // separators
      var j = 0
      while (j < n) { len += toks(i + j).length; j += 1 }
      val buf = new Array[Byte](len)
      var p = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(p) = ' '; p += 1 }
        val t = toks(i + j)
        System.arraycopy(t, 0, buf, p, t.length)
        p += t.length
        j += 1
      }
      out(i) = h60(md, buf)
      i += 1
    }
    out
  }

  def counts(cand: ArrayData, ref: ArrayData, maxN: Int): InternalRow = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def toks(a: ArrayData): Array[Array[Byte]] = {
      val out = Array.newBuilder[Array[Byte]]
      var i = 0
      while (i < a.numElements()) {
        // nulls and empty tokens are dropped — callers feed
        // filter(split(text,' '), _ != ''), and the oracle mirrors
        // list_filter; tolerating them here keeps the kernel total
        if (!a.isNullAt(i)) {
          val t = a.getUTF8String(i)
          if (t.numBytes() > 0) out += t.getBytes
        }
        i += 1
      }
      out.result()
    }
    val ct = toks(cand)
    val rt = toks(ref)
    val fields = new Array[Any](2 + 3 * maxN)
    fields(0) = ct.length.toLong
    fields(1) = rt.length.toLong
    var n = 1
    while (n <= maxN) {
      val cg = gramHashes(md, ct, n)
      val rg = gramHashes(md, rt, n)
      val refCounts = new java.util.HashMap[Long, Int](rg.length * 2)
      var i = 0
      while (i < rg.length) {
        refCounts.merge(rg(i), 1, (a: Int, b: Int) => a + b)
        i += 1
      }
      var m = 0L
      i = 0
      while (i < cg.length) {
        val c = refCounts.getOrDefault(cg(i), 0)
        if (c > 0) { refCounts.put(cg(i), c - 1); m += 1 }
        i += 1
      }
      fields(2 + 3 * (n - 1)) = m
      fields(3 + 3 * (n - 1)) = cg.length.toLong
      fields(4 + 3 * (n - 1)) = rg.length.toLong
      n += 1
    }
    new GenericInternalRow(fields)
  }
}

/** `ngram_overlap(cand_tokens, ref_tokens)`: per-pair clipped n-gram
  * overlap counts for n = 1..maxN as a struct (see
  * [[NgramOverlapKernels.outType]]). NULL if either side is NULL.
  */
case class NgramOverlapCounts(left: Expression, right: Expression, maxN: Int)
    extends BinaryExpression {

  // analysis-time: a non-positive n has no gram definition, and the
  // struct width must be decided before execution
  require(maxN >= 1 && maxN <= 8,
    s"ngram_overlap: need 1 <= maxN <= 8 (got $maxN)")

  override def dataType: DataType = NgramOverlapKernels.outType(maxN)
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_overlap"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_overlap requires array<string> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NgramOverlapKernels.counts(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], maxN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.NgramOverlapKernels.counts($a, $b, $maxN)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramOverlapCounts =
    copy(left = newLeft, right = newRight)
}

object NgramOverlapExpressions {
  /** Column API over [[NgramOverlapKernels.counts]]. */
  def ngramOverlap(cand: Column, ref: Column, maxN: Int): Column =
    ColumnBridge.column(NgramOverlapCounts(
      ColumnBridge.expression(cand), ColumnBridge.expression(ref), maxN))
}
