package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Byte-domain media kernels (the perceptual-hash family). Like
  * [[VectorKernels]], these are native codegen'd expressions: the hash
  * walks every payload byte, and Spark has no builtin byte-array HOFs —
  * the alternative (casting to string and per-char ascii() lambdas)
  * runs interpreted per byte.
  */
object MediaKernels {

  /** Block-mean perceptual hash: split the payload into `blocks` equal
    * byte segments (integer bounds `[b·n/blocks, (b+1)·n/blocks)`), set
    * bit b iff the segment's byte-value mean is STRICTLY above the
    * whole payload's mean — the cross-multiplied integer test
    * `segSum·n > totalSum·segLen`, exact in any engine. A classic
    * aHash/blockhash stand-in that needs no codec: near-identical blobs
    * (one byte edited, a few bytes appended) land within a few bits.
    * `blocks` must be ≤ 60: bits stay in the non-negative BIGINT range
    * both engines shift without overflow. Empty segments (payload
    * shorter than `blocks`) contribute 0-bits; an empty payload hashes
    * to 0. Overflow bound: segSum·n ≤ 255·n² needs n < ~190 MB — loud
    * require, not a wrap.
    */
  def blockMeanHash(p: Array[Byte], blocks: Int): Long = {
    require(blocks > 0 && blocks <= 60, s"blocks must be 1..60: $blocks")
    val n = p.length
    require(n < (1 << 27), s"payload too large for exact block hash: $n")
    if (n == 0) return 0L
    var total = 0L
    var i = 0
    while (i < n) { total += (p(i) & 0xff); i += 1 }
    var h = 0L
    var b = 0
    while (b < blocks) {
      val start = (b.toLong * n / blocks).toInt
      val end = ((b + 1).toLong * n / blocks).toInt
      var s = 0L
      var j = start
      while (j < end) { s += (p(j) & 0xff); j += 1 }
      if (s * n > total * (end - start)) h |= (1L << b)
      b += 1
    }
    h
  }
}

/** `block_mean_hash(payload)`: the 60-bit block-mean perceptual hash of
  * a binary column. NULL in → NULL out.
  */
case class BlockMeanHash(child: Expression, blocks: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "block_mean_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"block_mean_hash requires binary, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    MediaKernels.blockMeanHash(v.asInstanceOf[Array[Byte]], blocks)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.MediaKernels.blockMeanHash($v, $blocks)")

  override protected def withNewChildInternal(
      newChild: Expression): BlockMeanHash = copy(child = newChild)
}

object MediaExpressions {
  /** Column API: 60-bit block-mean perceptual hash of a binary column. */
  def blockMeanHash(payload: Column, blocks: Int = 60): Column =
    ColumnBridge.column(
      BlockMeanHash(ColumnBridge.expression(payload), blocks))
}
