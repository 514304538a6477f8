package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Applying a trained BPE merge table to a token stream — the encode
  * half of the tokenizer whose TRAINING is
  * [[graft.ops.TextAnalysis.bpeTrainMerges]].
  *
  * Training is corpus-global (each round needs global pair counts);
  * ENCODING is embarrassingly per-document: the merge table rides into
  * the executors once as a reference object and each row is rewritten
  * in a tight local loop — a shuffle-free narrow map, which is why
  * tokenizer application is the cheapest stage of a 100 TB pipeline
  * while tokenizer training is the expensive one.
  *
  * Semantics are EXACTLY the trainer's rewrite rule, per rank in
  * training order: scan left to right, merge non-overlapping adjacent
  * (a, b) occurrences into the compound symbol "a b" (the trainer's
  * representation), later ranks seeing earlier ranks' output. A
  * sequence "a a a" under rule (a, a) becomes ["a a", "a"], matching
  * the trainer's gaps-and-islands odd-occurrence selection.
  */
object BpeKernels {

  /** One pass per rank over the stream; O(ranks × tokens) per row. */
  def bpeApply(toks: ArrayData, a: Array[UTF8String], b: Array[UTF8String],
               merged: Array[UTF8String]): ArrayData = {
    val n = toks.numElements()
    var cur = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i))
        throw new IllegalArgumentException(
          "bpe_encode: null token — clean the corpus first")
      cur.add(toks.getUTF8String(i))
      i += 1
    }
    var r = 0
    while (r < a.length) {
      val next = new java.util.ArrayList[UTF8String](cur.size())
      var j = 0
      while (j < cur.size()) {
        if (j + 1 < cur.size() && cur.get(j).equals(a(r)) &&
            cur.get(j + 1).equals(b(r))) {
          next.add(merged(r))
          j += 2 // non-overlapping, left to right
        } else {
          next.add(cur.get(j))
          j += 1
        }
      }
      cur = next
      r += 1
    }
    new GenericArrayData(cur.toArray())
  }
}

/** `bpe_encode(tokens)`: rewrite an array<string> token stream through a
  * fixed rank-ordered merge table (driver-side constant, shipped as
  * reference objects — not a join).
  */
case class BpeEncode(child: Expression, mergesA: Vector[String],
                     mergesB: Vector[String])
    extends UnaryExpression {

  @transient private lazy val aArr: Array[UTF8String] =
    mergesA.map(UTF8String.fromString).toArray
  @transient private lazy val bArr: Array[UTF8String] =
    mergesB.map(UTF8String.fromString).toArray
  @transient private lazy val mArr: Array[UTF8String] =
    mergesA.zip(mergesB).map { case (x, y) =>
      UTF8String.fromString(x + " " + y) }.toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    BpeKernels.bpeApply(v.asInstanceOf[ArrayData], aArr, bArr, mArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeA", aArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val bRef = ctx.addReferenceObj("bpeB", bArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val mRef = ctx.addReferenceObj("bpeM", mArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.BpeKernels.bpeApply($v, $aRef, $bRef, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeExpressions {
  /** Column API: encode an array<string> token column through the
    * rank-ordered merge table.
    */
  def bpeEncode(tokens: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(tokens),
      merges.map(_._1).toVector, merges.map(_._2).toVector))

  /** Column API: DEFLATE-compressed byte length of a string — the
    * compression-ratio quality signal (RefinedWeb/Dolma-style):
    * repetitive or templated text compresses far below natural prose,
    * so `length(text) / deflate_len(text)` flags boilerplate without
    * any token-level modeling. One native kernel per row, narrow map.
    */
  def deflateLen(text: Column): Column =
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(text)))
}

object DeflateKernels {
  /** Compressed size of the UTF-8 bytes under raw DEFLATE at the
    * default level — a Deflater per call (the JNI object is cheap
    * relative to the compression itself, and sharing one across rows
    * would need thread-local state the expression contract does not
    * guarantee).
    */
  def deflateLen(s: UTF8String): Long = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** `deflate_len(text)`: compressed byte length of a string column. */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "deflate_len"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deflate_len requires string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    DeflateKernels.deflateLen(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.DeflateKernels.deflateLen($v)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}
