package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernels. NFC is the dedup-critical one: the
  * SAME text arrives precomposed (é = U+00E9) from one crawl and
  * decomposed (e + U+0301) from another, and byte-level exact dedup
  * misses the duplicate until both canonicalize. Spark has no builtin
  * normalizer; `java.text.Normalizer` implements the Unicode standard
  * NFC, and DuckDB's `nfc_normalize` is the oracle twin (verified
  * equivalent on composed/decomposed/ligature/compat cases).
  */
object UnicodeKernels {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan and most real
    // text is already NFC — skip the rebuild allocation when so
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}

/** `nfc(text)`: Unicode NFC canonical composition. NULL in → NULL out. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc requires string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    UnicodeKernels.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.UnicodeKernels.nfc($v)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object UnicodeExpressions {
  /** Column API: Unicode NFC canonical composition of a string column. */
  def nfc(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
