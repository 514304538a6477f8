package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** CRC-32C (Castagnoli) as a native Catalyst expression with codegen —
  * Spark's builtin `crc32` is IEEE-polynomial, while the Kafka batch
  * checksum is Castagnoli (reference
  * `nisshi-sans-io/src/record/deflated.rs:155-165`).
  *
  * `doGenCode` emits a direct static call, so the expression stays inside
  * whole-stage codegen (no UDF serialization, no row boxing) — a custom
  * Expression beats a Scala UDF on the hot path.
  */
case class Crc32C(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "crc32c"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"crc32c requires binary input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Crc32C.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Crc32C.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Crc32C =
    copy(child = newChild)
}

object Crc32C {
  /** Static entry used by both interpreted and generated code. */
  def compute(bytes: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, 0, bytes.length)
    c.getValue
  }

  /** Column API: crc32c(binaryCol). */
  def crc32c(c: Column): Column =
    ColumnBridge.column(Crc32C(ColumnBridge.expression(c)))
}
