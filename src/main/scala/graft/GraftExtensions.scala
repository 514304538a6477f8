package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{Crc32C, DeflateLen, DotQLongs}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * functions so they're usable from SQL text as well as the Column API.
  *
  * Usage:
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // programmatic
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *
  * This is the (c)-tier extension point from the build rules — the same
  * registration path a custom LogicalPlan/Strategy would use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("crc32c"),
      new ExpressionInfo(classOf[Crc32C].getName, "crc32c"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "crc32c takes exactly one argument")
        Crc32C(children.head)
      }))
    // exact fixed-point dot product over quantized long vectors — the
    // similarity kernel, usable straight from SQL text
    ext.injectFunction((
      new FunctionIdentifier("dotq"),
      new ExpressionInfo(classOf[DotQLongs].getName, "dotq"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dotq takes exactly two array<bigint> arguments")
        DotQLongs(children(0), children(1))
      }))
    // DEFLATE-compressed length of a string — the compression-ratio
    // repetitiveness signal's kernel
    ext.injectFunction((
      new FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "deflate_len takes exactly one argument")
        DeflateLen(children.head)
      }))
  }
}
