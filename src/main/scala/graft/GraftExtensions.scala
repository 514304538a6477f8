package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.functions.{Crc32C, DeflateLen, DotQLongs, PhraseCount,
  PhraseKernels, WordPieceEncodeWords, WordPieceKernels}

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
    // Aho–Corasick blocklist scan: phrase_count(text, array('p1','p2')).
    // The phrase list must be a literal — the automaton is built ONCE at
    // analysis time on the driver and broadcast, exactly like the Column
    // API path; a non-foldable list would mean an automaton per row.
    ext.injectFunction((
      new FunctionIdentifier("phrase_count"),
      new ExpressionInfo(classOf[PhraseCount].getName, "phrase_count"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "phrase_count(text, array<string> phrases)")
        require(children(1).foldable,
          "phrase_count: the phrase list must be a literal array")
        val phrases = children(1).eval().asInstanceOf[ArrayData]
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq
        PhraseCount(children.head,
          org.apache.spark.sql.SparkSession.active.sparkContext
            .broadcast(PhraseKernels.build(phrases)))
      }))
    // WordPiece segmentation: wordpiece_encode(words, array('un','##a')).
    // Same literal-vocab contract as phrase_count.
    ext.injectFunction((
      new FunctionIdentifier("wordpiece_encode"),
      new ExpressionInfo(classOf[WordPieceEncodeWords].getName,
        "wordpiece_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "wordpiece_encode(words, array<string> vocab)")
        require(children(1).foldable,
          "wordpiece_encode: the vocab must be a literal array")
        val pieces = children(1).eval().asInstanceOf[ArrayData]
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq
        WordPieceEncodeWords(children.head,
          org.apache.spark.sql.SparkSession.active.sparkContext
            .broadcast(WordPieceKernels.vocab(pieces, "[UNK]", 100)))
      }))
  }
}
