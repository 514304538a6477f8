package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenizer application (Wu et al. 2016; the BERT tokenizer
  * family) — greedy longest-match-first segmentation of each whitespace
  * word against a fixed vocabulary, continuation pieces carrying the
  * `##` prefix, whole-word `[UNK]` fallback when any position fails to
  * match. Completes the engine's tokenizer triad next to BPE
  * ([[BpeExpressions]]) and the unigram LM ([[UnigramExpressions]]).
  *
  * Scale shape mirrors `bpe_encode`: the vocabulary rides into the
  * executors ONCE PER EXECUTOR as a `Broadcast` (a 32k-piece vocab
  * inside the task binary would re-ship driver→executor for every task
  * — the "task of very large size" failure mode), and each row is
  * segmented in a tight local loop: a shuffle-free narrow map that runs
  * at scan speed over 100 TB of text.
  *
  * Match semantics (the HuggingFace / original BERT contract):
  *  - words longer than `maxWordChars` CODE POINTS become `[UNK]`
  *    outright (the runaway-word guard);
  *  - at position 0 the longest vocabulary piece WITHOUT the `##`
  *    prefix matching a prefix of the word wins; at later positions the
  *    longest piece WITH `##` wins (matched against the piece's bare
  *    text);
  *  - if any position matches nothing, the WHOLE word collapses to the
  *    unk token (partial segmentations are discarded);
  *  - the empty word (doubled separators) emits nothing.
  * Positions count Unicode code points, matching the DuckDB oracle's
  * character-counting `substr`.
  */
object WordPieceKernels {

  /** Broadcast payload: the piece set (continuations stored WITH their
    * `##` prefix, exactly as the published vocab files list them), the
    * unk token, and the per-word length guard.
    */
  final case class Vocab(pieces: java.util.HashSet[String], unk: UTF8String,
                         maxWordChars: Int) extends Serializable

  def vocab(pieces: Seq[String], unk: String, maxWordChars: Int): Vocab = {
    val set = new java.util.HashSet[String](pieces.size * 2)
    pieces.foreach(p => set.add(p))
    Vocab(set, UTF8String.fromString(unk), maxWordChars)
  }

  /** Segment every word of `words`, concatenating the per-word piece
    * streams into one row-level stream. O(word_len²) hash probes per
    * word, bounded by `maxWordChars`; zero shared mutable state.
    */
  def encodeWords(words: ArrayData, v: Vocab): ArrayData = {
    val n = words.numElements()
    val out = new java.util.ArrayList[UTF8String](n * 2)
    var t = 0
    while (t < n) {
      if (words.isNullAt(t))
        throw new IllegalArgumentException(
          "wordpiece_encode: null token — clean the corpus first")
      encodeWord(words.getUTF8String(t), v, out)
      t += 1
    }
    new GenericArrayData(out.toArray())
  }

  private def encodeWord(w: UTF8String, v: Vocab,
                         out: java.util.ArrayList[UTF8String]): Unit = {
    val s = w.toString
    if (s.isEmpty) return
    val cps = s.codePoints().toArray
    if (cps.length > v.maxWordChars) { out.add(v.unk); return }
    val pieces = new java.util.ArrayList[UTF8String](4)
    var start = 0
    while (start < cps.length) {
      var end = cps.length
      var found: String = null
      while (end > start && (found eq null)) {
        val sub = new String(cps, start, end - start)
        val cand = if (start == 0) sub else "##" + sub
        // position 0 takes only non-continuation pieces: a WORD that
        // literally starts with "##" must not alias a "##x" vocab
        // entry (the oracle's `NOT LIKE '##%'` at p = 1)
        if (v.pieces.contains(cand) &&
            !(start == 0 && sub.startsWith("##"))) found = cand
        else end -= 1
      }
      if (found eq null) { out.add(v.unk); return } // whole-word fallback
      pieces.add(UTF8String.fromString(found))
      start = end
    }
    out.addAll(pieces)
    ()
  }

  /** Codegen entry point: segment against the broadcast vocab
    * (`bc.value` is a cached field read after the first per-executor
    * fetch — per-task driver egress is zero bytes).
    */
  def encodeWordsBc(words: ArrayData, bc: Broadcast[Vocab]): ArrayData =
    encodeWords(words, bc.value)
}

/** `wordpiece_encode(words)`: greedy longest-match WordPiece pieces of
  * an array<string> word column, vocab riding as a broadcast.
  */
case class WordPieceEncodeWords(child: Expression,
                                vocab: Broadcast[WordPieceKernels.Vocab])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    WordPieceKernels.encodeWordsBc(v.asInstanceOf[ArrayData], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("wpVocabBc", vocab,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.WordPieceKernels.encodeWordsBc($v, $bcRef)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WordPieceEncodeWords = copy(child = newChild)
}

object WordPieceExpressions {

  // same per-(context, vocab) broadcast reuse as PhraseExpressions —
  // re-analyzed SQL must not mint a fresh broadcast per query
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, Seq[String], String, Int), Broadcast[WordPieceKernels.Vocab]]()

  private[graft] def broadcastFor(pieces: Seq[String], unk: String,
                                  maxWordChars: Int)
      : Broadcast[WordPieceKernels.Vocab] = {
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    // evict entries from stopped contexts (one active context per JVM)
    // — see PhraseExpressions.broadcastFor
    cache.keySet.removeIf(_._1 != sc.applicationId)
    cache.computeIfAbsent((sc.applicationId, pieces, unk, maxWordChars),
      _ => sc.broadcast(WordPieceKernels.vocab(pieces, unk, maxWordChars)))
  }

  /** Column API: WordPiece-segment an array<string> word column through
    * a fixed vocabulary (continuation pieces listed with their `##`
    * prefix). The vocab ships as ONE broadcast per plan.
    */
  def wordpieceEncode(words: Column, pieces: Seq[String],
                      unk: String = "[UNK]",
                      maxWordChars: Int = 100): Column = {
    require(pieces.nonEmpty, "empty wordpiece vocab")
    require(maxWordChars > 0, "maxWordChars must be positive")
    ColumnBridge.column(
      WordPieceEncodeWords(ColumnBridge.expression(words),
        broadcastFor(pieces, unk, maxWordChars)))
  }
}
