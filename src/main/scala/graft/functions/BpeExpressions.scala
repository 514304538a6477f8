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

/** Applying a trained BPE merge table — the encode half of the
  * tokenizer whose TRAINING is
  * [[graft.ops.TextAnalysis.bpeTrainMerges]].
  *
  * Training is corpus-global (each round needs global pair counts);
  * ENCODING is embarrassingly per-document: the merge table rides into
  * the executors ONCE PER EXECUTOR as a `Broadcast` (not once per task
  * inside the serialized expression — a 32k-merge vocab inside the task
  * binary would ship driver→executor for every task, the "task of very
  * large size" failure mode) and each row is rewritten in a tight local
  * loop — a shuffle-free narrow map, which is why tokenizer application
  * is the cheapest stage of a 100 TB pipeline while tokenizer training
  * is the expensive one.
  *
  * Semantics are EXACTLY the trainer's rewrite rule (Sennrich et al.
  * 2016: symbols start as the CODE POINTS of each whitespace word,
  * merges never cross word boundaries), per rank in training order:
  * scan each word's symbols left to right, merge non-overlapping
  * adjacent (a, b) occurrences into the compound symbol "a b" (the
  * trainer's representation), later ranks seeing earlier ranks'
  * output. Symbols ["a","a","a"] under rule (a, a) become
  * ["a a", "a"], matching the trainer's left-to-right selection.
  */
object BpeKernels {

  /** The ONE code-point splitter ("" → [""], surrogate pairs kept
    * whole) — both the dictionary initialization ([[charSyms]]) and the
    * encode path ([[bpeApplyWords]]) call this, so the split contract
    * cannot drift between training and encoding.
    */
  private def symsList(w: UTF8String): java.util.ArrayList[UTF8String] = {
    val s = w.toString
    val out = new java.util.ArrayList[UTF8String](s.length max 1)
    if (s.isEmpty) out.add(UTF8String.fromString(""))
    else {
      val cps = s.codePoints().toArray
      var i = 0
      while (i < cps.length) {
        out.add(UTF8String.fromString(new String(cps, i, 1)))
        i += 1
      }
    }
    out
  }

  /** Code-point symbols of one word: "" → [""] (the split contract both
    * the trainer's dictionary and the DuckDB oracle's
    * `string_split(word, '')` use), surrogate pairs kept whole.
    */
  def charSyms(w: UTF8String): ArrayData =
    new GenericArrayData(symsList(w).toArray())

  /** The GPT-2 `bytes_to_unicode` table: printable latin-1 bytes keep
    * their codepoint (33..126, 161..172, 174..255); every other byte b
    * maps to codepoint 256+k in byte order — 256 DISTINCT visible
    * one-char symbols, so byte streams round-trip losslessly through
    * strings. One definition; the DuckDB oracle's 256-row mapping CTE
    * renders from it.
    */
  val ByteToCp: Array[Int] = {
    val keep =
      ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = new Array[Int](256)
    var n = 0
    for (b <- 0 until 256) {
      if (keep(b)) arr(b) = b
      else { arr(b) = 256 + n; n += 1 }
    }
    arr
  }

  /** BYTE-level symbols of one word (the GPT-2 contract: UTF-8 bytes,
    * each mapped through [[ByteToCp]]): "" → [""], matching the
    * char-level empty-word contract.
    */
  private def byteSymsList(w: UTF8String): java.util.ArrayList[UTF8String] = {
    val bytes = w.getBytes
    val out = new java.util.ArrayList[UTF8String](bytes.length max 1)
    if (bytes.isEmpty) out.add(UTF8String.fromString(""))
    else {
      var i = 0
      while (i < bytes.length) {
        out.add(UTF8String.fromString(
          new String(Character.toChars(ByteToCp(bytes(i) & 0xff)))))
        i += 1
      }
    }
    out
  }

  def byteSyms(w: UTF8String): ArrayData =
    new GenericArrayData(byteSymsList(w).toArray())

  /** One pass per rank over one symbol array; O(ranks × symbols). */
  def bpeApply(toks: ArrayData, a: Array[UTF8String], b: Array[UTF8String],
               merged: Array[UTF8String]): ArrayData = {
    val n = toks.numElements()
    val cur = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i))
        throw new IllegalArgumentException(
          "bpe_rewrite: null symbol — clean the corpus first")
      cur.add(toks.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(applyRanks(cur, a, b, merged).toArray())
  }

  /** In-place merge passes over one word's symbol list (the inner loop
    * of both [[bpeApplyWords]] and the trainer's per-round rewrite —
    * ONE definition so the encode half can never drift from training).
    */
  private def applyRanks(cur0: java.util.ArrayList[UTF8String],
                         a: Array[UTF8String], b: Array[UTF8String],
                         merged: Array[UTF8String])
      : java.util.ArrayList[UTF8String] = {
    var cur = cur0
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
    cur
  }

  /** Word-level encode: every WORD in `words` splits to code-point
    * symbols and runs the full rank-ordered merge pass within the word
    * (merges never cross word boundaries — the Sennrich contract); the
    * per-word symbol streams concatenate into one row-level stream.
    * O(ranks × word length) per word, zero allocations shared across
    * rows.
    */
  def bpeApplyWords(words: ArrayData, a: Array[UTF8String],
                    b: Array[UTF8String], merged: Array[UTF8String],
                    byteLevel: Boolean = false): ArrayData = {
    val n = words.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var t = 0
    while (t < n) {
      if (words.isNullAt(t))
        throw new IllegalArgumentException(
          "bpe_encode: null token — clean the corpus first")
      val w = words.getUTF8String(t)
      val syms = if (byteLevel) byteSymsList(w) else symsList(w)
      out.addAll(applyRanks(syms, a, b, merged))
      t += 1
    }
    new GenericArrayData(out.toArray())
  }

  /** [[bpeApply]] against a pre-built merge-table tuple — the codegen
    * entry point of the PLAIN (non-broadcast) per-round rewrite.
    */
  def bpeApplyTbl(toks: ArrayData, t: BpeKernelsBc.MergeTable): ArrayData =
    bpeApply(toks, t._1, t._2, t._3)

  /** The broadcast payload: (a, b, "a b") columns of the rank-ordered
    * merge table, pre-encoded as UTF8String so executors deserialize it
    * once and probe with zero per-row conversion.
    */
  def mergeArrays(merges: Seq[(String, String)])
      : (Array[UTF8String], Array[UTF8String], Array[UTF8String]) = (
    merges.map(m => UTF8String.fromString(m._1)).toArray,
    merges.map(m => UTF8String.fromString(m._2)).toArray,
    merges.map(m => UTF8String.fromString(m._1 + " " + m._2)).toArray)
}

/** The (a, b, "a b") merge-table arrays, broadcast once per plan. */
object BpeKernelsBc {
  type MergeTable = (Array[UTF8String], Array[UTF8String], Array[UTF8String])

  /** Word-level encode against a broadcast merge table (`bc.value` is a
    * cached field read after the first per-executor fetch — the per-row
    * cost is a null check, the per-TASK cost is zero bytes of driver
    * egress).
    */
  def bpeApplyWords(words: ArrayData, bc: Broadcast[MergeTable],
                    byteLevel: Boolean): ArrayData = {
    val t = bc.value
    BpeKernels.bpeApplyWords(words, t._1, t._2, t._3, byteLevel)
  }
}

/** `bpe_rewrite(syms)`: rewrite an array<string> SYMBOL stream through a
  * rank-ordered merge table riding as a PLAIN reference object inside
  * the serialized expression. This is the trainer's per-round rewrite:
  * the table is one (or a few) rules, so shipping it in the task binary
  * is bytes — while a `Broadcast` per training round would mint 32k
  * never-destroyed broadcast blocks over a real vocabulary run. The
  * corpus-facing encode path ([[BpeEncodeWords]]) carries the full
  * trained table and DOES broadcast.
  */
case class BpeRewriteSyms(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val table: BpeKernelsBc.MergeTable =
    BpeKernels.mergeArrays(merges)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_rewrite"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_rewrite requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    BpeKernels.bpeApplyTbl(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tblRef = ctx.addReferenceObj("bpeTbl", table, "scala.Tuple3")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.BpeKernels.bpeApplyTbl($v, $tblRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeRewriteSyms =
    copy(child = newChild)
}

/** `bpe_encode(words)`: split each WORD of an array<string> column into
  * code-point symbols and rewrite through the broadcast merge table —
  * the user-facing tokenizer-application expression.
  */
case class BpeEncodeWords(child: Expression,
                          merges: Broadcast[BpeKernelsBc.MergeTable],
                          byteLevel: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    BpeKernelsBc.bpeApplyWords(v.asInstanceOf[ArrayData], merges, byteLevel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bpeMergesBc", merges,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.BpeKernelsBc.bpeApplyWords($v, $bcRef, $byteLevel)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWords =
    copy(child = newChild)
}

/** `char_syms(word)`: the code-point symbol array of one word ("" →
  * [""]) — the dictionary-initialization step of BPE training.
  */
case class CharSyms(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_syms"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_syms requires string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    BpeKernels.charSyms(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.BpeKernels.charSyms($v)")

  override protected def withNewChildInternal(newChild: Expression): CharSyms =
    copy(child = newChild)
}

/** `byte_syms(word)`: the GPT-2 byte-level symbol array of one word
  * ("" -> [""]) — the dictionary-initialization step of BYTE-level BPE.
  */
case class ByteSyms(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "byte_syms"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"byte_syms requires string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    BpeKernels.byteSyms(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.BpeKernels.byteSyms($v)")

  override protected def withNewChildInternal(newChild: Expression): ByteSyms =
    copy(child = newChild)
}

object BpeExpressions {

  /** Test hook: merge-table broadcasts minted by this JVM. Training
    * must not mint ANY (its per-round rewrite ships plain reference
    * objects); only the corpus-facing encode broadcasts count here.
    */
  private[graft] val broadcastsMinted =
    new java.util.concurrent.atomic.AtomicLong

  private def bcMerges(merges: Seq[(String, String)])
      : Broadcast[BpeKernelsBc.MergeTable] = {
    broadcastsMinted.incrementAndGet()
    org.apache.spark.sql.SparkSession.active.sparkContext
      .broadcast(BpeKernels.mergeArrays(merges))
  }

  /** Column API: encode an array<string> WORD column through the
    * rank-ordered merge table (each word → code-point symbols → merge
    * passes, concatenated). The table ships as a broadcast.
    */
  def bpeEncode(words: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeWords(ColumnBridge.expression(words),
      bcMerges(merges)))

  /** Column API: rewrite an array<string> SYMBOL column through the
    * merge table — the trainer's per-round rewrite step. The table is
    * round-sized (one rule), so it rides as a plain reference object:
    * no broadcast to mint, none to leak across 32k training rounds.
    */
  def bpeRewriteSyms(syms: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeRewriteSyms(ColumnBridge.expression(syms), merges))

  /** Column API: code-point symbol array of a word column. */
  def charSyms(word: Column): Column =
    ColumnBridge.column(CharSyms(ColumnBridge.expression(word)))

  /** Column API: GPT-2 byte-level symbol array of a word column. */
  def byteSyms(word: Column): Column =
    ColumnBridge.column(ByteSyms(ColumnBridge.expression(word)))

  /** Column API: BYTE-level encode — [[bpeEncode]] with GPT-2 byte
    * symbolization of each word before the merge passes.
    */
  def bpeEncodeBytes(words: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeWords(ColumnBridge.expression(words),
      bcMerges(merges), byteLevel = true))

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
