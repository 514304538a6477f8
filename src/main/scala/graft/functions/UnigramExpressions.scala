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

/** Unigram-LM (SentencePiece-style) tokenization — the OTHER real-world
  * tokenizer family next to BPE (Kudo 2018: "Subword Regularization").
  * Where BPE applies a merge list, the unigram model picks, per word,
  * the SEGMENTATION of minimum total piece cost (cost = −ln P(piece),
  * e6-scaled integer) by Viterbi dynamic programming over the word's
  * positions. TRAINING (hard-EM over corpus word counts) lives in
  * [[graft.ops.TextAnalysis.unigramTrain]]; this file is the encode
  * kernel: the piece table rides into executors once per EXECUTOR as a
  * `Broadcast` and each row segments in a tight local loop — a
  * shuffle-free narrow map, same deployment shape as
  * [[BpeEncodeWords]].
  *
  * Determinism: integer costs; ties broken by PREFERRING THE LONGER
  * PIECE ending at each position (then the position order itself), so
  * the segmentation is a pure function of (word, table) — rerun- and
  * partition-order-stable. Characters absent from the table segment as
  * single-char "unknown" pieces at `unkCostE6` (strictly worse than
  * any real piece), so every word is always coverable.
  */
object UnigramKernels {

  /** ONE definition of the (pieces, costs) → lookup table build, shared
    * by both expressions (a fix to sizing or duplicate handling must
    * not fork).
    */
  def buildTable(pieces: Vector[String], costsE6: Vector[Long])
      : java.util.HashMap[String, java.lang.Long] = {
    require(pieces.length == costsE6.length, "pieces and costs must align")
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(pieces(i), java.lang.Long.valueOf(costsE6(i)))
      i += 1
    }
    m
  }

  /** Viterbi min-cost segmentation of every word in `toks`, output as
    * one flattened piece stream per row. O(Σ |w|·maxLen) per row with
    * an O(1) hash probe per candidate piece.
    */
  def encode(toks: ArrayData,
             table: java.util.HashMap[String, java.lang.Long],
             maxLen: Int, unkCostE6: Long): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      if (toks.isNullAt(t))
        throw new IllegalArgumentException(
          "unigram_encode: null token — clean the corpus first")
      segmentInto(toks.getUTF8String(t).toString, table, maxLen,
        unkCostE6, out)
      t += 1
    }
    new GenericArrayData(out.toArray())
  }

  private def segmentInto(w: String,
                          table: java.util.HashMap[String, java.lang.Long],
                          maxLen: Int, unkCostE6: Long,
                          out: java.util.ArrayList[UTF8String]): Unit = {
    // CODE POINTS, not UTF-16 chars: char-indexed slicing would cut a
    // surrogate pair in half and emit invalid pieces for emoji /
    // astral-plane scripts. This also matches the seed stage, whose
    // Spark substring()/length() (and the oracle's length()) count
    // characters, never bytes or UTF-16 units.
    val cps = w.codePoints().toArray
    val n = cps.length
    if (n == 0) return
    val best = new Array[Long](n + 1)
    val backLen = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      best(i) = Long.MaxValue
      // longest candidate FIRST: on equal cost the longer piece wins
      // (strict < below never replaces it), pinning the tie-break
      var l = math.min(maxLen, i)
      while (l >= 1) {
        val piece = new String(cps, i - l, l)
        // java.lang.Long, NOT scala Long: a scala-typed get would
        // silently unbox a missing key's null to 0 — every unknown
        // substring would become a free piece
        val c: java.lang.Long = table.get(piece)
        if (c != null && best(i - l) != Long.MaxValue &&
            best(i - l) + c.longValue() < best(i)) {
          best(i) = best(i - l) + c.longValue()
          backLen(i) = l
        }
        l -= 1
      }
      // single-code-point unknown fallback: guarantees coverage, priced
      // so a real piece always beats it at equal span
      if (best(i - 1) != Long.MaxValue && best(i - 1) + unkCostE6 < best(i)) {
        best(i) = best(i - 1) + unkCostE6
        backLen(i) = 1
      }
      i += 1
    }
    // walk back, then reverse in place into the output
    val from = out.size()
    var p = n
    while (p > 0) {
      val l = backLen(p)
      out.add(UTF8String.fromString(new String(cps, p - l, l)))
      p -= l
    }
    var lo = from
    var hi = out.size() - 1
    while (lo < hi) {
      val tmp = out.get(lo); out.set(lo, out.get(hi)); out.set(hi, tmp)
      lo += 1; hi -= 1
    }
  }
}

/** The piece table as a `Broadcast` — one copy per EXECUTOR, fetched on
  * first use, instead of a serialized HashMap inside every task binary
  * (a 32k-piece vocab in the task closure is the "task of very large
  * size" failure mode: at 100k tasks it is hundreds of GB of driver
  * egress). Same deployment shape as [[BpeKernelsBc]].
  */
object UnigramKernelsBc {
  type PieceTable = java.util.HashMap[String, java.lang.Long]

  def encode(toks: ArrayData, bc: Broadcast[PieceTable], maxLen: Int,
             unkCostE6: Long): ArrayData =
    UnigramKernels.encode(toks, bc.value, maxLen, unkCostE6)

  def nbest(word: UTF8String, bc: Broadcast[PieceTable], maxLen: Int,
            unkCostE6: Long, n: Int): ArrayData =
    UnigramKernelsNbest.nbest(word, bc.value, maxLen, unkCostE6, n)
}

/** `unigram_encode(tokens)`: segment an array<string> word stream into
  * the min-cost piece stream under a fixed (piece → costE6) table
  * riding as a `Broadcast` (once per executor, not once per task).
  */
case class UnigramEncode(child: Expression,
                         table: Broadcast[UnigramKernelsBc.PieceTable],
                         maxLen: Int, unkCostE6: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_encode requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    UnigramKernelsBc.encode(v.asInstanceOf[ArrayData], table, maxLen,
      unkCostE6)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("unigramTableBc", table,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.UnigramKernelsBc.encode($v, $tRef, $maxLen, ${unkCostE6}L)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : UnigramEncode = copy(child = newChild)
}

object UnigramKernelsNbest {

  /** N-BEST segmentations of ONE word — the enumeration subword
    * regularization samples from (Kudo 2018 §3: training-time
    * augmentation draws a segmentation ∝ its probability; the n-best
    * list IS the support it draws over). Standard k-best DP: each
    * position keeps its `n` cheapest (cost, prevPos, pieceLen) partial
    * derivations; paths reconstruct backward. Output rows are
    * (pieces[], costE6) sorted cost-ascending with the SAME tie-breaks
    * as the 1-best kernel, so row 0 always equals
    * [[UnigramKernels.encode]]'s segmentation.
    */
  def nbest(word: UTF8String, table: java.util.HashMap[String, java.lang.Long],
            maxLen: Int, unkCostE6: Long, n: Int): ArrayData = {
    val cps = word.toString.codePoints().toArray
    val len = cps.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    // states(i) = up to n (cost, pieces-reversed) derivations covering
    // the prefix of length i, cost-sorted. Carrying the piece LISTS
    // (not backpointers) keeps reconstruction trivially correct under
    // cost ties; words are short, n is small — the memory is nothing.
    val states = Array.fill(len + 1)(
      new java.util.ArrayList[(Long, List[String])]())
    states(0).add((0L, Nil))
    var i = 1
    while (i <= len) {
      val cand = new java.util.ArrayList[(Long, List[String])]()
      // longest piece FIRST: the stable sort below then prefers it on
      // equal cost, matching the 1-best kernel's tie-break
      var l = math.min(maxLen, i)
      while (l >= 1) {
        val piece = new String(cps, i - l, l)
        val c: java.lang.Long = table.get(piece)
        // single chars price at min(table, unk) — EXACTLY what the
        // 1-best kernel's separate fallback branch computes, so rank 0
        // of this list always matches its segmentation AND its cost
        // even when a caller sets unkCostE6 below a table cost
        val cost: Long =
          if (l == 1)
            math.min(if (c != null) c.longValue() else Long.MaxValue,
              unkCostE6)
          else if (c != null) c.longValue()
          else -1L
        if (cost >= 0) {
          val prev = states(i - l)
          var s = 0
          while (s < prev.size()) {
            cand.add((prev.get(s)._1 + cost, piece :: prev.get(s)._2))
            s += 1
          }
        }
        l -= 1
      }
      val arr = cand.toArray(new Array[(Long, List[String])](cand.size()))
      // stable: equal costs keep generation order (longer piece, then
      // the prefix list's own rank)
      java.util.Arrays.sort(arr,
        Ordering.by((t: (Long, List[String])) => t._1))
      var keep = 0
      while (keep < arr.length && keep < n) { states(i).add(arr(keep)); keep += 1 }
      i += 1
    }
    val out = new java.util.ArrayList[Any]()
    val fin = states(len)
    var r = 0
    while (r < fin.size()) {
      val pieces = fin.get(r)._2.reverse.map(UTF8String.fromString).toArray
      out.add(org.apache.spark.sql.catalyst.InternalRow(
        new GenericArrayData(pieces.asInstanceOf[Array[AnyRef]]),
        fin.get(r)._1))
      r += 1
    }
    new GenericArrayData(out.toArray())
  }
}

/** `unigram_nbest(word)`: the n cheapest segmentations of a word under
  * a fixed piece table, as array<struct<pieces array<string>, cost_e6
  * bigint>> sorted by cost.
  */
case class UnigramNbest(child: Expression,
                        table: Broadcast[UnigramKernelsBc.PieceTable],
                        maxLen: Int, unkCostE6: Long, n: Int)
    extends UnaryExpression {
  require(n >= 1 && n <= 64, s"n out of [1, 64]: $n")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pieces",
        ArrayType(StringType, containsNull = false), nullable = false),
      org.apache.spark.sql.types.StructField("cost_e6",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "unigram_nbest"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_nbest requires a string word, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    UnigramKernelsBc.nbest(v.asInstanceOf[UTF8String], table, maxLen,
      unkCostE6, n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("unigramNbestTableBc", table,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.UnigramKernelsBc.nbest($v, $tRef, $maxLen, " +
        s"${unkCostE6}L, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : UnigramNbest = copy(child = newChild)
}

object UnigramExpressions {

  /** Broadcast a (piece, costE6) vocab once; hand the result to the
    * `...Bc` builders below. Callers running a TRAINING LOOP should
    * mint one per round and `destroy()` it once the round's result is
    * materialized — otherwise a long EM run accumulates dead broadcast
    * blocks.
    */
  def broadcastVocab(vocab: Seq[(String, Long)])
      : Broadcast[UnigramKernelsBc.PieceTable] =
    org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(
      UnigramKernels.buildTable(vocab.map(_._1).toVector,
        vocab.map(_._2).toVector))

  /** Column API: segment an array<string> word column through an
    * already-broadcast piece table (caller owns the lifecycle).
    */
  def unigramEncodeBc(tokens: Column,
                      table: Broadcast[UnigramKernelsBc.PieceTable],
                      maxLen: Int, unkCostE6: Long): Column =
    ColumnBridge.column(UnigramEncode(ColumnBridge.expression(tokens),
      table, maxLen, unkCostE6))

  /** Column API: segment an array<string> word column through a trained
    * (piece, costE6) table; the table broadcasts once per plan.
    */
  def unigramEncode(tokens: Column, vocab: Seq[(String, Long)],
                    maxLen: Int, unkCostE6: Long): Column =
    unigramEncodeBc(tokens, broadcastVocab(vocab), maxLen, unkCostE6)

  /** Column API: the n cheapest segmentations of one WORD (the support
    * subword-regularization sampling draws over); the table broadcasts
    * once per plan.
    */
  def unigramNbest(word: Column, vocab: Seq[(String, Long)], maxLen: Int,
                   unkCostE6: Long, n: Int): Column =
    ColumnBridge.column(UnigramNbest(ColumnBridge.expression(word),
      broadcastVocab(vocab), maxLen, unkCostE6, n))
}
