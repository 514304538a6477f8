package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-phrase matching via an Aho–Corasick automaton (Aho & Corasick
  * 1975) — the content-blocklist / contamination-phrase scan of a
  * training-data pipeline, where the phrase set is hundreds to tens of
  * thousands of entries.
  *
  * Why a native kernel and not composed builtins: P `regexp_count` /
  * `replace` passes cost O(P·n) per document — at a 10k-phrase blocklist
  * over 100 TB that is four orders of magnitude more character
  * comparisons than the automaton's single O(n + matches) pass. The
  * automaton is BUILT ONCE on the driver and ships per-executor as a
  * `Broadcast` (the [[BpeKernels]] pattern — per-task driver egress is
  * zero bytes); matching is a tight goto/fail walk with no allocation
  * beyond the per-row count array.
  *
  * Match semantics: counts EVERY occurrence end position (overlapping
  * occurrences included — "aa" occurs twice in "aaa"), the classic AC
  * contract. Matching walks the raw UTF-8 bytes of the `UTF8String`
  * (no per-row decode or copy); UTF-8's self-synchronization makes
  * byte-domain counts equal character-domain counts for any phrase set.
  */
object PhraseKernels {

  /** The finished automaton: `next` transitions per node (keyed by
    * UTF-8 BYTE — matching walks the row's `UTF8String` bytes directly,
    * no per-row UTF-16 String copy; a multi-byte pattern can only match
    * at codepoint boundaries because UTF-8 lead/continuation bytes
    * never alias, so byte counts equal character-domain counts), `fail`
    * links, `out(n)` = phrase ids whose occurrence ends at node n
    * (fail-closure pre-aggregated so the match loop never chases fail
    * links for output).
    */
  final case class Automaton(next: Array[java.util.HashMap[java.lang.Byte, Integer]],
                             fail: Array[Int], out: Array[Array[Int]],
                             nPhrases: Int) extends Serializable

  /** Standard BFS construction. Duplicate phrases each keep their own
    * id (both are counted — the caller controls the list).
    */
  def build(phrases: Seq[String]): Automaton = {
    require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
      "phrase_count: empty phrase")
    val next = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[java.lang.Byte, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer[Int]())
    phrases.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      p.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { ch =>
        val t = next(node).get(ch)
        node = if (t != null) t.intValue()
        else {
          next += new java.util.HashMap[java.lang.Byte, Integer]()
          ends += scala.collection.mutable.ArrayBuffer[Int]()
          next(node).put(ch, next.size - 1)
          next.size - 1
        }
      }
      ends(node) += pid
    }
    val n = next.size
    val fail = new Array[Int](n)
    val queue = new java.util.ArrayDeque[Int]()
    next(0).forEach((_, v) => { fail(v) = 0; queue.add(v); () })
    while (!queue.isEmpty) {
      val u = queue.poll()
      next(u).forEach { (ch, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).containsKey(ch)) f = fail(f)
        val t = next(f).get(ch)
        fail(v) = if (t != null && t.intValue() != v) t.intValue() else 0
        // output closure: everything the fail target emits, v emits too
        ends(v) ++= ends(fail(v))
        queue.add(v)
        ()
      }
    }
    Automaton(next.toArray, fail, ends.map(_.toArray).toArray, phrases.size)
  }

  /** One pass over `text`'s UTF-8 bytes — no row-level String
    * allocation; per-phrase occurrence counts (array aligned with the
    * build-time phrase order).
    */
  def countMatches(text: UTF8String, a: Automaton): GenericArrayData = {
    val counts = new Array[Long](a.nPhrases)
    var node = 0
    var i = 0
    val n = text.numBytes()
    while (i < n) {
      val ch: java.lang.Byte = text.getByte(i)
      var t = a.next(node).get(ch)
      while (t == null && node != 0) {
        node = a.fail(node)
        t = a.next(node).get(ch)
      }
      if (t != null) node = t.intValue()
      val out = a.out(node)
      var j = 0
      while (j < out.length) { counts(out(j)) += 1L; j += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Codegen entry point (broadcast handle → cached `.value`). */
  def countMatchesBc(text: UTF8String,
                     bc: Broadcast[Automaton]): GenericArrayData =
    countMatches(text, bc.value)
}

/** `phrase_count(text)`: per-phrase occurrence counts as array<long>,
  * the automaton riding as a broadcast.
  */
case class PhraseCount(child: Expression,
                       automaton: Broadcast[PhraseKernels.Automaton])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "phrase_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"phrase_count requires string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    PhraseKernels.countMatchesBc(v.asInstanceOf[UTF8String], automaton)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("acAutomatonBc", automaton,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.PhraseKernels.countMatchesBc($v, $bcRef)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : PhraseCount = copy(child = newChild)
}

object PhraseExpressions {

  // One broadcast per distinct phrase list per SparkContext — repeated
  // Column-API calls and re-analyzed SQL queries reuse it instead of
  // minting never-destroyed broadcast blocks each time. Keyed by
  // (contextId, phrases) so a restarted context doesn't serve a dead
  // broadcast.
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, Seq[String]), Broadcast[PhraseKernels.Automaton]]()

  private[graft] def broadcastFor(phrases: Seq[String])
      : Broadcast[PhraseKernels.Automaton] = {
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    // Spark allows one active context per JVM, so any other appId is a
    // stopped context: drop its entries or the map pins every dead
    // context's automata (+ broadcast handles) for the JVM's lifetime.
    // No destroy() — the stopped context already released the blocks.
    cache.keySet.removeIf(_._1 != sc.applicationId)
    cache.computeIfAbsent((sc.applicationId, phrases),
      _ => sc.broadcast(PhraseKernels.build(phrases)))
  }

  /** Column API: count occurrences of every phrase in `phrases` inside
    * a string column, in ONE text pass. Returns array<long> aligned
    * with the phrase list.
    */
  def phraseCount(text: Column, phrases: Seq[String]): Column =
    ColumnBridge.column(
      PhraseCount(ColumnBridge.expression(text), broadcastFor(phrases)))
}
