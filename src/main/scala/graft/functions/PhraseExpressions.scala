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
  * contract. Matching is by UTF-16 code unit, exact for any phrase set
  * without surrogate-boundary tricks (blocklists are plain text).
  */
object PhraseKernels {

  /** The finished automaton: `next` transitions per node, `fail` links,
    * `out(n)` = phrase ids whose occurrence ends at node n (fail-closure
    * pre-aggregated so the match loop never chases fail links for
    * output).
    */
  final case class Automaton(next: Array[java.util.HashMap[Character, Integer]],
                             fail: Array[Int], out: Array[Array[Int]],
                             nPhrases: Int) extends Serializable

  /** Standard BFS construction. Duplicate phrases each keep their own
    * id (both are counted — the caller controls the list).
    */
  def build(phrases: Seq[String]): Automaton = {
    require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
      "phrase_count: empty phrase")
    val next = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer[Int]())
    phrases.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      p.foreach { ch =>
        val t = next(node).get(ch)
        node = if (t != null) t.intValue()
        else {
          next += new java.util.HashMap[Character, Integer]()
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

  /** One pass over `text`: per-phrase occurrence counts (array aligned
    * with the build-time phrase order).
    */
  def countMatches(text: UTF8String, a: Automaton): GenericArrayData = {
    val s = text.toString
    val counts = new Array[Long](a.nPhrases)
    var node = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
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

  /** Column API: count occurrences of every phrase in `phrases` inside
    * a string column, in ONE text pass. Returns array<long> aligned
    * with the phrase list.
    */
  def phraseCount(text: Column, phrases: Seq[String]): Column = {
    val bc = org.apache.spark.sql.SparkSession.active.sparkContext
      .broadcast(PhraseKernels.build(phrases))
    ColumnBridge.column(PhraseCount(ColumnBridge.expression(text), bc))
  }
}
