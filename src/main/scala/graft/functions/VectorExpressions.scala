package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact fixed-point vector kernels as native codegen'd Catalyst
  * expressions.
  *
  * Why not `zip_with`/`aggregate` higher-order functions: HOF lambdas
  * are interpreted per element — fine when evaluated once per VECTOR
  * (norms), ruinous once per candidate PAIR. Why not an unrolled
  * `element_at` sum chain: a 64-term chain inside one whole-stage-codegen
  * method pushes the generated method past HotSpot's huge-method JIT
  * limit, so the hot projection runs in the bytecode interpreter
  * (measured ~44 µs/row on the semDedup pair join — ~100× the cost of
  * this kernel's tight loop, which JITs to straight-line long math).
  *
  * Both kernels use `Math.addExact`/`multiplyExact`, matching ANSI
  * overflow semantics of the builtin arithmetic they replace: the
  * fixed-point range contract (see [[graft.ops.Similarity.quantize]])
  * is enforced, never silently wrapped. Array elements must be
  * non-null (quantize output always is).
  */
object VectorKernels {

  /** Exact integer dot product; arrays must be equal-length. */
  def dotQ(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"dotq: length mismatch ${n} vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = Math.addExact(acc, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    acc
  }

  /** Argmin over centroids of the exact squared distance, encoded as
    * `dist * k + cid` — identical to `min(dist*k+cid)` over all
    * centroids (ties break to the smaller cid), the same collision-free
    * key the relational k-means oracle computes. `cids` may be sparse
    * (clusters that lost all members vanish without re-seeding) while
    * `k` stays the ORIGINAL cluster count the key encoding was built on.
    */
  def nearestKey(v: ArrayData, cents: Array[Array[Long]], cids: Array[Long],
                 k: Long): Long = {
    var best = Long.MaxValue
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var acc = 0L
      var i = 0
      while (i < c.length) {
        val d = Math.subtractExact(v.getLong(i), c(i))
        acc = Math.addExact(acc, Math.multiplyExact(d, d))
        i += 1
      }
      val key = Math.addExact(Math.multiplyExact(acc, k), cids(j))
      if (key < best) best = key
      j += 1
    }
    best
  }
}

/** `dotq(a, b)`: exact integer dot product of two long-array columns. */
case class DotQLongs(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dotq"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dotq requires array<bigint> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotQ(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dotQ($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQLongs =
    copy(left = newLeft, right = newRight)
}

/** `nearest_centroid_key(v)`: dist*k+cid argmin key against a fixed
  * centroid table (driver-side constant, shipped once per plan as a
  * reference object — NOT k·dims literal nodes, which bloat the plan
  * and the generated code alike).
  */
case class NearestCentroidKey(child: Expression, cids: Vector[Long],
                              cents: Vector[Vector[Long]], k: Long)
    extends UnaryExpression {

  @transient private lazy val centsArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray
  @transient private lazy val cidsArr: Array[Long] = cids.toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid_key"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_key requires array<bigint>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.nearestKey(v.asInstanceOf[ArrayData], centsArr, cidsArr, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", centsArr, "long[][]")
    val iRef = ctx.addReferenceObj("cids", cidsArr, "long[]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.VectorKernels.nearestKey($v, $cRef, $iRef, ${k}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidKey =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column API: exact integer dot of two array<bigint> columns. */
  def dotq(a: Column, b: Column): Column =
    ColumnBridge.column(DotQLongs(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API: argmin dist*k+cid key against fixed (cid, centroid)
    * rows; `k` is the original cluster count of the key encoding (cids
    * may be sparse once clusters vanish).
    */
  def nearestCentroidKey(v: Column, cents: Seq[(Long, IndexedSeq[Long])],
                         k: Int): Column =
    ColumnBridge.column(NearestCentroidKey(
      ColumnBridge.expression(v),
      cents.map(_._1).toVector,
      cents.map(_._2.toVector).toVector, k.toLong))
}
