package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

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
  * is enforced, never silently wrapped.
  *
  * Null handling: `dotq` propagates NULL when either array or ANY
  * element is NULL (a quantized vector from an embedding with null
  * components carries null elements — the old HOF form returned NULL
  * there, and a silent 0-for-null read would fabricate cosines);
  * `nearest_centroid` THROWS on null elements — it is the trainer hot
  * path and a half-null vector assigned to a garbage cluster is worse
  * than a loud failure telling the caller to clean the corpus first.
  */
object VectorKernels {

  /** Exact integer dot product in ONE fused pass (this is the per-pair
    * hot path — a separate null-scan would re-traverse both arrays):
    * boxed null when any element is NULL, the exact sum otherwise.
    * Arrays must be equal-length.
    */
  def dotQNullable(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"dotq: length mismatch ${n} vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = Math.addExact(acc, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Sparse sign random projection of a quantized vector: coordinate j
    * is Σ_i q(i)·s(j, i) with s ∈ {+1, 0, −1} from the minhash LCG on
    * (axis, 1-based component) — the [[graft.ops.Similarity
    * .randomProjection]] contract, as ONE tight JIT'd loop instead of
    * outDims interpreted aggregate(zip_with(sequence)) lambdas (the HOF
    * form measured ~5× the whole-query cost at 16×64 per row; see the
    * object doc above for why HOFs never codegen). NULL result when any
    * element is NULL (the dotq convention). Overflow errors loudly via
    * addExact — the e7 range contract means it cannot fire below ~9e11
    * dims.
    */
  def randProject(q: ArrayData, outDims: Int): ArrayData = {
    val p = 2147483647L
    val n = q.numElements()
    val out = new Array[Any](outDims)
    var j = 0
    while (j < outDims) {
      val a = 1103515245L * (j + 1) % p
      val b = 12345L * (2 * j + 1) % p
      var acc = 0L
      var i = 0
      while (i < n) {
        if (q.isNullAt(i)) return null
        val m = (a * (i + 1) + b) % p % 6
        if (m == 0L) acc = Math.addExact(acc, q.getLong(i))
        else if (m == 1L) acc = Math.subtractExact(acc, q.getLong(i))
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Argmin over centroids of the exact squared distance: returns
    * struct(cid, dist) with ties broken to the smaller cid (centroids
    * arrive sorted by cid and the comparison is strict) — the same
    * winner as the oracle's `min(dist*k+cid)` key, WITHOUT the k·dist
    * product: the encoding overflows a long once k·dist passes 2^63
    * (k ≈ 23,000 at the worst-case unit-norm distance — exactly the
    * large-k regime SemDeDup runs), while the struct form is bounded by
    * the quantize range contract alone (dist ≤ 4e14·dims < 2^63 at any
    * k). `cids` may be sparse: clusters that lost all members vanish
    * without re-seeding.
    */
  def nearestCentroid(v: ArrayData, cents: Array[Array[Long]],
                      cids: Array[Long]): InternalRow = {
    // loud-failure contract (trainer path): ragged and dirty vectors
    // must error, never cluster by a garbage/unchecked read
    if (cents.length > 0 && v.numElements() != cents(0).length)
      throw new IllegalArgumentException(
        s"nearest_centroid: vector has ${v.numElements()} dims, " +
          s"centroids have ${cents(0).length}")
    var bestD = Long.MaxValue
    var bestC = 0L
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var acc = 0L
      var i = 0
      while (i < c.length) {
        if (v.isNullAt(i))
          throw new IllegalArgumentException(
            "nearest_centroid: null embedding element — clean or filter the corpus first")
        val d = Math.subtractExact(v.getLong(i), c(i))
        acc = Math.addExact(acc, Math.multiplyExact(d, d))
        i += 1
      }
      if (acc < bestD) { bestD = acc; bestC = cids(j) }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestC, bestD))
  }
}

/** `dotq(a, b)`: exact integer dot product of two long-array columns.
  * NULL result when either array is NULL or carries a NULL element.
  */
case class DotQLongs(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
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

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else VectorKernels.dotQNullable(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Long ${ev.value}$$r =
         |  graft.functions.VectorKernels.dotQNullable($a, $b);
         |if (${ev.value}$$r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}$$r.longValue();
         |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQLongs =
    copy(left = newLeft, right = newRight)
}

/** `rand_proj(q, outDims)`: sparse sign random projection of an
  * array<bigint> column — see [[VectorKernels.randProject]]. NULL in
  * (array or element) → NULL out.
  */
case class RandProjLongs(child: Expression, outDims: Int)
    extends UnaryExpression {
  // analysis-time, not per-row: a bad size must fail before execution
  require(outDims > 0, s"rand_proj: outDims must be positive: $outDims")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rand_proj"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rand_proj requires array<bigint>, got ${t.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else VectorKernels.randProject(v.asInstanceOf[ArrayData], outDims)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}$$r =
         |  graft.functions.VectorKernels.randProject($v, $outDims);
         |if (${ev.value}$$r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}$$r;
         |}""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): RandProjLongs =
    copy(child = newChild)
}

/** The (cids, centroids) table as a `Broadcast` — one copy per
  * EXECUTOR, fetched on first use, instead of k·dims longs serialized
  * into every task binary (at SemDeDup's k≈10k over 64 dims that is
  * ~5 MB PER TASK of driver egress — the "task of very large size"
  * failure mode). Same deployment shape as [[BpeKernelsBc]].
  */
object VectorKernelsBc {
  type CentroidTable = (Array[Long], Array[Array[Long]])

  def nearestCentroid(v: ArrayData,
                      bc: Broadcast[CentroidTable]): InternalRow = {
    val t = bc.value
    VectorKernels.nearestCentroid(v, t._2, t._1)
  }
}

/** `nearest_centroid(v)`: struct(cid, dist) of the closest centroid in
  * a fixed centroid table riding as a `Broadcast` (once per executor —
  * NOT k·dims literal nodes, which bloat the plan and the generated
  * code alike, and NOT a dist·k+cid packed key, which overflows at
  * large k).
  */
case class NearestCentroid(child: Expression,
                           table: Broadcast[VectorKernelsBc.CentroidTable])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("dist", LongType, nullable = false)))
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<bigint>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorKernelsBc.nearestCentroid(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("centsBc", table,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.VectorKernelsBc.nearestCentroid($v, $tRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column API: exact integer dot of two array<bigint> columns. */
  def dotq(a: Column, b: Column): Column =
    ColumnBridge.column(DotQLongs(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API: sparse sign random projection to `outDims` axes. */
  def randproj(q: Column, outDims: Int): Column =
    ColumnBridge.column(RandProjLongs(ColumnBridge.expression(q), outDims))

  /** Broadcast a (cid, centroid) table once; hand the result to
    * [[nearestCentroidBc]]. Centroids must arrive sorted by cid (ties
    * break to the first, i.e. smallest, cid) and may be sparse once
    * clusters vanish. Callers running a TRAINING LOOP (Lloyd) should
    * mint one per iteration and `destroy()` it once the iteration's
    * aggregate is collected.
    */
  def broadcastCentroids(cents: Seq[(Long, IndexedSeq[Long])])
      : Broadcast[VectorKernelsBc.CentroidTable] = {
    require(cents.map(_._1) == cents.map(_._1).sorted,
      "centroids must be sorted by cid for the smaller-cid tie-break")
    org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(
      (cents.map(_._1).toArray, cents.map(_._2.toArray).toArray))
  }

  /** Column API: struct(cid, dist) of the nearest centroid in an
    * already-broadcast table (caller owns the lifecycle).
    */
  def nearestCentroidBc(v: Column,
                        table: Broadcast[VectorKernelsBc.CentroidTable])
      : Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v), table))

  /** Column API: struct(cid, dist) of the nearest fixed (cid, centroid)
    * row; the table broadcasts once per plan.
    */
  def nearestCentroid(v: Column, cents: Seq[(Long, IndexedSeq[Long])]): Column =
    nearestCentroidBc(v, broadcastCentroids(cents))
}
