package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded k-minimum-values aggregate: the k SMALLEST DISTINCT long
  * hashes of the group, as an ascending array (Bar-Yossef et al. 2002).
  *
  * This is the KMV sketch BUILD as a single partial-aggregable pass:
  * every map task carries at most k longs per group in its buffer, so
  * the shuffle moves O(groups · k · tasks) serialized longs instead of
  * the group's whole distinct value set — the previous formulation
  * (global distinct + a salted-shard row_number window + a final
  * per-group window) shuffled and SORTED the full distinct set twice,
  * which owned q_kmv_overlap's top-decade exponent (0.46 measured at
  * the 100x probe decade). An exact bounded min-k is not expressible
  * with built-in aggregates without that materialization, so this is
  * the (b)-tier custom-Expression case.
  *
  * Duplicates dedup in the buffer (TreeSet), nulls are skipped, and
  * the result is deterministic given the input multiset — the DuckDB
  * oracle replays it as `row_number() OVER (ORDER BY h) <= k` over the
  * distinct hashes, bit for bit.
  */
case class KmvMinK(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv needs k >= 2: $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = java.lang.Long.valueOf(v.asInstanceOf[Long])
      if (buf.size < k) { buf.add(h); () }
      else if (h.longValue() < buf.last().longValue()) {
        // only evict when the add actually inserted (not a duplicate)
        if (buf.add(h)) { buf.pollLast(); () }
      }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]):
      java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    var live = true
    while (live && it.hasNext) {
      val h = it.next()
      if (a.size < k) { a.add(h); () }
      else if (h.longValue() < a.last().longValue()) {
        if (a.add(h)) { a.pollLast(); () }
      } else live = false // b iterates ascending; the rest cannot qualify
    }
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]):
      java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvMinK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMinK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvMinK =
    copy(child = c)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_min_k"
}
