package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded top-k-smallest aggregate over a LONG column: returns the k
  * smallest values of the group as a sorted array<long>.
  *
  * This exists because computing "the nHubs smallest doc ids of an LSH
  * bucket" with `row_number() OVER (PARTITION BY bucket ORDER BY id)`
  * forces every member of a mega-bucket (web-scale boilerplate: millions
  * of docs sharing one band hash) through ONE task's sort — the
  * unsplittable-hot-partition hazard AQE cannot repair for windows. As a
  * TypedImperativeAggregate the k-minima combine map-side (each partial
  * is at most k longs), so the exchange ships k values per
  * (partition, bucket) no matter how hot the bucket is, and skewed
  * groups are just ordinary aggregation skew.
  *
  * The buffer is a sorted Array[Long] of size <= k; k is operator-config
  * sized (the LSH hub count, <= 8 in practice), so linear insertion is
  * cheaper than a heap. Duplicate values are kept (callers aggregating
  * unique ids never see them). */
case class MinKLongAgg(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(k >= 1 && k <= 1024, s"minK k must be in [1, 1024], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def insert(buf: Array[Long], v: Long): Array[Long] = {
    if (buf.length == k && v >= buf(buf.length - 1)) return buf
    // insertion position in the sorted buffer
    var i = 0
    while (i < buf.length && buf(i) <= v) i += 1
    val n = math.min(buf.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(buf, 0, out, 0, i)
    out(i) = v
    System.arraycopy(buf, i, out, i + 1, n - i - 1)
    out
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer else insert(buffer, v.asInstanceOf[Long])
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var b = buffer
    var i = 0
    while (i < other.length) { b = insert(b, other(i)); i += 1 }
    b
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.length)
    bb.putInt(buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKLongAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKLongAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKLongAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "min_k_long"
}

object MinK {
  /** k smallest values of a long column per group, sorted ascending. */
  def minKLong(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      MinKLongAgg(org.apache.spark.sql.GraftExpressionBridge.toExpression(c), k)
        .toAggregateExpression())
}
