package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** K-Minimum-Values distinct sketch (Bar-Yossef et al. 2002): the buffer
  * keeps the k smallest DISTINCT hash values seen; the (k−1)/h_k order
  * statistic estimates the distinct count. Unlike HLL (q46, engine-specific
  * and therefore rows-only-checked), KMV over the engine-portable md5 hash
  * is fully DETERMINISTIC: the k smallest distinct values of a set do not
  * depend on arrival or merge order, so Spark and a DuckDB oracle produce
  * bit-identical sketches and estimates at any parallelism.
  *
  * Scale shape: mergeable bounded buffer (k longs per group per map task)
  * → partial aggregation; the shuffle carries k values per group instead
  * of the distinct-key set a COUNT(DISTINCT) exchange needs — the whole
  * point of sketch-based distinct at 100 TB.
  *
  * Buffer: sorted Array[Long] of ≤ k distinct values (ascending).
  */
case class KMinValuesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k >= 2, s"k must be >= 2, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  override def update(buf: java.util.TreeSet[Long],
      input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (buf.size < k) buf.add(x)
      else if (x < buf.last) { if (buf.add(x)) buf.pollLast() }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[Long],
      b: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      val x = it.next()
      if (a.size < k) a.add(x)
      else if (x < a.last) { if (a.add(x)) a.pollLast() }
      else return a // b is sorted ascending: the rest only gets larger
    }
    a
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new java.util.TreeSet[Long]()
    while (bb.hasRemaining) s.add(bb.getLong())
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(offset: Int): KMinValuesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinValuesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KMinValuesAgg {
  /** Column API: sorted array of the k smallest distinct values of x. */
  def kMinValues(x: Column, k: Int): Column =
    GraftBridge.column(KMinValuesAgg(GraftBridge.expression(x), k)
      .toAggregateExpression())
}
