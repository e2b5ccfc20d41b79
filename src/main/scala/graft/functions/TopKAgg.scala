package graft.functions

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (key, id) pairs per group —
  * best = highest key, ties to the lowest id — in a mergeable buffer.
  * The scale-correct replacement for the window-rank top-k idiom
  * (`row_number() OVER (PARTITION BY g ORDER BY ...) <= k`): a window
  * SORTS every group's full row set; this aggregate carries at most k
  * pairs per group through partial aggregation, so the shuffle and the
  * per-group state are O(k) regardless of group size — the same
  * bounded-buffer discipline as [[KMinValuesAgg]].
  *
  * Deterministic: the k best pairs of a set under a TOTAL order
  * (key desc, id asc) do not depend on arrival or merge order, so the
  * result is bit-identical at any parallelism and replicable by a
  * window-rank oracle.
  */
case class TopKAgg(
    key: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]] {

  require(k >= 1, s"k must be >= 1, got $k")

  // ascending GOODNESS: smaller key first; for equal keys the HIGHER id
  // sits earlier (is worse) — so first() is always the eviction victim
  private def cmp: Comparator[(Long, Long)] = new Comparator[(Long, Long)] {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](cmp)

  private def offer(buf: java.util.TreeSet[(Long, Long)],
      p: (Long, Long)): Unit = {
    if (buf.size < k) buf.add(p)
    else if (cmp.compare(p, buf.first()) > 0) {
      if (buf.add(p)) buf.pollFirst()
    }
  }

  override def update(buf: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null)
      offer(buf, (kv.asInstanceOf[Long], iv.asInstanceOf[Long]))
    buf
  }

  override def merge(a: java.util.TreeSet[(Long, Long)],
      b: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = b.descendingIterator() // best of b first; stop early when a
    var continue = true             // is full and b's rest can't compete
    while (continue && it.hasNext) {
      val p = it.next()
      if (a.size < k || cmp.compare(p, a.first()) > 0) offer(a, p)
      else continue = false
    }
    a
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.descendingIterator() // best first
    var i = 0
    while (it.hasNext) {
      val p = it.next()
      out(i) = InternalRow(p._1, p._2)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(
      buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val s = createAggregationBuffer()
    while (bb.hasRemaining) s.add((bb.getLong(), bb.getLong()))
    s
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(key, id)

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** Column API: array of the k best (key, id) structs, best first
    * (key desc, id asc). */
  def topK(key: Column, id: Column, k: Int): Column =
    GraftBridge.column(TopKAgg(GraftBridge.expression(key),
      GraftBridge.expression(id), k).toAggregateExpression())
}
