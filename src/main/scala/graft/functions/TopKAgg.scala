package graft.functions

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
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
  * BAG semantics: a (key, id) pair appearing twice in the input occupies
  * two of the k slots (the buffer counts multiplicity), exactly like the
  * window-rank formulation — top-k membership is never silently
  * deduplicated.
  *
  * Deterministic: the k best pairs of a multiset under a TOTAL order
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
  extends TypedImperativeAggregate[TopKAgg.Buf] with ImplicitCastInputTypes {

  require(k >= 1, s"k must be >= 1, got $k")

  import TopKAgg.{Buf, cmp}

  // the AbstractDataType return type is private[sql]; the inferred
  // Seq[LongType.type] conforms covariantly
  override def inputTypes = Seq(LongType, LongType)

  // ImplicitCastInputTypes would happily insert DOUBLE->LONG casts, which
  // TRUNCATE and quietly change ranking semantics for SQL callers of
  // graft_topk. Integral widening stays implicit; fractional inputs must
  // fail loudly (the caller can cast explicitly if truncation is meant).
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def fractional(e: Expression): Boolean = e match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast =>
        fractional(c.child)
      case other => other.dataType match {
        case DoubleType | FloatType | _: DecimalType => true
        case _ => false
      }
    }
    // NOTE: analyzer-inserted and user-written Cast nodes are
    // indistinguishable, so CAST(x AS BIGINT) cannot serve as the escape
    // hatch — the message points at conversions that produce a genuine
    // LONG expression instead (floor/ceil return BIGINT).
    if (fractional(key) || fractional(id))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_topk arguments must be integral; a fractional key/id would " +
          "be truncated. If truncation/rounding is intended, convert with " +
          "floor(x) or ceil(x) (these return BIGINT)")
    else super.checkInputDataTypes()
  }

  override def createAggregationBuffer(): Buf = new Buf

  private def offer(buf: Buf, p: (Long, Long), times: Int): Unit = {
    var t = times
    while (t > 0 && buf.n < k) { buf.addOne(p); t -= 1 }
    while (t > 0 && cmp.compare(p, buf.m.firstKey()) > 0) {
      buf.addOne(p)
      buf.dropWorst()
      t -= 1
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null)
      offer(buf, (kv.asInstanceOf[Long], iv.asInstanceOf[Long]), 1)
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val it = b.m.descendingMap().entrySet().iterator() // best of b first
    var continue = true // stop once a is full and b's rest can't compete
    while (continue && it.hasNext) {
      val e = it.next()
      if (a.n < k || cmp.compare(e.getKey, a.m.firstKey()) > 0)
        offer(a, e.getKey, e.getValue)
      else continue = false
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Any](buf.n)
    val it = buf.m.descendingMap().entrySet().iterator() // best first
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue
      while (c > 0) { out(i) = InternalRow(e.getKey._1, e.getKey._2); i += 1
        c -= 1 }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(20 * buf.m.size)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey._1); bb.putLong(e.getKey._2); bb.putInt(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buf
    while (bb.hasRemaining) {
      val p = (bb.getLong(), bb.getLong())
      val c = bb.getInt()
      buf.m.put(p, c)
      buf.n += c
    }
    buf
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

  // ascending GOODNESS: smaller key first; for equal keys the HIGHER id
  // sits earlier (is worse) — so firstKey() is always the eviction victim
  private[functions] val cmp: Comparator[(Long, Long)] =
    new Comparator[(Long, Long)] {
      override def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      }
    }

  /** Multiset of ≤ k (key, id) pairs: TreeMap pair → multiplicity plus a
    * total count — duplicate pairs occupy distinct top-k slots. */
  final class Buf {
    val m = new java.util.TreeMap[(Long, Long), Int](cmp)
    var n = 0
    def addOne(p: (Long, Long)): Unit = {
      m.merge(p, 1, (a: Int, b: Int) => a + b)
      n += 1
    }
    def dropWorst(): Unit = {
      val e = m.firstEntry()
      if (e.getValue > 1) m.put(e.getKey, e.getValue - 1)
      else m.remove(e.getKey)
      n -= 1
    }
  }

  /** Column API: array of the k best (key, id) structs, best first
    * (key desc, id asc); duplicate pairs keep their multiplicity. */
  def topK(key: Column, id: Column, k: Int): Column =
    GraftBridge.column(TopKAgg(GraftBridge.expression(key),
      GraftBridge.expression(id), k).toAggregateExpression())
}
