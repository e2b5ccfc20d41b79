package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Gram-matrix accumulation Σ_rows outer(x, x) as ONE
  * TypedImperativeAggregate over the quantized embedding array (r16, the
  * [[MinHashAgg]] discipline applied to the PC1 stage): buffer = d²
  * running long sums, updated in a tight JIT'd loop per vector.
  *
  * Replaces the (vec_id)-keyed self-join + groupBy(j, k) form, which
  * materialized n·d² join rows through codegen join/agg machinery just
  * to multiply-add them (8.2M rows at sf0.1/d=64 — measured the
  * dominant cost of stage_pc1). The buffer is mergeable (elementwise
  * add) → map-side partial aggregation; the shuffle carries ONE d²
  * array per partition instead of n·d² pre-agg rows. Integer sums are
  * order-independent, so the result is bit-identical to the join form
  * (`GramAggSpec` pins equality against it).
  *
  * The buffer is sized lazily from the first vector (d is a data
  * property, not a plan constant); an empty relation evals to an empty
  * array, which the caller's posexplode reshape turns into zero Gram
  * rows — the join form's empty-corpus behavior, preserved. */
case class GramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (d == 0) return buf
    val xs = arr.toLongArray()
    val b = if (buf.isEmpty) new Array[Long](d * d) else buf
    require(b.length == d * d,
      s"GramAgg: inconsistent embedding dims (buffer ${b.length} vs $d²)")
    var j = 0
    while (j < d) {
      val xj = xs(j)
      val off = j * d
      var k = 0
      while (k < d) { b(off + k) += xj * xs(k); k += 1 }
      j += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"GramAgg: inconsistent embedding dims (${a.length} vs ${b.length})")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(offset: Int): GramAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object GramAgg {
  /** Column API: row-major d² Gram sums of a long-array column. */
  def gram(xs: Column): Column =
    GraftBridge.column(GramAgg(GraftBridge.expression(xs))
      .toAggregateExpression())
}
