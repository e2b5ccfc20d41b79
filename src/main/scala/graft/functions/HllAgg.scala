package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** PORTABLE HyperLogLog register sketch (Flajolet et al. 2007) over the
  * engine-portable 60-bit md5 hash ([[TextOps.portableHash60]]) — the
  * deterministic counterpart to Spark's built-in HLL++ (q46, whose
  * register layout is engine-private and therefore rows-only-checked).
  * Top 6 hash bits pick one of m = 64 registers; the register keeps the
  * max rank (position of the highest set bit) of the remaining 54 bits:
  *   rho(rest) = 55 − bitlength(rest)   (rest = 0 → 55)
  * Register maxima are order- and merge-independent, so the sketch — and
  * any estimate derived from it with fixed IEEE arithmetic — is
  * bit-identical at any parallelism AND replicable in a DuckDB oracle
  * (rho via `len(bin(x))`, the same integer-log idiom as q128).
  *
  * The harmonic-mean denominator Σ 2^(−M[j]) is evaluated downstream as
  * the exact INTEGER Σ 2^(55−M[j]) (≤ 64·2^55 < 2^62 — no overflow, no
  * float accumulation ordering), and the q160 estimator applies the raw
  * HLL formula α·m²/Z with no small-range branch: the linear-counting
  * correction needs ln(), whose last-ulp behavior differs between libm
  * implementations, while the raw form uses only IEEE · and /. The spec
  * bounds accuracy against exact counts at the fixture cardinalities.
  *
  * Scale shape: one mergeable 64-byte buffer per group per map task —
  * the shuffle carries 64 bytes per group instead of the distinct-key
  * set, which is the entire case for sketched distinct at 100 TB.
  */
case class HllAgg(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(HllAgg.Alpha.contains(m), s"m must be one of 16/32/64, got $m")

  private val bits = java.lang.Integer.numberOfTrailingZeros(m)
  private val restBits = 60 - bits
  private val rhoMax = restBits + 1

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  private def offer(buf: Array[Byte], h: Long): Unit = {
    val bkt = (h >>> restBits).toInt & (m - 1)
    val rest = h & ((1L << restBits) - 1)
    val rho =
      if (rest == 0L) rhoMax
      else rhoMax - (64 - java.lang.Long.numberOfLeadingZeros(rest))
    if (rho > buf(bkt)) buf(bkt) = rho.toByte
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Any](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  // clone both ways: the live buffer keeps mutating after serialize, and
  // the deserialized array becomes a live buffer merge() writes into
  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(offset: Int): HllAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HllAgg {
  /** α constants from the HLL paper, per supported register count —
    * LITERALS both engines parse to the same double, never a computed
    * expression. */
  val Alpha: Map[Int, Double] = Map(16 -> 0.673, 32 -> 0.697, 64 -> 0.709)

  /** Column API: the m HLL register maxima of the 60-bit hash column. */
  def hllRegs(h: Column, m: Int): Column =
    GraftBridge.column(HllAgg(GraftBridge.expression(h), m)
      .toAggregateExpression())
}
