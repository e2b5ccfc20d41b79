package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Bloom filter over a pre-hashed long column, as a mergeable
  * TypedImperativeAggregate. The buffer IS the bitset (`Array[Byte]`,
  * `numBits` a power of two); update sets `numHashes` bits via double
  * hashing (h1 = x, h2 = odd mix of x — Kirsch-Mitzelmann composition),
  * merge is bytewise OR, eval emits the bitset as BinaryType.
  *
  * Scale rationale: the exact decontamination join (q92) broadcasts the
  * benchmark's full shingle strings. At production benchmark sizes that
  * broadcast is hundreds of MB of strings; the bloom form broadcasts a
  * fixed 512 KiB bitset instead and prefilters the 100 TB corpus side down
  * to (matches + the configured false-positive residue) before the exact
  * join sees it. Partial aggregation means each map task ships one bitset,
  * not its inputs.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require((numBits & (numBits - 1)) == 0 && numBits >= 64,
    s"numBits must be a power of two >= 64, got $numBits")

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](numBits >>> 3)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val h1 = BloomFilterOps.mixDown(x)
      val h2 = BloomFilterOps.stepOf(x)
      var i = 0
      while (i < numHashes) {
        val idx = ((h1 + i * h2) & (numBits - 1)).toInt
        buf(idx >>> 3) = (buf(idx >>> 3) | (1 << (idx & 7))).toByte
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Membership probe against a [[BloomAgg]] bitset: true if ALL
  * `numHashes` probed bits are set (no false negatives; false positives at
  * the configured rate get removed by the exact verify join downstream).
  * Codegen'd into an inline probe loop — the corpus-side prefilter stays
  * inside whole-stage codegen. */
case class BloomMightContain(left: Expression, right: Expression,
    numHashes: Int) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects (binary, bigint), " +
          s"got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any, b: Any): Any =
    BloomFilterOps.mightContain(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bf, x) => {
      val i = ctx.freshName("i")
      val z = ctx.freshName("z")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val idx = ctx.freshName("idx")
      val m = ctx.freshName("m")
      s"""
         |long $z = $x * ${BloomFilterOps.mix}L;
         |long $h1 = $z ^ ($z >>> 32);
         |long $h2 = (($x >>> 24) * ${BloomFilterOps.mix2}L) | 1L;
         |long $m = (long) $bf.length * 8L - 1L;
         |${ev.value} = true;
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  int $idx = (int) (($h1 + $i * $h2) & $m);
         |  if (($bf[$idx >>> 3] & (1 << ($idx & 7))) == 0) {
         |    ${ev.value} = false; break;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomFilterOps {
  /** Odd 64-bit golden-ratio / xxhash multipliers for the double-hash
    * step. h1 must NOT be a bare multiply: an index mask keeps only the
    * LOW log2(m) bits, and the low bits of x*C depend only on the low
    * bits of x — every probe index would then be a function of x's low 20
    * bits alone, degenerating the whole-filter FP rate to an n/2^20
    * low-bit collision (measured: 1% instead of 4e-5). The xor-shift
    * folds the high bits down; h2 draws its entropy from bits >= 24 so
    * the probe tuple depends on ~40+ independent bits. */
  val mix: Long = 0x9E3779B97F4A7C15L
  val mix2: Long = 0xC2B2AE3D27D4EB4FL

  @inline def mixDown(x: Long): Long = {
    val z = x * mix
    z ^ (z >>> 32)
  }

  @inline def stepOf(x: Long): Long = ((x >>> 24) * mix2) | 1L

  /** Interpreted-path probe (also the reference for the codegen'd form). */
  def mightContain(bf: Array[Byte], x: Long, k: Int): Boolean = {
    val h1 = mixDown(x)
    val h2 = stepOf(x)
    val m = bf.length.toLong * 8L - 1L
    var i = 0
    while (i < k) {
      val idx = ((h1 + i * h2) & m).toInt
      if ((bf(idx >>> 3) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Column API: build a bloom bitset over a long-hash column. */
  def bloomAgg(x: Column, numBits: Int, numHashes: Int): Column =
    GraftBridge.column(
      BloomAgg(GraftBridge.expression(x), numBits, numHashes)
        .toAggregateExpression())

  /** Column API: probe a bloom bitset column with a long-hash column. */
  def bloomContains(bf: Column, x: Column, numHashes: Int): Column =
    GraftBridge.column(BloomMightContain(
      GraftBridge.expression(bf), GraftBridge.expression(x), numHashes))
}
