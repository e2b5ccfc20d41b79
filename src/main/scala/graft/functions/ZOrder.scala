package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of the low 16 bits of two long columns —
  * the clustering key for multi-dimensional data layout. Rows sorted or
  * range-partitioned by z-value are simultaneously clustered on BOTH
  * dimensions, so parquet min/max footer stats prune on either predicate
  * column — the standard layout trick (Delta/Iceberg OPTIMIZE ZORDER) for
  * 100 TB tables queried along more than one axis.
  *
  * Codegen'd with the magic-number bit-spreading sequence (no loop, ~10
  * ops per operand); the interpreted path mirrors it exactly. Semantics
  * are pure integer bit shuffling, so an oracle can reproduce it with an
  * expanded shift/mask arithmetic sum.
  */
case class InterleaveBits16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_zorder expects (bigint, bigint), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderOps.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      def spread(in: String, out: String): String =
        s"""
           |long $out = $in & 0xFFFFL;
           |$out = ($out | ($out << 8)) & 0x00FF00FFL;
           |$out = ($out | ($out << 4)) & 0x0F0F0F0FL;
           |$out = ($out | ($out << 2)) & 0x33333333L;
           |$out = ($out | ($out << 1)) & 0x55555555L;
         """.stripMargin
      s"""
         |${spread(x, sx)}
         |${spread(y, sy)}
         |${ev.value} = $sx | ($sy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderOps {
  /** Spread the low 16 bits of v to even bit positions (magic masks). */
  @inline def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Interpreted-path interleave (reference for the codegen'd form). */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  /** Column API: z = interleave of the low 16 bits of x and y. */
  def zorder2(x: Column, y: Column): Column =
    GraftBridge.column(InterleaveBits16(
      GraftBridge.expression(x), GraftBridge.expression(y)))

  /** The equivalent expanded shift/mask SQL over columns `xc`/`yc`, for
    * engines without the expression (the DuckDB oracle): a 2·bits-term
    * integer sum — exact, no floats anywhere. */
  def expandedSql(xc: String, yc: String, bits: Int = 16): String =
    (0 until bits).flatMap(i => Seq(
      s"((($xc >> $i) & 1) << ${2 * i})",
      s"((($yc >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
}
