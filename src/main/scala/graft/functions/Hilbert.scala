package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Order-8 Hilbert curve index of two 8-bit cell coordinates (256×256
  * grid, 16-bit output) — the higher-locality alternative to the Morton
  * key in [[InterleaveBits16]] for multi-dimensional data layout.
  *
  * Unlike the Z-curve, every pair of consecutive Hilbert indices is
  * Manhattan-distance 1 on the grid (no "seams" where the curve jumps
  * across the space), so equal-count index ranges — which is exactly what
  * `repartitionByRange` and parquet row-groups cut — have strictly
  * tighter per-dimension bounding boxes. Tighter bboxes = more zone-map
  * skips at 100 TB; this is why table formats offer Hilbert clustering
  * above Z-order. The adjacency property is pinned exhaustively over all
  * 65,536 grid cells in `ZOrderSpec`.
  *
  * Pure integer state machine (the classical xy2d quadrant-rotation
  * walk), codegen'd as a tight 8-round loop; [[HilbertOps.stepsSql]]
  * emits the same rounds as chained SQL stages for engines without the
  * expression (the DuckDB oracle) — exact, no floats anywhere.
  */
case class HilbertIndex2D8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert expects (bigint, bigint), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertOps.hilbert8(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xin, yin) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val h = ctx.freshName("hh")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $xin & 255L;
         |long $y = $yin & 255L;
         |long $h = 0L;
         |for (long $s = 128L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) != 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) != 0L) ? 1L : 0L;
         |  $h += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = 255L - $x; $y = 255L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertOps {
  /** Interpreted-path xy2d (reference for the codegen'd form): quadrant
    * walk from the top bit down, rotating/flipping the frame per round. */
  def hilbert8(xi: Long, yi: Long): Long = {
    var x = xi & 255L
    var y = yi & 255L
    var h = 0L
    var s = 128L
    while (s > 0L) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      h += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = 255L - x; y = 255L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    h
  }

  /** Column API: Hilbert index of the low 8 bits of x and y. */
  def hilbert2(x: Column, y: Column): Column =
    GraftBridge.column(HilbertIndex2D8(
      GraftBridge.expression(x), GraftBridge.expression(y)))

  /** The same 8 rotation rounds as chained SQL stages for the DuckDB
    * oracle. `from` must expose columns (`x`, `y`, `h`, carry...);
    * returns the list of per-round SELECT bodies to thread through a
    * WITH chain, e.g. `sN AS (SELECT <carry>, <stepSql(s)> FROM sN-1)`.
    * Each round reads the PREVIOUS stage's (x, y, h) — all-integer CASE
    * arithmetic, the exact state machine [[hilbert8]] runs. */
  def stepSql(s: Int): String = {
    val q = // quadrant (3*rx)^ry as pure CASE arithmetic
      s"(CASE WHEN (x & $s) = 0 THEN (CASE WHEN (y & $s) = 0 THEN 0 " +
        s"ELSE 1 END) ELSE (CASE WHEN (y & $s) = 0 THEN 3 ELSE 2 END) END)"
    s"h + ${s * s} * $q AS h, " +
      s"CASE WHEN (y & $s) > 0 THEN x WHEN (x & $s) > 0 THEN 255 - y " +
      s"ELSE y END AS x, " +
      s"CASE WHEN (y & $s) > 0 THEN y WHEN (x & $s) > 0 THEN 255 - x " +
      s"ELSE x END AS y"
  }

  /** Full WITH-chain fragment: stages `h0..h8` over `fromStage`, which
    * must provide (`carry` columns, x, y). The final stage exposes the
    * carry columns plus BIGINT `h`. */
  def chainSql(fromStage: String, carry: String): String = {
    val rounds = Seq(128, 64, 32, 16, 8, 4, 2, 1)
    val s0 = s"h0 AS (SELECT $carry, x, y, 0 AS h FROM $fromStage)"
    val steps = rounds.zipWithIndex.map { case (s, i) =>
      s"h${i + 1} AS (SELECT $carry, ${stepSql(s)} FROM h$i)"
    }
    (s0 +: steps).mkString(",\n")
  }
}
