package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary scan (the q360 hot loop).
  *
  * Semantics are EXACTLY `Multimodal.cdcFpSql`'s SQL formula — and the
  * DuckDB oracle's list comprehension: over the text's codepoints
  * (Spark `ascii` / DuckDB `unicode` units), position i (1-based,
  * i ≤ n−7) is a boundary iff
  * (Σⱼ cp[i+j]·Bʲ) mod 1000000007 ≡ 0 (mod 16), B = 1000003.
  * All arithmetic is exact in signed 64-bit (term ≤ 1.1e6·1e9, 8-term
  * sum ≤ 8.8e15) and addition order is immaterial without overflow, so
  * the compiled loop is bit-identical to the SQL fold.
  *
  * Why native: the `transform(sequence(...))` spelling evaluates the
  * 8-term polynomial interpreted per position (HigherOrderFunction is
  * CodegenFallback) — ~1.4 s of the 2.5 s q360 wall at sf0.1. This
  * expression runs the same math as one compiled loop inside
  * whole-stage codegen.
  */
object CdcOps {
  /** B^j mod P, j = 0..7 — keep in sync with Multimodal.cdcPows. */
  val POWS: Array[Long] = Array(1L, 1000003L, 5993009L, 26937076L,
    156622669L, 137771646L, 58350534L, 708643152L)

  /** Boundary positions (1-based codepoint index) — called from both
    * the interpreted eval and the generated code. */
  def boundaries(s: UTF8String): ArrayData = {
    val str = s.toString
    val len = str.length
    var n = 0
    var i = 0
    while (i < len) { // count codepoints (supplementary = 1, like numChars)
      i += Character.charCount(str.codePointAt(i)); n += 1
    }
    if (n < 8) return new GenericArrayData(Array.empty[Int])
    val cps = new Array[Long](n)
    i = 0
    var k = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      cps(k) = cp.toLong
      k += 1
      i += Character.charCount(cp)
    }
    val out = Array.newBuilder[Int]
    var p = 0 // 0-based window start; boundary index is p + 1
    val last = n - 8
    while (p <= last) {
      var fp = 0L
      var j = 0
      while (j < 8) { fp += cps(p + j) * POWS(j); j += 1 }
      if (fp % 1000000007L % 16L == 0L) out += p + 1
      p += 1
    }
    new GenericArrayData(out.result())
  }

  /** Column API: boundary positions of a string column. */
  def cdcBoundaries(text: Column): Column =
    GraftBridge.column(CdcBoundariesExpr(GraftBridge.expression(text)))
}

case class CdcBoundariesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_boundaries expects string, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CdcOps.boundaries(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcOps.boundaries($c);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
