package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector primitives over `array<float>` embedding columns.
  *
  * Elements are cast float→double before any arithmetic and folded
  * left-to-right, so Spark and the DuckDB oracle execute the identical
  * IEEE-double operation sequence — results compare bit-for-bit
  * (SURVEY.md §7.4 float-determinism discipline).
  */
object VectorOps {

  private def asDouble(v: Column): Column =
    transform(v, x => x.cast("double"))

  /** Σ a_i·b_i (double, sequential fold) — native codegen'd expression
    * ([[VectorExpressions.DotProductFloat]]); bit-identical to
    * [[dotBuiltin]], ~30x faster over millions of pairs. */
  def dot(a: Column, b: Column): Column =
    VectorExpressions.dotNative(a, b)

  /** Built-in higher-order composition of the dot product (reference
    * semantics; used to cross-check the native expression in specs). */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** Σ a_i² (double). */
  def normSq(a: Column): Column = dot(a, a)

  /** Euclidean norm. */
  def l2Norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity: dot / (‖a‖·‖b‖). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine given precomputed norms (the at-scale form: norms are computed
    * once per vector in a narrow pass, not once per pair). */
  def cosinePrenormed(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol / (normA * normB)

  /** Σ a_i·c_i for a float vector against a double vector (centroid):
    * float→double cast then left-to-right fold — the identical operation
    * sequence as the oracle's list-comprehension + list_aggregate('sum'),
    * so centroid-assignment scores compare bit-for-bit. Native codegen'd
    * form ([[VectorExpressions.DotFloatDouble]]); the built-in
    * zip_with+aggregate spelling is bit-identical but interpreted. */
  def dotFloatDouble(a: Column, c: Column): Column =
    VectorExpressions.dotFloatDoubleNative(a, c)

  /** Built-in higher-order spelling of [[dotFloatDouble]] (spec
    * cross-check). */
  def dotFloatDoubleBuiltin(a: Column, c: Column): Column =
    aggregate(zip_with(asDouble(a), c, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** Euclidean norm of a double vector (sequential fold). */
  def l2NormDouble(c: Column): Column =
    sqrt(aggregate(transform(c, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Sign-bit LSH bucket over the first `nBits` dimensions (axis-aligned
    * hyperplanes — deterministic, engine-portable). Random-hyperplane LSH
    * (Charikar 2002) would use projected gaussians; axis planes keep the
    * oracle SQL exactly equivalent. */
  def signBucket(v: Column, nBits: Int): Column =
    concat_ws("", (1 to nBits).map(i =>
      when(element_at(v, i) >= 0f, lit("1")).otherwise(lit("0"))): _*)
}
