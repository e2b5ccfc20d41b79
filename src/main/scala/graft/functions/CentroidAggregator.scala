package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator computing the element-wise mean of integer-quantized
  * vectors (cluster centroids for IVF-style ANN). Buffer = (sum vector,
  * count): associative + commutative merge → partial aggregation on the
  * map side, the shuffle carries one (dim+1)-long buffer per group
  * regardless of row count. SURVEY.md §7.3's `Aggregator[IN, BUF, OUT]`
  * surface.
  *
  * Input is the QUANTIZED grid vector (`floor(1000*x + 0.5)` longs), not
  * the raw floats: per-dimension sums are then exact integers — order-
  * and partition-independent — so the finished centroid doubles are
  * bit-identical on any engine (the same trick as
  * [[graft.operators.Dedup.embeddingCells]]'s Lloyd step), which is what
  * lets the IVF query be hash-checked against a DuckDB oracle. A float
  * sum here would drift with merge order and make the probe assignment
  * nondeterministic across runs.
  */
object CentroidAggregator
    extends Aggregator[Array[Long], (Array[Long], Long), Array[Double]] {

  override def zero: (Array[Long], Long) = (Array.empty[Long], 0L)

  override def reduce(b: (Array[Long], Long),
                      v: Array[Long]): (Array[Long], Long) = {
    val acc = if (b._1.isEmpty) new Array[Long](v.length) else b._1
    var i = 0
    while (i < v.length) { acc(i) += v(i); i += 1 }
    (acc, b._2 + 1)
  }

  override def merge(a: (Array[Long], Long),
                     b: (Array[Long], Long)): (Array[Long], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      val out = a._1.clone()
      var i = 0
      while (i < out.length) { out(i) += b._1(i); i += 1 }
      (out, a._2 + b._2)
    }
  }

  override def finish(b: (Array[Long], Long)): Array[Double] =
    if (b._2 == 0) Array.empty else b._1.map(_.toDouble / b._2)

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Array[Long], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
