package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator computing the element-wise mean of float vectors
  * (cluster centroids for IVF-style ANN). Buffer = (sum vector, count):
  * associative + commutative merge → partial aggregation on the map side,
  * the shuffle carries one (dim+1)-double buffer per group regardless of
  * row count. SURVEY.md §7.3's `Aggregator[IN, BUF, OUT]` surface.
  */
object CentroidAggregator
    extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long),
                      v: Array[Float]): (Array[Double], Long) = {
    val acc = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length) { acc(i) += v(i); i += 1 }
    (acc, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long),
                     b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      val out = a._1.clone()
      var i = 0
      while (i < out.length) { out(i) += b._1(i); i += 1 }
      (out, a._2 + b._2)
    }
  }

  override def finish(b: (Array[Double], Long)): Array[Double] =
    if (b._2 == 0) Array.empty else b._1.map(_ / b._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
