package graft

import org.apache.spark.sql.functions._
import graft.functions.{MinHashAgg, TextOps}

class MinHashAggSpec extends SparkSpec {

  test("typed-imperative signature equals the k-min-aggregate form") {
    val k = 64
    val hashed = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), explode(TextOps.shingles3(col("text"))).as("s"))
      .select(col("doc_id"), TextOps.portableHash(col("s")).as("x"))

    val viaAgg = hashed.groupBy(col("doc_id"))
      .agg(MinHashAgg.minhashSig(col("x"), k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    val minAggs = (0 until k).map(i =>
      min(TextOps.minhashPermute(i, col("x"))).as(s"m$i"))
    val viaExprs = hashed.groupBy(col("doc_id"))
      .agg(minAggs.head, minAggs.tail: _*)
      .collect().map(r =>
        r.getLong(0) -> (1 to k).map(r.getLong(_)).toSeq).toMap

    assert(viaAgg.keySet === viaExprs.keySet)
    viaAgg.foreach { case (id, sig) =>
      assert(sig === viaExprs(id), s"signature mismatch for doc $id")
    }
  }

  test("signature is permutation-bounded and merge-stable across partitions") {
    val hashed = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(TextOps.shingles3(col("text"))).as("s"))
      .select(col("doc_id"), TextOps.portableHash(col("s")).as("x"))
    val one = hashed.coalesce(1).groupBy(col("doc_id"))
      .agg(MinHashAgg.minhashSig(col("x"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val many = hashed.repartition(7).groupBy(col("doc_id"))
      .agg(MinHashAgg.minhashSig(col("x"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(one === many) // partial-agg merge is order-insensitive
    assert(one.values.forall(_.forall(v =>
      v >= 0 && v < TextOps.minhashPrime)))
  }
}
