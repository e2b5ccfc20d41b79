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

  test("SimHashAgg fingerprint equals the 60-expression sum/pack form") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("tk"))
      .select(col("doc_id"), TextOps.portableHash60(col("tk")).as("h"))
    val viaAgg = toks.groupBy(col("doc_id"))
      .agg(graft.functions.SimHashAgg.simhashFp(col("h"), 60).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bitAggs = (0 until 60).map(i =>
      sum(TextOps.simhashContrib(i, col("h"))).as(s"b$i"))
    val viaExprs = toks.groupBy(col("doc_id"))
      .agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), TextOps.simhashPack60(i => col(s"b$i")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg === viaExprs)
    assert(viaAgg.values.forall(_ >= 0L)) // 60-bit: sign bit never set
  }

  test("SimHashAgg is merge-stable across partitionings") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("tk"))
      .select(col("doc_id"), TextOps.portableHash60(col("tk")).as("h"))
    def fp(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.groupBy(col("doc_id"))
        .agg(graft.functions.SimHashAgg.simhashFp(col("h"), 60).as("sim"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(toks.coalesce(1)) === fp(toks.repartition(7)))
  }
}
