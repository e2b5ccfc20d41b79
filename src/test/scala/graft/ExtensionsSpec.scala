package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.plans.RewriteDotProduct

class ExtensionsSpec extends SparkSpec {

  test("RewriteDotProduct fuses the higher-order pattern to DotProductFloat") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(10)
    val df = e.select(VectorOps.dotBuiltin(col("embedding"), col("embedding"))
      .as("d"))
    val before = df.queryExecution.analyzed
    val after = RewriteDotProduct(before)
    assert(!before.toString.contains("DotProductFloat"))
    assert(after.toString.toLowerCase.contains("dotproductfloat"),
      s"rewrite did not fire:\n$after")
  }

  test("rewritten plan computes identical values end-to-end") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(100)
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = Seq(RewriteDotProduct)
      val viaRule = e.select(col("vec_id"),
        VectorOps.dotBuiltin(col("embedding"), col("embedding")).as("d"))
      assert(viaRule.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("dotproductfloat"))
      val native = e.select(col("vec_id"),
        VectorOps.dot(col("embedding"), col("embedding")).as("d"))
      val l = viaRule.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val r = native.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(l === r) // exact equality — the rewrite is bit-identical
    } finally spark.experimental.extraOptimizations = prev
  }

  test("GraftExtensions registers graft_dot in a fresh session") {
    // exercised against a cloned session state via extensions-applied config
    val s2 = spark.newSession()
    graft.functions.VectorExpressions.register(s2)
    s2.read.parquet(s"$sf/embeddings.parquet").limit(3)
      .createOrReplaceTempView("ext_vecs")
    val rows = s2.sql("SELECT graft_dot(embedding, embedding) AS d FROM ext_vecs")
      .collect()
    assert(rows.forall(_.getDouble(0) > 0))
  }

  test("graft_zorder / graft_bloom_agg / graft_bloom_contains / graft_kmin " +
      "work from SQL") {
    val s2 = spark.newSession()
    val reg = s2.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_zorder",
      exprs => graft.functions.InterleaveBits16(exprs(0), exprs(1)),
      "scala_udf")
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      exprs => graft.functions.BloomAgg(exprs(0), 1 << 16, 5)
        .toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bloom_contains",
      exprs => graft.functions.BloomMightContain(exprs(0), exprs(1), 5),
      "scala_udf")
    reg.createOrReplaceTempFunction("graft_kmin",
      exprs => graft.functions.KMinValuesAgg(exprs(0), 4)
        .toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("graft_hilbert",
      exprs => graft.functions.HilbertIndex2D8(exprs(0), exprs(1)),
      "scala_udf")
    assert(s2.sql("SELECT graft_zorder(3L, 5L) AS z").collect()(0)
      .getLong(0) === graft.functions.ZOrderOps.interleave16(3L, 5L))
    assert(s2.sql("SELECT graft_hilbert(3L, 5L) AS h").collect()(0)
      .getLong(0) === graft.functions.HilbertOps.hilbert8(3L, 5L))
    val r = s2.sql(
      """WITH v(x) AS (VALUES (10L), (20L), (30L), (7L), (7L))
        |SELECT graft_kmin(x, 4) AS km,
        |  graft_bloom_contains(graft_bloom_agg(x, 65536, 5), 20L, 5) AS inb,
        |  graft_bloom_contains(graft_bloom_agg(x, 65536, 5), 999L, 5) AS outb
        |FROM v""".stripMargin).collect()(0)
    assert(r.getSeq[Long](0) === Seq(7L, 10L, 20L, 30L))
    assert(r.getBoolean(1) && !r.getBoolean(2))
  }

  test("graft_topk keeps the k best (key, id) pairs from SQL") {
    val s2 = spark.newSession()
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk",
      exprs => graft.functions.TopKAgg(exprs(0), exprs(1), 2)
        .toAggregateExpression(), "scala_udf")
    val r = s2.sql(
      """WITH v(k, id) AS (VALUES (10L, 1L), (30L, 2L), (30L, 3L), (5L, 4L))
        |SELECT graft_topk(k, id, 2) AS top FROM v""".stripMargin)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    // best first: key 30 tie broken to the LOWER id, then the other 30
    assert(r.map(x => (x.getLong(0), x.getLong(1))) ===
      Seq((30L, 2L), (30L, 3L)))
    // BAG semantics: a duplicated (key, id) pair fills two top-k slots,
    // exactly like the window-rank formulation would emit two rows
    val dup = s2.sql(
      """WITH v(k, id) AS (VALUES (10L, 1L), (10L, 1L), (5L, 2L))
        |SELECT graft_topk(k, id, 2) AS top FROM v""".stripMargin)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(dup.map(x => (x.getLong(0), x.getLong(1))) ===
      Seq((10L, 1L), (10L, 1L)))
    // analysis-time typing: an INT key is implicitly cast, not a
    // task-time ClassCastException (k is pinned to 2 by this temp
    // registration; the injectFunction path reads the literal)
    val cast = s2.sql(
      """WITH v(k, id) AS (VALUES (7, 1L), (9, 2L))
        |SELECT graft_topk(k, id, 2) AS top FROM v""".stripMargin)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(cast.map(x => (x.getLong(0), x.getLong(1))) ===
      Seq((9L, 2L), (7L, 1L)))
  }

  test("graft_dot_fd scores a float vector against a double centroid in SQL") {
    val s2 = spark.newSession()
    // drive the injectFunction path directly via a session registration
    graft.functions.VectorExpressions.register(s2)
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_fd",
      exprs => graft.functions.DotFloatDouble(exprs(0), exprs(1)),
      "scala_udf")
    s2.read.parquet(s"$sf/embeddings.parquet").limit(3)
      .createOrReplaceTempView("ext_vecs_fd")
    val rows = s2.sql(
      """SELECT graft_dot_fd(embedding,
        |  transform(embedding, x -> CAST(x AS DOUBLE))) AS d
        |FROM ext_vecs_fd""".stripMargin).collect()
    assert(rows.forall(_.getDouble(0) > 0))
  }
}
