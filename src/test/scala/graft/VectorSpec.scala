package graft

import org.apache.spark.sql.functions._
import graft.functions.{VectorExpressions, VectorOps}

class VectorSpec extends SparkSpec {

  test("native dot product is bit-identical to built-in composition") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    val pairs = e.select(col("vec_id").as("v1"), col("embedding").as("e1"))
      .crossJoin(e.select(col("vec_id").as("v2"), col("embedding").as("e2")))
    val diff = pairs
      .withColumn("d_native", VectorOps.dot(col("e1"), col("e2")))
      .withColumn("d_builtin", VectorOps.dotBuiltin(col("e1"), col("e2")))
      .filter(col("d_native") =!= col("d_builtin")) // exact, no tolerance
    assert(diff.count() === 0)
  }

  test("native float×double dot is bit-identical to built-in composition") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
      .withColumn("c", transform(col("embedding"),
        x => x.cast("double") * lit(1.0000001)))
    val diff = e
      .withColumn("d_native",
        VectorOps.dotFloatDouble(col("embedding"), col("c")))
      .withColumn("d_builtin",
        VectorOps.dotFloatDoubleBuiltin(col("embedding"), col("c")))
      .filter(col("d_native") =!= col("d_builtin")) // exact, no tolerance
    assert(diff.count() === 0)
  }

  test("native dot registered for SQL surface") {
    VectorExpressions.register(spark)
    spark.read.parquet(s"$sf/embeddings.parquet").limit(5)
      .createOrReplaceTempView("vec_test")
    val rows = spark.sql(
      "SELECT graft_dot(embedding, embedding) AS d FROM vec_test").collect()
    assert(rows.forall(_.getAs[Double]("d") > 0))
  }

  test("ANN queries canonicalize a tiny-negative cosine to +0.0") {
    // The exact escape class that cost round 4 a red: a cosine in
    // (-5e-7, 0) rounds to -0.0 in DuckDB's round() but +0.0 through
    // Spark's BigDecimal HALF_UP, and the driver's hash gate is
    // representation-exact. All three ANN paths append `+ 0.0` after
    // round(cos, 6); this fixture seeds such a cosine into each path's
    // candidate set and pins the positive-zero bit pattern end-to-end.
    import graft.operators.Similarity
    val tmp = java.nio.file.Files.createTempDirectory("veczero").toString
    val pad = Array.fill(7)(0f)
    val b = java.lang.Math.nextUp(0.5f) // 8*(0.25^2) - b = -5.96e-8
    val rows = Seq(
      (0L, Array(1f, 0f) ++ pad ++ pad, 0),          // plain anchor
      (1L, Array(-1e-7f, 1f) ++ pad ++ pad, 0),      // cos(v0,v1) ~ -1e-7
      (2L, Array.fill(8)(0.25f) ++ Array(1f) ++ pad, 0),
      (3L, Array.fill(8)(0.25f) ++ Array(-b) ++ pad, 0)) // same LSH bucket
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    def pinPosZero(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val cos = df.collect().map(_.getAs[Double]("cos"))
      val zeros = cos.filter(_ == 0.0)
      assert(zeros.nonEmpty, s"$name: fixture produced no rounded-zero cos")
      zeros.foreach(z =>
        assert(java.lang.Double.doubleToRawLongBits(z) === 0L,
          s"$name emitted -0.0 (gate-visible divergence)"))
    }
    pinPosZero(Similarity.annBruteForce(spark, tmp), "q38_bruteforce")
    pinPosZero(Similarity.annLsh(spark, tmp), "q39_lsh")
    pinPosZero(Similarity.annIvf(spark, tmp), "q48_ivf")
  }

  test("cosine is symmetric and self-cosine is 1") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(20)
    val selfCos = e.select(
      round(VectorOps.cosine(col("embedding"), col("embedding")), 9)
        .as("c")).collect()
    assert(selfCos.forall(_.getAs[Double]("c") === 1.0))
  }
}
