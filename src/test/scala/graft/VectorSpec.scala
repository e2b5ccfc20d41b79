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

  test("cosine is symmetric and self-cosine is 1") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(20)
    val selfCos = e.select(
      round(VectorOps.cosine(col("embedding"), col("embedding")), 9)
        .as("c")).collect()
    assert(selfCos.forall(_.getAs[Double]("c") === 1.0))
  }
}
