package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins the r16 GramAgg rewrite of stage_pc1's Gram stage: the typed
  * aggregate's d² sums equal the previous (vec_id self-join +
  * groupBy(j,k)) form bit-for-bit, including the empty-relation shape
  * (empty buffer → zero Gram rows). */
class GramAggSpec extends SparkSpec {

  private def quantized(dir: String) =
    graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x =>
        floor(lit(1000.0) * x.cast("double") + lit(0.5)).cast("long"))
        .as("xs"))

  private def gramViaJoin(q: org.apache.spark.sql.DataFrame) = {
    val pts = q.select(col("vec_id"),
      posexplode(col("xs")).as(Seq("j", "x")))
      .withColumn("j", col("j") + 1)
    pts.select(col("vec_id"), col("j"), col("x"))
      .join(pts.select(col("vec_id"), col("j").as("k"),
        col("x").as("xk")), Seq("vec_id"))
      .groupBy(col("j"), col("k")).agg(sum(col("x") * col("xk")).as("g"))
  }

  private def gramViaAgg(q: org.apache.spark.sql.DataFrame) =
    q.agg(graft.functions.GramAgg.gram(col("xs")).as("gb"))
      .select(expr("CAST(round(sqrt(size(gb)), 0) AS INT)").as("d"),
        posexplode(col("gb")).as(Seq("idx", "g")))
      .select((expr("CAST(idx div d AS INT)") + 1).as("j"),
        (expr("CAST(idx % d AS INT)") + 1).as("k"), col("g"))

  test("GramAgg equals the self-join Gram on the sf0.001 embeddings") {
    val q = quantized(sf)
    def norm(r: org.apache.spark.sql.Row) =
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue)
    val a = gramViaAgg(q).collect().map(norm).sorted
    val b = gramViaJoin(q).collect().map(norm).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("GramAgg on an empty relation yields zero Gram rows") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("xs", ArrayType(LongType))))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    assert(gramViaAgg(empty).collect().isEmpty)
  }

  test("GramAgg skips null vectors and matches a hand computation") {
    val df = spark.createDataFrame(Seq(
      (1L, Seq(2L, -3L)), (2L, Seq(5L, 7L)))).toDF("vec_id", "xs")
      .unionByName(spark.createDataFrame(Seq(Tuple1(3L))).toDF("vec_id")
        .withColumn("xs", lit(null).cast(ArrayType(LongType))))
    val got = gramViaAgg(df).collect()
      .map(r => ((r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue), r.getAs[Number](2).longValue)).toMap
    // outer(2,-3)+outer(5,7): [[4+25, -6+35], [-6+35, 9+49]]
    assert(got === Map((1L, 1L) -> 29L, (1L, 2L) -> 29L,
      (2L, 1L) -> 29L, (2L, 2L) -> 58L))
  }
}
