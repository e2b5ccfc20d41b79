package graft

import org.apache.spark.sql.functions._
import graft.functions.{KMinValuesAgg, TextOps}
import graft.operators.ApproxAgg

class KMinValuesSpec extends SparkSpec {

  private def hashed = spark.read.parquet(s"$sf/lineitem.parquet")
    .select(TextOps.portableHash(col("l_partkey").cast("string")).as("h"))

  test("sketch is the k smallest distinct values, any partitioning") {
    val expected = hashed.select(col("h")).distinct()
      .orderBy(col("h")).limit(16)
      .collect().map(_.getLong(0)).toSeq
    for (parts <- Seq(1, 7)) {
      val got = hashed.repartition(parts)
        .agg(KMinValuesAgg.kMinValues(col("h"), 16).as("kmv"))
        .collect()(0).getSeq[Long](0)
      assert(got === expected, s"parts=$parts")
    }
  }

  test("under-full buffer reports the exact distinct count") {
    val small = hashed.limit(10)
    val n = small.distinct().count()
    val got = small.agg(KMinValuesAgg.kMinValues(col("h"), 64).as("kmv"))
      .collect()(0).getSeq[Long](0)
    assert(got.length.toLong === n)
  }

  test("q106 estimate lands within 35% of exact (k=64, fixed data)") {
    ApproxAgg.kmvDistinct(spark, sf).collect().foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val exact = r.getAs[Long]("exact_distinct").toDouble
      assert(math.abs(est - exact) / exact < 0.35,
        s"flag=${r.getString(0)} est=$est exact=$exact")
    }
  }
}
