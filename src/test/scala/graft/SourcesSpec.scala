package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{ApproxAgg, SkewJoin}
import graft.sources.{PartitionedWrite, Tables}

class SourcesSpec extends SparkSpec {

  test("DSv2 census source: partition per payload file, header-derived schema") {
    val dir = Files.createTempDirectory("graft_dsv2").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/y2017.json"),
      """[["NAME","DP03_0062E","state"],["Mississippi","42009","28"],["Missouri","51542","29"]]""")
    Files.writeString(java.nio.file.Paths.get(s"$dir/y2018.json"),
      """[["NAME","DP03_0062E","state"],["Mississippi","43567","28"]]""")
    val df = spark.read.format("graft.sources.CensusSource")
      .option("path", dir).load()
    assert(df.columns.toSeq === Seq("NAME", "DP03_0062E", "state"))
    assert(df.count() === 3)
    assert(df.rdd.getNumPartitions === 2) // one per staged payload
    assert(df.filter(col("state") === "28").count() === 2)
  }

  test("partitioned parquet write prunes partitions on year predicate") {
    val dir = Files.createTempDirectory("graft_part").toString
    val orders = Tables.load(spark, sf, "orders")
    PartitionedWrite.writeByYear(orders, "o_orderdate", s"$dir/orders")
    val back = PartitionedWrite.read(spark, s"$dir/orders")
    assert(back.count() === orders.count())
    val pruned = back.filter(col("p_year") === 1996)
    // plan must carry a PartitionFilters entry on p_year (no data filter)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p_year"),
      s"partition pruning missing from plan:\n$plan")
    val expected = orders.filter(year(col("o_orderdate")) === 1996).count()
    assert(pruned.count() === expected)
  }

  test("salted join equals plain join (skew mitigation is invisible)") {
    val plain = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val salted = SkewJoin.saltedSupplierJoin(spark, sf)
      .collect().map(r => (r.getAs[Int]("nation_id"), r.getAs[Long]("n")))
      .toMap
    assert(salted === plain)
  }

  test("approx distinct within rsd bound of exact; approx median sane") {
    val exact = Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ApproxAgg.approxAgg(spark, sf).collect().foreach { r =>
      val e = exact(r.getAs[String]("o_orderstatus")).toDouble
      val a = r.getAs[Long]("approx_cust").toDouble
      assert(math.abs(a - e) / e < 0.1, s"approx $a vs exact $e")
      assert(r.getAs[Double]("approx_median") > 0)
    }
  }
}
