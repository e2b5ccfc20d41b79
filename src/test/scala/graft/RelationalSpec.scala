package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("q01 star fact: 25 nations, positive revenue, regions consistent") {
    val rows = Relational.starFact(spark, sf).collect()
    assert(rows.length === 25)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
    assert(rows.forall(_.getAs[Long]("n_rows") > 0))
  }

  test("distinct is idempotent (A1)") {
    val d1 = Relational.distinctDims(spark, sf)
    assert(d1.count() === d1.distinct().count())
  }

  test("union row-count additivity (U1)") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val n95 = o.filter(year(col("o_orderdate")) === 1995).count()
    val n96 = o.filter(year(col("o_orderdate")) === 1996).count()
    val unioned = Relational.unionYears(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(unioned === n95 + n96)
  }

  test("try_cast: malformed to null, well-formed preserved (P6)") {
    val r = Relational.tryCastCoercion(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_type_ok") === 0)          // 'ECONOMY' -> null
    assert(r.getAs[Long]("n_brand_ok") === r.getAs[Long]("n_parts"))
    assert(r.getAs[Int]("min_brand") >= 0)
  }

  test("composite-key join output is bounded by smaller measure (J1)") {
    val out = Relational.joinComposite(spark, sf)
    assert(out.count() > 0)
    // inner join on (cust, yr): pairs cannot exceed either side's groups
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val spendGroups = o.groupBy(col("o_custkey"),
      year(col("o_orderdate"))).count().count()
    val pairs = out.agg(sum("n_pairs")).collect()(0).getLong(0)
    assert(pairs <= spendGroups)
  }

  test("census star analog: one row per active nation, filtered year (EP3)") {
    val out = Relational.censusStar(spark, sf).collect()
    assert(out.length > 0 && out.length <= 25)
    assert(out.forall(_.getAs[Double]("avg_rate") >= 0))
  }

  test("table diff: change census equals the rule arithmetic exactly") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the synthesis rules partition the keyspace deterministically:
    val removed = orders.filter(_._1 % 101 == 0)
    val added = orders.filter(_._1 % 103 == 0)
    val changed = orders.filter(o => o._1 % 97 == 0 && o._1 % 101 != 0)
    val unchanged =
      orders.length - removed.length - changed.length
    val got = Relational.tableDiff(spark, sf).collect().map(r =>
      r.getAs[String]("change") -> ((r.getAs[Long]("n"),
        r.getAs[Long]("cents_delta")))).toMap
    assert(got("removed") === ((removed.length.toLong,
      -removed.map(_._2).sum)))
    assert(got("added") === ((added.length.toLong, added.map(_._2).sum)))
    // every changed row is a +100-cent reprice
    assert(got("changed") === ((changed.length.toLong,
      changed.length.toLong * 100)))
    assert(got("unchanged") === ((unchanged.toLong, 0L)))
    // the census is non-degenerate: all four classes occur
    assert(got.size === 4)
  }
}
