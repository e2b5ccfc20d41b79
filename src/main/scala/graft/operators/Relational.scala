package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational parity operators — SURVEY.md §2 (scans, projections, filters,
  * joins, aggregations, set ops), re-expressed as declarative DataFrame plans
  * so Catalyst handles pushdown/pruning/join-strategy (SURVEY.md §4).
  *
  * Every query takes (spark, sfDir) and is deterministic + order-insensitive;
  * double aggregates are rounded so the DuckDB oracle hash-matches.
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Flagship star query (reference fact view + EP3 consumption query,
    * `report.md:489-494,509-515`, mapped onto the testdata star):
    * fact = lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region (J1/J2/J3),
    * filter one year (P5), group-by-avg + revenue (A2).
    *
    * Scale notes: nation/region are constant-size dims → broadcast (no
    * shuffle); lineitem⋈orders and ⋈customer shuffle on their keys — at
    * 100 TB these are the unavoidable fact-to-fact exchanges, sized by AQE.
    * The year filter and the 7-column projection push down to the Parquet
    * scan (verified via explain: PushedFilters/ReadSchema).
    */
  def starFact(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
      .filter(year(col("o_orderdate")) === 1996)
    val c = t(spark, dir, "customer")
    val n = Tables.dim(spark, dir, "nation")
    val r = Tables.dim(spark, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name").as("nation"), col("r_name").as("region"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        round(avg(col("l_discount")), 6).as("avg_discount"),
        count(lit(1)).as("n_rows"))
  }

  val starFactSql: String =
    """SELECT n_name AS nation, r_name AS region,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  round(avg(l_discount), 6) AS avg_discount,
      |  count(*) AS n_rows
      |FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation   ON c_nationkey = n_nationkey
      |  JOIN region   ON n_regionkey = r_regionkey
      |WHERE year(o_orderdate) = 1996
      |GROUP BY 1, 2""".stripMargin
}
