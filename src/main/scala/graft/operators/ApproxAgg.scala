package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Approximate and order-statistic aggregates.
  *
  * At 100 TB, exact distinct counts and exact quantiles need either a
  * full shuffle of the distinct values or a global sort; the sketch forms
  * (HyperLogLog++ for distinct, an approximate quantile summary for
  * percentiles) are single-pass, mergeable, fixed-memory — the default
  * choice at scale. Sketch results are engine-specific → declared
  * rows-only (no DuckDB oracle); `ApproxSpec` bounds them against exact.
  */
object ApproxAgg {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** HLL++ distinct + approximate median per order status. */
  def approxAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_cust"),
           percentile_approx(col("o_totalprice"), lit(0.5), lit(1000))
             .as("approx_median"),
           count(lit(1)).as("n"))

  /** Exact interpolated percentiles (quantile_cont semantics — identical
    * definition in Spark `percentile` and DuckDB `quantile_cont`). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").as("ps"),
           count(lit(1)).as("n"))
      .select(col("o_orderstatus"),
        round(element_at(col("ps"), 1), 4).as("p25"),
        round(element_at(col("ps"), 2), 4).as("p50"),
        round(element_at(col("ps"), 3), 4).as("p75"),
        col("n"))

  val catalog: Seq[Q] = Seq(
    Q.noOracle("q46_approx_agg", approxAgg _),
    Q("q47_percentiles", percentiles _,
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        |  count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin)
  )
}
