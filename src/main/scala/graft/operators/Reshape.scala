package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Reshaping + subquery operators: pivot (long→wide), explode/unnest
  * (wide→long), scalar subqueries. */
object Reshape {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Pivot with an explicit value list (the at-scale form — without it
    * Spark must first collect the distinct pivot values to the driver). */
  def pivotStatus(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum(col("o_totalprice")), 2))

  /** Scalar subquery: customers above the global average balance. */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("sq_customer")
    spark.sql(
      """SELECT c_mktsegment AS segment, count(*) AS n,
        |  round(avg(c_acctbal), 4) AS avg_bal
        |FROM sq_customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM sq_customer)
        |GROUP BY 1""".stripMargin)
  }

  /** Lateral join: correlated top-2 orders per customer — "for each row,
    * run this subquery" semantics. Catalyst decorrelates the LIMIT'd
    * correlated subquery into a window-rank over a hash join, so at scale
    * it executes as one shuffle on the correlation key — no per-row
    * subquery execution ever happens (the pitfall lateral syntax invites
    * on engines that nest-loop it). */
  def lateralTopk(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("lat_customer")
    t(spark, dir, "orders").createOrReplaceTempView("lat_orders")
    spark.sql(
      """SELECT c_custkey AS cust_id, o_orderkey AS order_id,
        |  round(o_totalprice, 2) AS price
        |FROM lat_customer,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM lat_orders WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC
        |  LIMIT 2)
        |WHERE c_custkey < 300""".stripMargin)
  }

  /** UNPIVOT (wide→long) — the inverse of [[pivotStatus]], via Spark's
    * native `Dataset.unpivot` (the melt operation metric stores and
    * profilers need when a wide per-entity table feeds a generic
    * (entity, metric, value) sink). All three metrics are exact integers
    * (balance pre-quantized to cents PER ROW, then summed — a summed
    * double quantized after the fact would be order-dependent), so the
    * long output is bit-stable. Narrow: unpivot is a per-row flatMap, no
    * shuffle beyond the source aggregation. */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .groupBy(col("c_nationkey").cast("int").as("nation_id"))
      .agg(count(lit(1)).as("n_customers"),
        sum(expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)"))
          .as("bal_cents"),
        max(col("c_custkey")).as("max_custkey"))
      .unpivot(
        Array(col("nation_id")),
        Array(col("n_customers"), col("bal_cents"), col("max_custkey")),
        "metric", "value")

  /** Explode array → rows (wide→long), re-aggregated per vector bucket. */
  def explodeEmbeddings(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"), explode(col("embedding")).as("x"))
      .groupBy(expr("CAST(vec_id div 100 AS INT)").as("bucket"))
      .agg(count(lit(1)).as("n_elements"),
           round(sum(abs(col("x").cast("double"))), 4).as("abs_sum"))

  val catalog: Seq[Q] = Seq(
    Q("q130_unpivot", unpivotMetrics _,
      """WITH wide AS (
        |  SELECT CAST(c_nationkey AS INT) AS nation_id,
        |    count(*) AS n_customers,
        |    CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS bal_cents,
        |    max(c_custkey) AS max_custkey
        |  FROM customer GROUP BY 1)
        |SELECT nation_id, 'n_customers' AS metric, n_customers AS value
        |FROM wide
        |UNION ALL
        |SELECT nation_id, 'bal_cents' AS metric, bal_cents AS value
        |FROM wide
        |UNION ALL
        |SELECT nation_id, 'max_custkey' AS metric, max_custkey AS value
        |FROM wide""".stripMargin),
    Q("q79_lateral_topk", lateralTopk _,
      """SELECT c_custkey AS cust_id, o_orderkey AS order_id,
        |  round(o_totalprice, 2) AS price
        |FROM customer,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC
        |  LIMIT 2)
        |WHERE c_custkey < 300""".stripMargin),
    Q("q49_pivot", pivotStatus _,
      """SELECT o_orderpriority AS priority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P
        |FROM orders GROUP BY 1""".stripMargin),
    Q("q50_scalar_subquery", scalarSubquery _,
      """SELECT c_mktsegment AS segment, count(*) AS n,
        |  round(avg(c_acctbal), 4) AS avg_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |GROUP BY 1""".stripMargin),
    Q("q51_explode", explodeEmbeddings _,
      """SELECT CAST(vec_id // 100 AS INT) AS bucket,
        |  count(*) AS n_elements,
        |  round(sum(abs(CAST(x AS DOUBLE))), 4) AS abs_sum
        |FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
        |GROUP BY 1""".stripMargin)
  )
}
