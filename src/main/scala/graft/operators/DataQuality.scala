package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Rule-driven data-quality gate: declarative constraints evaluated as ONE
  * aggregation pass over the table — every rule becomes a conditional sum,
  * so N rules cost one scan and one constant-size exchange regardless of
  * table size (the shape that lets an ingestion pipeline gate every batch).
  * NULL handling is explicit: a row that cannot prove the predicate
  * (NULL input) counts as a violation, so rules are contracts, not hints.
  *
  * The long-form output (one row per rule) keeps downstream alerting
  * column-generic, same rationale as [[Analytics.profileTable]].
  */
object DataQuality {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** (rule name, predicate that valid rows satisfy). */
  private def orderRules: Seq[(String, Column)] = Seq(
    "totalprice_positive" -> (col("o_totalprice") > 0),
    "custkey_present" -> col("o_custkey").isNotNull,
    "status_in_domain" -> col("o_orderstatus").isin("F", "O", "P"),
    "orderdate_in_range" ->
      (col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1992-01-01 00:00:00")) &&
       col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00"))))

  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val aggs = count(lit(1)).as("n_rows") +:
      orderRules.map { case (name, pred) =>
        sum(when(pred, 0).otherwise(1)).as(s"v_$name")
      }
    val wide = o.agg(aggs.head, aggs.tail: _*)
    orderRules.map { case (name, _) =>
      wide.select(lit(name).as("rule_name"), col("n_rows"),
        col(s"v_$name").as("n_violations"),
        round(col(s"v_$name") / col("n_rows"), 6).as("violation_rate"))
    }.reduce(_ unionByName _)
  }

  val catalog: Seq[Q] = Seq(
    Q("q78_dq_checks", dqChecks _,
      """WITH w AS (
        |  SELECT count(*) AS n_rows,
        |    sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)
        |      AS v_totalprice_positive,
        |    sum(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END)
        |      AS v_custkey_present,
        |    sum(CASE WHEN o_orderstatus IN ('F', 'O', 'P') THEN 0 ELSE 1 END)
        |      AS v_status_in_domain,
        |    sum(CASE WHEN o_orderdate >= TIMESTAMP '1992-01-01 00:00:00'
        |              AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |             THEN 0 ELSE 1 END) AS v_orderdate_in_range
        |  FROM orders)
        |SELECT 'totalprice_positive' AS rule_name, n_rows,
        |  CAST(v_totalprice_positive AS BIGINT) AS n_violations,
        |  round(v_totalprice_positive / n_rows, 6) AS violation_rate FROM w
        |UNION ALL
        |SELECT 'custkey_present', n_rows,
        |  CAST(v_custkey_present AS BIGINT),
        |  round(v_custkey_present / n_rows, 6) FROM w
        |UNION ALL
        |SELECT 'status_in_domain', n_rows,
        |  CAST(v_status_in_domain AS BIGINT),
        |  round(v_status_in_domain / n_rows, 6) FROM w
        |UNION ALL
        |SELECT 'orderdate_in_range', n_rows,
        |  CAST(v_orderdate_in_range AS BIGINT),
        |  round(v_orderdate_in_range / n_rows, 6) FROM w""".stripMargin)
  )
}
