package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made `ExpressionUtils` private[sql],
  * so the one place that needs the conversion for registering a custom
  * Catalyst expression as a Column lives in this package. No Spark
  * internals are modified — these are straight delegations.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Unique-per-session id (classic.SparkSession.sessionUUID is not on
    * the public base type): the cache key that survives session churn —
    * an identity hash can recur after GC, a sessionUUID cannot. */
  def sessionUUID(s: SparkSession): String =
    s.asInstanceOf[classic.SparkSession].sessionUUID

  /** Materialize a logical sub-plan as a DataFrame
    * (classic.Dataset.ofRows is private[sql]) — used by the
    * bounded-window lint spec to count the rows actually entering each
    * unpartitioned Window node. */
  def ofRows(s: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}
