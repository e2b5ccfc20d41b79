package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Join-variant, set-operation, and multi-dimensional grouping operators —
  * engine breadth beyond the reference's three inner joins (SURVEY.md §2.3
  * notes the full join surface as roadmap).
  *
  * Scale notes: semi/anti joins shuffle only the join keys of the filtered
  * side; rollup/cube expand grouping sets map-side with partial aggregation,
  * so the exchange carries one partial row per (group, grouping-set) — not
  * per input row.
  */
object JoinsSetOps {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Left outer join preserving customers with no orders; null-aware
    * aggregation (count(col) skips nulls, unlike count(*)). */
  def outerJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_nationkey").as("nation_id"))
      .agg(countDistinct(col("c_custkey")).as("n_customers"),
           count(col("o_orderkey")).as("n_orders"),
           countDistinct(when(col("o_orderkey").isNull, col("c_custkey")))
             .as("n_no_order"))
  }

  /** Left-semi join — EXISTS semantics, no row multiplication. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o95 = t(spark, dir, "orders")
      .filter(Relational.inYear(col("o_orderdate"), 1995))
    c.join(o95, c("c_custkey") === o95("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** Left-anti join — NOT EXISTS semantics. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("nation_id"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** ROLLUP with grouping_id — hierarchical subtotals. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("l_quantity")), 2).as("qty"),
           grouping_id().as("gid"))

  /** CUBE — all grouping-set combinations. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("o_totalprice")), 2).as("spend"),
           grouping_id().as("gid"))

  /** INTERSECT / EXCEPT (both DISTINCT semantics, as in ANSI SQL):
    * customers active in 1995 vs 1996. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    def custs(y: Int): DataFrame =
      o.filter(Relational.inYear(col("o_orderdate"), y))
        .select(col("o_custkey"))
    val both = custs(1995).intersect(custs(1996))
      .agg(count(lit(1)).as("n")).select(lit("intersect").as("op"), col("n"))
    val only95 = custs(1995).except(custs(1996))
      .agg(count(lit(1)).as("n")).select(lit("except").as("op"), col("n"))
    both.unionByName(only95)
  }

  /** HAVING — post-aggregation filter. */
  def havingFilter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("part_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .filter(col("n") >= 5)

  /** Exact multi-expression distinct counts. */
  def countDistinctAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
           countDistinct(col("o_orderstatus")).as("n_status"),
           countDistinct(concat_ws("|", col("o_orderstatus"),
             col("o_orderpriority"))).as("n_combo"))

  val catalog: Seq[Q] = Seq(
    Q("q16_outer_join", outerJoin _,
      """SELECT c_nationkey AS nation_id,
        |  count(DISTINCT c_custkey) AS n_customers,
        |  count(o_orderkey) AS n_orders,
        |  count(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END)
        |    AS n_no_order
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin),
    Q("q17_semi_join", semiJoin _,
      """SELECT c_mktsegment AS segment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
        |GROUP BY 1""".stripMargin),
    Q("q18_anti_join", antiJoin _,
      """SELECT c_nationkey AS nation_id, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1""".stripMargin),
    Q("q19_rollup", rollupAgg _,
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty,
        |  GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin),
    Q("q20_cube", cubeAgg _,
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS spend,
        |  GROUPING(o_orderstatus, o_orderpriority) AS gid
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin),
    Q("q21_setops", setOps _,
      """SELECT 'intersect' AS op, count(*) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |UNION ALL
        |SELECT 'except' AS op, count(*) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)""".stripMargin),
    Q("q28_having", havingFilter _,
      """SELECT l_partkey AS part_id, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY 1 HAVING count(*) >= 5""".stripMargin),
    Q("q29_count_distinct", countDistinctAgg _,
      """SELECT count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT o_orderstatus) AS n_status,
        |  count(DISTINCT o_orderstatus || '|' || o_orderpriority) AS n_combo
        |FROM orders""".stripMargin)
  )
}
