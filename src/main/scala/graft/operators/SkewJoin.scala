package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Skew-mitigated (salted) join — the at-scale pattern for a shuffle join
  * whose key distribution is heavy-tailed (SURVEY.md §7.4 "skewed keys →
  * salting or AQE skew-join").
  *
  * The big side appends a deterministic salt in [0, S) derived from a
  * high-cardinality column; the small side is exploded S-fold; the join key
  * becomes (key, salt), splitting each hot key's rows across S reducers.
  * Results are identical to the unsalted join — the DuckDB oracle runs the
  * plain join. (AQE's runtime skew-join split handles the same problem
  * adaptively; explicit salting is the portable, planner-independent form
  * and composes with aggregation pushdown.)
  */
object SkewJoin {

  /** Salted inner equi-join of big ⋈ small on `key`. `saltFrom` must be a
    * (near-)unique big-side column so the salt spreads uniformly and
    * deterministically (no rand(): results must be reproducible). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFrom: String, salt: Int): DataFrame = {
    val salted = big.withColumn("_salt", pmod(hash(col(saltFrom)), lit(salt)))
    val exploded = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Declared query: lineitem ⋈ supplier salted 8-way, aggregated per
    * supplier nation — byte-equal to the plain join. */
  def saltedSupplierJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .withColumnRenamed("l_suppkey", "s_suppkey")
    val sup = Tables.load(spark, dir, "supplier")
    saltedJoin(li, sup, "s_suppkey", "l_orderkey", 8)
      .groupBy(col("s_nationkey").as("nation_id"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("l_quantity")), 2).as("qty"),
           round(sum(col("l_extendedprice")), 2).as("revenue"))
  }

  val catalog: Seq[Q] = Seq(
    Q("q45_salted_join", saltedSupplierJoin _,
      """SELECT s_nationkey AS nation_id, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1""".stripMargin)
  )
}
