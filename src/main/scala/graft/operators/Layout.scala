package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.ZOrderOps
import graft.sources.Tables

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  * At 100 TB the dominant query cost is how much of the table a scan must
  * read; a z-order layout makes parquet footer min/max stats selective on
  * SEVERAL predicate columns at once, where a plain sort only helps one.
  */
object Layout {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Z-order clustering key over orders (customer × price-bucket): each
    * row's Morton code plus the 100 lowest-z rows. The z computation is
    * the codegen'd [[graft.functions.InterleaveBits16]]; top-k is
    * TakeOrderedAndProject (no global sort). The layout action itself —
    * `repartitionByRange(z)` + write — is exercised in `ZOrderSpec`,
    * which measures per-partition bounding boxes shrinking on BOTH
    * dimensions; this query pins the key's exact semantics against an
    * expanded shift/mask oracle. */
  def zorderCluster(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "orders").select(col("o_orderkey"),
      col("o_custkey").bitwiseAND(lit(255L)).as("xb"),
      floor(col("o_totalprice") / lit(2048.0)).cast("long")
        .bitwiseAND(lit(255L)).as("yb"))
    d.withColumn("z", ZOrderOps.zorder2(col("xb"), col("yb")))
      .orderBy(col("z").asc, col("o_orderkey").asc)
      .limit(100)
  }

  val catalog: Seq[Q] = Seq(
    Q("q104_zorder_cluster", zorderCluster _,
      s"""WITH d AS (
         |  SELECT o_orderkey, (o_custkey & 255) AS xb,
         |    (CAST(floor(o_totalprice / 2048.0) AS BIGINT) & 255) AS yb
         |  FROM orders)
         |SELECT o_orderkey, xb, yb,
         |  (${ZOrderOps.expandedSql("xb", "yb")}) AS z
         |FROM d ORDER BY z ASC, o_orderkey ASC LIMIT 100""".stripMargin)
  )
}
