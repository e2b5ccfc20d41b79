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

  /** Key-skew diagnostics — the profiling pass that DECIDES whether a
    * join needs salting: the 20 heaviest lineitem part keys with their
    * absolute count, parts-per-million share, and a ×1000 skew factor
    * vs the mean key (cnt · n_keys / total). All ratios are integer
    * arithmetic (exact, order-independent); the corpus totals are one
    * broadcast scalar row (accepted broadcast-scalar crossJoin pattern),
    * and the top-20 is TakeOrderedAndProject. At 100 TB this runs as a
    * cheap side pass over the join column only — the scan prunes to one
    * column — and its output feeds [[saltedJoin]]'s salt-factor choice. */
  def skewProfile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem").select(col("l_partkey"))
    val tot = li.agg(count(lit(1)).as("total"),
      countDistinct(col("l_partkey")).as("n_keys"))
    li.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("(cnt * 1000000) div total"))
      .withColumn("skew_x1000", expr("(cnt * 1000 * n_keys) div total"))
      .orderBy(col("cnt").desc, col("l_partkey").asc)
      .limit(20)
      .select(col("l_partkey"), col("cnt"), col("share_ppm"),
        col("skew_x1000"))
  }

  /** AQE runtime skew-join split — the AUTOMATIC half of the skew story
    * ([[saltedJoin]] is the explicit, planner-independent fallback): a
    * deliberately skewed join (one key carrying ~99.5% of the big side)
    * executed under adaptive query execution with the skew thresholds
    * scoped down to fixture scale. At runtime AQE observes the hot
    * shuffle partition, splits it into advisory-sized slices, and
    * replicates the matching small-side partition — the plan's
    * SortMergeJoin is marked `(skew=true)` and the big-side
    * AQEShuffleRead reports skew splits. `PlanSpec` executes this and
    * asserts the marker; `PlanDump` records the final adaptive plan in
    * PLANS.md. At 100 TB this is what saves the unsuspecting user whose
    * join key turns out heavy-tailed — with the thresholds at their
    * production defaults (256 MB partitions, factor 5).
    *
    * Confs are scoped to a cloned session (the q170 discipline): skew
    * detection factor 2 over the median and a 64 KB absolute floor, 16 KB
    * advisory slices, broadcast disabled so the join actually shuffles
    * (a broadcast join has no reducer partitions to skew). No downstream
    * operator re-uses the join's hash partitioning — a skew split breaks
    * that guarantee, and AQE would otherwise skip the optimization. */
  private[graft] def aqeSkewJoin(spark: SparkSession): DataFrame = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    // hot key 0 carries 199k of 200k rows; keys 1..999 get one row each
    val big = s2.range(0, 200000).select(
      when(col("id") < 199000, 0L).otherwise(col("id") % 1000).as("k"),
      col("id").as("v"))
    val small = s2.range(0, 1000).select(
      col("id").as("k"), (col("id") * 7).as("w"))
    big.join(small, Seq("k")).select(col("k"), col("v"), col("w"))
  }

  val catalog: Seq[Q] = Seq(
    Q("q127_skew_profile", skewProfile _,
      """WITH tot AS (
        |  SELECT count(*) AS total, count(DISTINCT l_partkey) AS n_keys
        |  FROM lineitem),
        |c AS (
        |  SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1)
        |SELECT l_partkey, cnt,
        |  CAST((cnt * 1000000) // total AS BIGINT) AS share_ppm,
        |  CAST((cnt * 1000 * n_keys) // total AS BIGINT) AS skew_x1000
        |FROM c CROSS JOIN tot
        |ORDER BY cnt DESC, l_partkey ASC LIMIT 20""".stripMargin),
    Q("q45_salted_join", saltedSupplierJoin _,
      """SELECT s_nationkey AS nation_id, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1""".stripMargin)
  )
}
