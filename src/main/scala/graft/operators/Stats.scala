package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Q

/** Table/column statistics + cost-based-optimizer evidence.
  *
  * Everywhere else the engine reads parquet by PATH, so Catalyst only ever
  * sees file-size estimates and join order is view-text order (plus AQE's
  * runtime demotions). That is fine for the shapes in this catalog, but a
  * 100 TB warehouse does not hand-order its joins: it collects catalog
  * statistics (`ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS`) and
  * lets `CostBasedJoinReorder` pick the join order from rowCount +
  * selectivity. This operator registers the TPC-H-ish tables as external
  * catalog tables, analyzes them once per (JVM, sf dir), and runs a
  * 4-table star query written in a deliberately BAD textual order
  * (fact ⋈ fact-sized first, selective dims last) — `PlanSpec` asserts the
  * optimizer reorders it under CBO and leaves it in text order without.
  */
object Stats {

  /** One catalog database per sf dir (bench warms several dirs in one
    * JVM); value = database name once tables are created + analyzed. */
  private val analyzed =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val tables = Seq("orders", "customer", "nation", "region")

  /** Create external parquet tables for `dir` and ANALYZE them. The
    * cached db name is re-validated against the live session catalog
    * before reuse: ANALYZE state lives in the session's SharedState, so
    * a cached name from a previous (stopped) SparkSession in the same
    * JVM would point at tables that no longer exist. */
  private[graft] def ensureStats(spark: SparkSession, dir: String): String =
    analyzed.compute(dir, { (_, cached) =>
      if (cached != null &&
          spark.catalog.tableExists(s"$cached.${tables.head}")) cached
      else {
        val db = "graft_cbo" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
        tables.foreach { t =>
          spark.sql(s"DROP TABLE IF EXISTS $db.$t")
          spark.sql(
            s"""CREATE TABLE $db.$t USING parquet
               |LOCATION '$dir/$t.parquet'""".stripMargin)
          spark.sql(
            s"ANALYZE TABLE $db.$t COMPUTE STATISTICS FOR ALL COLUMNS")
        }
        db
      }
    })

  /** The star query on a CLONED session (shared SparkContext + external
    * catalog, isolated SQLConf) with CBO set as requested. Enabling
    * cost-based reorder must never leak into the caller's session: a
    * sticky `spark.conf.set` would silently re-plan every LATER query in
    * the session under catalog-stats estimation — changed join shapes
    * change float summation order, making hash parity order-dependent.
    * The clone scopes the conf to exactly this query's lifetime. */
  private[graft] def starQuery(spark: SparkSession, dir: String,
      cbo: Boolean): DataFrame = {
    val db = ensureStats(spark, dir)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.cbo.enabled", cbo.toString)
    s2.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
    s2.sql(
      s"""SELECT n.n_name AS nation, count(*) AS n_orders,
         |  sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
         |FROM $db.orders o
         |  JOIN $db.customer c ON o.o_custkey = c.c_custkey
         |  JOIN $db.nation n ON c.c_nationkey = n.n_nationkey
         |  JOIN $db.region r ON n.n_regionkey = r.r_regionkey
         |WHERE r.r_name = 'ASIA'
         |GROUP BY n.n_name""".stripMargin)
  }

  /** Asia-region revenue by nation, written fact-first so only the CBO
    * can rescue the join order. Money is exact per-row integer cents
    * (the established cross-engine recipe). */
  def cboJoinReorder(spark: SparkSession, dir: String): DataFrame =
    starQuery(spark, dir, cbo = true)

  /** Runtime bloom-filter join pruning (`InjectRuntimeFilter`) — the
    * optimizer lever that turns a selective dim filter into a row-level
    * prefilter ON THE FACT SCAN side of a shuffle join: Catalyst builds a
    * `BloomFilterAggregate` over the filtered creation side (here:
    * URGENT orders) as a subquery and injects `might_contain(...)` above
    * the lineitem scan, so fact rows that cannot match die BEFORE the
    * shuffle — at 100 TB that's the difference between shuffling the
    * whole fact table and shuffling ~the matching slice. Complements
    * q101 (hand-built Bloom via [[graft.functions.BloomFilterOps]]):
    * this one is zero user code, purely the optimizer's.
    *
    * Confs scoped to a cloned session (the q170/AQE discipline):
    * broadcast disabled so the join shuffles (a broadcast join needs no
    * runtime filter — the dim is already on every executor), application
    * -side size floor dropped to fixture scale (production default 10 GB
    * is exactly right at 100 TB — the filter only pays where the fact
    * scan is large). The query result is plan-invariant, so it is also
    * oracle-gated as q188. `PlanSpec` asserts the injected
    * `might_contain` + `BloomFilterAggregate` land in the optimized plan
    * and that row counts equal the filter-free formulation. */
  private[graft] def runtimeBloomJoin(spark: SparkSession,
      dir: String): DataFrame = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter." +
      "applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    import graft.sources.Tables
    import org.apache.spark.sql.functions._
    val li = Tables.load(s2, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val urgent = Tables.load(s2, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"),
        round(sum(col("l_quantity")), 2).as("qty"))
  }

  val catalog: Seq[Q] = Seq(
    Q("q188_runtime_bloom_join", runtimeBloomJoin _,
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS cents,
        |  round(sum(l_quantity), 2) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1""".stripMargin),
    Q("q170_cbo_join_reorder", cboJoinReorder _,
      """SELECT n.n_name AS nation, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS cents
        |FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY n.n_name""".stripMargin)
  )
}
