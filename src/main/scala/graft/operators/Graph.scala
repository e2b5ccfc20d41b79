package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Graph operators over relations — link-analysis primitives a training-
  * data pipeline runs on crawl graphs (page rank of source domains feeds
  * quality weighting; the same propagation shape powers trust/spam
  * scores). The reference has no graph surface; this is a north-star
  * extension sized like the iterative connected-components family
  * ([[Dedup.connectedComponents]]).
  *
  * Arithmetic is INTEGER-ONLY (scaled fixed-point ranks, integer
  * division for out-degree splits): sums of longs are exact and
  * order-independent, so the result is bit-identical on any partition
  * count and in any engine — the same determinism trick as q37's
  * integer-quantized centroids. A float PageRank would be order-dependent
  * under partial aggregation and could never hash-match an oracle.
  */
object Graph {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Fixed-point damping: rank'(v) = 0.15·R0 + 0.85·Σ rank(u) div deg(u),
    * with R0 = 1e6 per node, evaluated as `150000 + (85·Σ) div 100`. */
  private val iters = 4

  /** PageRank over the customer↔supplier purchase graph (bipartite,
    * symmetrized; a deterministic 10% customer slice keeps the graph
    * proportional to the corpus without changing the algorithm's shape).
    * Node encoding: customer c → 2c, supplier s → 2s+1.
    *
    * Scale shape: the edge list is built once and `localCheckpoint`ed
    * (every iteration consumes it — same guard as connected components);
    * each of the 4 rounds is one hash join (ranks onto edge sources,
    * shuffle keyed on node id) plus one partial-aggregated sum keyed on
    * the destination — cost per round is O(edges), state per round is
    * one long per node, nothing ever sits on the driver. The final top-20
    * is TakeOrderedAndProject (per-partition heaps), not a global sort. */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .filter(col("o_custkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_custkey"))
    val l = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val eraw = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val sym = eraw.unionByName(
      eraw.select(col("dst").as("src"), col("src").as("dst")))
    val deg = sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    // edges+degree consumed by every round — materialize once
    val ew = sym.join(deg, sym("src") === deg("node"))
      .select(col("src"), col("dst"), col("deg"))
      .localCheckpoint(true)
    val nodes = ew.select(col("src").as("node"), col("deg")).distinct()
    var ranks = nodes.select(col("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = ew
        .join(ranks, ew("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("pr div deg")).as("s"))
      ranks = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left_outer")
        .select(col("node"),
          expr("CAST(150000 + (85 * coalesce(s, 0)) div 100 AS BIGINT)")
            .as("pr"))
    }
    val sup = t(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"))
    ranks.filter(col("node") % 2 === 1)
      .withColumn("s_suppkey", expr("(node - 1) div 2"))
      .join(sup, Seq("s_suppkey"))
      .orderBy(col("pr").desc, col("s_suppkey").asc)
      .limit(20)
      .select(col("s_suppkey"), col("s_name"), col("pr"))
  }

  /** Degree-distribution profile of the full customer↔supplier purchase
    * graph: per side, log2-bucketed degree histogram (bucket =
    * `length(bin(deg))` = ⌊log2 deg⌋+1 — an integer-only log that both
    * engines compute identically; a float `log2` could land on x.9999…
    * at exact powers). The companion diagnostic to [[pagerank]]: a
    * heavy-tailed degree histogram is what predicts hot vertices before
    * an iterative job is launched. Scale shape: one distinct + two
    * partial-agg'd groupBys over the checkpointed pair list; histogram
    * output is O(log maxdeg) rows. */
  def degreeStats(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    // both degree aggregations consume the pair list — materialize once
    val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
      .localCheckpoint(true)
    val cdeg = pairs.groupBy(col("c").as("k"))
      .agg(count(lit(1)).as("deg")).withColumn("side", lit("customer"))
    val sdeg = pairs.groupBy(col("s").as("k"))
      .agg(count(lit(1)).as("deg")).withColumn("side", lit("supplier"))
    cdeg.unionByName(sdeg)
      .withColumn("bucket", length(bin(col("deg"))))
      .groupBy(col("side"), col("bucket"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("deg")).as("min_deg"),
        max(col("deg")).as("max_deg"),
        sum(col("deg")).as("total_edges"))
  }

  /** One unrolled oracle iteration (DuckDB `//` = Spark `div` on
    * positive longs; DuckDB's HUGEINT sum re-narrows in the CAST). */
  private def prIterSql(i: Int): String =
    s"""r$i AS (
       |  SELECT d.node AS node,
       |    CAST(150000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS pr
       |  FROM deg d LEFT JOIN (
       |    SELECT ew.dst AS node, sum(r.pr // ew.deg) AS s
       |    FROM ew JOIN r${i - 1} r ON ew.src = r.node GROUP BY 1) c
       |    ON d.node = c.node)""".stripMargin

  val catalog: Seq[Q] = Seq(
    Q("q128_degree_stats", degreeStats _,
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |deg AS (
        |  SELECT 'customer' AS side, count(*) AS deg
        |  FROM pairs GROUP BY c
        |  UNION ALL
        |  SELECT 'supplier' AS side, count(*) AS deg
        |  FROM pairs GROUP BY s)
        |SELECT side, CAST(len(bin(deg)) AS INT) AS bucket,
        |  count(*) AS n_nodes,
        |  min(deg) AS min_deg, max(deg) AS max_deg,
        |  CAST(sum(deg) AS BIGINT) AS total_edges
        |FROM deg GROUP BY 1, 2""".stripMargin),
    Q("q119_pagerank", pagerank _,
      s"""WITH eraw AS (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  WHERE o_custkey % 10 = 0),
         |e AS (SELECT src, dst FROM eraw
         |      UNION ALL SELECT dst AS src, src AS dst FROM eraw),
         |deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
         |ew AS (SELECT e.src, e.dst, d.deg
         |       FROM e JOIN deg d ON e.src = d.node),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM deg),
         |${(1 to iters).map(prIterSql).mkString(",\n")}
         |SELECT s.s_suppkey, s.s_name, r.pr
         |FROM r$iters r JOIN supplier s ON s.s_suppkey = (r.node - 1) // 2
         |WHERE r.node % 2 = 1
         |ORDER BY r.pr DESC, s.s_suppkey ASC LIMIT 20""".stripMargin)
  )
}
