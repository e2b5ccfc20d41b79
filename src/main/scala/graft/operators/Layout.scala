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

  /** Shard manifest — the dataset-publishing step after all filtering and
    * dedup: assign every document to one of 8 output shards by
    * deterministic hash and emit the per-shard manifest (doc count, token
    * total, id range, content checksum). The checksum is a SUM of per-doc
    * portable hashes — an exact, order-independent integer, so two
    * engines (or two runs at different parallelism) produce the same
    * manifest bit-for-bit; that is what makes the manifest usable as a
    * publish/consume integrity contract. One partial-agg'd shuffle of 8
    * groups at any corpus size. */
  def shardManifest(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextOps
    t(spark, dir, "documents")
      .select(col("doc_id"),
        (TextOps.portableHash(
          concat(lit("shard:"), col("doc_id").cast("string"))) % 8)
          .as("shard"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        TextOps.portableHash(md5(col("text"))).as("ch"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("total_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        sum(col("ch")).as("checksum"))
  }

  val catalog: Seq[Q] = Seq(
    Q("q126_shard_manifest", shardManifest _,
      """SELECT
        |  ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |    ::BIGINT % 8 AS shard,
        |  count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  min(doc_id) AS min_doc,
        |  max(doc_id) AS max_doc,
        |  CAST(sum(('0x' || substr(md5(md5(text)), 1, 8))::BIGINT)
        |    AS BIGINT) AS checksum
        |FROM documents GROUP BY 1""".stripMargin),
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
