package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one named entry per implemented operator (SURVEY.md §2 +
  * LLM-pipeline extensions). `oracleSql`: DuckDB-runnable ANSI SQL over the
  * same parquet tables, column names aligned with the Spark output; queries
  * without an oracle entry are non-SQL-expressible (driver does rows-only).
  */
object SparkEntry {

  private def catalog: Seq[Q] =
    Relational.catalog ++ Analytics.catalog ++ JoinsSetOps.catalog ++
      ScalarFuncs.catalog ++ Dedup.catalog ++ Similarity.catalog ++
      TextAnalysis.catalog ++ Multimodal.catalog ++ SkewJoin.catalog ++
      ApproxAgg.catalog ++ Reshape.catalog ++ Sampling.catalog ++
      StreamQueries.catalog ++ DataQuality.catalog ++ Layout.catalog ++
      Graph.catalog ++ Stats.catalog ++ MlEval.catalog

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.starFact(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap

  /** Category membership (derived from the owning operator catalogs) for
    * the bench's per-category subtotals: with 181 queries a single total
    * hides mix shifts between rounds — the fixed, small category axis is
    * what successive verdicts can actually diff. */
  def categories: Map[String, Set[String]] = Seq(
    "relational" -> (Relational.catalog ++ JoinsSetOps.catalog ++
      ScalarFuncs.catalog ++ Reshape.catalog ++ Stats.catalog),
    "analytics" -> (Analytics.catalog ++ ApproxAgg.catalog ++
      SkewJoin.catalog ++ DataQuality.catalog ++ MlEval.catalog),
    "dedup" -> (Dedup.catalog ++ Similarity.catalog),
    "text" -> TextAnalysis.catalog,
    "multimodal" -> Multimodal.catalog,
    "sampling" -> (Sampling.catalog ++ Layout.catalog),
    "graph" -> Graph.catalog,
    "streaming" -> StreamQueries.catalog
  ).map { case (k, v) => k -> v.map(_.name).toSet }.toMap
}
