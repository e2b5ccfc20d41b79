package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-parquet at-rest layout (SURVEY.md §4: the reference keys S3
  * prefixes by *table*; the engine partitions facts by their temporal key
  * so Catalyst's static + dynamic partition pruning skip irrelevant data).
  *
  * At 100 TB this is the difference between scanning one year and scanning
  * a decade: a `WHERE year = …` predicate prunes directories at planning
  * time (static) or via a runtime subquery filter (DPP) — zero I/O for
  * pruned partitions, visible as PartitionFilters in explain.
  */
object PartitionedWrite {

  /** Write `df` partitioned by the year of `tsCol` (directory per year). */
  def writeByYear(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_year", year(col(tsCol)))
      .write.mode("overwrite").partitionBy("p_year").parquet(path)

  /** Read back; predicates on p_year become PartitionFilters. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
