package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark plan builder over an sf dir, plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL with identically-named
  * output columns (driver hash-compares after sorting columns by name).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, fn: (SparkSession, String) => DataFrame,
            oracle: String): Q = Q(name, fn, Some(oracle))
  def noOracle(name: String,
               fn: (SparkSession, String) => DataFrame): Q = Q(name, fn, None)
}
