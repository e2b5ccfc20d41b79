package graft

import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** Library facade for SQL-first users (the reference's audience wrote
  * Athena SQL over external tables — `report.md:368-495`): one call
  * registers the parquet catalog as temp views, so every reference-style
  * statement (`CREATE OR REPLACE TEMP VIEW`, star joins, group-avg) runs
  * via `spark.sql` unchanged in shape. The `graft_dot` SQL function and
  * the dot-product rewrite rule come from registering
  * `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  * (see `ExtensionsSpec`).
  */
object GraftSession {

  /** Register every testdata table under its canonical name. */
  def init(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
}
