package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink (SURVEY.md §2.1 S4-S5).
  *
  * Reference semantics: headered UTF-8 CSV, one logical table per directory
  * (`extractCensusACS5.py:47-63`), read back through a declared schema with
  * string→int/float coercion where malformed values become NULL
  * (`report.md:380-394` LazySimpleSerDe ≈ Spark PERMISSIVE mode).
  */
object Csv {

  /** S5: schema-on-read CSV scan. PERMISSIVE: malformed cells → null,
    * never a job failure — matching Athena's SerDe behavior. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** S4: headered CSV sink. `single = true` reproduces the reference's
    * one-file-per-table layout (`to_csv` + single `put_object`) for
    * fidelity; at scale leave it false so every task writes its own part
    * file — a 100 TB table must never funnel through one writer. */
  def write(df: DataFrame, path: String, single: Boolean = false): Unit = {
    val out = if (single) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }
}
