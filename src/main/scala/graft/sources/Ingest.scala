package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** API-payload ingestion operators (SURVEY.md §2.1 S1-S3).
  *
  * The reference fetches Census-API JSON (array-of-arrays, row 0 = header)
  * and promotes the first row to column names
  * (reference `extractCensusACS5.py:26-34`). Here the decode is a Spark
  * plan: `from_json` + `posexplode`, with the position index making
  * header-vs-data separation deterministic (SURVEY.md §7.4 — pandas is
  * order-preserving, a distributed engine must carry the order explicitly).
  */
object Ingest {

  private val payloadType = ArrayType(ArrayType(StringType))

  /** S2+S3: decode one JSON array-of-arrays payload into a headered
    * DataFrame of strings (every cell starts as a string, exactly like the
    * reference's pandas frame — typing happens later at the read schema).
    *
    * The header row is a single driver-side `head()` on a 1-row slice —
    * O(1) data motion regardless of payload size; the data rows never
    * leave executors.
    */
  def arrayOfArrays(spark: SparkSession, payload: String): DataFrame = {
    import spark.implicits._
    val rows = spark.createDataset(Seq(payload))
      .select(from_json(col("value"), payloadType).as("rows"))
      .select(posexplode(col("rows")).as(Seq("idx", "row")))
    promoteHeader(rows)
  }

  /** S3 generalized: given (idx, row array<string>) with idx 0 = header,
    * return the data rows with header-derived column names. */
  def promoteHeader(indexed: DataFrame): DataFrame = {
    val header = indexed.filter(col("idx") === 0)
      .select(col("row")).head().getSeq[String](0)
    val cols = header.indices.map(i => col("row")(i).as(header(i)))
    indexed.filter(col("idx") > 0).select(cols: _*)
  }

  /** Staged-payload variant of S1 at scale: a directory of one JSON payload
    * per fetch (e.g. per year), read distributed — each file decodes on an
    * executor, so ingest parallelism = number of staged payloads. */
  def arrayOfArraysDir(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.text(dir)
      .select(from_json(col("value"), payloadType).as("rows"))
      .select(posexplode(col("rows")).as(Seq("idx", "row")))
    promoteHeader(raw)
  }
}
