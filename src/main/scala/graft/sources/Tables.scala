package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Parquet table catalog over a driver testdata dir (`TESTDATA.md`).
  *
  * The reference models tables as external CSV directories with a declared
  * schema (reference `report.md:380-434`); here the at-rest format is Parquet
  * (columnar, min/max pruning, predicate pushdown) which is the scale-out
  * equivalent — see SURVEY.md §1.3.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables that are small/constant-size dimensions at every scale factor.
    * At 100 TB these stay KB-sized (25 nations, 5 regions) — always broadcast.
    */
  val constantDims: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects natively;
    // with spark.sql.legacy.parquet.nanosAsLong=true (set by Verify/Bench/
    // tests) it arrives as a nanosecond LongType — convert to Spark's native
    // microsecond TimestampType via integer division (a double roundtrip
    // would lose precision at 1e18 magnitudes).
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType) {
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else df
  }

  /** Load with a broadcast hint when the table is a constant-size dim.
    * Scaling dims (customer, part, supplier) are left to AQE, which converts
    * sort-merge to broadcast-hash at runtime when the built side is small.
    */
  def dim(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = load(spark, dir, name)
    if (constantDims(name)) broadcast(df) else df
  }
}
