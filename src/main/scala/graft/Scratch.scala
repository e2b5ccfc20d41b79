package graft

import org.apache.spark.sql.SparkSession

// temporary debug runner — deleted before commit
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.operators.Analytics.scd2History(spark, "/root/testdata/sf0.01")
    df.coalesce(1).write.mode("overwrite")
      .parquet("/tmp/verify_out/q86_scd2_history")
    println("rows=" + spark.read.parquet("/tmp/verify_out/q86_scd2_history").count())
    spark.stop()
  }
}
