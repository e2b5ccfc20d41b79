package graft

// One-off query runner for interactive debugging (test scope):
//   sbt 'Test/runMain graft.DebugRun <queryName> <sfDir> [explain]'
object DebugRun {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    if (args.length > 2 && args(2) == "explain") df.explain("formatted")
    df.show(50, truncate = false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
