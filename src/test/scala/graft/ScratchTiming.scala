package graft

// Local profiling harness (test scope, not shipped library code):
// per-execution wall times for one catalog query in a single JVM —
// the distribution-shape probe behind SCALE.md isolation adjudications
// (first used for the r14 q224 solo-floor verdict).
//   sbt 'Test/runMain graft.ScratchTiming q224_priority_sample'
object ScratchTiming {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val fn = SparkEntry.queries(args.headOption.getOrElse("q224_priority_sample"))
    val n = if (args.length > 2) args(2).toInt else 12
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"run $i%2d: $dt%.3f s")
    }
    spark.stop()
  }
}
