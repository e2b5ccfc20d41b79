package graft

// Stages the adversarial-input sf dirs (r16 verdict item 6) on disk so
// the driver-contract gate can run over them: graft.Verify <dir> <out>
// + tools/check.py then prove ORACLE AGREEMENT (not just no-crash,
// which AdversarialInputSpec asserts in-tree) on the empty and
// single-row corpora. Truncates /root/testdata/sf0.001 via
// limit(0)/limit(1) so schemas are exactly the production ones.
//   sbt 'Test/runMain graft.StageDegenerate /tmp/adv_empty 0'
//   sbt 'Test/runMain graft.StageDegenerate /tmp/adv_one 1'
object StageDegenerate {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val n = args(1).toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.001"
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(n)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    spark.stop()
  }
}
