package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool (r16 optimization round): dump `.explain("formatted")` for a
  * comma-separated list of catalog queries into per-query files —
  * `runMain graft.R16Plans <outDir> <suffix> <q1,q2,...> [sfDir]`.
  * Writes `<outDir>/<query>_<suffix>.txt`. Not driver contract. */
object R16Plans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sf = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    // mirror the bench's shuffle-partition count: join-strategy choice
    // (canBuildLocalHashMap = size < advisory × partitions) depends on it,
    // and these dumps are the evidence for bench-shape claims
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.maxMetadataStringLength", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    EngineDefaults(spark)
    // honor the same experiment hook as Bench so candidate confs can be
    // plan-diffed before they ship
    sys.env.get("GRAFT_BENCH_CONF").foreach(_.split(";").foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) spark.conf.set(kv.take(i).trim, kv.drop(i + 1).trim)
    })
    Files.createDirectories(Paths.get(outDir))
    val qs = SparkEntry.queries
    names.foreach { n =>
      qs.get(n) match {
        case None => System.err.println(s"[r16plans] no such query: $n")
        case Some(fn) =>
          val plan = try {
            val df = fn(spark, sf)
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          } catch { case e: Throwable => s"explain failed: $e" }
          Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), plan)
          println(s"[r16plans] wrote $n ($suffix)")
      }
    }
    spark.stop()
  }
}
