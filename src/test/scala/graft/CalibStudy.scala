package graft

// Calib-probe comparison harness (test scope, not shipped library code):
// one fresh-JVM window = 3 pure-ALU probes + 3 shuffle+scan probes +
// (as ground truth for "what the suite actually feels") one fixed small
// query mix, all in the same session so both probes sample the SAME
// host-contention state. Invoked repeatedly across a working session;
// the across-window spread of each probe's min-of-3, relative to the
// mix's spread, is the r16 calib-study evidence in SCALE.md (verdict
// item 4: the ALU probe's 39% same-HEAD spread vs the suite's 7.4%
// made normalization misleading — this measures the replacement under
// an identical protocol before adopting it).
//   sbt 'Test/runMain graft.CalibStudy'
object CalibStudy {
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
    val dir = "/root/testdata/sf0.01"
    // the ground-truth mix: scan+filter+agg, a join, a window — the
    // suite's bottleneck shapes, small enough to run in ~2 s
    val mix = Seq("q01_star_fact", "q03_groupby_avg", "q08_join_composite")
      .map(SparkEntry.queries)
    def timeMix(): Double = {
      val t0 = System.nanoTime()
      mix.foreach(_(spark, dir).count())
      (System.nanoTime() - t0) / 1e9
    }
    timeMix() // codegen/JIT warm, untimed — Bench warms before probing too
    Calib.sparkProbe(spark) // warm the probe's own codegen path
    val alu = (1 to 3).map(_ => Calib.probe(32))
    val shf = (1 to 3).map(_ => Calib.sparkProbe(spark))
    val mx = (1 to 3).map(_ => timeMix())
    def s(v: Seq[Double]) = v.map(x => f"$x%.3f").mkString(" ")
    println(f"CALIBSTUDY alu_min=${alu.min}%.3f shuffle_min=${shf.min}%.3f " +
      f"mix_min=${mx.min}%.3f | alu=[${s(alu)}] shuffle=[${s(shf)}] " +
      f"mix=[${s(mx)}]")
    spark.stop()
  }
}
