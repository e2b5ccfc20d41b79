package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.sources.Tables

/** Dev-only micro-profiler for dedup sub-plans (not part of the driver
  * contract; run via `runMain graft.Profile <sfDir>`). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // MICROS-no-UTC feed reads as LTZ at the scan itself (UTC session:
      // bit-identical micros) so ts range predicates reach PushedFilters
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    EngineDefaults(spark)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    val docs = Tables.load(spark, dir, "documents")
    time("scan")(docs.count())
    time("shingles_per_doc") {
      docs.select(TextOps.shingles3(col("text")).as("sh"))
        .select(size(col("sh"))).agg(sum("size(sh)")).count()
    }
    time("shingle_hash_explode") {
      docs.select(col("doc_id"), explode(TextOps.shingles3(col("text")))
        .as("s")).select(TextOps.unsignedHash(col("s"))).count()
    }
    val hashed = docs
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), explode(TextOps.shingles3(col("text"))).as("s"))
      .select(col("doc_id"), TextOps.unsignedHash(col("s")).as("x"))
    val minAggs = (0 until 64).map(i =>
      min(TextOps.minhashPermute(i, col("x"))).as(s"m$i"))
    time("minhash_sigs") {
      hashed.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
        .count()
    }
    val sigs = hashed.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"),
        array((0 until 64).map(i => col(s"m$i")): _*).as("sig"))
    val banded = sigs.select(col("doc_id"),
      explode(TextOps.minhashBands(col("sig"), 16, 4)).as("band"))
    time("banded")(banded.count())
    time("band_join") {
      banded.select(col("doc_id").as("doc_a"), col("band"))
        .join(banded.select(col("doc_id").as("doc_b"), col("band")),
          Seq("band"))
        .filter(col("doc_a") < col("doc_b")).count()
    }
    // --- signature-stage variants (q35 hot path) ---
    val docsOk = docs.filter(size(split(col("text"), " ")) >= 3)
    def sigCount(hashed: org.apache.spark.sql.DataFrame): Long =
      hashed.groupBy(col("doc_id"))
        .agg(graft.functions.MinHashAgg.minhashSig(col("x"), 64).as("sig"))
        .count()
    time("sig_window_distinct_md5") {
      // current shape: posexplode + lead window + distinct, portable md5
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      sigCount(docsOk
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .select(col("doc_id"), col("pos"), col("w"),
          lead(col("w"), 1).over(w).as("w1"),
          lead(col("w"), 2).over(w).as("w2"))
        .filter(col("w2").isNotNull)
        .select(col("doc_id"),
          concat_ws(" ", col("w"), col("w1"), col("w2")).as("s"))
        .distinct()
        .select(col("doc_id"), TextOps.portableHash(col("s")).as("x")))
    }
    time("sig_transform_nodup_md5") {
      // narrow shape: array transform (no window, no distinct), md5
      val wds = split(col("text"), " ")
      sigCount(docsOk
        .select(col("doc_id"), explode(transform(
          sequence(lit(0), size(wds) - 3),
          i => concat_ws(" ", element_at(wds, i + 1),
            element_at(wds, i + 2), element_at(wds, i + 3)))).as("s"))
        .select(col("doc_id"), TextOps.portableHash(col("s")).as("x")))
    }
    time("sig_transform_distinct_md5") {
      sigCount(docsOk
        .select(col("doc_id"),
          explode(TextOps.shingles3(col("text"))).as("s"))
        .select(col("doc_id"), TextOps.portableHash(col("s")).as("x")))
    }
    time("q34_full")(graft.operators.Dedup.ngramJaccard(spark, dir).count())
    time("q35_full")(graft.operators.Dedup.minhash(spark, dir).count())
    time("q36_full")(graft.operators.Dedup.simhash(spark, dir).count())
    spark.stop()
  }
}
