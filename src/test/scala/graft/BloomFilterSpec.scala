package graft

import org.apache.spark.sql.functions._
import graft.functions.{BloomFilterOps, TextOps}
import graft.operators.TextAnalysis

class BloomFilterSpec extends SparkSpec {

  private def hashedShingles = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), explode(TextOps.shingles3(col("text"))).as("s"))
    .select(col("doc_id"), TextOps.portableHash60(col("s")).as("h"))

  test("no false negatives: every inserted element probes true") {
    val sh = hashedShingles
    val bloom = sh.agg(
      BloomFilterOps.bloomAgg(col("h"), 1 << 18, 5).as("bf"))
    val missed = sh.crossJoin(broadcast(bloom))
      .filter(!BloomFilterOps.bloomContains(col("bf"), col("h"), 5))
      .count()
    assert(missed === 0L)
  }

  test("false-positive rate stays near the design point") {
    val sh = hashedShingles.filter(col("doc_id") % 2 === 0)
    val probe = hashedShingles.filter(col("doc_id") % 2 === 1)
      .join(sh.select(col("h")), Seq("h"), "left_anti") // true non-members
    val bloom = sh.agg(
      BloomFilterOps.bloomAgg(col("h"), 1 << 20, 5).as("bf"))
    val n = probe.count()
    val fp = probe.crossJoin(broadcast(bloom))
      .filter(BloomFilterOps.bloomContains(col("bf"), col("h"), 5))
      .count()
    // ~30k member shingles in 2^20 bits with 5 hashes → theoretical FP
    // (1−e^(−nk/m))^k ≈ 4e-5; assert well under 0.5% to leave room for
    // double-hashing clustering and small-sample noise.
    assert(n > 0 && fp.toDouble / n < 0.005, s"fp=$fp of $n")
  }

  test("bitset is merge-stable across partitionings") {
    val sh = hashedShingles
    def bits(parts: Int): Array[Byte] = sh.repartition(parts)
      .agg(BloomFilterOps.bloomAgg(col("h"), 1 << 16, 5).as("bf"))
      .collect()(0).getAs[Array[Byte]]("bf")
    assert(bits(1).toSeq === bits(7).toSeq)
  }

  test("bloom-prefiltered decontamination equals the exact-join result") {
    // The bloom path's contract: identical output to exact overlap. The
    // oracle gate checks this against DuckDB; here we pin it against the
    // in-engine exact q92-style formulation including the per-source agg.
    val out = TextAnalysis.bloomDecontaminate(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 3)
      .withColumn("is_bench",
        TextOps.portableHash(
          concat(lit("bench:"), col("doc_id").cast("string"))) % 100 < 5)
    val bsh = docs.filter(col("is_bench"))
      .select(explode(TextOps.shingles3(col("text"))).as("s")).distinct()
    val exactHits = docs.filter(!col("is_bench"))
      .select(col("doc_id"), explode(TextOps.shingles3(col("text"))).as("s"))
      .join(bsh, Seq("s")).select(col("doc_id")).distinct()
      .withColumn("hit", lit(1))
    val exact = docs.filter(!col("is_bench"))
      .join(exactHits, Seq("doc_id"), "left_outer")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), count(col("hit")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === exact)
  }
}
