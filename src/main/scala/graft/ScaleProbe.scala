package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dev-only weak-scaling probe (not driver contract): replicate the sf0.1
  * tables 10x into target/scale10 and time the heaviest operator families
  * at 1x vs 10x. Linear-ish growth is the evidence that the candidate-
  * generation design (buckets, not all-pairs) and the partial-agg
  * discipline hold as data grows — the measurable stand-in for the 100 TB
  * claim. Replicated documents get a per-replica marker token, so replicas
  * form REAL near-dup cliques: dedup is probed at a 10x duplication rate,
  * its worst realistic shape. Run: `sbt "runMain graft.ScaleProbe"`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "target/scale10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val keySpan = 100000000L
    def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until 10).map(i => f(df, i)).reduce(_ unionByName _)

    // 10x documents: replica i gets shifted ids and a marker token so the
    // copies are near-dups (J just under 1), not byte dups
    val docs = Tables.load(spark, base, "documents")
    rep(docs) { (d, i) =>
      d.withColumn("doc_id", col("doc_id") + i * keySpan)
        .withColumn("text",
          if (i == 0) col("text") else concat(lit(s"r$i "), col("text")))
    }.write.mode("overwrite").parquet(s"$out/documents.parquet")

    // 10x fact tables with consistent key shifts; dims stay fixed (the
    // realistic growth shape: more facts per unchanged dimension)
    val orders = Tables.load(spark, base, "orders")
    rep(orders) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + i * keySpan)
    }.write.mode("overwrite").parquet(s"$out/orders.parquet")
    val li = Tables.load(spark, base, "lineitem")
    rep(li) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + i * keySpan)
    }.write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    // 10x embeddings with shifted vec_ids: replicas are EXACT vector dups
    // (cos = 1 cliques), probing cell-bucketed embedding dedup at a 10x
    // duplication rate — candidate pairs should track cell occupancy
    // (k = N/32 cells keeps ~32-vector cells → linear in N), never N²
    val emb = Tables.load(spark, base, "embeddings")
    rep(emb) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + i * keySpan)
    }.write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    Seq("customer", "supplier", "part", "nation", "region", "events")
      .foreach { t =>
        Tables.load(spark, base, t).write.mode("overwrite")
          .parquet(s"$out/$t.parquet")
      }

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    // warm both dirs outside timing
    Seq(base, out).foreach { d =>
      operators.Relational.starFact(spark, d).count()
      operators.Dedup.exact(spark, d).count()
    }
    for (round <- 1 to 2; (tag, dir) <- Seq("1x" -> base, "10x" -> out)) {
      println(s"--- $tag round $round ($dir) ---")
      time(s"star_fact_$tag")(operators.Relational.starFact(spark, dir).count())
      time(s"minhash_$tag")(operators.Dedup.minhash(spark, dir).count())
      time(s"simhash_$tag")(operators.Dedup.simhash(spark, dir).count())
      time(s"top_ngrams_$tag")(operators.TextAnalysis.topNgrams(spark, dir).count())
      time(s"split_$tag")(operators.Sampling.trainTestSplit(spark, dir).count())
      time(s"emb_dedup_$tag")(operators.Dedup.embeddingCosine(spark, dir).count())
      time(s"bloom_decon_$tag")(
        operators.TextAnalysis.bloomDecontaminate(spark, dir).count())
    }
    spark.stop()
  }
}
