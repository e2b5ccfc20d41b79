package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Empty-input robustness: a production pipeline regularly feeds an
  * operator an empty batch (fresh partition, all-filtered slice). Every
  * dedup/similarity/prep operator must return an EMPTY result — not
  * throw, not hang in an iteration loop. Exercised against a staged sf
  * dir whose documents/embeddings tables have the real schemas and zero
  * rows. */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val docsSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(spark.sparkContext
      .emptyRDD[Row], docsSchema)
      .write.parquet(s"$dir/documents.parquet")
    spark.createDataFrame(spark.sparkContext
      .emptyRDD[Row], embSchema)
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("dedup family returns empty on an empty corpus") {
    import graft.operators.Dedup
    assert(Dedup.exact(spark, emptyDir).count() === 0)
    assert(Dedup.ngramJaccard(spark, emptyDir).count() === 0)
    assert(Dedup.minhash(spark, emptyDir).count() === 0)
    assert(Dedup.simhash(spark, emptyDir).count() === 0)
    assert(Dedup.incrementalDedup(spark, emptyDir).count() === 0)
    assert(Dedup.dupClusters(spark, emptyDir).count() === 0)
  }

  test("embedding family returns empty on an empty vector table") {
    import graft.operators.{Dedup, Similarity}
    assert(Dedup.embeddingCosine(spark, emptyDir).count() === 0)
    assert(Similarity.annBruteForce(spark, emptyDir).count() === 0)
    assert(Similarity.annLsh(spark, emptyDir).count() === 0)
    assert(Similarity.embeddingQuantize(spark, emptyDir).count() === 0)
  }

  test("text prep returns empty on an empty corpus") {
    import graft.operators.TextAnalysis
    assert(TextAnalysis.decontaminate(spark, emptyDir).count() === 0)
    assert(TextAnalysis.bm25(spark, emptyDir).count() === 0)
    assert(TextAnalysis.packSequences(spark, emptyDir).count() === 0)
    assert(TextAnalysis.topNgrams(spark, emptyDir).count() === 0)
  }

  test("connected components converges immediately on an empty edge list") {
    import spark.implicits._
    val labels = graft.operators.Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(labels.count() === 0)
  }
}
