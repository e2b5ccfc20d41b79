package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.{TextOps, VectorOps}
import graft.sources.Tables

/** Deduplication operators for LLM training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design: every variant follows the same shape —
  *   (1) narrow per-document sketch (hash / signature / bits / norm),
  *   (2) candidate generation by bucket equi-join (the only shuffle,
  *       keyed on the sketch bucket, never all-pairs),
  *   (3) exact verification on the candidate pairs only.
  * At 100 TB step (2) is what makes dedup tractable: candidates scale with
  * collisions, not documents².
  */
object Dedup {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Exact dedup via content hash: one group per md5(text); keeper = min
    * doc_id (deterministic). Map-side partial agg means the shuffle carries
    * one row per distinct hash. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))

  /** Near-dup by exact 3-word-shingle Jaccard over prefix-bucket candidate
    * pairs (docs sharing their first 30 chars — a deterministic 1-band LSH;
    * the general banded form is [[minhash]]). Output: pairs with J ≥ 0.5. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), substring(col("text"), 1, 30).as("bucket"),
              TextOps.shingles3(col("text")).as("sh"))
    val a = docs.select(col("doc_id").as("doc_a"), col("bucket"),
      col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("bucket"),
      col("sh").as("sh_b"))
    a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        round(TextOps.jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash + banded LSH near-dup (Broder 1997; k=64 hashes, 16 bands ×
    * 4 rows → catches J ≳ 0.5 with high probability). Signature is one
    * narrow higher-order expression; candidates come from a self-equi-join
    * on band keys; exact Jaccard verifies. Not SQL-expressible (murmur3 is
    * engine-specific) → no oracle; `DedupSpec` checks it recovers exactly
    * the q34 pairs. */
  def minhash(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    val docs = t(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), TextOps.shingles3(col("text")).as("sh"))
    // explode → one murmur3 per shingle (codegen'd), then k min-aggregates
    // with map-side partial agg: the shuffle carries k values per document.
    val hashed = docs
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), TextOps.unsignedHash(col("s")).as("x"))
    val minAggs = (0 until k).map(i =>
      min(TextOps.minhashPermute(i, col("x"))).as(s"m$i"))
    val sigs = hashed.groupBy(col("doc_id"))
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"),
        array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
    val banded = sigs.select(col("doc_id"),
      explode(TextOps.minhashBands(col("sig"), 16, 4)).as("band"))
    val cands = banded.select(col("doc_id").as("doc_a"), col("band"))
      .join(banded.select(col("doc_id").as("doc_b"), col("band")),
        Seq("band"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    // exact-Jaccard verification on candidates only
    cands
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("doc_b"))
      .withColumn("jaccard",
        round(TextOps.jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** SimHash near-dup (Charikar 2002): 64-bit signed fingerprint of the
    * token multiset; candidates share one of 4 16-bit chunks (any pair at
    * hamming < 4 must collide); verified by exact hamming ≤ 12. Engine-
    * specific hashing (xxhash64) → no oracle; spec cross-checks vs q34. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    // explode tokens → one xxhash64 per token, then 64 signed-sum
    // aggregates (partial agg, codegen'd); bit i = sign of sum i.
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("tk"))
      .select(col("doc_id"), xxhash64(col("tk")).as("h"))
    val bitAggs = (0 until 64).map(i =>
      sum(TextOps.simhashContrib(i, col("h"))).as(s"b$i"))
    val docs = toks.groupBy(col("doc_id"))
      .agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), array((0 until 64).map(i =>
        when(col(s"b$i") >= 0, 1).otherwise(0)): _*).as("bits"))
      .withColumn("chunks", TextOps.simhashChunks(col("bits"), 4, 16))
    val chunked = docs.select(col("doc_id"), col("bits"),
      explode(col("chunks")).as("chunk"))
    val a = chunked.select(col("doc_id").as("doc_a"),
      col("bits").as("bits_a"), col("chunk"))
    val b = chunked.select(col("doc_id").as("doc_b"),
      col("bits").as("bits_b"), col("chunk"))
    a.join(b, Seq("chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("bits_a"), col("bits_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", TextOps.hamming(col("bits_a"), col("bits_b")))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Embedding-cosine near-dup: norms precomputed per vector (narrow),
    * then pair join + dot product. At this corpus size the pair join is a
    * broadcast nested loop; the 100 TB path is [[Similarity.annLsh]]-style
    * sign-bucketing first. Threshold J ≥ 0.5. */
  def embeddingCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        VectorOps.l2Norm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("v1"), col("embedding").as("e1"),
      col("nrm").as("n1"))
    val b = e.select(col("vec_id").as("v2"), col("embedding").as("e2"),
      col("nrm").as("n2"))
    a.join(b, col("v1") < col("v2"))
      .withColumn("cos", round(
        VectorOps.cosinePrenormed(VectorOps.dot(col("e1"), col("e2")),
          col("n1"), col("n2")), 6))
      .filter(col("cos") >= 0.5)
      .select(col("v1"), col("v2"), col("cos"))
  }

  private val ngramJaccardSql =
    """WITH docs AS (
      |  SELECT doc_id, substr(text, 1, 30) AS bucket,
      |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                   for i in range(1, len(w) - 1)]) AS sh
      |  FROM (SELECT doc_id, text, string_split(text, ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  round(len(list_intersect(a.sh, b.sh)) /
      |        len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
      |FROM docs a JOIN docs b
      |  ON a.bucket = b.bucket AND a.doc_id < b.doc_id
      |WHERE round(len(list_intersect(a.sh, b.sh)) /
      |      len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.5""".stripMargin

  private val embeddingCosineSql =
    """WITH e AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_aggregate(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
      |  FROM embeddings),
      |p AS (
      |  SELECT a.vec_id AS v1, b.vec_id AS v2,
      |    round(list_aggregate(
      |      [CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
      |       for i in range(1, len(a.embedding) + 1)], 'sum')
      |      / (a.nrm * b.nrm), 6) AS cos
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
      |SELECT v1, v2, cos FROM p WHERE cos >= 0.5""".stripMargin

  val catalog: Seq[Q] = Seq(
    Q("q33_dedup_exact", exact _,
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin),
    Q("q34_dedup_ngram_jaccard", ngramJaccard _, ngramJaccardSql),
    Q.noOracle("q35_dedup_minhash", minhash _),
    Q.noOracle("q36_dedup_simhash", simhash _),
    Q("q37_dedup_embedding", embeddingCosine _, embeddingCosineSql)
  )
}
