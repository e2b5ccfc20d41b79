package graft

import org.apache.spark.sql.functions._
import graft.functions.CdcOps
import graft.operators.Multimodal

/** Pins the native CDC boundary expression to the SQL formula it
  * replaces: [[CdcOps.boundaries]]'s compiled loop must equal the
  * `cdcFpSql` HOF spelling (the form the DuckDB oracle still runs)
  * position-for-position on real corpus text, non-ASCII text, and
  * degenerate inputs. */
class CdcBoundariesSpec extends SparkSpec {

  private def sqlBoundaries(): org.apache.spark.sql.Column = {
    val fp = Multimodal.cdcFpSql(j => s"element_at(cp, i + $j)")
    // n < 8 guard: Spark sequence(1, 0) is DESCENDING [1, 0], not empty
    expr(
      s"""IF(n < 8, array(),
         |  filter(transform(sequence(1, n - 7), i ->
         |    IF(($fp) % 16 = 0, i, CAST(NULL AS INT))),
         |    x -> x IS NOT NULL))""".stripMargin)
  }

  test("native boundary loop equals the SQL fold on the gate corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(length(col("text")) >= 8)
      .withColumn("n", length(col("text")))
      .withColumn("cp", expr("transform(split(text, ''), c -> ascii(c))"))
    val diff = docs
      .withColumn("nat", CdcOps.cdcBoundaries(col("text")))
      .withColumn("sqlb", sqlBoundaries())
      .filter(col("nat") =!= col("sqlb"))
      .count()
    assert(diff === 0)
    // fixture sanity: boundaries actually fire at roughly 1/16
    val stats = docs
      .withColumn("nb", size(CdcOps.cdcBoundaries(col("text"))))
      .agg(sum(col("nb")).as("b"), sum(col("n") - 7).as("p"))
      .collect()(0)
    val rate = stats.getLong(0).toDouble / stats.getLong(1)
    assert(rate > 1.0 / 32 && rate < 1.0 / 8,
      s"boundary rate $rate far from the designed 1/16")
  }

  test("native loop handles non-ASCII, supplementary and short inputs " +
      "like the SQL fold") {
    import spark.implicits._
    val fixtures = Seq(
      "héllo wörld ü — ça va très bien aujourd'hui, naïve façade",
      "日本語のテキストで内容定義チャンキングを試験する長めの文字列です",
      "mixed ascii and 𝕌𝕟𝕚𝕔𝕠𝕕𝕖 𝖘𝖚𝖕𝖕𝖑𝖊𝖒𝖊𝖓𝖙𝖆𝖗𝖞 planes 😀 test",
      "exactly8",   // n = 8: one position
      "seven77",    // n = 7: below the window, no positions
      "",           // empty
      "a" * 500     // uniform: every position same fp
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rows = fixtures
      .withColumn("n", length(col("text")))
      .withColumn("cp", expr("transform(split(text, ''), c -> ascii(c))"))
      .withColumn("nat", CdcOps.cdcBoundaries(col("text")))
      .withColumn("sqlb", sqlBoundaries())
      .select(col("doc_id"), col("nat"), col("sqlb"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) === r.getSeq[Int](2),
        s"doc ${r.getLong(0)}: native ${r.getSeq[Int](1)} != " +
          s"sql ${r.getSeq[Int](2)}")
    }
  }

  test("interpreted eval path equals codegen (collect via expression " +
      "eval on literals)") {
    import org.apache.spark.unsafe.types.UTF8String
    val texts = Seq("the quick brown fox jumps over the lazy dog " * 5,
      "héllo wörld ü " * 10)
    texts.foreach { t =>
      val viaEval = CdcOps.boundaries(UTF8String.fromString(t))
        .toIntArray().toSeq
      // reference recompute in plain Scala over codepoints
      val cps = t.codePoints().toArray.map(_.toLong)
      val expected = (0 to cps.length - 8).filter { p =>
        (0 until 8).map(j => cps(p + j) * CdcOps.POWS(j)).sum %
          1000000007L % 16L == 0L
      }.map(_ + 1)
      assert(viaEval === expected)
    }
  }
}
