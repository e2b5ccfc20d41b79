package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.functions.TextOps
import graft.sources.Ingest

/** Property-based invariants (SURVEY.md §5): distinct idempotence, union
  * additivity, join containment, avg bounds, Jaccard/SimHash algebra,
  * header-promotion roundtrip. Small generated inputs, shared local session.
  */
object EngineProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark
  import scala.language.reflectiveCalls

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val words: Gen[List[String]] = Gen.nonEmptyListOf(word)
  private val kvRows: Gen[List[(Int, String)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 20), word))

  property("distinct is idempotent and equals set size") =
    forAll(kvRows) { xs =>
      import spark.implicits._
      val d = xs.toDF("k", "v").distinct()
      d.count() == xs.toSet.size && d.distinct().count() == xs.toSet.size
    }

  property("unionByName row-count additivity") =
    forAll(kvRows, kvRows) { (a, b) =>
      import spark.implicits._
      a.toDF("k", "v").unionByName(b.toDF("k", "v")).count() ==
        (a.size + b.size).toLong
    }

  property("inner join bounded by cross product; keys are intersection") =
    forAll(kvRows, kvRows) { (a, b) =>
      import spark.implicits._
      val l = a.toDF("k", "v1")
      val r = b.toDF("k", "v2")
      val j = l.join(r, "k")
      val joinedKeys = j.select("k").distinct().collect()
        .map(_.getInt(0)).toSet
      j.count() <= a.size.toLong * b.size &&
        joinedKeys == a.map(_._1).toSet.intersect(b.map(_._1).toSet)
    }

  property("avg lies within [min, max]") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6))) { xs =>
      import spark.implicits._
      val r = xs.toDF("x")
        .agg(avg("x").as("a"), min("x").as("mn"), max("x").as("mx"))
        .collect()(0)
      r.getDouble(0) >= r.getDouble(1) - 1e-6 &&
        r.getDouble(0) <= r.getDouble(2) + 1e-6
    }

  property("jaccard in [0,1], symmetric, self = 1") =
    forAll(words, words) { (a, b) =>
      import spark.implicits._
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        TextOps.jaccard(col("a"), col("b")).as("ab"),
        TextOps.jaccard(col("b"), col("a")).as("ba"),
        TextOps.jaccard(col("a"), col("a")).as("aa")).collect()(0)
      val ab = r.getDouble(0)
      ab >= 0.0 && ab <= 1.0 && ab == r.getDouble(1) && r.getDouble(2) == 1.0
    }

  property("packed hamming: self 0, symmetric, bounded by 64") =
    forAll(Gen.long, Gen.long) { (a, b) =>
      import spark.implicits._
      val r = Seq((a, b)).toDF("a", "b").select(
        TextOps.hamming(col("a"), col("b")).as("ab"),
        TextOps.hamming(col("b"), col("a")).as("ba"),
        TextOps.hamming(col("a"), col("a")).as("aa")).collect()(0)
      r.getInt(2) == 0 && r.getInt(0) == r.getInt(1) &&
        r.getInt(0) >= 0 && r.getInt(0) <= 64
    }

  property("minhash permutations stay in [0, p)") =
    forAll(Gen.choose(0L, (1L << 32) - 1), Gen.choose(0, 63)) { (x, i) =>
      import spark.implicits._
      val v = Seq(x).toDF("x")
        .select(TextOps.minhashPermute(i, col("x")).as("h"))
        .collect()(0).getLong(0)
      v >= 0L && v < TextOps.minhashPrime
    }

  private val floatVec: Gen[List[Float]] =
    Gen.listOfN(8, Gen.choose(-10f, 10f)).suchThat(_.exists(_ != 0f))

  property("cosine within [-1,1] and symmetric; self-cosine 1") =
    forAll(floatVec, floatVec) { (a, b) =>
      import spark.implicits._
      import graft.functions.VectorOps
      val df = Seq((a, b)).toDF("a", "b")
        .select(col("a").cast("array<float>").as("a"),
          col("b").cast("array<float>").as("b"))
      val r = df.select(
        VectorOps.cosine(col("a"), col("b")).as("ab"),
        VectorOps.cosine(col("b"), col("a")).as("ba"),
        VectorOps.cosine(col("a"), col("a")).as("aa")).collect()(0)
      val ab = r.getDouble(0)
      ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9 &&
        math.abs(ab - r.getDouble(1)) < 1e-12 &&
        math.abs(r.getDouble(2) - 1.0) < 1e-9
    }

  property("salted join equals plain join on generated data") =
    forAll(kvRows, kvRows) { (big, small) =>
      import spark.implicits._
      val b = big.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "v", "uid")
      val s = small.map(_._1).distinct.map(k => (k, s"dim_$k"))
        .toDF("k", "tag")
      val plain = b.join(s, Seq("k")).count()
      val salted = graft.operators.SkewJoin
        .saltedJoin(b, s, "k", "uid", 4).count()
      plain == salted
    }

  property("hash split is a stable partition: every key in exactly one split") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 1000000L))) { ids =>
      import spark.implicits._
      val bucket = TextOps.portableHash(
        concat(lit("smp:"), col("id").cast("string"))) % 100
      val labeled = ids.distinct.toDF("id")
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "valid")
            .otherwise("test"))
      val once = labeled.collect().map(r => r.getLong(0) -> r.getString(1))
      val again = labeled.collect().map(r => r.getLong(0) -> r.getString(1))
      // deterministic (same assignment on re-run) and total (every id once)
      once.toMap == again.toMap && once.length == ids.distinct.size
    }

  property("chunking partitions tokens: sizes sum to total, all full but last") =
    forAll(Gen.choose(1, 230)) { n =>
      import spark.implicits._
      val text = (0 until n).map(i => s"w$i").mkString(" ")
      val w = split(col("text"), " ")
      val chunks = Seq(text).toDF("text")
        .select(explode(sequence(lit(0),
          ceil(size(w) / lit(50.0)).cast("int") - 1)).as("cid"),
          size(slice(w, col("cid") * 50 + 1, lit(50))).as("ct"))
        .orderBy("cid").collect().map(_.getInt(1))
      chunks.sum == n && chunks.init.forall(_ == 50) &&
        chunks.last == (if (n % 50 == 0) 50 else n % 50)
    }

  property("connected components equals reference union-find on random graphs") =
    forAll(Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))) { rawEdges =>
      val edges = rawEdges.filter { case (a, b) => a != b }
      edges.isEmpty || {
        import spark.implicits._
        val got = graft.operators.Dedup
          .connectedComponents(edges.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1))
        // reference union-find over the same edges
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(v => v -> find(v)).toMap
        // same vertex set, and the PARTITIONS agree (operator labels are
        // min-of-component, union-find roots after path compression too)
        got.length == want.size && got.forall { case (v, c) => want(v) == c }
      }
    }

  property("interval union: covered time equals the sweep on any start set") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 3L),
      Gen.choose(0L, 20000L)))) { pairs =>
      import spark.implicits._
      val out = graft.operators.Analytics
        .intervalUnionOn(pairs.toDF("user_id", "st")).collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("n_sessions"), r.getAs[Long]("covered_sec"))))
        .toMap
      pairs.groupBy(_._1).forall { case (u, ps) =>
        var merged = List.empty[(Long, Long)]
        ps.map(_._2).distinct.sorted.foreach { s =>
          merged = merged match {
            case (a, b) :: rest if s <= b =>
              (a, math.max(b, s + 1800)) :: rest
            case m => (s, s + 1800) :: m
          }
        }
        out(u) == ((merged.length.toLong,
          merged.map { case (a, b) => b - a }.sum))
      }
    }

  property("containment join equals brute force on any tiny corpus") = {
    // tiny vocab forces real overlaps; docs of 3..12 words over 6 terms
    val doc: Gen[List[String]] = Gen.choose(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("ax", "bx", "cx", "dx", "ex", "fx")))
    forAll(Gen.choose(2, 5).flatMap(k => Gen.listOfN(k, doc))) { ds =>
      import spark.implicits._
      val docs = ds.zipWithIndex.map { case (w, i) =>
        (i.toLong, w.mkString(" ")) }
      val sets = docs.map { case (id, t) =>
        id -> t.split(" ").toSeq.sliding(3).map(_.mkString(" ")).toSet }
      val brute = (for {
        (a, sa) <- sets; (b, sb) <- sets if a != b
        c = BigDecimal((sa & sb).size.toDouble / sa.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        if c >= BigDecimal("0.8")
      } yield (a, b)).toSet
      val got = graft.operators.Dedup
        .containmentJoinOn(docs.toDF("doc_id", "text"))
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      Prop(got == brute) :| s"got=$got want=$brute"
    }
  }

  property("header promotion: columns from row 0, data rows preserved") =
    forAll(Gen.choose(1, 4), Gen.choose(1, 5)) { (nCols, nRows) =>
      val header = (0 until nCols).map(i => s"col$i")
      val data = (0 until nRows).map(r =>
        (0 until nCols).map(c => s"v${r}_$c"))
      val payload = (header +: data)
        .map(_.mkString("[\"", "\",\"", "\"]"))
        .mkString("[", ",", "]")
      val df = Ingest.arrayOfArrays(spark, payload)
      df.columns.toSeq == header && df.count() == nRows.toLong
    }

  // substring dedup (q317): a verbatim copy of an earlier doc has EVERY
  // window duplicated (dup_ppm = 1e6, pruned); the earlier doc, none.
  // Window census is always len - 7 for docs of >= 8 tokens.
  private val longDoc: Gen[List[String]] =
    Gen.choose(8, 24).flatMap(n => Gen.listOfN(n, word))
  property("substring dedup: verbatim copy fully flagged, owner clean") =
    forAll(longDoc, longDoc) { (a, b) =>
      import spark.implicits._
      val docs = Seq(
        (1L, a.mkString(" ")),
        (2L, b.mkString(" ")),
        (3L, a.mkString(" ")) // verbatim copy of doc 1
      ).toDF("doc_id", "text")
      val out = graft.operators.Dedup.substringDedupOn(docs, 8).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getAs[Boolean]("prune")))
        .toMap
      val na = (a.length - 7).toLong
      out(1L)._1 == na && out(1L)._2 == 0L &&
        out(3L) == ((na, na, true)) &&
        out(2L)._1 == (b.length - 7).toLong
    }
}
