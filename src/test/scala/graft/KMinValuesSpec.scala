package graft

import org.apache.spark.sql.functions._
import graft.functions.{KMinValuesAgg, TextOps}
import graft.operators.ApproxAgg

class KMinValuesSpec extends SparkSpec {

  private def hashed = spark.read.parquet(s"$sf/lineitem.parquet")
    .select(TextOps.portableHash(col("l_partkey").cast("string")).as("h"))

  test("sketch is the k smallest distinct values, any partitioning") {
    val expected = hashed.select(col("h")).distinct()
      .orderBy(col("h")).limit(16)
      .collect().map(_.getLong(0)).toSeq
    for (parts <- Seq(1, 7)) {
      val got = hashed.repartition(parts)
        .agg(KMinValuesAgg.kMinValues(col("h"), 16).as("kmv"))
        .collect()(0).getSeq[Long](0)
      assert(got === expected, s"parts=$parts")
    }
  }

  test("under-full buffer reports the exact distinct count") {
    val small = hashed.limit(10)
    val n = small.distinct().count()
    val got = small.agg(KMinValuesAgg.kMinValues(col("h"), 64).as("kmv"))
      .collect()(0).getSeq[Long](0)
    assert(got.length.toLong === n)
  }

  test("q106 estimate lands within 35% of exact (k=64, fixed data)") {
    ApproxAgg.kmvDistinct(spark, sf).collect().foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val exact = r.getAs[Long]("exact_distinct").toDouble
      assert(math.abs(est - exact) / exact < 0.35,
        s"flag=${r.getString(0)} est=$est exact=$exact")
    }
  }

  private def hashed60 = spark.read.parquet(s"$sf/lineitem.parquet")
    .select(TextOps.portableHash60(col("l_partkey").cast("string")).as("h"))

  test("hll registers are partition-invariant and match a local recompute") {
    val local = new Array[Int](64)
    hashed60.distinct().collect().map(_.getLong(0)).foreach { h =>
      val bkt = (h >>> 54).toInt & 63
      val rest = h & ((1L << 54) - 1)
      val rho = if (rest == 0L) 55
        else 55 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rho > local(bkt)) local(bkt) = rho
    }
    for (parts <- Seq(1, 7)) {
      val regs = hashed60.repartition(parts)
        .agg(graft.functions.HllAgg.hllRegs(col("h"), 64).as("regs"))
        .collect()(0).getSeq[Int](0)
      assert(regs === local.toSeq, s"parts=$parts")
    }
  }

  test("q160 portable-HLL estimate lands within 35% of exact") {
    ApproxAgg.hllDistinct(spark, sf).collect().foreach { r =>
      val est = r.getAs[Double]("hll_estimate")
      val exact = r.getAs[Long]("exact_distinct").toDouble
      assert(est > 0)
      assert(math.abs(est - exact) / exact < 0.35,
        s"flag=${r.getString(0)} est=$est exact=$exact")
    }
  }

  test("q163 histogram quantile is within one bin width of exact") {
    // The equi-width sketch's worst case is the bin width (2048): the
    // true quantile lies somewhere in the crossing bin, the estimate
    // interpolates inside it.
    ApproxAgg.histogramQuantile(spark, sf).collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("p50_hist") -
        r.getAs[Double]("p50_exact")) <= 2048.0)
      assert(math.abs(r.getAs[Double]("p95_hist") -
        r.getAs[Double]("p95_exact")) <= 2048.0)
    }
  }

  test("hll on empty input yields all-zero registers") {
    val regs = hashed60.filter(col("h") < 0) // portable hash is >= 0
      .agg(graft.functions.HllAgg.hllRegs(col("h"), 64).as("regs"))
      .collect()(0).getSeq[Int](0)
    assert(regs === Seq.fill(64)(0))
  }

  test("kmv retention: per-week sketch algebra recomputes from scratch; " +
      "below-k weeks give exact overlap") {
    def hk(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select((col("ts").cast("long") / 604800).cast("long").as("wk"),
        col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val byWk = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sk = byWk.view.mapValues(us =>
      us.map(u => hk(u.toString)).toVector.sorted.take(64)).toMap
    val got = operators.ApproxAgg.kmvRetention(spark, sf).collect()
    val wks = byWk.keys.toSeq.sorted
    assert(got.length === wks.count(w => byWk.contains(w + 1)))
    got.foreach { r =>
      val w = r.getAs[Long]("wk_from")
      val (ka, kb) = (sk(w), sk(w + 1))
      val merged = (ka ++ kb).distinct.sorted.take(64)
      val matches = merged.count(h => ka.contains(h) && kb.contains(h))
      val unionEst = if (merged.length < 64) merged.length.toDouble
        else 63.0 * 4294967296.0 / merged.last
      assert(r.getAs[Long]("n_a") === byWk(w).size.toLong)
      assert(r.getAs[Long]("n_b") === byWk(w + 1).size.toLong)
      assert(r.getAs[Long]("retained_exact") ===
        (byWk(w) & byWk(w + 1)).size.toLong)
      assert(r.getAs[Long]("n_merged") === merged.length.toLong)
      assert(r.getAs[Long]("matches") === matches.toLong)
      assert(r.getAs[Long]("jacc_ppm") ===
        matches.toLong * 1000000L / merged.length)
      assert(math.abs(r.getAs[Double]("union_est_r") - unionEst) < 1e-3)
      // the sf0.001 weeks hold < 64 users: sketches are exact and the
      // estimate must equal the witness
      if (byWk(w).size < 64 && byWk(w + 1).size < 64) {
        assert(r.getAs[Long]("matches").toDouble /
          r.getAs[Long]("n_merged") * unionEst ===
          r.getAs[Long]("retained_exact").toDouble)
      }
    }
  }

  test("join cardinality: estimator recomputes from scratch; union " +
      "estimate within the k=64 KMV error band") {
    def hk(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val aKeys = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).toSet
    val bKeys = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey")).distinct().collect()
      .map(_.getLong(0)).toSet
    val ka = aKeys.map(x => hk(s"jc:$x")).toVector.sorted.take(64)
    val kb = bKeys.map(x => hk(s"jc:$x")).toVector.sorted.take(64)
    val merged = (ka ++ kb).distinct.sorted.take(64)
    val jNum = merged.count(h => ka.contains(h) && kb.contains(h)).toLong
    val m = merged.length.toLong
    val unionEst =
      if (m < 64) m else 63L * 4294967296L / merged.last
    val r = ApproxAgg.joinCardinality(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_a") === aKeys.size.toLong)
    assert(r.getAs[Long]("n_b") === bKeys.size.toLong)
    assert(r.getAs[Long]("n_inter") === (aKeys & bKeys).size.toLong)
    assert(r.getAs[Long]("n_union") === (aKeys | bKeys).size.toLong)
    assert(r.getAs[Long]("kmin_m") === m)
    assert(r.getAs[Long]("union_est") === unionEst)
    assert(r.getAs[Long]("inter_est") === jNum * unionEst / m)
    assert(r.getAs[Long]("jaccard_ppm_est") === jNum * 1000000L / m)
    // accuracy: KMV with k=64 → stderr ≈ 1/sqrt(62) ≈ 12.7%; 35% = 2.7σ
    val exactU = (aKeys | bKeys).size.toLong
    assert(math.abs(r.getAs[Long]("union_est") - exactU) <=
      (0.35 * exactU).toLong.max(2L))
  }
}
