package graft

import org.apache.spark.sql.functions._

/** Brute-force recomputes for the model-evaluation family (q251–q255):
  * each statistic re-derived sequentially on the driver from the raw
  * sf0.001 rows and compared exactly (integers) or to 1e-9 (the one
  * fixed-order double each operator emits).
  */
class MlEvalSpec extends SparkSpec {

  private def li: Array[(Long, Long, Boolean)] =
    spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_quantity").cast("long"),
        expr("CAST(l_quantity AS BIGINT) * 1000 + " +
          "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) * 10 + " +
          "CAST(floor(l_tax * 100 + 0.5) AS BIGINT)").as("s"),
        (col("l_returnflag") === "R").as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

  test("roc auc: rank-sum form equals the O(n_pos*n_neg) pair count") {
    val rows = li
    val pos = rows.filter(_._3).map(_._2)
    val neg = rows.filterNot(_._3).map(_._2)
    // pair-count ground truth on a deterministic subsample (full
    // product at sf0.001 is ~8.7M pairs — fine, but keep it quick)
    var num2 = 0L
    pos.foreach { p =>
      neg.foreach { n =>
        if (p > n) num2 += 2 else if (p == n) num2 += 1
      }
    }
    val got = operators.MlEval.rocAuc(spark, sf).collect()(0)
    assert(got.getAs[Long]("n1") === pos.length.toLong)
    assert(got.getAs[Long]("n0") === neg.length.toLong)
    assert(got.getAs[Long]("auc_num2") === num2)
    val auc = num2.toDouble / (2.0 * pos.length * neg.length)
    assert(math.abs(got.getAs[Double]("auc_r") - auc) < 1e-6)
  }

  test("calibration: per-bin counts, rates and Brier match a " +
      "sequential fold; predictions stay in [0, 1e6]") {
    val rows = li
    val binned = rows.map { case (_, s, y) =>
      val p = math.min(s * 20, 1000000L)
      (math.min(p / 100000, 9L), p, if (y) 1L else 0L)
    }
    val expected = binned.groupBy(_._1).map { case (b, rs) =>
      val n = rs.length.toLong
      val npos = rs.map(_._3).sum
      val sp = rs.map(_._2).sum
      val se2 = rs.map(r => {
        val d = r._2 - r._3 * 1000000L; d * d
      }).sum
      b -> (n, npos, sp / n, npos * 1000000L / n, se2 / (n * 1000000L))
    }
    val got = operators.MlEval.calibration(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val e = expected(r.getAs[Long]("bin"))
      assert(r.getAs[Long]("n") === e._1)
      assert(r.getAs[Long]("n_pos") === e._2)
      assert(r.getAs[Long]("mean_pred_ppm") === e._3)
      assert(r.getAs[Long]("pos_rate_ppm") === e._4)
      assert(r.getAs[Long]("gap_ppm") === e._3 - e._4)
      assert(r.getAs[Long]("brier_ppm") === e._5)
      assert(e._3 >= 0 && e._3 <= 1000000L)
    }
  }

  test("cohens kappa: confusion-margin identity against a driver-side " +
      "recompute of the q40 predictor") {
    val lo = operators.TextAnalysis.langOrder
    val sw = operators.TextAnalysis.stopwords
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val pairs = docs.map { case (lang, text) =>
      val tk = text.split(" ", -1)
      val scores = lo.map(l => l -> tk.count(sw(l).toSet)).toMap
      val best = scores.values.max
      val pred =
        if (best == 0) "unknown"
        else lo.find(l => scores(l) == best).getOrElse("unknown")
      (lang, pred)
    }
    val n = pairs.length.toLong
    val agree = pairs.count(p => p._1 == p._2).toLong
    val rowsM = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colsM = pairs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val peNum = rowsM.map { case (k, rn) =>
      rn * colsM.getOrElse(k, 0L)
    }.sum
    val got = operators.MlEval.cohensKappa(spark, sf).collect()(0)
    assert(got.getAs[Long]("n") === n)
    assert(got.getAs[Long]("n_agree") === agree)
    assert(got.getAs[Long]("pe_num") === peNum)
    assert(got.getAs[Long]("kappa_num") === n * agree - peNum)
    assert(got.getAs[Long]("kappa_den") === n * n - peNum)
    val kap = (n * agree - peNum).toDouble / (n * n - peNum).toDouble
    assert(math.abs(got.getAs[Double]("kappa_r") - kap) < 1e-6)
  }

  test("k-anonymity: equivalence-class census equals a driver-side " +
      "group-by; risky classes are exactly those below k=5") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        col("c_acctbal").cast("double")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val classes = cust.groupBy { case (nk, seg, bal) =>
      (nk, seg, math.floor(bal / 1000.0).toLong)
    }.toSeq.map { case (_, rs) =>
      // (.toSeq first: mapping the Map directly would re-build a Map
      // keyed on class size, silently collapsing equal-sized classes)
      (rs.length.toLong,
        rs.map(r => math.floor(r._3 * 100 + 0.5).toLong).distinct.length.toLong)
    }
    val expected = classes.groupBy(_._1).map { case (sz, cs) =>
      sz -> (cs.length.toLong, cs.length.toLong * sz, cs.map(_._2).min,
        if (sz < 5) cs.length.toLong else 0L)
    }
    val got = operators.MlEval.kAnonymity(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val e = expected(r.getAs[Long]("class_size"))
      assert(r.getAs[Long]("n_classes") === e._1)
      assert(r.getAs[Long]("n_rows") === e._2)
      assert(r.getAs[Long]("min_l") === e._3)
      assert(r.getAs[Long]("n_risky_classes") === e._4)
    }
  }

  test("spearman: two-phase midrank rho equals the one-sort driver " +
      "recompute, and is invariant under a monotone price transform") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_quantity").cast("long"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def midranks2(vs: Array[Long]): Map[Long, Long] = {
      val byV = vs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val sorted = byV.keys.toArray.sorted
      var cum = 0L
      sorted.map { v =>
        val r2 = 2 * cum + byV(v) + 1
        cum += byV(v); v -> r2
      }.toMap
    }
    val rx = midranks2(rows.map(_._1))
    val ry = midranks2(rows.map(_._2))
    val n = rows.length.toLong
    val (sx, sy) = (rows.map(r => rx(r._1)).sum, rows.map(r => ry(r._2)).sum)
    val sxy = rows.map(r => BigInt(rx(r._1)) * ry(r._2)).sum
    val sxx = rows.map(r => BigInt(rx(r._1)) * rx(r._1)).sum
    val syy = rows.map(r => BigInt(ry(r._2)) * ry(r._2)).sum
    val rho = (BigDecimal(n) * BigDecimal(sxy) -
      BigDecimal(sx) * BigDecimal(sy)).toDouble /
      math.sqrt((BigDecimal(n) * BigDecimal(sxx) -
        BigDecimal(sx) * BigDecimal(sx)).toDouble *
        (BigDecimal(n) * BigDecimal(syy) -
          BigDecimal(sy) * BigDecimal(sy)).toDouble)
    val got = operators.MlEval.spearman(spark, sf).collect()(0)
    assert(got.getAs[Long]("n") === n)
    assert(math.abs(got.getAs[Double]("rho_r") - rho) < 1e-5)
    // monotone invariance: ranks of cents² equal ranks of cents (all
    // positive), so rho over the squared price is identical
    val ry2 = midranks2(rows.map(r => r._2 * r._2))
    rows.foreach(r => assert(ry2(r._2 * r._2) === ry(r._2)))
  }
  test("cuped: pooled theta and per-arm adjusted means match a " +
      "sequential recompute; arm split is the portable hash") {
    import java.security.MessageDigest
    def h32(x: String): Long = {
      val d = MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("ts").cast("long").as("sec"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val perUser = ev.groupBy(_._1).map { case (u, rs) =>
      val x = rs.filter(_._2 < mid).map(_._3).sum
      val y = rs.filter(_._2 >= mid).map(_._3).sum
      (u, x, y, h32(s"arm:$u") % 2)
    }.toArray
    val n = perUser.length.toLong
    val sx = perUser.map(_._2).sum
    val sy = perUser.map(_._3).sum
    val sxy = perUser.map(r => BigInt(r._2) * r._3).sum
    val sxx = perUser.map(r => BigInt(r._2) * r._2).sum
    val cov = BigInt(n) * sxy - BigInt(sx) * sy
    val vr = BigInt(n) * sxx - BigInt(sx) * sx
    val got = operators.MlEval.cuped(spark, sf).collect()
      .map(r => r.getAs[Long]("arm") -> r).toMap
    assert(got.size === 2)
    Seq(0L, 1L).foreach { a =>
      val rs = perUser.filter(_._4 == a)
      val row = got(a)
      assert(row.getAs[Long]("n_users") === rs.length.toLong)
      assert(row.getAs[Long]("sum_x_cents") === rs.map(_._2).sum)
      assert(row.getAs[Long]("sum_y_cents") === rs.map(_._3).sum)
      // outputs are BIGINT (dtype-portability rule) — the BigInt
      // recompute still proves the decimal INTERMEDIATES were exact
      assert(BigInt(row.getAs[Long]("cov_num")) === cov)
      assert(BigInt(row.getAs[Long]("var_num")) === vr)
      val adj = (vr.toDouble * rs.map(_._3).sum -
        cov.toDouble * rs.map(_._2).sum) / (vr.toDouble * rs.length)
      assert(math.abs(row.getAs[Double]("adj_mean_r") - adj) < 1e-5)
    }
    // variance reduction is real on this data only if |theta| > 0; at
    // minimum the adjusted readout must differ from raw when cov != 0
    assert(cov != 0)
  }

  test("mutual info: per-cell contributions match a driver recompute " +
      "and total MI is non-negative") {
    val rows = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_mktsegment"), col("c_nationkey").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = rows.length.toDouble
    val cells = rows.groupBy(identity).view.mapValues(_.length.toLong)
    val margX = rows.groupBy(_._1).view.mapValues(_.length.toLong)
    val margY = rows.groupBy(_._2).view.mapValues(_.length.toLong)
    val got = operators.MlEval.mutualInfo(spark, sf).collect()
    assert(got.length === cells.size)
    var total = 0.0
    got.foreach { r =>
      val key = (r.getAs[String]("seg"), r.getAs[Int]("nat").toLong)
      val nxy = cells(key)
      assert(r.getAs[Long]("n_xy") === nxy)
      assert(r.getAs[Long]("n_x") === margX(key._1))
      assert(r.getAs[Long]("n_y") === margY(key._2))
      val mi = (nxy / n) * math.log(nxy * n /
        (margX(key._1).toDouble * margY(key._2)))
      assert(math.abs(r.getAs[Double]("mi_contrib_r") - mi) < 1e-5)
      total += r.getAs[Double]("mi_contrib_r")
    }
    assert(total > -1e-9) // MI >= 0 (rounding slack)
  }

  test("churn labels: leakage-safe recompute — features pre-cut only, " +
      "label post-cut only, unseen users dropped") {
    val out = operators.MlEval.churnLabels(spark, sf).collect()
      .map(r => r.getAs[Long]("ev_bucket") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_churned"),
          r.getAs[Long]("cents_pre"))).toMap
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(o_orderdate AS TIMESTAMP_LTZ) AS t",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
      .selectExpr("o_custkey", "CAST(t AS LONG) AS sec", "cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mn = rows.map(_._2).min; val mx = rows.map(_._2).max
    val cut = mn + (mx - mn) * 7 / 10
    val byUser = rows.groupBy(_._1)
    val expect = scala.collection.mutable
      .Map.empty[Long, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    byUser.foreach { case (_, es) =>
      val pre = es.filter(_._2 < cut)
      if (pre.nonEmpty) {
        val nPre = pre.size.toLong
        val bucket = 63L - java.lang.Long.numberOfLeadingZeros(nPre)
        val churned = if (es.exists(_._2 >= cut)) 0L else 1L
        val (u, c, s) = expect(bucket)
        expect(bucket) = (u + 1, c + churned, s + pre.map(_._3).sum)
      }
    }
    assert(out === expect.toMap)
    assert(out.values.map(_._2).sum > 0) // the label is non-degenerate
  }

  test("isotonic: the minimax closed form equals a genuine PAVA " +
      "merge-loop recompute, and the fit is monotone") {
    val out = operators.MlEval.isotonic(spark, sf).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("pos"), r.getAs[Double]("fit_r"))).sortBy(_._1)
    val rows = li.map { case (_, s, y) =>
      (math.min(math.min(s * 20, 1000000L) / 15625, 63L),
        if (y) 1L else 0L) }
    val bins = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, rs) =>
        (b, rs.length.toLong, rs.map(_._2).sum) }
    assert(out.map(r => (r._1, r._2, r._3)) === bins)
    // real PAVA: pool adjacent violators until monotone
    var blocks = bins.map { case (_, n, p) => (n, p) }.toBuffer
    var merged = true
    while (merged) {
      merged = false
      var i = 0
      while (i + 1 < blocks.length) {
        val (n1, p1) = blocks(i); val (n2, p2) = blocks(i + 1)
        if (p1.toDouble / n1 > p2.toDouble / n2) {
          blocks(i) = (n1 + n2, p1 + p2)
          blocks.remove(i + 1)
          merged = true
        } else i += 1
      }
    }
    val fits = blocks.flatMap { case (n, p) =>
      Seq.fill(n.toInt)(p.toDouble / n) } // per-ROW fit
    // map per-row fits back to per-bin (each bin sits in one block)
    var idx = 0
    bins.zip(out).foreach { case ((_, n, _), o) =>
      assert(math.abs(o._4 - fits(idx)) < 1.5e-6, s"bin ${o._1}")
      idx += n.toInt
    }
    out.map(_._4).sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-9); case _ => }
  }

  test("policy replay: per-user sequential recompute of the " +
      "prior-cumulative-spend recommendation") {
    val out = operators.MlEval.policyReplay(spark, sf).collect()
      .map(r => r.getAs[String]("pi") ->
        ((r.getAs[Long]("n_logged"), r.getAs[Long]("n_matched")))).toMap
    val types = Seq("click", "error", "purchase", "signup", "view")
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "CAST(ts AS LONG) AS sec",
        "unix_micros(ts) AS usec", "event_id", "event_type",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    val tally = scala.collection.mutable
      .Map.empty[String, (Long, Long)].withDefaultValue((0L, 0L))
    ev.groupBy(_._1).foreach { case (_, es) =>
      val cums = scala.collection.mutable
        .Map(types.map(_ -> 0L): _*)
      es.sortBy(e => (e._2, e._3)).foreach { e =>
        val mx = types.map(cums).max
        val pi = types.find(cums(_) == mx).get
        val (nl, nm) = tally(pi)
        tally(pi) = (nl + 1, nm + (if (e._4 == pi) 1L else 0L))
        cums(e._4) += e._5
      }
    }
    types.foreach { t0 =>
      assert(out.get(t0).map(v => (v._1, v._2)) ===
        tally.get(t0).map(v => (v._1, v._2)), s"pi=$t0")
    }
  }

  test("info gain stump: per-split gains and the two-stage argmax " +
      "equal a driver-side recompute") {
    val out = operators.MlEval.infoGain(spark, sf).collect()
      .map(r => r.getAs[Long]("split") ->
        ((r.getAs[Long]("n_l"), r.getAs[Long]("p_l"),
          r.getAs[Long]("thr_cents"),
          Option(r.getAs[java.lang.Double]("gain_r")).map(_.toDouble),
          r.getAs[Long]("best_split")))).toMap
    assert(out.size === 63)
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)",
        "l_returnflag = 'R'")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val mn = rows.map(_._1).min; val mx = rows.map(_._1).max
    val binned = rows.map { case (c, y) =>
      (math.min(63L, (c - mn) * 64L / (mx - mn + 1)), y) }
    val nt = rows.length.toLong
    val pt = rows.count(_._2).toLong
    def ent(p: Long, n: Long): Double =
      if (n == 0) 0.0
      else {
        val a = if (p == 0) 0.0
          else -(p.toDouble / n) * math.log(p.toDouble / n)
        val b = if (n - p == 0) 0.0
          else -((n - p).toDouble / n) * math.log((n - p).toDouble / n)
        a + b
      }
    val gains = (0L until 63L).map { s =>
      val nl = binned.count(_._1 <= s).toLong
      val pl = binned.count(b => b._1 <= s && b._2).toLong
      val g = if (nl == 0 || nt - nl == 0) None
        else Some(ent(pt, nt) - (nl.toDouble / nt) * ent(pl, nl) -
          ((nt - nl).toDouble / nt) * ent(pt - pl, nt - nl))
      (s, nl, pl, g)
    }
    val best = gains.filter(_._4.nonEmpty)
      .maxBy(g => (g._4.get, -g._1))._1
    gains.foreach { case (s, nl, pl, g) =>
      val (gnl, gpl, thr, gg, gbest) = out(s)
      assert((gnl, gpl) === ((nl, pl)))
      assert(thr === mn + (s + 1) * (mx - mn + 1) / 64)
      (g, gg) match {
        case (Some(e), Some(got)) => assert(math.abs(got - e) < 1.5e-6)
        case (None, None) =>
        case other => fail(s"split $s: $other")
      }
      // two-stage argmax on the rounded gain — recompute the rounding
      assert(gbest === best ||
        math.abs(gains(gbest.toInt)._4.get -
          gains(best.toInt)._4.get) < 1e-6)
    }
  }

  test("srm check: user-level chi2 recompute; the hash split is " +
      "balanced on this corpus") {
    import java.security.MessageDigest
    def h32(x: String): Long = {
      val d = MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val row = operators.MlEval.srmCheck(spark, sf).collect()(0)
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().collect().map(_.getLong(0))
    val n0 = users.count(u => h32(s"arm:$u") % 2 == 0).toLong
    val n1 = users.length - n0
    assert(row.getAs[Long]("n0") === n0)
    assert(row.getAs[Long]("n1") === n1)
    val chi2 = ((n0 - n1) * (n0 - n1)).toDouble / (n0 + n1)
    assert(math.abs(row.getAs[Double]("chi2_r") - chi2) < 1.5e-6)
    assert(row.getAs[String]("verdict") ===
      (if (chi2 > 10.828) "srm_critical"
       else if (chi2 > 3.841) "srm_warning" else "balanced"))
  }

  test("power/mde: the two-proportion sample size recomputes from the " +
      "observed conversion; powered verdict is consistent") {
    val row = operators.MlEval.powerMde(spark, sf).collect()(0)
    val perUser = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id",
        "CASE WHEN event_type = 'purchase' AND " +
          "CAST(floor(value * 100 + 0.5) AS BIGINT) >= 20000 " +
          "THEN 1 ELSE 0 END AS conv")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).map(_._2.map(_._2).max)
    val nUsers = perUser.size.toLong
    val nConv = perUser.sum.toLong
    assert(row.getAs[Long]("n_users") === nUsers)
    assert(row.getAs[Long]("n_conv") === nConv)
    val p0ppm = nConv * 1000000L / nUsers
    assert(row.getAs[Long]("p0_ppm") === p0ppm)
    val p0 = p0ppm.toDouble / 1000000.0
    val p1 = p0 * 1.1
    val pbar = (p0 + p1) / 2.0
    val root = 1.959964 * math.sqrt(2.0 * pbar * (1.0 - pbar)) +
      0.841621 * math.sqrt(p0 * (1 - p0) + p1 * (1 - p1))
    val n = math.ceil(root * root / ((p1 - p0) * (p1 - p0))).toLong
    assert(row.getAs[Long]("n_required") === n)
    assert(row.getAs[Boolean]("powered") === (nUsers >= 2 * n))
  }

  test("shapley r2: coalition values recomputed from scratch; the " +
      "efficiency identity phi_q + phi_d = v_joint holds exactly") {
    val out = operators.MlEval.shapleyR2(spark, sf).collect()
      .map(r => r.getAs[String]("feature") ->
        ((BigInt(r.getAs[Long]("phi2")), BigInt(r.getAs[Long]("v_alone")),
          r.getAs[Double]("shapley_share_r")))).toMap
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("CAST(l_quantity AS LONG) AS q",
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) div 100" +
          " AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def w(key: ((Long, Long, Long)) => Any): BigInt =
      rows.groupBy(key).values.map { g =>
        val s = BigInt(g.map(_._3).sum)
        s * s / g.size
      }.sum
    val w0 = { val s = BigInt(rows.map(_._3).sum); s * s / rows.size }
    val wq = w(_._1); val wd = w(_._2); val wqd = w(r => (r._1, r._2))
    val phiQ2 = (wq - w0) + (wqd - wd)
    val phiD2 = (wd - w0) + (wqd - wq)
    assert(out("quantity")._1 === phiQ2)
    assert(out("discount")._1 === phiD2)
    assert(out("quantity")._2 === wq - w0)
    assert(out("discount")._2 === wd - w0)
    // efficiency: the two halves sum exactly to the joint value
    assert(phiQ2 + phiD2 === (wqd - w0) * 2)
    val tss = rows.map(r => BigInt(r._3) * r._3).sum - w0
    assert(math.abs(out("quantity")._3 -
      (BigDecimal(phiQ2) / (BigDecimal(tss) * 2)).toDouble) < 1.5e-6)
  }

  test("sprt: integer micro-nat walk recomputed sequentially; " +
      "boundaries and decisions match") {
    import java.security.MessageDigest
    def h32(x: String): Long = {
      val d = MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val out = operators.MlEval.sprt(spark, sf).collect()
      .map(r => r.getAs[Long]("arm") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("final_llr"),
          r.getAs[String]("decision"),
          Option(r.getAs[java.lang.Long]("decision_day"))
            .map(_.toLong))).toMap
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "CAST(ts AS LONG) DIV 86400 AS d",
        "event_type").collect()
      .map(r => (h32(s"sprtarm:${r.getLong(0)}") % 2, r.getLong(1),
        r.getString(2) == "purchase"))
    (0L to 1L).foreach { arm =>
      val daily = ev.filter(_._1 == arm).groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (d, es) =>
          (d, es.size.toLong, es.count(_._3).toLong) }
      var llr = 0L
      var dHi = Option.empty[Long]; var dLo = Option.empty[Long]
      daily.foreach { case (d, n, c) =>
        llr += c * 223144L + (n - c) * -64539L
        if (llr >= 2944439L && dHi.isEmpty) dHi = Some(d)
        if (llr <= -2944439L && dLo.isEmpty) dLo = Some(d)
      }
      val (decision, day) =
        if (dHi.nonEmpty && (dLo.isEmpty || dHi.get <= dLo.get))
          ("accept_h1", dHi)
        else if (dLo.nonEmpty) ("accept_h0", dLo)
        else ("continue", None)
      assert(out(arm) === ((daily.size.toLong, llr, decision, day)),
        s"arm=$arm")
    }
  }

  test("lift/gains: decile capture equals a full-sort sequential fold " +
      "with proportional tie allocation; lift at depth 10 is 1e6") {
    val rows = li
    val groups = rows.groupBy(_._2).map { case (s, xs) =>
      (s, xs.length.toLong, xs.count(_._3).toLong) }
      .toSeq.sortBy(-_._1)
    val nt = groups.map(_._2).sum
    val pt = groups.map(_._3).sum
    val got = operators.MlEval.liftGains(spark, sf).collect()
      .map(r => r.getAs[Long]("decile") ->
        (r.getAs[Long]("depth"), r.getAs[Long]("gain_ppm"),
          r.getAs[Long]("prec_ppm"), r.getAs[Long]("lift_ppm"))).toMap
    assert(got.keySet === (1L to 10L).toSet)
    (1L to 10L).foreach { i =>
      val depth = i * nt / 10
      // walk groups to the straddling one
      var (nlt, plt) = (0L, 0L)
      var k = 0
      while (nlt + groups(k)._2 < depth) {
        nlt += groups(k)._2; plt += groups(k)._3; k += 1
      }
      val (_, ng, pg) = groups(k)
      val cap = BigInt(plt) * ng + BigInt(depth - nlt) * pg
      val gain = (cap * 1000000 / (BigInt(ng) * pt)).toLong
      val prec = (cap * 1000000 / (BigInt(ng) * depth)).toLong
      val lift = (cap * nt * 1000000 /
        (BigInt(ng) * pt * depth)).toLong
      assert(got(i) === ((depth, gain, prec, lift)), s"decile=$i")
    }
    assert(got(10L)._4 === 1000000L) // full depth captures everything
  }

  test("pr auc: threshold-stepped average precision equals the " +
      "sequential fold over descending score blocks") {
    val rows = li
    val groups = rows.groupBy(_._2).map { case (s, xs) =>
      (s, xs.length.toLong, xs.count(_._3).toLong) }
      .toSeq.sortBy(-_._1)
    var (nge, pge) = (0L, 0L)
    var apn = BigInt(0)
    groups.foreach { case (_, n, p) =>
      nge += n; pge += p
      val precPpb = BigInt(pge) * 1000000000L / nge
      apn += BigInt(p) * precPpb
    }
    val got = operators.MlEval.prAuc(spark, sf).collect()(0)
    assert(got.getAs[Long]("n1") === pge)
    assert(got.getAs[Long]("n0") === nge - pge)
    assert(got.getAs[Long]("n_thresholds") === groups.size.toLong)
    assert(got.getAs[Long]("prevalence_ppb") ===
      (BigInt(pge) * 1000000000L / nge).toLong)
    assert(got.getAs[Long]("ap_ppb") === (apn / pge).toLong)
    // AP can never undercut the random-classifier floor by more than
    // quantization, and is bounded by 1
    assert(got.getAs[Long]("ap_ppb") <= 1000000000L)
  }

  test("depth-2 tree: root and child splits equal a sequential ID3 " +
      "recompute over the binned contingency") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"),
        col("l_quantity").cast("long"),
        (col("l_returnflag") === "R").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mn = rows.map(_._1).min
    val mx = rows.map(_._1).max
    val binned = rows.map { case (c, q, y) =>
      (math.min(63L, (c - mn) * 64 / (mx - mn + 1)), q, y) }
    def ent(p: Long, n: Long): Double = {
      if (n == 0) return 0.0
      val a = if (p == 0) 0.0
        else -(p.toDouble / n) * math.log(p.toDouble / n)
      val b = if (n - p == 0) 0.0
        else -((n - p).toDouble / n) * math.log((n - p).toDouble / n)
      a + b
    }
    def bestSplit(xs: Array[(Long, Long)], cands: Seq[Long])
        : (Option[Long], Option[Double]) = {
      val nt = xs.length.toLong
      val pt = xs.map(_._2).sum
      val gains = cands.map { s =>
        val l = xs.filter(_._1 <= s)
        val (nl, pl) = (l.length.toLong, l.map(_._2).sum)
        val g = if (nl == 0 || nt - nl == 0) None
          else Some(math.round((ent(pt, nt) -
            (nl.toDouble / nt) * ent(pl, nl) -
            ((nt - nl).toDouble / nt) * ent(pt - pl, nt - nl)) * 1e6)
            / 1e6 + 0.0)
        (s, g)
      }
      val defined = gains.collect { case (s, Some(g)) => (s, g) }
      if (defined.isEmpty) (None, None)
      else {
        val bg = defined.map(_._2).max
        (Some(defined.filter(_._2 == bg).map(_._1).min), Some(bg))
      }
    }
    val (rootSplit, rootGain) =
      bestSplit(binned.map(t => (t._1, t._3)), 0L until 63L)
    val got = operators.MlEval.treeDepth2(spark, sf).collect()
      .map(r => r.getAs[String]("node") ->
        (r.getAs[Long]("n"), r.getAs[Long]("pos"),
          Option(r.getAs[java.lang.Long]("best_split")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("gain_r")).map(_.toDouble)))
      .toMap
    assert(got.keySet === Set("root", "left", "right"))
    assert(got("root")._1 === binned.length.toLong)
    assert(got("root")._2 === binned.map(_._3).sum)
    assert(got("root")._3 === rootSplit)
    assert(got("root")._4 === rootGain)
    Seq("left" -> true, "right" -> false).foreach { case (node, isL) =>
      val side = binned.filter(t => (t._1 <= rootSplit.get) == isL)
      val cands = side.map(_._2).distinct.sorted.toSeq
      val (bs, bgain) = bestSplit(side.map(t => (t._2, t._3)), cands)
      assert(got(node)._1 === side.length.toLong, node)
      assert(got(node)._2 === side.map(_._3).sum, node)
      assert(got(node)._3 === bs, node)
      assert(got(node)._4 === bgain, node)
    }
  }

  test("did: four cells and the estimate equal a sequential 2x2 fold") {
    val seg = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> (r.getString(1) == "BUILDING"))
      .toMap
    val cut = java.time.Instant.parse("1996-01-01T00:00:00Z")
      .getEpochSecond
    val cells = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        "CAST(CAST(o_orderdate AS TIMESTAMP_LTZ) AS LONG) AS sec")
      .collect()
      .map(r => (seg(r.getLong(0)), r.getLong(2) >= cut, r.getLong(1)))
      .groupBy(t => (t._1, t._2))
      .map { case (k, xs) => k -> (xs.length.toLong, xs.map(_._3).sum) }
    val got = operators.MlEval.did(spark, sf).collect()
      .map(r => (r.getAs[Boolean]("treat"), r.getAs[Boolean]("post")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_cents"),
          r.getAs[Double]("did_dollars_r"))).toMap
    assert(got.keySet === cells.keySet)
    cells.foreach { case (k, (n, s)) =>
      assert(got(k)._1 === n, k); assert(got(k)._2 === s, k) }
    def mean(k: (Boolean, Boolean)) =
      cells(k)._2.toDouble / cells(k)._1
    val did = ((mean((true, true)) - mean((true, false))) -
      (mean((false, true)) - mean((false, false)))) / 100.0
    got.values.foreach(v => assert(math.abs(v._3 - did) < 1e-6))
  }

  test("t-closeness: per-class ordered EMD equals a sequential fold " +
      "over the band grid") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("CAST(c_nationkey AS BIGINT)", "c_mktsegment",
        "CAST(floor(c_acctbal / 2000.0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bands = cust.map(_._3).distinct.sorted
    val m = bands.length
    val nTot = cust.length.toLong
    val gCum = bands.map(b => b -> cust.count(_._3 <= b).toLong).toMap
    val got = operators.MlEval.tCloseness(spark, sf).collect()
      .map(r => (r.getAs[Long]("c_nationkey"),
        r.getAs[String]("c_mktsegment")) ->
        (r.getAs[Long]("cls_n"), r.getAs[Long]("t_ppm"))).toMap
    val classes = cust.groupBy(c => (c._1, c._2))
    assert(got.keySet === classes.keySet)
    classes.foreach { case (k, members) =>
      val nc = members.length.toLong
      val dsum = bands.dropRight(1).map { b =>
        val cumC = members.count(_._3 <= b).toLong
        (BigInt(cumC) * nTot - BigInt(gCum(b)) * nc).abs
      }.sum
      val t = (dsum * 1000000 / (BigInt(m - 1) * nc * nTot)).toLong
      assert(got(k) === ((nc, t)), k)
    }
  }

  test("ols multi: exact normal-equation solve equals a driver-side " +
      "BigInt recompute; residual checks R2 in [0, 1]") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("CAST(l_quantity AS BIGINT)",
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = BigInt(rows.length)
    def S(f: ((Long, Long, Long)) => BigInt): BigInt =
      rows.map(f).sum
    val (sq, sd, sy) = (S(t => BigInt(t._1)), S(t => BigInt(t._2)),
      S(t => BigInt(t._3)))
    val cqq = n * S(t => BigInt(t._1) * t._1) - sq * sq
    val cqd = n * S(t => BigInt(t._1) * t._2) - sq * sd
    val cdd = n * S(t => BigInt(t._2) * t._2) - sd * sd
    val cqy = n * S(t => BigInt(t._1) * t._3) - sq * sy
    val cdy = n * S(t => BigInt(t._2) * t._3) - sd * sy
    val cyy = n * S(t => BigInt(t._3) * t._3) - sy * sy
    val det = cqq * cdd - cqd * cqd
    val b1n = cqy * cdd - cdy * cqd
    val b2n = cdy * cqq - cqy * cqd
    val got = operators.MlEval.olsMulti(spark, sf).collect()(0)
    assert(got.getAs[Long]("n") === rows.length.toLong)
    val b1 = BigDecimal(b1n).toDouble / BigDecimal(det).toDouble
    val b2 = BigDecimal(b2n).toDouble / BigDecimal(det).toDouble
    assert(math.abs(got.getAs[Double]("b_qty_r") - b1) < 1e-5)
    assert(math.abs(got.getAs[Double]("b_disc_r") - b2) < 1e-5)
    val r2 = (BigDecimal(b1n * cqy + b2n * cdy) /
      BigDecimal(det * cyy)).toDouble
    assert(math.abs(got.getAs[Double]("r2_r") - r2) < 1e-5)
    assert(r2 >= 0.0 && r2 <= 1.0)
    // this synthetic feed draws price independently of quantity and
    // discount (corr ≈ ±0.01 across the board), so the honest pin is
    // near-orthogonality: the exact machinery must REPORT the absence
    // of signal, not manufacture some
    assert(r2 < 0.01)
  }

  private def orderArms(): Array[(Long, Boolean, Long)] = {
    val seg = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey").cast("long"),
        col("c_mktsegment"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
      .collect().map { r =>
        val (nat, s) = seg(r.getLong(0))
        (nat, s == "BUILDING", r.getLong(1))
      }
  }

  test("stratified effect: per-stratum quantized terms equal a BigInt " +
      "fold with the positive-shifted nearest-int division") {
    val rows = orderArms()
    val strata = rows.groupBy(_._1).flatMap { case (nat, xs) =>
      val t = xs.filter(_._2); val c = xs.filterNot(_._2)
      if (t.isEmpty || c.isEmpty) None
      else Some((nat, t.length.toLong, t.map(_._3).sum,
        c.length.toLong, c.map(_._3).sum))
    }.toSeq
    val nn = strata.map(s => s._2 + s._4).sum
    val off = BigInt("10000000000000")
    val terms = strata.map { case (_, nt, st, ncc, sc) =>
      val ns = BigInt(nt + ncc)
      val num = 2 * ns * (BigInt(st) * ncc - BigInt(sc) * nt) * 100 +
        BigInt(nn) * nt * ncc + 2 * off * nn * nt * ncc
      val den = 2 * BigInt(nn) * nt * ncc
      // num is positive by the shift, so floorDiv == truncation
      num / den - off
    }
    val ate = terms.sum
    val got = operators.MlEval.stratEffect(spark, sf).collect()(0)
    assert(got.getAs[Long]("n_orders_used") === nn)
    assert(got.getAs[Long]("n_strata_used") === strata.length.toLong)
    assert(got.getAs[Long]("ate_e4") === ate.toLong)
  }

  test("welch t: statistic, df and verdict equal a driver-side " +
      "recompute from the exact sufficient statistics") {
    val rows = orderArms()
    val a = rows.filter(_._2).map(_._3)
    val b = rows.filterNot(_._2).map(_._3)
    def stats(x: Array[Long]) = {
      val n = x.length.toDouble
      val s = x.map(BigInt(_)).sum
      val q = x.map(v => BigInt(v) * v).sum
      val v = (n * BigDecimal(q).toDouble -
        BigDecimal(s).toDouble * BigDecimal(s).toDouble) / (n * (n - 1))
      (n, BigDecimal(s).toDouble, v)
    }
    val (n1, s1, v1) = stats(a)
    val (n2, s2, v2) = stats(b)
    val t = (s1 / n1 - s2 / n2) / math.sqrt(v1 / n1 + v2 / n2)
    val df = math.pow(v1 / n1 + v2 / n2, 2) /
      (math.pow(v1 / n1, 2) / (n1 - 1) + math.pow(v2 / n2, 2) / (n2 - 1))
    val got = operators.MlEval.welchT(spark, sf).collect()(0)
    assert(got.getAs[Long]("n1") === a.length.toLong)
    assert(got.getAs[Long]("n2") === b.length.toLong)
    assert(math.abs(got.getAs[Double]("t_r") - t) < 1e-4)
    assert(math.abs(got.getAs[Double]("df_r") - df) < df * 1e-6 + 1e-4)
    val verdict = if (math.abs(t) > 2.576) "significant_99"
      else if (math.abs(t) > 1.96) "significant_95" else "not_significant"
    assert(got.getAs[String]("verdict") === verdict)
  }

  test("bh fdr: z, approximate p and the step-up verdicts equal a " +
      "sequential recompute; rejections respect the rank cutoff") {
    val natOf = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey", "o_totalprice >= 300000.0")
      .collect().map(r => (natOf(r.getLong(0)), r.getBoolean(1)))
    val cells = rows.groupBy(_._1).map { case (nat, xs) =>
      (nat, xs.length.toLong, xs.count(_._2).toLong) }.toSeq
    val nt = cells.map(_._2).sum
    val ct = cells.map(_._3).sum
    val m = cells.length
    def round6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    def pTwo(z: Double): Double = {
      val x = math.abs(z) / 1.4142135623730951
      val t = 1.0 / (1.0 + 0.3275911 * x)
      ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
        - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
    }
    val scored = cells.map { case (nat, n, c) =>
      val p0 = ct.toDouble / nt
      val z = (c.toDouble / n - (ct - c).toDouble / (nt - n)) /
        math.sqrt(p0 * (1.0 - p0) * (1.0 / n + 1.0 / (nt - n)))
      (nat, n, c, round6(z), round6(pTwo(z)))
    }.sortBy { case (nat, _, _, _, p) => (p, nat) }
    val ks = scored.zipWithIndex.collect {
      case ((_, _, _, _, p), idx) if p <= (idx + 1).toDouble * 0.05 / m
        => idx + 1 }
    val kstar = if (ks.isEmpty) None else Some(ks.max)
    val got = operators.MlEval.bhFdr(spark, sf).collect()
      .map(r => r.getAs[Long]("c_nationkey") ->
        (r.getAs[Long]("n"), r.getAs[Long]("c"), r.getAs[Double]("z_r"),
          r.getAs[Double]("p_r"), r.getAs[Int]("i"),
          r.getAs[Boolean]("bh_reject"))).toMap
    assert(got.size === m)
    scored.zipWithIndex.foreach { case ((nat, n, c, z, p), idx) =>
      val (gn, gc, gz, gp, gi, grej) = got(nat)
      assert(gn === n, nat); assert(gc === c, nat)
      assert(math.abs(gz - z) < 2e-6, nat)
      assert(math.abs(gp - p) < 2e-6, nat)
      assert(gi === idx + 1, nat)
      assert(grej === kstar.exists(idx + 1 <= _), nat)
    }
  }

  test("anova: F, eta2 and verdict equal a 5-segment sequential " +
      "recompute; iid segments read not-significant") {
    val segOf = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
      .collect().map(r => (segOf(r.getLong(0)), r.getLong(1)))
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    val cells = segs.map { s =>
      val xs = rows.filter(_._1 == s).map(_._2)
      (xs.length.toDouble, xs.map(BigInt(_)).sum) }
    val nT = rows.length.toDouble
    val sT = rows.map(t => BigInt(t._2)).sum
    val qq = rows.map(t => BigInt(t._2) * t._2).sum
    // same fixed order as the shared fragment
    val ssb = cells.map { case (n, s) =>
      BigDecimal(s).toDouble * BigDecimal(s).toDouble / n }.sum -
      BigDecimal(sT).toDouble * BigDecimal(sT).toDouble / nT
    val sst = BigDecimal(qq).toDouble -
      BigDecimal(sT).toDouble * BigDecimal(sT).toDouble / nT
    val f = (ssb / 4.0) / ((sst - ssb) / (nT - 5))
    val got = operators.MlEval.anova(spark, sf).collect()(0)
    assert(got.getAs[Long]("n_total") === rows.length.toLong)
    assert(got.getAs[Long]("df2") === rows.length.toLong - 5)
    assert(math.abs(got.getAs[Double]("f_r") - f) < 1e-4)
    assert(math.abs(got.getAs[Double]("eta2_r") - ssb / sst) < 1e-6)
    assert(got.getAs[String]("verdict") ===
      (if (f > 2.372) "significant_95" else "not_significant"))
  }

  test("wilcoxon: signed midranks of the exact rational per-nation " +
      "diffs equal a sequential fold") {
    val natOf = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cut = java.time.Instant.parse("1996-01-01T00:00:00Z")
      .getEpochSecond
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        "CAST(CAST(o_orderdate AS TIMESTAMP_LTZ) AS LONG) AS sec")
      .collect()
      .map(r => (natOf(r.getLong(0)), r.getLong(2) >= cut, r.getLong(1)))
    val cells = rows.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val pre = xs.filterNot(_._2); val post = xs.filter(_._2)
      if (pre.isEmpty || post.isEmpty) None
      else {
        val num = BigInt(post.map(_._3).sum) * pre.length -
          BigInt(pre.map(_._3).sum) * post.length
        if (num == 0) None
        else Some((num, BigInt(pre.length) * post.length))
      }
    }
    val r2s = cells.map { case (numA, denA) =>
      val lt = cells.count { case (numB, denB) =>
        numB.abs * denA < numA.abs * denB }
      val eq = cells.count { case (numB, denB) =>
        numB.abs * denA == numA.abs * denB }
      (numA > 0, 2L * lt + eq)
    }
    val n = r2s.size.toLong
    val wX2 = r2s.collect { case (true, r2) => r2 }.sum
    val z = (wX2.toDouble / 2.0 - n.toDouble * (n + 1) / 4.0) /
      math.sqrt(n.toDouble * (n + 1) * (2 * n + 1) / 24.0)
    val got = operators.MlEval.wilcoxon(spark, sf).collect()(0)
    assert(got.getAs[Long]("n_pairs") === n)
    assert(got.getAs[Long]("w_plus_x2") === wX2)
    assert(math.abs(got.getAs[Double]("z_r") - z) < 1e-5)
    assert(got.getAs[String]("verdict") ===
      (if (math.abs(z) > 1.96) "significant_95" else "not_significant"))
  }

  test("mann whitney: U and the tie-corrected z equal a direct " +
      "pairwise-count recompute over the quantity domain") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("CAST(l_quantity AS BIGINT)", "l_linestatus = 'F'")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val cells = rows.groupBy(_._1).map { case (s, xs) =>
      (s, xs.count(_._2).toLong, xs.count(!_._2).toLong) }.toSeq
    val n1 = cells.map(_._2).sum; val n0 = cells.map(_._3).sum
    // definitional U: count of (group1, group0) pairs group1 wins,
    // ties worth half — in doubled units to stay integral
    val u2 = (for ((sa, a1, _) <- cells; (sb, _, b0) <- cells) yield {
      if (sa > sb) 2L * a1 * b0 else if (sa == sb) a1 * b0 else 0L
    }).sum
    val tt = cells.map { case (_, a1, a0) =>
      val t = BigInt(a1 + a0); t * t * t - t }.sum
    val z = (u2.toDouble / 2.0 - n1.toDouble * n0 / 2.0) /
      math.sqrt(n1.toDouble * n0 / 12.0 * ((n1.toDouble + n0 + 1.0) -
        tt.toDouble / ((n1.toDouble + n0) * (n1.toDouble + n0 - 1.0))))
    val got = operators.MlEval.mannWhitney(spark, sf).collect()(0)
    assert(got.getAs[Long]("n1") === n1)
    assert(got.getAs[Long]("n0") === n0)
    assert(got.getAs[Long]("u2") === u2)
    assert(math.abs(got.getAs[Double]("z_r") - z) < 1e-5)
    assert(got.getAs[String]("verdict") ===
      (if (math.abs(z) > 1.96) "significant_95" else "not_significant"))
  }

  test("kendall tau-b: concordance tallies equal a direct pairwise " +
      "fold over the per-nation cells") {
    val natOf = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cells = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
      .collect().map(r => (natOf(r.getLong(0)), r.getLong(1)))
      .groupBy(_._1).map { case (nat, xs) =>
        (nat, xs.length.toLong, xs.map(t => BigInt(t._2)).sum) }.toSeq
      .sortBy(_._1)
    val pairs = for (a <- cells; b <- cells; if a._1 < b._1) yield (a, b)
    val c = pairs.count { case (a, b) =>
      (BigInt(a._2 - b._2) * (a._3 - b._3)).signum > 0 }
    val d = pairs.count { case (a, b) =>
      (BigInt(a._2 - b._2) * (a._3 - b._3)).signum < 0 }
    val tx = pairs.count { case (a, b) => a._2 == b._2 }
    val ty = pairs.count { case (a, b) => a._3 == b._3 }
    val np = pairs.size
    val tau = (c - d).toDouble /
      math.sqrt((np - tx).toDouble * (np - ty).toDouble)
    val got = operators.MlEval.kendallTau(spark, sf).collect()(0)
    assert(got.getAs[Long]("n_pairs") === np.toLong)
    assert(got.getAs[Long]("n_conc") === c.toLong)
    assert(got.getAs[Long]("n_disc") === d.toLong)
    assert(got.getAs[Long]("ties_x") === tx.toLong)
    assert(got.getAs[Long]("ties_y") === ty.toLong)
    assert(math.abs(got.getAs[Double]("tau_b_r") - tau) < 1e-6)
  }

  test("conformal: the quantile equals a sort-based order statistic " +
      "and test coverage counts match; coverage is near nominal") {
    val segOf = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)",
        "CAST(o_orderkey % 5 AS BIGINT)")
      .collect().map(r => (segOf(r.getLong(0)), r.getLong(1), r.getLong(2)))
    val yhat = rows.filter(_._3 >= 2).groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(t => BigInt(t._2)).sum / xs.length }
    def rd(t: (String, Long, Long)) =
      ((BigInt(t._2) - yhat(t._1)).abs / 100).toLong
    val cal = rows.filter(_._3 == 0L).map(rd).sorted
    val k = (9 * (cal.length + 1) + 9) / 10
    val qhat = cal(k - 1) // k-th smallest, 1-based
    val tst = rows.filter(_._3 == 1L).map(rd)
    val covered = tst.count(_ <= qhat)
    val got = operators.MlEval.conformal(spark, sf).collect()(0)
    assert(got.getAs[Long]("n_cal") === cal.length.toLong)
    assert(got.getAs[Long]("k_rank") === k.toLong)
    assert(got.getAs[Long]("q_hat_dollars") === qhat)
    assert(got.getAs[Long]("n_test") === tst.length.toLong)
    assert(got.getAs[Long]("n_covered") === covered.toLong)
    assert(got.getAs[Long]("coverage_ppm") ===
      covered.toLong * 1000000 / tst.length)
    // finite-sample guarantee: coverage concentrates near >= 90%
    assert(got.getAs[Long]("coverage_ppm") > 850000)
  }

  test("logistic irls: both Newton steps equal a BigInt recompute of " +
      "the sufficient statistics and Cramer solve; step 2 converges") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("CAST(l_quantity AS BIGINT) div 10",
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) div 2",
        "l_returnflag = 'R'")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val cells = rows.groupBy(t => (t._1, t._2)).map { case ((x1, x2), xs) =>
      (x1, x2, xs.length.toLong, xs.count(_._3).toLong) }.toSeq.sortBy(c => (c._1, c._2))
    def step(pm: ((Long, Long)) => Long): (Double, Double, Double) = {
      var g = Array(BigInt(0), BigInt(0), BigInt(0))
      var h = Array.fill(6)(BigInt(0)) // h11 h12 h13 h22 h23 h33
      cells.foreach { case (x1, x2, n, pos) =>
        val p = pm((x1, x2))
        val gi = BigInt(pos) * 1000000 - BigInt(n) * p
        val w7 = p * (1000000L - p) / 10000000L
        g = Array(g(0) + gi, g(1) + x1 * gi, g(2) + x2 * gi)
        h = Array(h(0) + BigInt(n) * w7, h(1) + BigInt(x1 * n) * w7,
          h(2) + BigInt(x2 * n) * w7, h(3) + BigInt(x1 * x1 * n) * w7,
          h(4) + BigInt(x1 * x2 * n) * w7, h(5) + BigInt(x2 * x2 * n) * w7)
      }
      val Array(h11, h12, h13, h22, h23, h33) = h
      val Array(g1, g2, g3) = g
      val det = h11 * (h22 * h33 - h23 * h23) -
        h12 * (h12 * h33 - h23 * h13) + h13 * (h12 * h23 - h22 * h13)
      val d1 = g1 * (h22 * h33 - h23 * h23) -
        h12 * (g2 * h33 - h23 * g3) + h13 * (g2 * h23 - h22 * g3)
      val d2 = h11 * (g2 * h33 - g3 * h23) -
        g1 * (h12 * h33 - h23 * h13) + h13 * (h12 * g3 - g2 * h13)
      val d3 = h11 * (h22 * g3 - h23 * g2) -
        h12 * (h12 * g3 - g2 * h13) + g1 * (h12 * h23 - h22 * h13)
      (0.1 * (d1.toDouble / det.toDouble),
        0.1 * (d2.toDouble / det.toDouble),
        0.1 * (d3.toDouble / det.toDouble))
    }
    val (a0, a1, a2) = step(_ => 500000L)
    def sig(x: (Long, Long)): Long =
      math.floor(1000000.0 /
        (1.0 + math.exp(-(a0 + a1 * x._1 + a2 * x._2))) + 0.5).toLong
    val (e0, e1, e2) = step(sig)
    val (c0, c1, c2) = (a0 + e0, a1 + e1, a2 + e2)
    val got = operators.MlEval.logisticIrls(spark, sf).collect()(0)
    assert(got.getAs[Long]("n_total") === rows.length.toLong)
    assert(math.abs(got.getAs[Double]("b0_step1_r") - a0) < 1e-5)
    assert(math.abs(got.getAs[Double]("b1_step1_r") - a1) < 1e-5)
    assert(math.abs(got.getAs[Double]("b2_step1_r") - a2) < 1e-5)
    assert(math.abs(got.getAs[Double]("b0_step2_r") - c0) < 1e-5)
    assert(math.abs(got.getAs[Double]("b1_step2_r") - c1) < 1e-5)
    assert(math.abs(got.getAs[Double]("b2_step2_r") - c2) < 1e-5)
    // Newton's quadratic convergence: the step-2 delta is far smaller
    // than step 1's move from zero
    assert(math.abs(e0) < 0.2 * math.abs(a0))
  }

  test("jarque-bera: moments off the exact power sums equal a driver " +
      "recompute; right-skewed order values read significant") {
    val xs = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("CAST(floor(o_totalprice + 0.5) AS BIGINT)")
      .collect().map(_.getLong(0))
    val n = xs.length.toDouble
    val s1 = xs.map(BigInt(_)).sum
    val s2 = xs.map(x => BigInt(x) * x).sum
    val s3 = xs.map(x => BigInt(x) * x * x).sum
    val s4 = xs.map(x => BigInt(x) * x * x * x).sum
    val mu = s1.toDouble / n
    val m2 = s2.toDouble / n - mu * mu
    val m3 = s3.toDouble / n - 3.0 * mu * (s2.toDouble / n) +
      2.0 * mu * mu * mu
    val m4 = s4.toDouble / n - 4.0 * mu * (s3.toDouble / n) +
      6.0 * mu * mu * (s2.toDouble / n) - 3.0 * mu * mu * mu * mu
    val skew = m3 / (m2 * math.sqrt(m2))
    val kurt = m4 / (m2 * m2)
    val jb = n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
    val got = operators.MlEval.jarqueBera(spark, sf).collect()(0)
    assert(got.getAs[Long]("n") === xs.length.toLong)
    assert(math.abs(got.getAs[Double]("skew_r") - skew) < 1e-5)
    assert(math.abs(got.getAs[Double]("kurt_r") - kurt) < 1e-5)
    assert(math.abs(got.getAs[Double]("jb_r") - jb) < jb * 1e-6 + 1e-4)
    assert(got.getAs[String]("verdict") === "significant_95")
  }

  test("eb shrinkage: the beta prior and posterior means equal a " +
      "driver recompute; shrunk rates sit between raw and pooled") {
    val natOf = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cells = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey", "o_totalprice >= 300000.0")
      .collect().map(r => (natOf(r.getLong(0)), r.getBoolean(1)))
      .groupBy(_._1).toSeq.map { case (nat, xs) =>
        (nat, xs.length.toLong, xs.count(_._2).toLong) }
    val rates = cells.map { case (nat, nn, c) =>
      (nat, nn, c, c * 1000000 / nn) }
    val k = rates.length.toDouble
    val sp = rates.map(r => BigInt(r._4)).sum
    val spp = rates.map(r => BigInt(r._4) * r._4).sum
    val m = sp.toDouble / k / 1000000.0
    val v = (k * spp.toDouble - sp.toDouble * sp.toDouble) /
      (k * (k - 1)) / 1000000.0 / 1000000.0
    val ab = m * (1.0 - m) / v - 1.0
    val a = m * ab
    val got = operators.MlEval.ebShrinkage(spark, sf).collect()
      .map(r => r.getAs[Long]("c_nationkey") ->
        (r.getAs[Long]("n"), r.getAs[Long]("c"),
          r.getAs[Long]("rate_ppm"), r.getAs[Double]("alpha_r"),
          r.getAs[Double]("shrunk_rate_r"))).toMap
    assert(got.size === rates.length)
    rates.foreach { case (nat, nn, c, ppm) =>
      val (gn, gc, gppm, galpha, gshrunk) = got(nat)
      assert(gn === nn, nat); assert(gc === c, nat)
      assert(gppm === ppm, nat)
      assert(math.abs(galpha - a) < math.abs(a) * 1e-5 + 1e-4, nat)
      val expect = (c + a) / (nn + ab)
      assert(math.abs(gshrunk - expect) < 1e-5, nat)
      // shrinkage moves every raw rate TOWARD the prior mean
      val raw = c.toDouble / nn
      assert((expect - raw).abs <= (m - raw).abs + 1e-9, nat)
    }
  }

  test("cochran-armitage: trend statistic equals a BigInt recompute " +
      "over the dose census; iid bands not significant") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("CAST(l_quantity AS BIGINT) div 10",
        "l_returnflag = 'R'")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val n = BigInt(rows.length)
    val rr = BigInt(rows.count(_._2))
    val cells = rows.groupBy(_._1).map { case (t, xs) =>
      (BigInt(t), BigInt(xs.length), BigInt(xs.count(_._2))) }
    val str = cells.map { case (t, _, r) => t * r }.sum
    val stn = cells.map { case (t, m, _) => t * m }.sum
    val st2n = cells.map { case (t, m, _) => t * t * m }.sum
    val tt = n * str - rr * stn
    val den = rr * (n - rr) * (n * st2n - stn * stn)
    val chi2 = tt.toDouble * tt.toDouble * n.toLong / den.toDouble
    val got = operators.MlEval.cochranArmitage(spark, sf).collect()(0)
    assert(got.getAs[Long]("n_total") === n.toLong)
    assert(got.getAs[Long]("n_pos") === rr.toLong)
    assert(math.abs(got.getAs[Double]("chi2_r") - chi2) < 1e-4)
    assert(got.getAs[String]("verdict") ===
      (if (chi2 > 3.841) "significant_95" else "not_significant"))
  }

  test("ipw ate: per-nation inverse-propensity terms equal a BigInt " +
      "fold; single-arm nations excluded") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)",
        "c_mktsegment = 'BUILDING'")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
      .collect().map { r =>
        val (nat, tr) = cust(r.getLong(0)); (nat, tr, r.getLong(1)) }
    val cells = rows.groupBy(_._1).toSeq.map { case (nat, xs) =>
      val t = xs.filter(_._2); val c = xs.filterNot(_._2)
      (nat, BigInt(t.length), t.map(x => BigInt(x._3)).sum,
        BigInt(c.length), c.map(x => BigInt(x._3)).sum)
    }.filter(c => c._2 > 0 && c._4 > 0)
    val nn = cells.map(c => c._2 + c._4).sum
    val shift = BigInt("10000000000000")
    val terms = cells.map { case (_, nt, st, nc, sc) =>
      (2 * (nt + nc) * (st * nc - sc * nt) * 100 + nt * nc +
        2 * shift * nt * nc) / (2 * nt * nc) - shift
    }
    val got = operators.MlEval.ipwAte(spark, sf).collect()(0)
    assert(got.getAs[Long]("n_orders_used") === nn.toLong)
    assert(got.getAs[Long]("n_strata_used") === cells.length.toLong)
    assert(got.getAs[Long]("sum_e4") === terms.sum.toLong)
    assert(math.abs(got.getAs[Double]("ate_dollars_r") -
      terms.sum.toDouble / (nn.toDouble * 10000.0)) < 1e-5)
  }

  test("mcnemar: disagreement cells and the corrected chi2 equal a " +
      "driver recompute") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("n_chars >= 300",
        "size(split(text, ' ')) >= 55")
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    val b = rows.count(t => t._1 && !t._2).toLong
    val c = rows.count(t => !t._1 && t._2).toLong
    val got = operators.MlEval.mcnemar(spark, sf).collect()(0)
    assert(got.getAs[Long]("n_docs") === rows.length.toLong)
    assert(got.getAs[Long]("n_a_only") === b)
    assert(got.getAs[Long]("n_b_only") === c)
    if (b + c > 0) {
      val chi2 = (math.abs(b - c) - 1).toDouble *
        (math.abs(b - c) - 1) / (b + c)
      assert(math.abs(got.getAs[Double]("chi2_r") - chi2) < 1e-6)
      assert(got.getAs[String]("verdict") ===
        (if (chi2 > 3.841) "significant_95" else "not_significant"))
    } else assert(got.getAs[String]("verdict") === "no_disagreements")
  }

  test("levene: W equals an ANOVA recompute on the row-quantized " +
      "absolute deviations") {
    val segOf = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
      .collect().map(r => (segOf(r.getLong(0)), r.getLong(1)))
    val g = rows.groupBy(_._1).map { case (s, xs) =>
      s -> (BigInt(xs.length), xs.map(x => BigInt(x._2)).sum) }
    val z = rows.map { case (s, y) =>
      val (ng, sg) = g(s); (s, ((ng * y - sg).abs * 10 / ng).toLong) }
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    val cells = segs.map { s =>
      val xs = z.filter(_._1 == s).map(_._2)
      (xs.length.toDouble, xs.map(BigInt(_)).sum) }
    val nT = z.length.toDouble
    val sT = z.map(t => BigInt(t._2)).sum
    val qq = z.map(t => BigInt(t._2) * t._2).sum
    val ssb = cells.map { case (n, s) =>
      BigDecimal(s).toDouble * BigDecimal(s).toDouble / n }.sum -
      BigDecimal(sT).toDouble * BigDecimal(sT).toDouble / nT
    val sst = BigDecimal(qq).toDouble -
      BigDecimal(sT).toDouble * BigDecimal(sT).toDouble / nT
    val w = (ssb / 4.0) / ((sst - ssb) / (nT - 5))
    val got = operators.MlEval.levene(spark, sf).collect()(0)
    assert(got.getAs[Long]("n_total") === z.length.toLong)
    assert(math.abs(got.getAs[Double]("w_r") - w) < 1e-4)
    assert(got.getAs[String]("verdict") ===
      (if (w > 2.372) "significant_95" else "not_significant"))
  }

  test("kfold cv: leave-one-fold-out predictors and per-fold MSE " +
      "equal a BigInt recompute; no fold sees its own rows") {
    val segOf = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)",
        "CAST(o_orderkey % 5 AS BIGINT)")
      .collect().map(r => (segOf(r.getLong(0)), r.getLong(1), r.getLong(2)))
    val bySegAll = rows.groupBy(_._1).map { case (s, xs) =>
      s -> (BigInt(xs.length), xs.map(x => BigInt(x._2)).sum) }
    val got = operators.MlEval.kfoldCv(spark, sf).collect()
      .map(r => r.getAs[Long]("fold") ->
        (r.getAs[Long]("n_test"), r.getAs[Long]("mse_cents2"),
          r.getAs[Double]("rmse_dollars_r"))).toMap
    assert(got.size === 5)
    (0L to 4L).foreach { f =>
      val test = rows.filter(_._3 == f)
      val se2 = test.map { case (s, y, _) =>
        val (nAll, sAll) = bySegAll(s)
        val inFold = rows.filter(r => r._1 == s && r._3 == f)
        val yhat = (sAll - inFold.map(x => BigInt(x._2)).sum) /
          (nAll - inFold.length)
        val d = BigInt(y) - yhat; d * d
      }.sum
      val (gn, gm, gr) = got(f)
      assert(gn === test.length.toLong, f)
      assert(gm === (se2 / test.length).toLong, f)
      assert(math.abs(gr -
        math.sqrt(se2.toDouble / test.length) / 100.0) < 1e-4, f)
    }
  }

  test("partial correlation: three Pearson r's and the partial equal " +
      "a BigInt sufficient-statistic recompute") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("CAST(l_quantity AS BIGINT)",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)",
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = rows.length.toDouble
    def s(f: ((Long, Long, Long)) => BigInt) = rows.map(f).sum
    val (sx, sy, sz) = (s(t => BigInt(t._1)), s(t => BigInt(t._2)),
      s(t => BigInt(t._3)))
    def r(sab: BigInt, sa: BigInt, sb: BigInt, saa: BigInt,
        sbb: BigInt): Double =
      (n * sab.toDouble - sa.toDouble * sb.toDouble) /
        math.sqrt((n * saa.toDouble - sa.toDouble * sa.toDouble) *
          (n * sbb.toDouble - sb.toDouble * sb.toDouble))
    val rxy = r(s(t => BigInt(t._1) * t._2), sx, sy,
      s(t => BigInt(t._1) * t._1), s(t => BigInt(t._2) * t._2))
    val rxz = r(s(t => BigInt(t._1) * t._3), sx, sz,
      s(t => BigInt(t._1) * t._1), s(t => BigInt(t._3) * t._3))
    val ryz = r(s(t => BigInt(t._2) * t._3), sy, sz,
      s(t => BigInt(t._2) * t._2), s(t => BigInt(t._3) * t._3))
    val part = (rxy - rxz * ryz) /
      math.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
    val got = operators.MlEval.partialCorr(spark, sf).collect()(0)
    assert(got.getAs[Long]("n") === rows.length.toLong)
    assert(math.abs(got.getAs[Double]("r_xy_r") - rxy) < 1e-5)
    assert(math.abs(got.getAs[Double]("r_xz_r") - rxz) < 1e-5)
    assert(math.abs(got.getAs[Double]("r_yz_r") - ryz) < 1e-5)
    assert(math.abs(got.getAs[Double]("partial_xy_z_r") - part) < 1e-5)
  }

  test("bradley terry: the wins matrix and three MM iterations equal " +
      "a BigInt recompute; strengths normalize and rank deterministically") {
    val brandOf = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey"), col("p_brand"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ob = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_orderkey", "l_partkey",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
      .collect().map(r => ((r.getLong(0), brandOf(r.getLong(1))), r.getLong(2)))
      .groupBy(_._1).map { case ((ok, b), xs) =>
        (ok, b, xs.map(_._2).max) }.toSeq
    val byOrder = ob.groupBy(_._1)
    val directed = scala.collection.mutable.Map[(String, String), (Long, Long)]()
    byOrder.values.foreach { entries =>
      for (a <- entries; b <- entries; if a._2 < b._2 && a._3 != b._3) {
        val iw = if (a._3 > b._3) 1L else 0L
        val (n1, w1) = directed.getOrElse((a._2, b._2), (0L, 0L))
        directed((a._2, b._2)) = (n1 + 1, w1 + iw)
        val (n2, w2) = directed.getOrElse((b._2, a._2), (0L, 0L))
        directed((b._2, a._2)) = (n2 + 1, w2 + (1 - iw))
      }
    }
    val items = directed.keys.map(_._1).toSeq.distinct.sorted
    val wins = items.map(i => i ->
      directed.collect { case ((a, _), (_, w)) if a == i => w }.sum).toMap
    val ntot = items.map(i => i ->
      directed.collect { case ((a, _), (n, _)) if a == i => n }.sum).toMap
    var p = items.map(i => i -> BigInt(1000000)).toMap
    (1 to 3).foreach { _ =>
      val s = items.map { i =>
        i -> directed.collect { case ((a, j), (n, _)) if a == i =>
          val denom = p(i) + p(j)
          if (denom > 0) BigInt(n) * BigInt("1000000000000") / denom
          else BigInt(0) }.sum }.toMap
      val raw = items.map { i =>
        i -> (if (s(i) > 0) BigInt(wins(i)) * BigInt("1000000000000") / s(i)
              else BigInt(0)) }.toMap
      val pt = raw.values.sum
      p = items.map(i => i -> raw(i) * 1000000 / pt).toMap
    }
    val got = operators.MlEval.bradleyTerry(spark, sf).collect()
      .map(r => r.getAs[String]("brand") ->
        (r.getAs[Long]("n_matches"), r.getAs[Long]("n_wins"),
          r.getAs[Long]("p_micro"), r.getAs[Long]("rank"))).toMap
    assert(got.size === items.size)
    items.foreach { i =>
      val (gn, gw, gp, _) = got(i)
      assert(gn === ntot(i), i)
      assert(gw === wins(i), i)
      assert(gp === p(i).toLong, i)
    }
    // normalization: strengths sum to <= 1e6 (floor divisions) and
    // ranks are the deterministic (p desc, brand asc) order
    assert(got.values.map(_._3).sum <= 1000000L)
    val expRank = items.sortBy(i => (-p(i), i)).zipWithIndex
      .map { case (i, idx) => i -> (idx + 1).toLong }.toMap
    items.foreach(i => assert(got(i)._4 === expRank(i), i))
  }
}
