package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, JoinsSetOps, TextAnalysis}

/** Specs for the round-6 pipeline operators: histogram, blocked fuzzy
  * join, gap-fill LOCF, CDC apply, PII redaction, inverted index. */
class PipelineOpsSpec extends SparkSpec {

  test("histogram: bins partition all orders, edges ordered") {
    val df = Analytics.histogram(spark, sf).cache()
    val orders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(df.agg(sum("n")).collect()(0).getLong(0) === orders)
    assert(df.filter(col("bin") < 0 || col("bin") > 19).count() === 0)
    assert(df.filter(col("lo") >= col("hi")).count() === 0)
    df.unpersist()
  }

  test("fuzzy join: blocked candidates only, verified distance, canonical order") {
    val df = JoinsSetOps.fuzzyJoin(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("name_a") >= col("name_b")).count() === 0)
    assert(df.filter(col("lev") > 3 || col("lev") < 1).count() === 0)
    // every pair shares its blocking key (the last name token)
    val crossBlock = df.filter(
      element_at(split(col("name_a"), " "), -1) =!=
        element_at(split(col("name_b"), " "), -1)).count()
    assert(crossBlock === 0)
    df.unpersist()
  }

  test("gap fill: contiguous hourly spine per user, LOCF fills every gap") {
    val df = Analytics.gapFillLocf(spark, sf).cache()
    // spine is contiguous: rows per user == hours between min and max + 1
    val bad = df.groupBy("user_id")
      .agg(count(lit(1)).as("rows"),
        ((unix_timestamp(max(col("hr"))) - unix_timestamp(min(col("hr"))))
          / 3600 + 1).as("expect"))
      .filter(col("rows") =!= col("expect"))
    assert(bad.count() === 0)
    // after the first observation, every row is filled
    assert(df.filter(col("v_filled").isNull && !col("is_gap")).count() === 0)
    // real observations are never marked as gaps with a null fill
    assert(df.filter(!col("is_gap")).count() > 0)
    df.unpersist()
  }

  test("cdc apply: delete-terminated keys drop out, last-writer wins") {
    val df = Analytics.cdcApply(spark, sf).cache()
    assert(df.filter(col("last_op") === "D").count() === 0)
    // cross-check against an independent window formulation
    val ev = spark.read.parquet(s"$sf/events.parquet")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val expect = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .count()
    assert(df.count() === expect)
    df.unpersist()
  }

  test("pii redact: every synthesized email and phone found and removed") {
    val df = TextAnalysis.piiRedact(spark, sf).cache()
    assert(df.count() === 20)
    assert(df.filter(col("n_email") =!= 1 || col("n_phone") =!= 1)
      .count() === 0)
    assert(df.filter(!col("tail").contains("<PHONE>")).count() === 0)
    assert(df.filter(col("tail").contains("@example.com")).count() === 0)
    df.unpersist()
  }

  test("pagerank: conserves scaled mass within damping, supplier-heavy top") {
    val df = graft.operators.Graph.pagerank(spark, sf).cache()
    // top-20 cap; sf0.001 has only 10 suppliers
    assert(df.count() > 0 && df.count() <= 20)
    // every rank has the 0.15·R0 floor and stays positive/bounded
    assert(df.filter(col("pr") < 150000L).count() === 0)
    // ranks are non-trivial: the top supplier outranks the floor
    assert(df.agg(max("pr")).collect()(0).getLong(0) > 150000L)
    // deterministic: a second evaluation is byte-identical
    val again = graft.operators.Graph.pagerank(spark, sf)
    assert(df.exceptAll(again).count() === 0)
    assert(again.exceptAll(df).count() === 0)
    df.unpersist()
  }

  test("triangles: degree-oriented count equals the id-oriented join") {
    val row = graft.operators.Graph.triangles(spark, sf).collect()(0)
    // reference: the oracle's id-ordered orientation, run through Spark
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = l.as("a").join(l.as("b"), Seq("ok"))
      .filter(col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct().cache()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .count()
    assert(row.getAs[Long]("n_triangles") === tri)
    assert(row.getAs[Long]("n_edges") === e.count())
    assert(row.getAs[Long]("n_wedges") >= tri * 3)
    assert(row.getAs[Long]("closure_ppm") ===
      3000000L * tri / row.getAs[Long]("n_wedges"))
    e.unpersist()
  }

  test("bpe pairs: counts match a direct corpus scan") {
    val df = TextAnalysis.bpePairs(spark, sf).cache()
    assert(df.count() === 20)
    // weighted vocab expansion == counting pairs over the raw corpus
    val direct = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "" && length(col("word")) >= 2)
      .select(col("word"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(expr("substring(word, i, 2)").as("pair"))
      .groupBy("pair").count()
    val joined = df.join(direct, "pair")
      .filter(col("cnt") =!= col("count"))
    assert(joined.count() === 0)
    df.unpersist()
  }

  test("domain cap: at most 10 kept per source, ranks contiguous") {
    val df = graft.operators.Sampling.domainCap(spark, sf).cache()
    val per = df.groupBy("source")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"))
    assert(per.filter(col("n") > 10).count() === 0)
    // ranks are 1..n with no gaps (rank == count per source)
    assert(per.filter(col("n") =!= col("mx")).count() === 0)
    // sources under the cap keep everything
    val totals = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source").agg(count(lit(1)).as("total"))
    val under = per.join(totals, "source")
      .filter(col("total") <= 10 && col("n") =!= col("total"))
    assert(under.count() === 0)
    df.unpersist()
  }

  test("vec normalize: norms positive, components within [-1, 1]") {
    val df = graft.operators.Similarity.vecNormalize(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("norm_r") <= 0).count() === 0)
    assert(df.filter(abs(col("first_r")) > 1.0 ||
      abs(col("min_r")) > 1.0 || abs(col("max_r")) > 1.0).count() === 0)
    assert(df.filter(col("min_r") > col("max_r")).count() === 0)
    df.unpersist()
  }

  test("oov rate: integer tallies consistent, rate in [0, 1]") {
    val df = TextAnalysis.oovRate(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("n_oov") > col("n_tokens")).count() === 0)
    assert(df.filter(col("oov_rate") < 0 || col("oov_rate") > 1)
      .count() === 0)
    // tallies cover the whole corpus token stream
    val totalTokens = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tk"))
      .filter(col("tk") =!= "").count()
    assert(df.agg(sum("n_tokens")).collect()(0).getLong(0) === totalTokens)
    df.unpersist()
  }

  test("perplexity buckets: terciles partition each language's docs") {
    val df = graft.operators.TextAnalysis.perplexityBuckets(spark, sf)
      .cache()
    assert(df.filter(col("bucket") < 1 || col("bucket") > 3).count() === 0)
    // bucket doc counts per lang differ by at most 1 (ntile invariant)
    val spread = df.groupBy("lang")
      .agg((max("n_docs") - min("n_docs")).as("d"))
      .filter(col("d") > 1)
    assert(spread.count() === 0)
    // head bucket scores dominate tail bucket scores within each lang
    val h = df.filter(col("bucket") === 1)
      .select(col("lang"), col("min_score").as("head_min"))
    val t3 = df.filter(col("bucket") === 3)
      .select(col("lang"), col("max_score").as("tail_max"))
    assert(h.join(t3, "lang").filter(col("head_min") < col("tail_max"))
      .count() === 0)
    df.unpersist()
  }

  test("shard manifest: shards partition the corpus, checksum is exact") {
    val df = graft.operators.Layout.shardManifest(spark, sf).cache()
    assert(df.count() <= 8)
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(df.agg(sum("n_docs")).collect()(0).getLong(0) === docs)
    // checksum is an order-independent integer: re-evaluation matches
    val again = graft.operators.Layout.shardManifest(spark, sf)
      .withColumnRenamed("checksum", "ck2").select("shard", "ck2")
    assert(df.join(again, "shard")
      .filter(col("checksum") =!= col("ck2")).count() === 0)
    df.unpersist()
  }

  test("skew profile: shares and skew factors consistent with counts") {
    val df = graft.operators.SkewJoin.skewProfile(spark, sf).cache()
    assert(df.count() === 20)
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    // ppm share recomputes from the raw count (integer division)
    assert(df.filter(col("share_ppm") =!=
      expr(s"(cnt * 1000000) div $total")).count() === 0)
    // heavy keys: every listed key is at least the mean (skew >= 1000)
    assert(df.filter(col("skew_x1000") < 1000).count() === 0)
    df.unpersist()
  }

  test("degree stats: node totals match, buckets cover degrees") {
    val df = graft.operators.Graph.degreeStats(spark, sf).cache()
    // bucket bound: 2^(bucket-1) <= min_deg <= max_deg < 2^bucket
    assert(df.filter(col("min_deg") <
      pow(lit(2.0), col("bucket") - 1).cast("long")).count() === 0)
    assert(df.filter(col("max_deg") >=
      pow(lit(2.0), col("bucket")).cast("long")).count() === 0)
    // per-side node totals equal the distinct key counts in the pair list
    val pairs = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().cache()
    val nCust = pairs.select("o_custkey").distinct().count()
    val nSupp = pairs.select("l_suppkey").distinct().count()
    val bySide = df.groupBy("side").agg(sum("n_nodes").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySide("customer") === nCust)
    assert(bySide("supplier") === nSupp)
    pairs.unpersist(); df.unpersist()
  }

  test("range frame: trailing-hour sums match a self-join recompute") {
    val df = Analytics.rangeFrame(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("n_1h") < 1).count() === 0)
    // independent recompute: value-range self-join (inclusive 3600s window)
    val e = df.select(col("user_id"), col("event_id"), col("sec"),
      col("cents_1h")).cache()
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("user_id") < 50)
      .select(col("user_id").as("u2"), col("ts").cast("long").as("s2"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c2"))
    val recomputed = e.join(ev, col("user_id") === col("u2") &&
        col("s2") >= col("sec") - 3599 && col("s2") <= col("sec"))
      .groupBy(col("event_id")).agg(sum(col("c2")).as("expect"))
    val bad = e.join(recomputed, "event_id")
      .filter(col("cents_1h") =!= col("expect"))
    assert(bad.count() === 0)
    e.unpersist(); df.unpersist()
  }

  test("unpivot: three rows per nation, values round-trip the wide form") {
    val df = graft.operators.Reshape.unpivotMetrics(spark, sf).cache()
    val nations = df.select("nation_id").distinct().count()
    assert(df.count() === nations * 3)
    val metrics = df.select("metric").distinct().collect()
      .map(_.getString(0)).sorted
    assert(metrics === Array("bal_cents", "max_custkey", "n_customers"))
    // n_customers metric sums back to the customer row count
    val total = df.filter(col("metric") === "n_customers")
      .agg(sum("value")).collect()(0).getLong(0)
    assert(total ===
      spark.read.parquet(s"$sf/customer.parquet").count())
    df.unpersist()
  }

  test("mode per group: argmax matches the window formulation") {
    val df = Analytics.modePerGroup(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("n_top") > col("n_total")).count() === 0)
    import org.apache.spark.sql.expressions.Window
    val c = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("user_id") < 200)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("c").desc, col("event_type").asc)
    val viaWindow = c.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("wt"),
        col("c").as("wc"))
    val bad = df.join(viaWindow, "user_id")
      .filter(col("top_type") =!= col("wt") || col("n_top") =!= col("wc"))
    assert(bad.count() === 0)
    df.unpersist()
  }

  test("equi-depth bins: bins cover all rows, depths near-balanced") {
    val df = Analytics.equidepthBins(spark, sf).cache()
    val orders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(df.agg(sum("n")).collect()(0).getLong(0) === orders)
    assert(df.filter(col("bin") < 0 || col("bin") > 9).count() === 0)
    assert(df.filter(col("min_price") > col("max_price")).count() === 0)
    // equi-depth property: no bin holds more than 2x its fair share
    assert(df.filter(col("n") > orders / 5).count() === 0)
    df.unpersist()
  }

  test("rolling dau: every event lands in exactly two sliding windows") {
    val df = Analytics.rollingActiveUsers(spark, sf).cache()
    val events = spark.read.parquet(s"$sf/events.parquet").count()
    assert(df.agg(sum("n_events")).collect()(0).getLong(0) === 2 * events)
    assert(df.filter(col("active_users") > col("n_events")).count() === 0)
    assert(df.filter(col("active_users") < 1).count() === 0)
    df.unpersist()
  }

  test("feature map: sorted type:count string matches per-type counts") {
    val df = Analytics.featureMap(spark, sf).cache()
    assert(df.count() > 0)
    // features holds exactly n_types entries, sorted by type
    val bad = df.filter(size(split(col("features"), ",")) =!= col("n_types"))
    assert(bad.count() === 0)
    val unsorted = df.filter(
      array_join(array_sort(split(col("features"), ",")), ",")
        =!= col("features"))
    assert(unsorted.count() === 0)
    // counts in the string sum to n_events
    val sums = df.withColumn("parsed",
      aggregate(transform(split(col("features"), ","),
        e => element_at(split(e, ":"), 2).cast("long")),
        lit(0L), (a, x) => a + x))
    assert(sums.filter(col("parsed") =!= col("n_events")).count() === 0)
    df.unpersist()
  }

  test("event pattern: literal substring counts match a manual recompute") {
    val df = Analytics.eventPattern(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("n_quick_conversions") < 0 ||
      col("n_error_bursts") < 0).count() === 0)
    // recompute one user's sequence with a window and compare
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    val seqs = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("user_id") < 100)
      .withColumn("sec", col("ts").cast("long"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("user_id"))
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("rn").as("r"), col("event_type").as("t")))),
        s => s.getField("t")), ",").as("seq2"))
      .select(col("user_id"),
        regexp_count(col("seq2"), lit("click,purchase")).cast("int")
          .as("cp2"))
    val bad = df.join(seqs, "user_id")
      .filter(col("n_quick_conversions") =!= col("cp2"))
    assert(bad.count() === 0)
    df.unpersist()
  }

  test("interval index: bucketed equi-join equals the direct interval join") {
    val df = graft.operators.JoinsSetOps.intervalIndex(spark, sf).cache()
    assert(df.count() > 0)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val direct = orders
      .filter(col("o_totalprice") >= 0 && col("o_totalprice") < 600000)
      .count()
    assert(df.agg(sum("n")).collect()(0).getLong(0) === direct)
    // band bounds respected
    val bands = (0 until 10).map(i => (i.toLong, i.toLong * i * 6000,
      (i + 1L) * (i + 1) * 6000))
    bands.foreach { case (b, lo, hi) =>
      val row = df.filter(col("band") === b).collect()
      row.foreach { r =>
        assert(r.getAs[Double]("min_price") >= lo)
        assert(r.getAs[Double]("max_price") < hi)
      }
    }
    df.unpersist()
  }

  test("schema evolution: pre-schema rows audit as exactly the 1997 slice") {
    val df = graft.operators.Relational.schemaEvolution(spark, sf).cache()
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val y97 = o.filter(graft.operators.Relational.inYear(
      col("o_orderdate"), 1997)).count()
    val y98 = o.filter(graft.operators.Relational.inYear(
      col("o_orderdate"), 1998)).count()
    val pre = df.filter(col("priority") === "<pre-schema>")
      .agg(sum("n")).collect()(0).getLong(0)
    assert(pre === y97)
    assert(df.agg(sum("n")).collect()(0).getLong(0) === y97 + y98)
    df.unpersist()
  }

  test("setops all: bag multiplicities obey min/difference identities") {
    val df = graft.operators.JoinsSetOps.setOpsAll(spark, sf).cache()
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = spark.read.parquet(s"$sf/orders.parquet")
    def custs(y: Int) = o.filter(graft.operators.Relational.inYear(
      col("o_orderdate"), y)).select(col("o_custkey"))
    val c95 = custs(1995).count()
    // |A ∩all B| + |A \all B| = |A| (bag identity)
    assert(rows("intersect_all") + rows("except_all") === c95)
    // bag intersection is at least the set intersection
    val setInter = custs(1995).intersect(custs(1996)).count()
    assert(rows("intersect_all") >= setInter)
    df.unpersist()
  }

  test("rank trio: gaps after ties for rank, none for dense_rank, " +
      "row_number total") {
    val df = Analytics.rankTrio(spark, sf).cache()
    assert(df.count() > 0)
    // row_number is 1..n per customer
    val per = df.groupBy("cust_id")
      .agg(count(lit(1)).as("n"), max("rn").as("mx"))
    assert(per.filter(col("n") =!= col("mx")).count() === 0)
    // dense_rank never exceeds rank; both never exceed row count
    assert(df.filter(col("drnk") > col("rnk")).count() === 0)
    val joined = df.join(per, "cust_id")
    assert(joined.filter(col("rnk") > col("n")).count() === 0)
    // ties exist in the fixture (the trio actually diverges somewhere)
    assert(df.filter(col("rnk") =!= col("drnk")).count() > 0)
    df.unpersist()
  }

  test("jsonl source: declared-schema read round-trips the staged feed") {
    val df = graft.operators.Relational.jsonlSource(spark, sf).cache()
    val direct = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_id") < 2000).count()
    assert(df.agg(sum("n")).collect()(0).getLong(0) === direct)
    assert(df.filter(col("n_users") > col("n")).count() === 0)
    df.unpersist()
  }

  test("orc roundtrip: slice counts and key ranges survive the format") {
    val df = graft.operators.Relational.orcRoundTrip(spark, sf).cache()
    val direct = spark.read.parquet(s"$sf/orders.parquet")
      .filter(graft.operators.Relational.inYear(col("o_orderdate"), 1997))
    assert(df.agg(sum("n")).collect()(0).getLong(0) === direct.count())
    assert(df.filter(col("min_key") > col("max_key")).count() === 0)
    df.unpersist()
  }

  test("shipping priority: top-10 descending revenue, all positive") {
    val df = graft.operators.JoinsSetOps.shippingPriority(spark, sf).cache()
    assert(df.count() <= 10 && df.count() > 0)
    assert(df.filter(col("revenue_cents") <= 0 || col("n_lines") < 1)
      .count() === 0)
    val revs = df.select("revenue_cents").collect().map(_.getLong(0))
    assert(revs.sameElements(revs.sorted(Ordering[Long].reverse)))
    df.unpersist()
  }

  test("returned items: only R-flag revenue counted, quarter respected") {
    val df = graft.operators.JoinsSetOps.returnedItems(spark, sf).cache()
    assert(df.count() > 0 && df.count() <= 20)
    assert(df.filter(col("lost_cents") <= 0).count() === 0)
    // independent recompute of one customer's lost revenue
    val top = df.head()
    val cust = top.getAs[Long]("cust_id")
    val direct = spark.sql(s"""
      SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
        + 0.5) AS BIGINT)) AS BIGINT) AS c
      FROM parquet.`$sf/orders.parquet` o
        JOIN parquet.`$sf/lineitem.parquet` l ON o_orderkey = l_orderkey
      WHERE o_custkey = $cust AND l_returnflag = 'R'
        AND o_orderdate >= '1995-10-01' AND o_orderdate < '1996-01-01'
      """).collect()(0).getLong(0)
    assert(top.getAs[Long]("lost_cents") === direct)
    df.unpersist()
  }

  test("null-safe join: the NULL-key group survives the join") {
    val df = graft.operators.JoinsSetOps.nullSafeJoin(spark, sf).cache()
    // one row per distinct nullable status, INCLUDING the null group
    assert(df.filter(col("status") === "<null>").count() === 1)
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val nullCount = o.filter(col("o_orderstatus") === "O").count()
    assert(df.filter(col("status") === "<null>")
      .head().getAs[Long]("n_a") === nullCount)
    df.unpersist()
  }

  test("url normalize: canonical form collapses case/utm/slash variants") {
    val df = TextAnalysis.urlNormalize(spark, sf).cache()
    assert(df.count() > 0)
    // every reported group genuinely collapses ≥2 distinct raw forms
    assert(df.filter(col("n_variants") < 2).count() === 0)
    assert(df.filter(col("n_raw") < col("n_variants")).count() === 0)
    // canonical URLs carry no tracking params, no trailing slash, and a
    // lowercase scheme+host
    assert(df.filter(col("canon").contains("utm_")).count() === 0)
    assert(df.filter(col("canon").endsWith("/")).count() === 0)
    assert(df.filter(!col("canon").startsWith("http://www.")).count() === 0)
    df.unpersist()
  }

  test("filtered aggs: filtered counts bounded, weighted avg within range") {
    val df = Analytics.filteredAggs(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("n_discounted") > col("n") ||
      col("n_bulk") > col("n")).count() === 0)
    // weighted avg lies within the per-flag price min/max
    val bounds = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_returnflag").as("flag"))
      .agg(min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
    val bad = df.join(bounds, "flag")
      .filter(col("wavg_price") < col("lo") || col("wavg_price") > col("hi"))
    assert(bad.count() === 0)
    df.unpersist()
  }

  test("topk agg: bounded-heap result equals window rank at any partitioning") {
    import graft.functions.TopKAgg
    import org.apache.spark.sql.expressions.Window
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    def viaAgg(parts: Int) = o.repartition(parts)
      .groupBy(col("o_custkey"))
      .agg(TopKAgg.topK(col("cents"), col("o_orderkey"), 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("o_custkey"), col("pos"), col("s.id"), col("s.key"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("cents").desc, col("o_orderkey").asc)
    val viaWindow = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), (col("rn") - 1).cast("int").as("pos"),
        col("o_orderkey").as("id"), col("cents").as("key"))
    Seq(1, 7).foreach { p =>
      val a = viaAgg(p)
      assert(a.exceptAll(viaWindow).count() === 0, s"parts=$p extra rows")
      assert(viaWindow.exceptAll(a).count() === 0, s"parts=$p missing rows")
    }
  }

  test("inverted index: postings rank-truncated to 5, df counts full set") {
    val df = TextAnalysis.invertedIndex(spark, sf).cache()
    assert(df.count() > 0)
    val withLen = df.withColumn("np",
      when(col("postings") === "", lit(0))
        .otherwise(size(split(col("postings"), ","))))
    assert(withLen.filter(col("np") > 5).count() === 0)
    assert(withLen.filter(col("np") > col("df")).count() === 0)
    // spot-check one token's df against a direct distinct count
    val tok = df.orderBy(col("df").desc).select("token")
      .head().getString(0)
    val direct = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
      .filter(col("tk") === tok).select("doc_id").distinct().count()
    assert(df.filter(col("token") === tok).head().getAs[Long]("df")
      === direct)
    df.unpersist()
  }

  test("next-item eval: leave-last-out hit@3 equals a sequential " +
      "recompute of the co-purchase recommender and the pop baseline") {
    import graft.operators.Graph
    val row = Graph.nextItemEval(spark, sf).collect()(0)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey", "o_orderkey",
        "CAST(o_orderdate AS TIMESTAMP_LTZ) AS t")
      .selectExpr("o_custkey", "o_orderkey", "CAST(t AS LONG) AS sec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (ok, ps) => ok -> ps.map(_._2).toSet }
    val pairN = scala.collection.mutable
      .Map.empty[(Long, Long), Long].withDefaultValue(0L)
    baskets.values.foreach { ps =>
      val s = ps.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.size)
        pairN((s(i), s(j))) += 1
    }
    val sym = pairN.toSeq.filter(_._2 >= 2).flatMap { case ((u, v), n) =>
      Seq((u, v, n), (v, u, n)) }.groupBy(_._1)
    val popTop = baskets.values.toSeq.flatten
      .groupBy(identity).map { case (p, xs) => (p, xs.size) }.toSeq
      .sortBy { case (p, f) => (-f, p) }.take(3).map(_._1).toSet
    var (nc, hit, pop) = (0L, 0L, 0L)
    orders.groupBy(_._1).foreach { case (_, os) =>
      if (os.length >= 2) {
        val sorted = os.sortBy(o => (-o._3, -o._2))
        val truth = baskets.getOrElse(sorted(0)._2, Set.empty)
        val qps = baskets.getOrElse(sorted(1)._2, Set.empty)
        nc += 1
        val scores = qps.toSeq.flatMap(q => sym.getOrElse(q, Nil))
          .groupBy(_._2).map { case (b, xs) => (b, xs.map(_._3).sum) }
        val top3 = scores.toSeq.sortBy { case (b, s) => (-s, b) }
          .take(3).map(_._1)
        if (top3.exists(truth)) hit += 1
        if (truth.exists(popTop)) pop += 1
      }
    }
    assert(row.getAs[Long]("n_customers") === nc)
    assert(row.getAs[Long]("hits_at3") === hit)
    assert(row.getAs[Long]("pop_hits_at3") === pop)
  }

  test("ring rebalance: ownership recomputed from the md5 ring; " +
      "every moved key lands on the new node") {
    import graft.operators.Layout
    def h32(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val got = Layout.ringRebalance(spark, sf).collect()
      .map(r => (r.getAs[Long]("owner8"), r.getAs[Long]("owner9")) ->
        (r.getAs[Long]("n_keys"), r.getAs[Boolean]("moved"))).toMap
    val ring = for (n <- 0 until 9; v <- 0 until 16) yield {
      val pos = h32(s"ring:n$n:$v")
      (n.toLong, pos * 256L + n * 16L + v, pos)
    }
    def owner(keyPos: Long, nNodes: Int): Long = {
      val r = ring.filter(_._1 < nNodes)
      val succ = r.filter(_._3 >= keyPos).map(_._2)
      val rk = if (succ.nonEmpty) succ.min else r.map(_._2).min
      (rk % 256L) / 16L
    }
    val keys = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0))
    val expect = keys.groupBy { k =>
      val kp = h32(s"key:$k")
      (owner(kp, 8), owner(kp, 9))
    }.map { case (o, ks) =>
      o -> (ks.length.toLong, o._1 != o._2) }
    assert(got === expect)
    // the consistent-hashing theorem: moves only ever target node 8
    got.foreach { case ((_, o9), (_, moved)) =>
      if (moved) assert(o9 === 8L) }
    assert(got.exists(_._2._2)) // and some keys did move
  }

  test("dbscan: roles, clusters and neighbor counts equal a " +
      "brute-force union-find recompute") {
    import graft.operators.Graph
    val got = Graph.dbscan(spark, sf).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("role"),
          Option(r.getAs[java.lang.Long]("cluster")).map(_.toLong),
          r.getAs[Long]("n_in"))).toMap
    // from scratch: same synthetic geography, brute-force O(n²) pairs
    def h32(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val ids = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0))
    val pts = ids.map { id =>
      val lat = 40000000L + h32(s"lat:$id") % 1000000L
      val slon = (106000000L + h32(s"lon:$id") % 1000000L) * 7604L / 10000L
      id -> (lat, slon)
    }.toMap
    val eps = math.floor(
      math.sqrt(2.0 * 760400000000.0 / (math.Pi * ids.length))).toLong
    def near(a: Long, b: Long): Boolean = {
      val (la, sa) = pts(a); val (lb, sb) = pts(b)
      (la - lb) * (la - lb) + (sa - sb) * (sa - sb) <= eps * eps
    }
    val nin = ids.map(a => a -> ids.count(b => near(a, b))).toMap
    val cores = ids.filter(nin(_) >= 4L).toSet
    // union-find over core-core in-disc pairs
    val parent = scala.collection.mutable.Map(
      cores.map(c => c -> c).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- cores; b <- cores if a < b && near(a, b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comp = cores.map(c => c -> find(c)).toMap
    ids.foreach { id =>
      val (role, cluster) =
        if (cores(id)) ("core", Some(comp(id)))
        else {
          val coreNbrs = cores.filter(near(id, _))
          if (coreNbrs.nonEmpty) ("border", Some(coreNbrs.map(comp).min))
          else ("noise", None)
        }
      assert(got(id) === ((role, cluster, nin(id))), s"id=$id")
    }
    // the density scaling produced a non-degenerate mix at this SF
    val roles = got.values.map(_._1).toSet
    assert(roles.contains("core") && roles.contains("noise"))
  }

  test("k-core: planted chain-into-triangle peels in a multi-round " +
      "cascade; sf result equals brute-force peel") {
    import graft.operators.Graph
    import spark.implicits._
    // triangle 1-2-3 plus pendant chain 3-4-5-6: node 6 falls first,
    // then 5, then 4 — three cascading rounds before the fixpoint
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L))
    val sym = (und ++ und.map(e => (e._2, e._1))).toDF("src", "dst")
    val core = Graph.coreOf(sym, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core === Set((1L, 2L), (2L, 3L), (1L, 3L), (2L, 1L),
      (3L, 2L), (3L, 1L)), s"2-core should be exactly the triangle: $core")
    // full-query result equals an independent Scala peel at sf0.001
    val got = Graph.kcore(spark, sf).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("deg")).toMap
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    baskets.groupBy(_._1).values.foreach { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        pairCounts((ps(i), ps(j))) =
          pairCounts.getOrElse((ps(i), ps(j)), 0) + 1
    }
    var edges = pairCounts.filter(_._2 >= 2).keySet
      .flatMap(e => Seq(e, e.swap)).toSet
    var stable = false
    while (!stable) {
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 2).keySet
      val nxt = edges.filter(e => keep(e._1) && keep(e._2))
      stable = nxt == edges
      edges = nxt
    }
    val expected = edges.groupBy(_._1).view
      .mapValues(_.size.toLong).toMap
    assert(got === expected)
    got.values.foreach(d => assert(d >= 2))
  }

  test("label propagation: planted bridge graph + brute-force rounds at sf") {
    import graft.operators.Graph
    import spark.implicits._
    def bruteLpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lab = adj.keySet.map(n => n -> n).toMap
      for (_ <- 1 to rounds) {
        lab = adj.map { case (n, nbrs) =>
          val counts = nbrs.groupBy(x => lab(x)).view.mapValues(_.size)
          n -> counts.toSeq.map { case (l, c) => (-c.toLong, l) }.min._2
        }
      }
      lab
    }
    // two triangles bridged by one edge: min labels win inside each
    // clique; 4 rounds let label 1 leak across the bridge per the rule —
    // whatever the outcome, engine == independent recompute
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L))
    val symSeq = und ++ und.map(e => (e._2, e._1))
    val got = Graph.lpaOf(symSeq.toDF("src", "dst"), 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === bruteLpa(symSeq, 4))
    // full declared query at sf0.001 equals brute force on the real graph
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    baskets.groupBy(_._1).values.foreach { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        pairCounts((ps(i), ps(j))) =
          pairCounts.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val sfSym = pairCounts.filter(_._2 >= 2).keys.toSeq
      .flatMap(e => Seq(e, e.swap))
    val lab = bruteLpa(sfSym, 4)
    val expected = lab.groupBy(_._2).map { case (community, m) =>
      community -> ((m.size.toLong, m.keys.min, m.keys.max))
    }
    val gotQ = Graph.labelPropagation(spark, sf).collect().map(r =>
      r.getAs[Long]("community") -> ((r.getAs[Long]("n_members"),
        r.getAs[Long]("min_node"), r.getAs[Long]("max_node")))).toMap
    assert(gotQ === expected)
  }

  test("rake keywords: degree/frequency scores equal a sequential " +
      "phrase-splitting recompute") {
    val stops = TextAnalysis.stopwords("en").toSet
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
    val freq = scala.collection.mutable.Map.empty[String, Long]
    val deg = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { text =>
      // phrases: maximal stopword-free runs
      val phrases = text.split(" ", -1).foldLeft(List(List.empty[String])) {
        case (acc, tok) =>
          if (stops(tok)) Nil :: acc
          else (tok :: acc.head) :: acc.tail
      }.map(_.reverse).filter(_.nonEmpty)
      phrases.foreach { p =>
        p.foreach { w =>
          freq(w) = freq.getOrElse(w, 0L) + 1
          deg(w) = deg.getOrElse(w, 0L) + p.length
        }
      }
    }
    val expected = freq.keys.map(w =>
      (w, freq(w), deg(w), deg(w) * 1000000L / freq(w))).toSeq
      .sortBy(t => (-t._4, t._1)).take(20)
    val got = operators.TextAnalysis.rakeKeywords(spark, sf).collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Long]("freq"),
        r.getAs[Long]("deg"), r.getAs[Long]("score_ppm"))).toSeq
    assert(got === expected)
    // degree >= frequency always (each occurrence contributes phrase
    // length >= 1), with equality only for words seen solo
    got.foreach { case (_, f, d, _) => assert(d >= f) }
  }

  test("clustering coefficient: per-node triangle credit equals a " +
      "brute-force neighbor-pair scan; corners conserve 3x the count") {
    import graft.operators.Graph
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    baskets.groupBy(_._1).values.foreach { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        pairCounts((ps(i), ps(j))) =
          pairCounts.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val und = pairCounts.filter(_._2 >= 2).keySet
    val adj = und.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = adj.map { case (v, ns) =>
      val nsSeq = ns.toSeq.sorted
      var tri = 0L
      for (i <- nsSeq.indices; j <- (i + 1) until nsSeq.length)
        if (adj(nsSeq(i)).contains(nsSeq(j))) tri += 1
      val deg = ns.size.toLong
      v -> ((deg, tri,
        if (deg >= 2) Some(2L * tri * 1000000L / (deg * (deg - 1)))
        else None))
    }
    val got = Graph.clusteringCoeff(spark, sf).collect().map(r =>
      r.getAs[Long]("node") -> ((r.getAs[Long]("deg"),
        r.getAs[Long]("tri_n"),
        if (r.isNullAt(r.fieldIndex("lcc_ppm"))) None
        else Some(r.getAs[Long]("lcc_ppm"))))).toMap
    assert(got === expected)
    // every triangle credits its three corners exactly once
    val triTotal = expected.values.map(_._2).sum
    assert(triTotal % 3 === 0 || triTotal === 0)
  }

  test("modularity: exact integer identity against a brute-force " +
      "recompute; degree and edge masses conserve") {
    import graft.operators.Graph
    def bruteLpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lab = adj.keySet.map(n => n -> n).toMap
      for (_ <- 1 to rounds) {
        lab = adj.map { case (n, nbrs) =>
          val counts = nbrs.groupBy(x => lab(x)).view.mapValues(_.size)
          n -> counts.toSeq.map { case (l, c) => (-c.toLong, l) }.min._2
        }
      }
      lab
    }
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    baskets.groupBy(_._1).values.foreach { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        pairCounts((ps(i), ps(j))) =
          pairCounts.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val und = pairCounts.filter(_._2 >= 2).keys.toSeq
    val sym = und.flatMap(e => Seq(e, e.swap))
    val lab = bruteLpa(sym, 4)
    val m = und.length.toLong
    val deg = sym.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val expected = lab.groupBy(_._2).map { case (c, members) =>
      val nodes = members.keySet
      val dSum = nodes.toSeq.map(deg).sum
      val eIn = und.count(e => lab(e._1) == lab(e._2) &&
        lab(e._1) == c).toLong
      c -> ((members.size.toLong, dSum, eIn, 4L * m * eIn - dSum * dSum))
    }
    val got = Graph.modularity(spark, sf).collect().map(r =>
      r.getAs[Long]("community") -> ((r.getAs[Long]("n_members"),
        r.getAs[Long]("d_sum"), r.getAs[Long]("e_in"),
        r.getAs[Long]("q_num")))).toMap
    assert(got === expected)
    // conservation: Σ d_c = 2m and Σ e_c ≤ m (cross-community edges
    // are the slack); modularity itself stays in [-1/2, 1)
    assert(got.values.map(_._2).sum === 2 * m)
    assert(got.values.map(_._3).sum <= m)
    val q = got.values.map(_._4.toDouble).sum / (4.0 * m * m)
    assert(q >= -0.5 && q < 1.0)
  }

  test("louvain: census equals a sequential 4-sweep parity-damped " +
      "local-move recompute; optimized modularity beats the LPA " +
      "partition's") {
    import graft.operators.Graph
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    baskets.groupBy(_._1).values.foreach { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        pairCounts((ps(i), ps(j))) =
          pairCounts.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val und = pairCounts.filter(_._2 >= 2).keys.toSeq
    val sym = und.flatMap(e => Seq(e, e.swap))
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.length.toLong).toMap
    val m = und.length.toLong
    var lab = adj.keySet.map(n => n -> n).toMap
    for (r <- 1 to 4) {
      val dc = lab.toSeq.groupBy(_._2).view
        .mapValues(_.map(x => deg(x._1)).sum).toMap
      lab = lab.map { case (n, own) =>
        if (n % 2 != r % 2) n -> own // parity damping: keepers hold
        else {
          val kic = adj(n).groupBy(lab).view
            .mapValues(_.size.toLong).toMap
          n -> (kic.keySet + own).toSeq.map { c =>
            val k = kic.getOrElse(c, 0L)
            val d = dc(c) - (if (c == own) deg(n) else 0L)
            // ties prefer staying, then the smallest community id
            (-(2L * m * k - deg(n) * d), if (c == own) 0L else 1L, c)
          }.min._3
        }
      }
    }
    val expected = lab.groupBy(_._2).map { case (c, members) =>
      val dSum = members.keySet.toSeq.map(deg).sum
      val eIn = und.count(e => lab(e._1) == lab(e._2) &&
        lab(e._1) == c).toLong
      c -> ((members.size.toLong, dSum, eIn, 4L * m * eIn - dSum * dSum))
    }
    val got = Graph.louvain(spark, sf).collect().map(r =>
      r.getAs[Long]("community") -> ((r.getAs[Long]("n_members"),
        r.getAs[Long]("d_sum"), r.getAs[Long]("e_in"),
        r.getAs[Long]("q_num")))).toMap
    assert(got === expected)
    // the point of the operator: it OPTIMIZES the objective q256 only
    // scores — Σ q_num (∝ Q at fixed m) must beat the LPA partition
    val qLouvain = got.values.map(x => BigInt(x._4)).sum
    val qLpa = Graph.modularity(spark, sf).collect()
      .map(r => BigInt(r.getAs[Long]("q_num"))).sum
    assert(qLouvain >= qLpa, s"louvain $qLouvain < lpa $qLpa")
  }

  test("louvain two-level: census equals a sequential coarsen+sweep " +
      "recompute; coarsening strictly helps the level-1 partition") {
    import graft.operators.Graph
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    baskets.groupBy(_._1).values.foreach { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        pairCounts((ps(i), ps(j))) =
          pairCounts.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val und = pairCounts.filter(_._2 >= 2).keys.toSeq
    val m = und.length.toLong
    // weighted parity-damped sweeps — the same core at both levels
    def sweeps(adjW: Map[Long, Seq[(Long, Long)]], deg: Map[Long, Long],
        rounds: Int): Map[Long, Long] = {
      var lab = adjW.keySet.map(n => n -> n).toMap
      for (r <- 1 to rounds) {
        val dc = lab.toSeq.groupBy(_._2).view
          .mapValues(_.map(x => deg(x._1)).sum).toMap
        lab = lab.map { case (n, own) =>
          if (n % 2 != r % 2) n -> own
          else {
            val kic = adjW(n).groupBy(e => lab(e._1)).view
              .mapValues(_.map(_._2).sum).toMap
            n -> (kic.keySet + own).toSeq.map { c =>
              val k = kic.getOrElse(c, 0L)
              val d = dc(c) - (if (c == own) deg(n) else 0L)
              (-(2L * m * k - deg(n) * d), if (c == own) 0L else 1L, c)
            }.min._3
          }
        }
      }
      lab
    }
    val sym = und.flatMap(e => Seq(e, e.swap))
    val adj1 = sym.groupBy(_._1).view
      .mapValues(_.map(e => (e._2, 1L))).toMap
    val deg1 = adj1.view.mapValues(_.length.toLong).toMap
    val lab1 = sweeps(adj1, deg1, 4)
    // coarsen: inter-community weights, degree mass carried through
    val superW = sym.map { case (a, b) => (lab1(a), lab1(b)) }
      .filter(e => e._1 != e._2)
      .groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.size.toLong).toSeq)
      .toMap
    val sdeg = lab1.toSeq.groupBy(_._2).view
      .mapValues(_.map(x => deg1(x._1)).sum).toMap
    // isolated supernodes (no inter edges) still exist as nodes
    val adj2 = sdeg.keys.map(c =>
      c -> superW.getOrElse(c, Seq.empty)).toMap
    val lab2 = sweeps(adj2, sdeg, 2)
    val fin = lab1.view.mapValues(lab2).toMap
    val expected = fin.groupBy(_._2).map { case (c, members) =>
      val dSum = members.keySet.toSeq.map(deg1).sum
      val eIn = und.count(e => fin(e._1) == fin(e._2) &&
        fin(e._1) == c).toLong
      c -> ((members.size.toLong, dSum, eIn, 4L * m * eIn - dSum * dSum))
    }
    val got = Graph.louvainTwoLevel(spark, sf).collect().map(r =>
      r.getAs[Long]("community") -> ((r.getAs[Long]("n_members"),
        r.getAs[Long]("d_sum"), r.getAs[Long]("e_in"),
        r.getAs[Long]("q_num")))).toMap
    assert(got === expected)
    val q2 = got.values.map(x => BigInt(x._4)).sum
    val q1 = Graph.louvain(spark, sf).collect()
      .map(r => BigInt(r.getAs[Long]("q_num"))).sum
    assert(q2 >= q1, s"two-level $q2 < one-level $q1")
  }

  test("BFS hops: planted path pins hop counts, the horizon, and the " +
      "unreachable NULL class; sf census equals brute-force BFS") {
    import graft.operators.Graph
    import spark.implicits._
    // path 1-2-3-4-5-6-7, seed {1}: hops = index; 6 and 7 lie beyond
    // the 4-hop horizon and must surface as NULL, not be dropped
    val und = (1L to 6L).map(i => (i, i + 1))
    val symSeq = und ++ und.map(e => (e._2, e._1))
    val got = Graph.bfsOf(symSeq.toDF("src", "dst"),
        Seq(1L).toDF("seed"), 4).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(1L -> Some(0L), 2L -> Some(1L), 3L -> Some(2L),
      4L -> Some(3L), 5L -> Some(4L), 6L -> None, 7L -> None))
    // full declared query at sf0.001 equals an independent Scala BFS
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    baskets.groupBy(_._1).values.foreach { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        pairCounts((ps(i), ps(j))) =
          pairCounts.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val sfSym = pairCounts.filter(_._2 >= 2).keys.toSeq
      .flatMap(e => Seq(e, e.swap))
    val adj = sfSym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist = adj.keySet.map(n =>
      n -> (if (n % 97 == 0) Some(0L) else None)).toMap
    for (_ <- 1 to 4) {
      dist = dist.map { case (n, d) =>
        val nbr = adj(n).flatMap(u => dist(u)).map(_ + 1)
        n -> (d.toSeq ++ nbr).minOption
      }
    }
    val expected = dist.groupBy(_._2.map(_.toString).orNull)
      .map { case (hops, m) =>
        hops -> ((m.size.toLong, m.keys.min, m.keys.max)) }
    val gotQ = Graph.bfsHops(spark, sf).collect().map(r =>
      (if (r.isNullAt(r.fieldIndex("hops"))) null
       else r.getAs[Long]("hops").toString) ->
        ((r.getAs[Long]("n_nodes"), r.getAs[Long]("min_node"),
          r.getAs[Long]("max_node")))).toMap
    assert(gotQ === expected)
  }

  test("weighted relaxation: planted detour where the cheap route is NOT " +
      "the fewest-hop route; beyond-horizon nodes surface as NULL") {
    import graft.operators.Graph
    import spark.implicits._
    // 1→4 direct costs 10; 1-2-3-4 at unit costs totals 3: a BFS (hops)
    // would take the direct edge, the weighted relaxation must not —
    // but for nodes PAST 4 the expensive direct edge is the only way to
    // stay inside the 4-edge horizon (6 = 1-4-5-6 at cost 12, where the
    // cheap detour would need 5 edges). 8 needs 5 edges on ANY route —
    // past the horizon, so it must surface NULL.
    val und = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L),
      (4L, 5L, 1L), (5L, 6L, 1L), (6L, 7L, 1L), (7L, 8L, 1L))
    val symSeq = und ++ und.map(e => (e._2, e._1, e._3))
    val got = Graph.spOf(symSeq.toDF("src", "dst", "w"),
        Seq(1L).toDF("seed"), 4).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(1L -> Some(0L), 2L -> Some(1L), 3L -> Some(2L),
      4L -> Some(3L), 5L -> Some(4L), 6L -> Some(12L), 7L -> Some(13L),
      8L -> None))
  }

  test("item similarity: cosine equals a brute-force basket recompute, " +
      "bounded by 1, ordered by similarity") {
    import graft.operators.Graph
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val freq = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.groupBy(_._1).values.foreach { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        pairCounts((ps(i), ps(j))) =
          pairCounts.getOrElse((ps(i), ps(j)), 0L) + 1L
    }
    val expected = pairCounts.filter(_._2 >= 2).toSeq.map {
      case ((u, v), n) =>
        val cos = math.round(n / math.sqrt(
          (freq(u) * freq(v)).toDouble) * 1e9) / 1e9
        (u, v, n, freq(u), freq(v), cos)
    }.sortBy(t => (-t._6, t._1, t._2)).take(20)
    val got = Graph.itemSimilarity(spark, sf).collect().map(r =>
      (r.getAs[Long]("u"), r.getAs[Long]("v"), r.getAs[Long]("pair_n"),
        r.getAs[Long]("freq_u"), r.getAs[Long]("freq_v"),
        r.getAs[Double]("cos"))).toSeq
    assert(got.size === expected.size)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 === e._1 && g._2 === e._2 && g._3 === e._3 &&
        g._4 === e._4 && g._5 === e._5, s"pair mismatch: $g vs $e")
      assert(math.abs(g._6 - e._6) < 1e-9, s"cos mismatch: $g vs $e")
      assert(g._6 > 0.0 && g._6 <= 1.0)
    }
  }

  test("spatial join: grid-bucketed candidates equal a brute-force " +
      "all-pairs radius scan (the 3x3 neighborhood misses nothing)") {
    import graft.operators.JoinsSetOps
    import graft.functions.TextOps
    def coords(df: org.apache.spark.sql.DataFrame, key: String) = df
      .select(col(key).as("k"),
        (lit(40000000L) + TextOps.portableHash(
          concat(lit("lat:"), col(key).cast("string"))) % 1000000L)
          .as("lat"),
        ((lit(106000000L) + TextOps.portableHash(
          concat(lit("lon:"), col(key).cast("string"))) % 1000000L)
          * lit(7604L)).as("lon7604"))
      .collect()
      // per-point scaled longitude, same integer DIV as the operator
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) / 10000L))
    val sup = coords(spark.read.parquet(s"$sf/supplier.parquet"),
      "s_suppkey")
    val cus = coords(spark.read.parquet(s"$sf/customer.parquet"),
      "c_custkey")
    val r2 = 89830L * 89830L
    val expected = sup.map { case (sk, la, slo) =>
      val hits = cus.flatMap { case (ck, cla, cslo) =>
        val dlat = la - cla
        val dslon = slo - cslo
        val d2 = dlat * dlat + dslon * dslon
        if (d2 <= r2) Some((ck, d2)) else None
      }
      val nearest = hits.sortBy(h => (h._2, h._1)).headOption
      sk -> ((hits.length.toLong, nearest.map(_._2), nearest.map(_._1)))
    }.toMap
    val got = JoinsSetOps.spatialJoin(spark, sf).collect().map { r =>
      val d2m = if (r.isNullAt(r.fieldIndex("d2_min"))) None
        else Some(r.getAs[Long]("d2_min"))
      val nc = if (r.isNullAt(r.fieldIndex("nearest_cust"))) None
        else Some(r.getAs[Long]("nearest_cust"))
      r.getAs[Long]("supp") -> ((r.getAs[Long]("n_within"), d2m, nc))
    }.toMap
    assert(got === expected)
    // the fixture must produce real matches or the verify path is idle
    assert(got.values.map(_._1).sum > 0, "no within-radius pairs at sf")
  }

  test("merkle sync: drill-down census equals the planted mutation " +
      "rules and row work is confined to differing buckets") {
    val keys = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val nAdded = keys.count(_ % 103 == 0).toLong
    val nRemoved = keys.count(_ % 101 == 0).toLong
    val nChanged = keys.count(k => k % 97 == 0 && k % 101 != 0).toLong
    val r = graft.operators.Relational.merkleSync(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_buckets") === 64L)
    assert(r.getAs[Long]("n_added") === nAdded)
    assert(r.getAs[Long]("n_removed") === nRemoved)
    assert(r.getAs[Long]("n_changed") === nChanged)
    // the tree must localize: with ~3% planted mutation some buckets
    // stay clean at this SF, so the row-level scan is a strict subset
    val scanned = r.getAs[Long]("n_rows_scanned")
    assert(r.getAs[Long]("n_buckets_differing") > 0)
    assert(r.getAs[Long]("n_buckets_differing") < 64L)
    assert(scanned > 0 && scanned < keys.length.toLong,
      s"scan $scanned should be a strict subset of ${keys.length}")
    // every mutated row lives in a scanned bucket (completeness):
    // mutations <= scanned rows on the v1 side is implied by the class
    // census equality above; also pin the q198 cross-check — the same
    // classes from the full-diff operator
    val full = graft.operators.Relational.tableDiff(spark, sf).collect()
      .map(x => x.getAs[String]("change") -> x.getAs[Long]("n")).toMap
    assert(full.getOrElse("added", 0L) === nAdded)
    assert(full.getOrElse("removed", 0L) === nRemoved)
    assert(full.getOrElse("changed", 0L) === nChanged)
  }

  test("feature propagation: two message-passing rounds equal a " +
      "brute-force neighborhood fold") {
    import graft.operators.Graph
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    baskets.groupBy(_._1).values.foreach { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        pairCounts((ps(i), ps(j))) =
          pairCounts.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val sym = pairCounts.filter(_._2 >= 2).keys.toSeq
      .flatMap(e => Seq(e, e.swap))
    val adj = sym.groupBy(_._2).view.mapValues(_.map(_._1)).toMap // in-nbrs
    val f0 = spark.read.parquet(s"$sf/part.parquet")
      .selectExpr("p_partkey",
        "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS f0")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m1 = adj.map { case (n, nb) =>
      n -> ((nb.length.toLong, nb.map(f0).sum / nb.length)) }
    val m2 = adj.map { case (n, nb) =>
      n -> nb.map(u => m1(u)._2).sum / nb.length }
    val got = Graph.featurePropagation(spark, sf).collect().map(r =>
      r.getAs[Long]("node") -> ((r.getAs[Long]("f0"),
        r.getAs[Long]("deg"), r.getAs[Long]("m1"), r.getAs[Long]("m2"))))
      .toMap
    assert(got.keySet === adj.keySet)
    got.foreach { case (n, (gf0, deg, gm1, gm2)) =>
      assert(gf0 === f0(n), s"node $n f0")
      assert(deg === m1(n)._1, s"node $n deg")
      assert(gm1 === m1(n)._2, s"node $n m1")
      assert(gm2 === m2(n), s"node $n m2")
    }
  }

  test("contract check: compiled rules equal direct recomputes and " +
      "both verdict arms fire") {
    import graft.operators.DataQuality
    val got = DataQuality.contractCheck(spark, sf).collect().map(r =>
      r.getAs[Long]("rule_id") -> ((r.getAs[Long]("n_violations"),
        r.getAs[Boolean]("pass")))).toMap
    assert(got.keySet === (1L to 9L).toSet)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    // rule 9 (price cap the feed exceeds): direct recompute
    val over = orders.filter(col("o_totalprice") > 200000).count()
    assert(got(9L)._1 === over && over > 0 && !got(9L)._2)
    // rule 8 (uniqueness): orderkey is a key -> zero violations
    assert(got(8L) === ((0L, true)))
    // rule 5 (freshness bound 2001 data violates)
    val late = orders.filter(
      col("o_orderdate") > expr("TIMESTAMP '2000-12-31 23:59:59'")).count()
    assert(got(5L)._1 === late && late > 0 && !got(5L)._2)
    assert(got.values.exists(_._2), "no rule passes — fixture broken")
  }

  test("tokenized join equals the raw-id join (join preservation)") {
    import graft.operators.JoinsSetOps
    val tok = JoinsSetOps.tokenizedJoin(spark, sf).collect()
      .map(r => (r.getAs[String]("segment"), r.getAs[String]("event_type"))
        -> ((r.getAs[Long]("n"), r.getAs[Long]("cents"),
          r.getAs[Long]("n_users")))).toMap
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val cu = spark.read.parquet(s"$sf/customer.parquet")
    val raw = ev.join(cu, ev("user_id") === cu("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("cents"),
        countDistinct(col("user_id")).as("n_users"))
      .collect()
      .map(r => (r.getAs[String]("c_mktsegment"),
        r.getAs[String]("event_type"))
        -> ((r.getAs[Long]("n"), r.getAs[Long]("cents"),
          r.getAs[Long]("n_users")))).toMap
    assert(tok === raw)
    assert(tok.nonEmpty)
  }

  test("temporal join: AS-OF rollup equals brute-force interval scan") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("timestamp_ltz").cast("long").as("sec"),
        col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // versions: collapse consecutive same-priority runs per customer
    val versions = orders.groupBy(_._1).view.mapValues { rows =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val vs = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, String)] // (vsec, version, priority)
      var prev: String = null
      var v = 0L
      sorted.foreach { case (_, _, sec, p) =>
        v += 1
        if (prev == null || prev != p) vs += ((sec, v, p))
        prev = p
      }
      vs.toVector
    }.toMap
    // careful: version numbers count COLLAPSED rows (post-filter
    // row_number) — renumber to match
    val renumbered = versions.map { case (c, vs) =>
      c -> vs.zipWithIndex.map { case ((s, _, p), i) => (s, i + 1L, p) }
    }
    val ordByKey = orders.map(r => r._2 -> ((r._1, r._4))).toMap
    val facts = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("timestamp_ltz").cast("long").as("sec"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
          .as("cents")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val agg = scala.collection.mutable
      .Map.empty[Option[String], (Long, Long, Long)]
    facts.foreach { case (okey, _, fsec, cents) =>
      val (cust, own) = ordByKey(okey)
      val valid = renumbered(cust).filter(_._1 <= fsec)
        .sortBy(v => (v._1, v._2)).lastOption.map(_._3)
      val switched = if (valid.exists(_ != own)) 1L else 0L
      val (n, s, c) = agg.getOrElse(valid, (0L, 0L, 0L))
      agg(valid) = (n + 1, s + switched, c + cents)
    }
    val got = JoinsSetOps.temporalJoin(spark, sf).collect().map(r =>
      Option(r.getAs[String]("valid_priority")) ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_switched"),
          r.getAs[Long]("cents")))).toMap
    assert(got === agg.toMap)
    // the AS-OF semantics must be non-trivial on this feed: some facts
    // see an OLDER version than their own order's priority, and some
    // predate every version (NULL group)
    assert(agg.toMap.values.map(_._2).sum > 0)
    assert(agg.contains(None))
  }

  test("feature hashing: brute-force 1024-dim signed vectors per doc") {
    def hk(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val vec = new Array[Long](1024)
      toks.foreach { w =>
        val hv = hk(s"fh:$w")
        val idx = (hv % 1024).toInt
        vec(idx) += (if ((hv / 1024) % 2 == 0) 1L else -1L)
      }
      id -> ((toks.length.toLong, vec.count(_ != 0).toLong,
        vec.map(math.abs).sum,
        vec.zipWithIndex.map { case (v, i) => i * v }.sum))
    }.toMap
    val got = TextAnalysis.featureHashing(spark, sf).collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_tokens"),
        r.getAs[Long]("nnz"), r.getAs[Long]("l1"),
        r.getAs[Long]("checksum")))).toMap
    assert(got === expected)
    // collisions must actually occur at dim=1024 on this vocabulary —
    // otherwise the test wouldn't cover the accumulate path
    assert(got.values.exists { case (_, nnz, l1, _) => l1 > nnz })
  }

  test("doc repetition: brute-force ppm recompute over every document") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      val w = text.split(" ", -1)
      if (w.length < 3) None else {
        val tris = w.sliding(3).map(_.mkString(" ")).toVector
        val bis = w.sliding(2).map(_.mkString(" ")).toVector
        val nTri = tris.length.toLong
        val dupTri = nTri - tris.distinct.length
        val topBi = bis.groupBy(identity).values.map(_.length).max.toLong
        Some(id -> ((nTri, dupTri * 1000000L / nTri,
          topBi * 1000000L / bis.length)))
      }
    }.toMap
    val got = TextAnalysis.docRepetition(spark, sf).collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_tri"),
        r.getAs[Long]("dup_tri_ppm"), r.getAs[Long]("top_bi_ppm")))).toMap
    assert(got === expected)
    // the fixture corpus loops a tiny vocabulary: repetition must register
    assert(got.values.exists(_._2 > 0))
  }
  test("hits: half-round scores equal a driver recompute on the " +
      "distinct edge relation; top lists are deterministic") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val edges = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .flatMap(r => o.get(r.getLong(0)).map(c => (c, r.getLong(1))))
      .distinct
    val a1 = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val h1 = edges.groupBy(_._1).view
      .mapValues(_.map(e => a1(e._2)).sum).toMap
    val a2 = edges.groupBy(_._2).view
      .mapValues(_.map(e => h1(e._1)).sum).toMap
    val h2 = edges.groupBy(_._1).view
      .mapValues(_.map(e => a2(e._2)).sum).toMap
    val topH = h2.toArray.sortBy(x => (-x._2, x._1)).take(15)
    val topA = a2.toArray.sortBy(x => (-x._2, x._1)).take(15)
    val got = operators.Graph.hits(spark, sf).collect()
    val gotH = got.filter(_.getAs[String]("kind") == "hub")
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("score")))
    val gotA = got.filter(_.getAs[String]("kind") == "authority")
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("score")))
    assert(gotH.sortBy(x => (-x._2, x._1)) === topH.toSeq)
    assert(gotA.sortBy(x => (-x._2, x._1)) === topA.toSeq)
    // mutual reinforcement: every emitted score is strictly positive
    assert(got.forall(_.getAs[Long]("score") > 0))
  }

  test("rrf fusion: fused ranking equals a sequential recompute of " +
      "both retrievers plus the reciprocal-rank sum") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    val terms = Seq("join", "filter", "scan")
    val expected = terms.flatMap { term =>
      val matching = docs.map { case (id, ws) =>
        (id, ws.count(_ == term).toLong, ws.length.toLong)
      }.filter(_._2 > 0)
      val ra = matching.sortBy(x => (-x._2, x._1)).zipWithIndex
        .map { case ((id, _, _), i) => id -> (i + 1).toLong }
        .filter(_._2 <= 50).toMap
      val rb = matching.map { case (id, tf, dl) =>
        (id, tf * 1000000L / dl)
      }.sortBy(x => (-x._2, x._1)).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1).toLong }
        .filter(_._2 <= 50).toMap
      (ra.keySet ++ rb.keySet).toArray.map { id =>
        val rrf = ra.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L) +
          rb.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L)
        (term, id, ra.get(id), rb.get(id), rrf)
      }.sortBy(x => (-x._5, x._2)).take(10).zipWithIndex
        .map { case ((t, id, a, b, rrf), i) =>
          (t, id, a, b, rrf, (i + 1).toLong) }
    }.toSet
    val got = operators.TextAnalysis.rrfFusion(spark, sf).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id"),
        Option(r.getAs[java.lang.Long]("rank_a")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("rank_b")).map(_.toLong),
        r.getAs[Long]("rrf_ppm"), r.getAs[Long]("fused_rank"))).toSet
    assert(got === expected)
  }

  test("encoding audit: per-source counts equal the doc_id residue " +
      "census and the clean rate is exact") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // precondition: the pristine corpus carries none of the markers
    assert(docs.forall { case (_, _, t) =>
      !t.contains("\u00C3\u00A9") && !t.contains("\uFFFD") &&
        !t.contains("\u0007") })
    val bySrc = docs.groupBy(_._2)
    val got = operators.TextAnalysis.encodingAudit(spark, sf).collect()
    assert(got.length === bySrc.size)
    got.foreach { r =>
      val ds = bySrc(r.getAs[String]("source"))
      val moji = ds.count(_._1 % 7 == 0).toLong
      val repl = ds.count(_._1 % 11 == 0).toLong
      val ctrl = ds.count(_._1 % 13 == 0).toLong
      val clean = ds.count(d =>
        d._1 % 7 != 0 && d._1 % 11 != 0 && d._1 % 13 != 0).toLong
      assert(r.getAs[Long]("n_docs") === ds.length.toLong)
      assert(r.getAs[Long]("n_mojibake") === moji)
      assert(r.getAs[Long]("n_replacement") === repl)
      assert(r.getAs[Long]("n_control") === ctrl)
      assert(r.getAs[Long]("n_clean") === clean)
      assert(r.getAs[Long]("clean_ppm") === clean * 1000000L / ds.length)
    }
  }

  private def support2Graph(): (Set[(Long, Long)], Map[Long, Set[Long]]) = {
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (ok, ps) => ok -> ps.map(_._2).toSet }
    val pairN = scala.collection.mutable
      .Map.empty[(Long, Long), Long].withDefaultValue(0L)
    baskets.values.foreach { ps =>
      val s = ps.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.size)
        pairN((s(i), s(j))) += 1
    }
    val edges = pairN.toSeq.filter(_._2 >= 2).map(_._1).toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    (edges, adj)
  }

  test("link prediction: cn / ra_q / jaccard / pa equal a brute-force " +
      "wedge recompute over the support-2 graph; existing edges excluded") {
    import graft.operators.Graph
    val (edges, adj) = support2Graph()
    val cand = scala.collection.mutable
      .Map.empty[(Long, Long), (Long, Long)].withDefaultValue((0L, 0L))
    adj.foreach { case (z, nbrs) =>
      val s = nbrs.toSeq.sorted
      val dz = nbrs.size.toLong
      for (i <- s.indices; j <- i + 1 until s.size) {
        val k = (s(i), s(j))
        val (cn, ra) = cand(k)
        cand(k) = (cn + 1, ra + 1000000L / dz)
      }
    }
    val expect = cand.toSeq
      .filter { case (k, _) => !edges(k) }
      .map { case ((u, w), (cn, ra)) =>
        val (du, dw) = (adj(u).size.toLong, adj(w).size.toLong)
        (u, w, cn, ra, cn * 1000000L / (du + dw - cn), du * dw)
      }
      .sortBy { case (u, w, cn, ra, _, _) => (-cn, -ra, u, w) }
      .take(20)
    val got = Graph.linkPrediction(spark, sf).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("w"),
        r.getAs[Long]("cn"), r.getAs[Long]("ra_q"),
        r.getAs[Long]("jaccard_ppm"), r.getAs[Long]("pa"))).toSeq
    assert(got === expect)
  }

  test("mrr@3: reciprocal-rank sixths equal the sequential leave-last-out " +
      "recompute; hits imply positive reciprocal mass") {
    import graft.operators.Graph
    val row = Graph.mrrEval(spark, sf).collect()(0)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey", "o_orderkey",
        "CAST(o_orderdate AS TIMESTAMP_LTZ) AS t")
      .selectExpr("o_custkey", "o_orderkey", "CAST(t AS LONG) AS sec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (ok, ps) => ok -> ps.map(_._2).toSet }
    val pairN = scala.collection.mutable
      .Map.empty[(Long, Long), Long].withDefaultValue(0L)
    baskets.values.foreach { ps =>
      val s = ps.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.size)
        pairN((s(i), s(j))) += 1
    }
    val sym = pairN.toSeq.filter(_._2 >= 2).flatMap { case ((u, v), n) =>
      Seq((u, v, n), (v, u, n)) }.groupBy(_._1)
    var (nc, sumRr) = (0L, 0L)
    orders.groupBy(_._1).foreach { case (_, os) =>
      if (os.length >= 2) {
        val sorted = os.sortBy(o => (-o._3, -o._2))
        val truth = baskets.getOrElse(sorted(0)._2, Set.empty)
        val qps = baskets.getOrElse(sorted(1)._2, Set.empty)
        nc += 1
        val scores = qps.toSeq.flatMap(q => sym.getOrElse(q, Nil))
          .groupBy(_._2).map { case (b, xs) => (b, xs.map(_._3).sum) }
        val top3 = scores.toSeq.sortBy { case (b, s) => (-s, b) }
          .take(3).map(_._1)
        val best = top3.zipWithIndex.collectFirst {
          case (b, i) if truth(b) => i + 1 }
        sumRr += (best match {
          case Some(1) => 6L; case Some(2) => 3L; case Some(3) => 2L
          case _ => 0L })
      }
    }
    assert(row.getAs[Long]("n_customers") === nc)
    assert(row.getAs[Long]("sum_rr_x6") === sumRr)
    assert(row.getAs[Long]("mrr_ppm") === sumRr * 1000000L / (6L * nc))
  }

  test("ndcg@3: quantized-discount NDCG equals the sequential " +
      "leave-last-out recompute; perfect lists hit exactly 1e6") {
    import graft.operators.Graph
    val row = Graph.ndcgEval(spark, sf).collect()(0)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey", "o_orderkey",
        "CAST(o_orderdate AS TIMESTAMP_LTZ) AS t")
      .selectExpr("o_custkey", "o_orderkey", "CAST(t AS LONG) AS sec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (ok, ps) => ok -> ps.map(_._2).toSet }
    val pairN = scala.collection.mutable
      .Map.empty[(Long, Long), Long].withDefaultValue(0L)
    baskets.values.foreach { ps =>
      val s = ps.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.size)
        pairN((s(i), s(j))) += 1
    }
    val sym = pairN.toSeq.filter(_._2 >= 2).flatMap { case ((u, v), n) =>
      Seq((u, v, n), (v, u, n)) }.groupBy(_._1)
    val weights = Array(1000000L, 630930L, 500000L)
    var (nc, sumN, nPerf) = (0L, 0L, 0L)
    orders.groupBy(_._1).foreach { case (_, os) =>
      if (os.length >= 2) {
        val sorted = os.sortBy(o => (-o._3, -o._2))
        val truth = baskets.getOrElse(sorted(0)._2, Set.empty)
        val qps = baskets.getOrElse(sorted(1)._2, Set.empty)
        if (truth.nonEmpty) {
          nc += 1
          val scores = qps.toSeq.flatMap(q => sym.getOrElse(q, Nil))
            .groupBy(_._2).map { case (b, xs) => (b, xs.map(_._3).sum) }
          val top3 = scores.toSeq.sortBy { case (b, s) => (-s, b) }
            .take(3).map(_._1)
          val dcg = top3.zipWithIndex.collect {
            case (b, i) if truth(b) => weights(i) }.sum
          val idcg = weights.take(math.min(truth.size, 3)).sum
          val ndcg = dcg * 1000000L / idcg
          sumN += ndcg
          if (ndcg == 1000000L) nPerf += 1
        }
      }
    }
    assert(row.getAs[Long]("n_customers") === nc)
    assert(row.getAs[Long]("mean_ndcg_ppm") === sumN / nc)
    assert(row.getAs[Long]("n_perfect") === nPerf)
  }

  test("rec coverage: catalog coverage and top-share concentration " +
      "equal a sequential recompute of the exposure census") {
    import graft.operators.Graph
    val row = Graph.recCoverage(spark, sf).collect()(0)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey", "o_orderkey",
        "CAST(o_orderdate AS TIMESTAMP_LTZ) AS t")
      .selectExpr("o_custkey", "o_orderkey", "CAST(t AS LONG) AS sec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (ok, ps) => ok -> ps.map(_._2).toSet }
    val pairN = scala.collection.mutable
      .Map.empty[(Long, Long), Long].withDefaultValue(0L)
    baskets.values.foreach { ps =>
      val s = ps.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.size)
        pairN((s(i), s(j))) += 1
    }
    val sym = pairN.toSeq.filter(_._2 >= 2).flatMap { case ((u, v), n) =>
      Seq((u, v, n), (v, u, n)) }.groupBy(_._1)
    val expo = scala.collection.mutable
      .Map.empty[Long, Long].withDefaultValue(0L)
    var nCust = 0L
    orders.groupBy(_._1).foreach { case (_, os) =>
      if (os.length >= 2) {
        val sorted = os.sortBy(o => (-o._3, -o._2))
        val qps = baskets.getOrElse(sorted(1)._2, Set.empty)
        val scores = qps.toSeq.flatMap(q => sym.getOrElse(q, Nil))
          .groupBy(_._2).map { case (b, xs) => (b, xs.map(_._3).sum) }
        val top3 = scores.toSeq.sortBy { case (b, s) => (-s, b) }
          .take(3).map(_._1)
        if (top3.nonEmpty) {
          nCust += 1
          top3.foreach(b => expo(b) += 1)
        }
      }
    }
    val nDistinct = expo.size.toLong
    val slots = expo.values.sum
    val catalogN = baskets.values.flatten.toSet.size.toLong
    val k = math.max(1L, nDistinct / 100)
    val topSlots = expo.toSeq.sortBy { case (b, n) => (-n, b) }
      .take(k.toInt).map(_._2).sum
    assert(row.getAs[Long]("n_customers") === nCust)
    assert(row.getAs[Long]("total_slots") === slots)
    assert(row.getAs[Long]("n_rec_distinct") === nDistinct)
    assert(row.getAs[Long]("n_catalog") === catalogN)
    assert(row.getAs[Long]("k") === k)
    assert(row.getAs[Long]("coverage_ppm") ===
      nDistinct * 1000000L / catalogN)
    assert(row.getAs[Long]("top_share_ppm") ===
      topSlots * 1000000L / slots)
  }

  test("moore-lewis: micro-nat scores equal a driver recompute of the " +
      "two smoothed unigram LMs; top-20 ranking is deterministic") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1) == "src0",
        r.getString(2).split(" ").toSeq))
    val toks = docs.flatMap { case (_, ind, tk) => tk.map((_, ind)) }
    val counts = toks.groupBy(_._1).map { case (tok, xs) =>
      tok -> (xs.count(_._2).toLong, xs.count(!_._2).toLong) }
    val nin = counts.values.map(_._1).sum
    val ngen = counts.values.map(_._2).sum
    val v = counts.size.toLong
    def q(x: Double): Long = math.floor(x * 1000000 + 0.5).toLong
    val w = counts.map { case (tok, (cin, cgen)) =>
      tok -> q(math.log(cin + 1.0) - math.log(cgen + 1.0)) }
    val k = q(math.log((nin + v).toDouble) - math.log((ngen + v).toDouble))
    val scored = docs.map { case (id, _, tk) =>
      (id, tk.length.toLong, tk.map(w).sum - tk.length * k) }
    val top = scored
      .sortBy { case (id, n, s) => (-(s.toDouble / n), id) }.take(20)
    val got = operators.TextAnalysis.mooreLewis(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("score_micronat"), r.getAs[Double]("per_tok_r"),
        r.getAs[Long]("rank")))
      .sortBy(_._5)
    assert(got.length === 20)
    got.zip(top).zipWithIndex.foreach {
      case (((gid, gn, gs, gr, grk), (id, n, s)), idx) =>
        assert(gid === id, idx); assert(gn === n, idx)
        assert(gs === s, idx); assert(grk === idx + 1, idx)
        assert(math.abs(gr - s.toDouble / (n * 1000000.0)) < 1e-6, idx)
    }
  }

  test("dsir: hashed-bigram importance-weight histogram equals a " +
      "driver recompute incl. the portable bucket hash") {
    def bucket(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 1024
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1) == "src0",
        r.getString(2).split(" ").toSeq))
      .filter(_._3.length >= 2)
    val feats = docs.map { case (id, tgt, tk) =>
      (id, tgt, (tk ++ tk.sliding(2).map(_.mkString(" "))).map(bucket)) }
    val counts = feats.flatMap { case (_, tgt, bs) => bs.map((_, tgt)) }
      .groupBy(_._1).map { case (b, xs) =>
        b -> (xs.count(_._2).toLong, xs.count(!_._2).toLong) }
    val nt = counts.values.map(_._1).sum
    val nr = counts.values.map(_._2).sum
    def q(x: Double): Long = math.floor(x * 1000000 + 0.5).toLong
    val w = counts.map { case (b, (ct, cr)) =>
      b -> q(math.log(ct + 1.0) - math.log(cr + 1.0)) }
    val k = q(math.log(nt + 1024.0) - math.log(nr + 1024.0))
    val hist = feats.map { case (_, _, bs) =>
      val sm = bs.map(w).sum - bs.length * k
      ((sm + bs.length * 100000000L) / bs.length / 100000, sm)
    }.groupBy(_._1).map { case (bin, xs) =>
      bin -> (xs.size.toLong, xs.map(_._2).sum) }
    val got = operators.TextAnalysis.dsirWeights(spark, sf).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_score_micronat")))
      .toMap
    assert(got.size === hist.size)
    hist.foreach { case (bin, (n, s)) =>
      assert(got(bin) === ((n, s)), bin)
    }
    // bin 1000 is the zero-weight line; iid synthetic sources cluster
    // near it
    assert(hist.keys.forall(b => b >= 900 && b <= 1100))
  }

  test("bpe: the merge loop's vocab lineage stays bounded at K=20 " +
      "(re-checkpoint guard) and extends the K=10 merge list") {
    val (m10, _) = operators.TextAnalysis.bpeMergeLoop(spark, sf, 10)
    val (m20, planNodes) = operators.TextAnalysis.bpeMergeLoop(spark, sf, 20)
    // the longer run learns the same first 10 merges (determinism: the
    // guard's cutLineage must not perturb the elected pairs)
    assert(m20.take(m10.length) === m10)
    assert(m20.length > m10.length, "sf0.001 corpus exhausted before " +
      "generation 11 - plan-size assertion would be vacuous")
    // without the every-8-generations cut, the vocab frame accumulates
    // one replace Project per generation (~20+ logical nodes by g=20);
    // with it the last segment is at most 4 replaces over a LogicalRDD
    assert(planNodes <= 8, s"bpe vocab lineage grew to $planNodes " +
      "logical nodes at K=20 - the re-checkpoint guard regressed")
  }

  test("bpe: 10 merge generations + greedy encode equal a sequential " +
      "reference recompute of the Sennrich merge loop") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0),
        r.getString(1).split("\\s+").toSeq.filter(_.nonEmpty)))
    val wc = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }
    var segs: Map[String, Vector[String]] =
      wc.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to 10) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, sy) <- segs; i <- 0 until sy.length - 1)
        pc((sy(i), sy(i + 1))) =
          pc.getOrElse((sy(i), sy(i + 1)), 0L) + wc(w)
      val ((a, b), c) =
        pc.toSeq.sortBy { case ((x, y), n) => (-n, x, y) }.head
      merges += ((a, b, c))
      // the canonical non-overlapping left-to-right merge pass (explicit
      // skip-scan) — independently validates the operator's sentinel-
      // string replace encoding of the same pass
      segs = segs.map { case (w, sy) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < sy.length) {
          if (i + 1 < sy.length && sy(i) == a && sy(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += sy(i); i += 1 }
        }
        w -> out.toVector
      }
    }
    val gotM = operators.TextAnalysis.bpeMergeTable(spark, sf).collect()
      .sortBy(_.getAs[Long]("gen"))
    assert(gotM.length === 10)
    gotM.zip(merges).zipWithIndex.foreach { case ((r, (a, b, c)), i) =>
      assert(r.getAs[String]("left_sym") === a, i)
      assert(r.getAs[String]("right_sym") === b, i)
      assert(r.getAs[Long]("pair_cnt") === c, i)
    }
    // a merged symbol must appear as a LEFT or RIGHT operand of a later
    // merge — the property that distinguishes the loop from one
    // generation of pair counting
    val syms = merges.map { case (a, b, _) => a + b }
    assert(merges.exists { case (a, b, _) =>
      syms.contains(a) || syms.contains(b) })
    val exp = docs.filter(_._2.nonEmpty).map { case (id, tk) =>
      id -> ((tk.length.toLong, tk.map(w => segs(w).length.toLong).sum,
        tk.map(_.length.toLong).sum))
    }.toMap
    val gotE = operators.TextAnalysis.bpeEncode(spark, sf).collect()
    assert(gotE.length === exp.size)
    gotE.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nws, nbpe, nch) = exp(id)
      assert(r.getAs[Long]("n_ws_tokens") === nws, id)
      assert(r.getAs[Long]("n_bpe_tokens") === nbpe, id)
      assert(r.getAs[Long]("n_chars") === nch, id)
      assert(math.abs(r.getAs[Double]("tokens_per_word_r") -
        nbpe.toDouble / nws) < 1e-6, id)
      // merges compress: bpe token count sits between word and char count
      assert(nws <= nbpe && nbpe <= nch, id)
    }
  }

  test("kneser-ney: top-20 bigram statistics and probabilities equal " +
      "a sequential recompute; probabilities sit in (0, 1)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).collect()
      .map(_.getString(0).split(" ").toSeq).filter(_.length >= 2)
    val census = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach(tk => tk.sliding(2).foreach { p =>
      census((p(0), p(1))) = census.getOrElse((p(0), p(1)), 0L) + 1 })
    val cW1 = census.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val nFollow = census.toSeq.groupBy(_._1._1).view
      .mapValues(_.size.toLong).toMap
    val nPrec = census.toSeq.groupBy(_._1._2).view
      .mapValues(_.size.toLong).toMap
    val nTypes = census.size.toLong
    val top = census.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(20)
    val exp = top.map { case ((w1, w2), c) =>
      val p = (c.toDouble - 0.75) / cW1(w1) +
        (0.75 * nFollow(w1) / cW1(w1)) *
          (nPrec(w2).toDouble / nTypes)
      (w1, w2) -> ((c, cW1(w1), nFollow(w1), nPrec(w2), nTypes,
        math.floor(p * 1000000 + 0.5).toLong))
    }.toMap
    val got = operators.TextAnalysis.kneserNey(spark, sf).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        ((r.getAs[Long]("c_bg"), r.getAs[Long]("c_w1"),
          r.getAs[Long]("n_follow"), r.getAs[Long]("n_prec"),
          r.getAs[Long]("n_types"), r.getAs[Long]("p_kn_micro"))))
      .toMap
    assert(got === exp)
    got.values.foreach { case (_, _, _, _, _, pm) =>
      assert(pm > 0L && pm < 1000000L)
    }
  }

  test("heaps law: per-source points and the integer OLS equal a " +
      "driver recompute; closed vocabulary reads saturated") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1).split(" ")))
    def q(x: Double): Long = math.floor(x * 1000000 + 0.5).toLong
    val pts = docs.groupBy(_._1).map { case (_, xs) =>
      val toks = xs.flatMap(_._2)
      (q(math.log(toks.length.toDouble)),
        q(math.log(toks.distinct.length.toDouble))) }.toSeq
    val k = pts.length
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val beta = (k * sxy - sx * sy).toDouble / (k * sxx - sx * sx).toDouble
    val lnk = (sy.toDouble - beta * sx.toDouble) / k / 1000000.0
    val got = operators.TextAnalysis.heapsLaw(spark, sf).collect()(0)
    assert(got.getAs[Long]("n_sources") === k.toLong)
    assert(math.abs(got.getAs[Double]("beta_r") - beta) < 1e-5)
    assert(math.abs(got.getAs[Double]("lnk_r") - lnk) < 1e-4)
    // one shared synthetic vocabulary: growth must read saturated
    assert(got.getAs[Double]("beta_r") < 0.5)
  }

  test("vocab coverage: census, chao1 and good-turing mass equal a " +
      "driver recompute") {
    val counts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" "))
      .groupBy(identity).map(_._2.length.toLong)
    val v = counts.size.toLong
    val nTok = counts.sum
    val f1 = counts.count(_ == 1L).toLong
    val f2 = counts.count(_ == 2L).toLong
    val chao1 = if (f2 > 0) v * 1000 + f1 * f1 * 1000 / (2 * f2)
      else v * 1000 + f1 * (f1 - 1) * 1000 / (2 * (f2 + 1))
    val got = operators.TextAnalysis.vocabCoverage(spark, sf).collect()(0)
    assert(got.getAs[Long]("vocab") === v)
    assert(got.getAs[Long]("n_tokens") === nTok)
    assert(got.getAs[Long]("f1") === f1)
    assert(got.getAs[Long]("f2") === f2)
    assert(got.getAs[Long]("chao1_milli") === chao1)
    assert(got.getAs[Long]("gt_unseen_ppm") === f1 * 1000000 / nTok)
  }

  test("js divergence: per-vocabulary-row nano-nat terms equal a " +
      "driver recompute; value sits in [0, ln 2]") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select((col("source") === "src0").as("ind"), col("text"))
      .collect().flatMap(r =>
        r.getString(1).split(" ").map((_, r.getBoolean(0))))
    val counts = toks.groupBy(_._1).toSeq.map { case (_, xs) =>
      (xs.count(_._2).toLong, xs.count(!_._2).toLong) }
    val np = counts.map(_._1).sum; val nq = counts.map(_._2).sum
    val jsd = counts.map { case (cp, cq) =>
      val p = cp.toDouble / np; val qq2 = cq.toDouble / nq
      val m = 0.5 * (p + qq2)
      val a = if (cp > 0) 0.5 * p * math.log(p / m) else 0.0
      val b = if (cq > 0) 0.5 * qq2 * math.log(qq2 / m) else 0.0
      math.floor((a + b) * 1000000000 + 0.5).toLong
    }.sum
    val got = operators.TextAnalysis.jsDivergence(spark, sf).collect()(0)
    assert(got.getAs[Long]("vocab") === counts.size.toLong)
    assert(got.getAs[Long]("n_in_tokens") === np)
    assert(got.getAs[Long]("n_gen_tokens") === nq)
    assert(got.getAs[Long]("jsd_nanonat") === jsd)
    val j = got.getAs[Double]("jsd_r")
    assert(j >= 0.0 && j <= math.log(2.0) + 1e-9)
  }

  test("distinct-n: per-source unigram/bigram diversity equals a " +
      "driver recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1).split(" ")))
      .filter(_._2.length >= 2)
    val expect = docs.groupBy(_._1).map { case (src, xs) =>
      val uni = xs.flatMap(_._2)
      val bi = xs.flatMap(_._2.sliding(2).map(_.mkString(" ")))
      src -> (uni.length.toLong, uni.distinct.length.toLong,
        bi.length.toLong, bi.distinct.length.toLong) }
    val got = operators.TextAnalysis.distinctN(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n1"), r.getAs[Long]("d1"), r.getAs[Long]("n2"),
          r.getAs[Long]("d2"), r.getAs[Long]("distinct1_ppm"),
          r.getAs[Long]("distinct2_ppm"))).toMap
    assert(got.size === expect.size)
    expect.foreach { case (src, (n1, d1, n2, d2)) =>
      val (gn1, gd1, gn2, gd2, p1, p2) = got(src)
      assert(gn1 === n1, src); assert(gd1 === d1, src)
      assert(gn2 === n2, src); assert(gd2 === d2, src)
      assert(p1 === d1 * 1000000 / n1, src)
      assert(p2 === d2 * 1000000 / n2, src)
    }
  }
}
