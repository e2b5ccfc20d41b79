package graft

import graft.operators.{Analytics, Dedup, MlEval, Relational, TextAnalysis}

/** Physical-plan audits (SURVEY.md §4 discipline): the properties that make
  * these plans survive a 100x scale-up are asserted, not assumed — filter
  * pushdown to the Parquet scan, column pruning, broadcast of constant
  * dims, heap-based top-k.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: year range filter pushes down to the orders parquet scan") {
    val plan = planOf(Relational.starFact(spark, sf))
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(o_orderdate") &&
      plan.contains("LessThan(o_orderdate"),
      s"year filter not pushed to scan:\n$plan")
  }

  test("q01: constant dims join via BroadcastHashJoin, facts shuffle") {
    val plan = planOf(Relational.starFact(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), "nation/region not broadcast")
  }

  test("q01: column pruning — lineitem scan reads only needed columns") {
    val plan = planOf(Relational.starFact(spark, sf))
    // lineitem has 11 columns; the query needs 3
    val readSchema = plan.linesIterator
      .find(l => l.contains("ReadSchema") && l.contains("l_orderkey"))
    assert(readSchema.isDefined)
    assert(!readSchema.get.contains("l_shipdate") &&
      !readSchema.get.contains("l_returnflag"),
      s"unused lineitem columns not pruned: ${readSchema.get}")
  }

  test("q183: ts range + event_type both push into the events parquet scan") {
    // The feed ships ts as TIMESTAMP(MICROS) without UTC adjustment; read
    // naively (inferTimestampNTZ on) it arrives NTZ and the LTZ cast sits
    // as a Project over the scan — every ts range predicate then stays
    // ABOVE the scan and parquet row-group min/max pruning is lost, the
    // scale-killer for the canonical time-slice access at 100 TB. The
    // session-level inferTimestampNTZ=false makes the scan itself LTZ;
    // this test pins that the bounds actually reach PushedFilters.
    val plan = planOf(Analytics.timeSlice(spark, sf))
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(ts") &&
      plan.contains("LessThan(ts"),
      s"ts range not pushed to the events scan:\n$plan")
    assert(plan.contains("In(event_type") ||
      plan.contains("EqualTo(event_type"),
      s"event_type filter not pushed to the events scan:\n$plan")
  }

  test("q12: top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = planOf(Analytics.topkOrders(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"got:\n$plan")
  }

  test("q02: distinct runs as partial+final HashAggregate") {
    val plan = planOf(Relational.distinctDims(spark, sf))
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"got:\n$plan")
  }

  test("q35: MinHashAgg runs as partial+final ObjectHashAggregate") {
    val plan = planOf(graft.operators.Dedup.minhashSigs(spark, sf))
    assert(plan.contains("ObjectHashAggregate"), s"got:\n$plan")
    assert(plan.contains("partial_minhashagg") ||
      plan.toLowerCase.contains("partial_minhashagg"),
      s"no partial aggregation for MinHashAgg:\n$plan")
  }

  test("q06: status equality + year range both push to scan") {
    val plan = planOf(Relational.filterEq(spark, sf))
    assert(plan.contains("EqualTo(o_orderstatus,F)"),
      s"status filter not pushed:\n$plan")
  }

  test("q68: range join keeps its equi component — hash join, no NL/cartesian") {
    val plan = planOf(graft.operators.JoinsSetOps.rangeJoin(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join degraded to nested loop:\n$plan")
    assert(plan.contains("Join"), s"no join found:\n$plan")
  }

  test("q64: hash sample is scan→filter→agg with a single exchange") {
    val plan = planOf(graft.operators.Sampling.hashSample(spark, sf))
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"expected exactly the groupBy exchange, got $exchanges:\n$plan")
  }

  test("q70: corpus top-k plans as TakeOrderedAndProject over the agg") {
    val plan = planOf(graft.operators.TextAnalysis.topNgrams(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"got:\n$plan")
  }

  test("q79: lateral top-k decorrelates — no nested loop over customers") {
    val plan = planOf(graft.operators.Reshape.lateralTopk(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"got:\n$plan")
    assert(plan.contains("Window") || plan.contains("TakeOrdered"),
      s"no rank-based rewrite found:\n$plan")
  }

  test("q37: embedding dedup is cell-bucketed — no all-pairs nested loop") {
    val plan = planOf(graft.operators.Dedup.embeddingCosine(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"embedding dedup degraded to an all-pairs join:\n$plan")
  }

  test("q61: quartiles have no window and no global sort in the plan") {
    val plan = planOf(Analytics.ntileQuartiles(spark, sf))
    assert(!plan.contains("Window"), s"window crept back in:\n$plan")
    assert(!plan.contains("Sort "), s"global sort crept back in:\n$plan")
  }

  test("q92: decontamination joins the broadcast benchmark shingle set") {
    val plan = planOf(graft.operators.TextAnalysis.decontaminate(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side not broadcast:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"pair expansion crept in:\n$plan")
  }

  test("q95: BM25 top-10 plans as TakeOrderedAndProject") {
    val plan = planOf(graft.operators.TextAnalysis.bm25(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"got:\n$plan")
  }

  test("q96: funnel is stepwise partial-agg'd mins — no window, no sort") {
    val plan = planOf(Analytics.funnel(spark, sf))
    assert(!plan.contains("Window"), s"window crept in:\n$plan")
    assert("partial_min".r.findAllIn(plan).size >= 3,
      s"step mins not partially aggregated:\n$plan")
  }

  test("q66: stratified sample window is partitioned (no global sort)") {
    val plan = planOf(graft.operators.Sampling.stratifiedSample(spark, sf))
    assert(plan.contains("Window"), s"no window:\n$plan")
    assert(!plan.contains("Window [") ||
      !plan.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      s"unpartitioned window:\n$plan")
  }

  test("q101: bloom build is an ObjectHashAggregate; probe stays codegen'd; " +
      "no nested-loop anywhere") {
    val plan = planOf(graft.operators.TextAnalysis.bloomDecontaminate(spark, sf))
    assert(plan.contains("ObjectHashAggregate"),
      s"bloom bitset not built as a typed aggregate:\n$plan")
    assert(plan.contains("bloommightcontain"),
      s"bloom probe missing from the plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"got:\n$plan")
  }

  test("q103: blocklist joins as a broadcast hash join, never a literal isin") {
    val plan = planOf(graft.operators.TextAnalysis.blocklistFilter(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"blocklist not broadcast-joined:\n$plan")
  }

  test("q104: z-order top-k is TakeOrderedAndProject over a single " +
      "codegen'd projection — no exchange, no sort") {
    val plan = planOf(graft.operators.Layout.zorderCluster(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"got:\n$plan")
    assert(!plan.contains("Exchange"),
      s"z computation should be scan-local:\n$plan")
  }

  test("q109: span dedup is hash-partitioned end to end — no nested " +
      "loop, no global sort, scans pruned to (doc_id, text)") {
    val plan = planOf(graft.operators.TextAnalysis.spanDedup(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"span dedup degraded to an all-pairs join:\n$plan")
    // No GLOBAL sort (`Sort [...], true` = requires a range exchange over
    // the whole dataset). Partition-LOCAL sorts (`..., false`) feeding the
    // struct-min SortAggregate / sort-merge join are the hash-partitioned
    // discipline this test exists to pin, not a violation of it.
    assert("Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isEmpty,
      s"global sort crept in:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"document scan not pruned to the two used columns:\n$plan")
  }

  test("q120: BPE pair top-20 is TakeOrderedAndProject over partial aggs") {
    val plan = planOf(graft.operators.TextAnalysis.bpePairs(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"got:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"got:\n$plan")
  }

  test("q123: OOV vocab membership joins broadcast, never shuffles tokens " +
      "against the vocab") {
    val plan = planOf(graft.operators.TextAnalysis.oovRate(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab not broadcast-joined:\n$plan")
  }

  test("q127: skew profile is one agg + broadcast scalar + top-k — " +
      "no global sort") {
    val plan = planOf(graft.operators.SkewJoin.skewProfile(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"got:\n$plan")
    assert("Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isEmpty,
      s"global sort crept in:\n$plan")
  }

  test("q126: shard manifest is scan-local hashing with a single " +
      "agg exchange") {
    val plan = planOf(graft.operators.Layout.shardManifest(spark, sf))
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"expected exactly the per-shard rollup exchange, got $exchanges:" +
        s"\n$plan")
  }

  test("q131: mode-per-group is two mergeable aggs — no window, no sort " +
      "beyond the aggregation") {
    val plan = planOf(graft.operators.Analytics.modePerGroup(spark, sf))
    assert(!plan.contains("Window"), s"window crept in:\n$plan")
    assert(plan.contains("HashAggregate") ||
      plan.contains("ObjectHashAggregate"), s"got:\n$plan")
  }

  test("q121: domain cap window partitions by source (no global sort) " +
      "and the scan prunes to the used columns") {
    val plan = planOf(graft.operators.Sampling.domainCap(spark, sf))
    assert("Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isEmpty,
      s"global sort crept in:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      s"document scan not pruned:\n$plan")
  }

  test("q137: pure-interval lookup joins on the bucket equi key — " +
      "never a nested loop") {
    val plan = planOf(graft.operators.JoinsSetOps.intervalIndex(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval lookup degraded to a nested loop:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"got:\n$plan")
  }

  test("q149: top-k per group runs as a bounded-heap aggregate — " +
      "no window, no per-group sort") {
    val plan = planOf(graft.operators.Analytics.topkPerGroup(spark, sf))
    assert(!plan.contains("Window"), s"window crept in:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"TypedImperativeAggregate should plan as ObjectHashAggregate:\n$plan")
  }

  test("q152: group sample is a bounded-heap aggregate — no window sort") {
    val plan = planOf(graft.operators.Sampling.groupSample(spark, sf))
    assert(!plan.contains("Window"), s"window crept in:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"TopKAgg should plan as ObjectHashAggregate:\n$plan")
  }

  test("q150/q151/q171/q172: candidate joins are equi-joins, never cartesian") {
    Seq(graft.operators.Dedup.setsimExact(spark, sf),
        graft.operators.Dedup.editJoin(spark, sf),
        graft.operators.Dedup.containmentJoin(spark, sf),
        graft.operators.Multimodal.mediaPerceptualHash(spark, sf))
      .foreach { df =>
        val plan = planOf(df)
        assert(!plan.contains("CartesianProduct") &&
          !plan.contains("BroadcastNestedLoop"),
          s"similarity join degenerated to all-pairs:\n$plan")
      }
  }

  test("q156: correlated EXISTS decorrelates to hash semi/anti joins") {
    val plan = planOf(graft.operators.JoinsSetOps.existsJoin(spark, sf))
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"),
      s"correlated subquery failed to decorrelate:\n$plan")
    assert(plan.contains("LeftSemi"), s"no semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"no anti join:\n$plan")
  }

  test("q170: catalog stats drive CostBasedJoinReorder off text order") {
    import graft.operators.Stats
    // builds tables + ANALYZE; CBO is scoped to a cloned session inside
    val withCbo = Stats.cboJoinReorder(spark, sf)
    // catalog stats actually landed: every base relation resolves with a
    // rowCount (the precondition CostBasedJoinReorder requires)
    val leavesStats = withCbo.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.rowCount)
    assert(leavesStats.forall(_.isDefined),
      s"missing catalog rowCounts: $leavesStats")
    def leafOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collectLeaves().map(_.toString)
        .map(s => Seq("orders", "customer", "nation", "region")
          .find(t => s.contains(s"/$t.parquet") || s.contains(s".$t"))
          .getOrElse("?"))
    val cboOrder = leafOrder(withCbo)
    val textOrder = leafOrder(Stats.starQuery(spark, sf, cbo = false))
    // without CBO the optimizer keeps the (deliberately bad) text order
    assert(textOrder === Seq("orders", "customer", "nation", "region"),
      s"baseline no longer text order: $textOrder")
    // with stats the reorder must move a selective dim ahead of the fact
    assert(cboOrder !== textOrder,
      s"CostBasedJoinReorder left the join in text order: $cboOrder")
    // and the CBO conf never leaked into the parent session
    assert(spark.conf.get("spark.sql.cbo.enabled") === "false",
      "q170 leaked spark.sql.cbo.enabled into the shared session")
    // and the result itself is plan-independent (oracle-gated too)
    val n = withCbo.collect().length
    assert(n >= 1 && n <= 5, s"expected 1..5 ASIA nations, got $n")
  }

  test("AQE splits the skewed join partition at runtime (skew=true)") {
    import graft.operators.SkewJoin
    val df = SkewJoin.aqeSkewJoin(spark)
    // AQE finalizes the plan only under execution — and only for THIS
    // Dataset's own queryExecution, so collect() (count() would execute
    // a different derived plan). The row count also pins correctness
    // (199k hot-key rows + 1k singleton-key rows: the skew split must
    // not duplicate or drop either side).
    assert(df.collect().length === 200000)
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(500))
    assert(finalPlan.contains("skew=true"),
      s"AQE did not mark the skewed join:\n${finalPlan.take(2000)}")
  }

  test("q110: gopher rules are scan-local with a single agg exchange") {
    val plan = planOf(graft.operators.TextAnalysis.gopherRules(spark, sf))
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"expected exactly the per-source rollup exchange, got $exchanges:" +
        s"\n$plan")
    assert(plan.contains("HashAggregate"), s"got:\n$plan")
  }

  test("q190/q193: the only SinglePartition exchange carries the 64-row " +
      "offset table, never the data") {
    // q190: 1 single-partition exchange (the 64-row offsets window).
    // q193: 3 — the scalar min/max/count aggregate's partial→final
    // step adds two more; every one carries O(1) rows (bucket counts or
    // one scalar row), never the corpus.
    for ((df, maxSingle) <- Seq(
        graft.operators.Layout.globalOrdinals(spark, sf) -> 1,
        graft.operators.Analytics.rankTransform(spark, sf) -> 3)) {
      val plan = df.queryExecution.executedPlan.toString
      val single = "Exchange SinglePartition".r.findAllIn(plan).size
      assert(single <= maxSingle,
        s"SinglePartition exchanges: $single\n$plan")
      // the claim that matters: the ROW-SCALED window (row_number per
      // bucket) runs under a hash exchange on the bucket key
      assert(plan.contains("Exchange hashpartitioning(b"), plan)
      assert(
        "windowspecdefinition\\(b(ucket)?#".r.findFirstIn(plan).isDefined,
        plan)
    }
  }

  test("q188: runtime bloom filter injected on the fact side of the join") {
    import graft.operators.Stats
    import org.apache.spark.sql.functions.{col, sum}
    val df = Stats.runtimeBloomJoin(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    // InjectRuntimeFilter: a BloomFilterAggregate subquery over the
    // filtered creation side, probed by might_contain above the fact scan
    assert(opt.contains("bloom_filter_agg") ||
      opt.contains("BloomFilterAggregate"),
      s"no bloom build subquery in optimized plan:\n${opt.take(3000)}")
    assert(opt.contains("might_contain"),
      s"no might_contain probe in optimized plan:\n${opt.take(3000)}")
    // the probe must sit on the LINEITEM (application) side, pre-shuffle
    // — and the filter is invisible in the result: equal to the plain
    // formulation on the shared (bloom-free) session
    val plain = TestSpark.spark.read.parquet(s"$sf/lineitem.parquet")
      .join(TestSpark.spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    val n = df.agg(sum("n_lines")).collect()(0).getLong(0)
    assert(n === plain, s"bloom-filtered join changed the row count: $n")
  }

  test("q209: bucketed tables join with NO shuffle and NO sort below " +
      "the join") {
    // broadcast disabled on a cloned session so the small side can't
    // sidestep the claim — the join must be a SortMergeJoin fed by the
    // bucketed scans' own hash partitioning and sort order
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    // scan-reported sort order was demoted to opt-in in Spark 3.0
    // (SPARK-28595): with one file per bucket it is sound, and this conf
    // is what a bucketed-warehouse deployment sets to claim it
    s2.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    val plan = graft.operators.Layout.bucketedJoin(s2, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"not a SortMergeJoin:\n$plan")
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinPart.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(!joinPart.contains("Sort ["),
      s"bucketed join still sorts (sortBy metadata unused):\n$plan")
    // exactly one exchange in the whole plan: the final rollup
    val nEx = "Exchange ".r.findAllIn(plan).length
    assert(nEx === 1, s"expected only the agg exchange, got $nEx:\n$plan")
  }

  test("q231: NOT IN plans as a null-aware anti join, and the " +
      "three-valued-logic identities hold") {
    val df = graft.operators.JoinsSetOps.notInSemantics(spark, sf)
    val plan = planOf(df)
    // Spark's single-column NOT IN rewrite: a BroadcastHashJoin LeftAnti
    // whose trailing flag (isNullAwareAntiJoin) prints `true` — the
    // machinery that exists because a plain left-anti would KEEP null
    // probes. The NOT EXISTS branch in the SAME plan takes the ordinary
    // left-anti (flag `false`): both rewrites, side by side.
    assert(plan.contains("LeftAnti, BuildRight, true"),
      s"NOT IN did not plan as a null-aware anti join:\n$plan")
    assert(plan.contains("LeftAnti, BuildRight, false"),
      s"NOT EXISTS unexpectedly left the plain anti-join path:\n$plan")
    val r = df.collect()(0)
    val (nIn, nEx2, nNull, nPolluted) =
      (r.getAs[Long]("n_not_in"), r.getAs[Long]("n_not_exists"),
        r.getAs[Long]("n_null_probe"), r.getAs[Long]("n_not_in_nullset"))
    assert(nNull > 0, "fixture exercises no NULL probes")
    assert(nEx2 - nIn === nNull,
      s"NOT EXISTS − NOT IN ($nEx2 − $nIn) must equal null probes $nNull")
    assert(nPolluted === 0L,
      s"a NULL in the NOT IN list must empty the result, got $nPolluted")
  }

  test("q230: observed metrics equal an independent first-class " +
      "aggregation (the side-channel counters are exact)") {
    val got = graft.operators.DataQuality.observeMetrics(spark, sf)
      .collect()(0)
    val ref = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(org.apache.spark.sql.functions.col("l_quantity") >= 10)
      .selectExpr("count(*) AS n_kept",
        "CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS kept_cents",
        "CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned",
        "CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_discount")
      .collect()(0)
    Seq("n_kept", "kept_cents", "n_returned", "n_null_discount").foreach {
      c => assert(got.getAs[Long](c) === ref.getAs[Long](c), c)
    }
  }
  test("q271: the dim filter dynamically prunes fact partitions and " +
      "the result equals the unpartitioned formulation") {
    import org.apache.spark.sql.functions._
    val df = operators.Layout.dynamicPruning(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning expression in the fact scan:\n${plan.take(3000)}")
    val got = df.collect()
      .map(r => (r.getAs[Number]("yr").longValue(),
        r.getAs[Long]("n_orders"), r.getAs[Long]("cents"))).sortBy(_._1)
    val ref = spark.read.parquet(s"$sf/orders.parquet")
      .filter(year(col("o_orderdate")) >= 1999)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("c"))
      .collect()
      .map(r => (r.getAs[Number]("yr").longValue(),
        r.getAs[Long]("n"), r.getAs[Long]("c"))).sortBy(_._1)
    assert(got.toSeq === ref.toSeq)
    // only the late-era partition directories are read: every surviving
    // partition is >= 1999
    assert(got.forall(_._1 >= 1999L))
  }

  test("q313: Hill top-101 plans as TakeOrderedAndProject (no global sort " +
    "over orders)") {
    // assert on the pre-checkpoint frame: hillTail's cutLineage()
    // truncates the visible executed plan at the 101-row boundary
    val plan = planOf(Analytics.hillTop(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"got:\n$plan")
    assert(!plan.contains("Exchange"), s"top-101 shuffled:\n$plan")
  }

  test("q315: decontam candidates come from equi-joins — no cartesian, " +
    "no nested loop") {
    val plan = planOf(Dedup.substringDecontam(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"got:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"got:\n$plan")
  }

  test("q317: substring dedup's owner election and probe are " +
    "equi-joins — no cartesian, no nested loop") {
    val plan = planOf(Dedup.substringDedup(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"got:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"got:\n$plan")
  }

  test("q318: moore-lewis top-20 plans as TakeOrderedAndProject, " +
    "never a global sort") {
    val plan = planOf(TextAnalysis.mooreLewis(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"got:\n$plan")
  }

  test("q336: k-fold scoring joins the broadcast predictor grid — " +
    "no shuffle join on the corpus side") {
    val plan = planOf(MlEval.kfoldCv(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"got:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"got:\n$plan")
  }
}
