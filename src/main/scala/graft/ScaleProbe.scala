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
      // MICROS-no-UTC feed reads as LTZ at the scan itself (UTC session:
      // bit-identical micros) so ts range predicates reach PushedFilters
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    EngineDefaults(spark)

    // `--stream-only` skips the batch replication/probes (they need the
    // 10x staging write; the streaming probe stages its own feed).
    if (args.contains("--stream-only")) {
      println(f"calib_pre ${Calib.min3(32)}%8.3fs  (32 thr, min-of-3)")
      if (args.contains("--x100"))
        streamingProbe(spark, base,
          Seq(("stream1x", 1, 8), ("stream100x", 100, 800)))
      else streamingProbe(spark, base)
      println(f"calib_post ${Calib.min3(32)}%8.3fs  (32 thr, min-of-3)")
      spark.stop()
      return
    }

    // `--x100` runs the 100x wave (r11 verdict №8) instead of the 10x one.
    if (args.contains("--x100")) {
      x100Probe(spark, base)
      spark.stop()
      return
    }

    // `--x100-graph` extends the 100x wave to the graph family (r12
    // verdict №8): triangles / DBSCAN / HITS at 100x facts.
    if (args.contains("--x100-graph")) {
      x100GraphProbe(spark, base)
      spark.stop()
      return
    }

    // `--r13` probes the round-13 operator wave at 1x/10x over the
    // standard scale10 staging (expects the default 10x run to have
    // staged target/scale10, or stages it fresh when absent).
    if (args.contains("--r13")) {
      r13Probe(spark, base)
      spark.stop()
      return
    }

    // `--x100-r13` (r13 verdict №6): the five costliest wave-2/3
    // operators at 1x vs 100x facts — changepoint's ×3.4 at 10x is the
    // watch item this wave exists to adjudicate.
    if (args.contains("--x100-r13")) {
      x100R13Probe(spark, base)
      spark.stop()
      return
    }

    // `--r14` probes the round-14 operators at 1x/10x over the standard
    // scale10 staging.
    if (args.contains("--r14")) {
      r14Probe(spark, base)
      spark.stop()
      return
    }

    // `--r15`: 1x/10x for this round's additions + rewrites (phash ball,
    // crossmodal contam, rec-coverage histogram form, conformal two-level
    // prefix, driver-side Bradley-Terry).
    if (args.contains("--r15")) {
      r15Probe(spark, base)
      spark.stop()
      return
    }

    // `--x100-r15` (r14 verdict №5): the r14 additions at 1x vs 100x —
    // Kneser-Ney (bigram surface grows with vocab², the watch item),
    // two-level Louvain, substring dedup L=25.
    if (args.contains("--x100-r15")) {
      x100R15Probe(spark, base)
      spark.stop()
      return
    }

    // `--r16` (r15 verdict item 1): 1x/10x matched pairs for the r15
    // multimodal wave's unprobed queries — frame dedup (q358), media
    // quality (q359), CDC chunk dedup (q360). The 10x staging's "r$i "
    // prefix replicas are the CDC showcase: one 3-byte insertion shifts
    // every aligned frame but CDC boundaries re-sync, so q360 recovers
    // cross-replica chunk pairs q358 structurally cannot.
    if (args.contains("--r16")) {
      r16Probe(spark, base)
      spark.stop()
      return
    }

    // `--x100-r16` (r15 verdict items 1+8): 100x payload-bytes axis for
    // the two piece-hash pair-emitters (q358 frame-hash join, q360
    // chunk-hash join — both ride the sharedHashPairs hot-bucket cap),
    // plus the two standing heavyweights without a 100x row (q150
    // setsim, q267 lsh s-curve; q153 got its 100x in the r13 graph
    // wave). Token-tagged replicas = corpus bytes x100 at a constant
    // dup rate (cross-replica text shares nothing, each replica
    // mirrors the 1x near-dup structure), so cost should track corpus
    // bytes and output pairs ~x100.
    if (args.contains("--x100-r16")) {
      x100R16Probe(spark, base)
      spark.stop()
      return
    }

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

    // 10x events with shifted event_ids AND shifted user_ids (disjoint
    // user namespaces per replica, like embeddings' vec_id shift): 10x
    // more users at the SAME per-user density, so the user-keyed probes
    // (attribution's purchase→clicks window join, markov walks, clamped
    // balance, per-user concurrency windows) genuinely scale linearly —
    // keeping user_id fixed would multiply per-user density 10x and blow
    // attribution's in-window expansion up ~100x (r10 advice). The KS
    // probe's distinct-cents VALUE domain is untouched: tallies grow 10x
    // over a fixed domain, so ECDF cost should track the scan
    val ev10 = Tables.load(spark, base, "events")
    rep(ev10) { (d, i) =>
      d.withColumn("event_id", col("event_id") + i * keySpan)
        .withColumn("user_id", col("user_id") + i * keySpan)
    }.write.mode("overwrite").parquet(s"$out/events.parquet")

    Seq("customer", "supplier", "part", "nation", "region")
      .foreach { t =>
        Tables.load(spark, base, t).write.mode("overwrite")
          .parquet(s"$out/$t.parquet")
      }

    // 10x CUSTOMERS in a dedicated dir: customer is a fixed dim for every
    // other probe (replicating it in $out would distort their join
    // shapes), but the r11 geometry/placement ops (dbscan, ring) take
    // customer as their FACT — probe them against a point set that
    // actually grows. dbscan's eps shrinks as 1/√n by design, so expected
    // in-disc neighbors stay ~2 and the grid join should stay linear.
    val outCust = "target/scale10cust"
    rep(Tables.load(spark, base, "customer")) { (d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + i * keySpan)
    }.write.mode("overwrite").parquet(s"$outCust/customer.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    // Platform calibration alongside every probe block (same probe as
    // Bench's calib_sec, at this JVM's local[32] width): the 10× ratios
    // below are only comparable across rounds after dividing by the calib
    // ratio — SCALE.md's projection table cites the normalized values.
    def calib(tag: String): Unit =
      println(f"calib_${tag}%-22s ${Calib.min3(32)}%8.3fs  (32 thr, min-of-3)")
    calib("pre")
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
      // prefix-filter exact similarity join at a 10x duplication rate:
      // replicas form J≈1 cliques, so OUTPUT pairs grow ~45x (C(10,2) per
      // original near-dup) while candidate-generation cost should track
      // the corpus (freq agg + per-doc rank) plus the clique pairs —
      // never documents²
      time(s"setsim_$tag")(operators.Dedup.setsimExact(spark, dir).count())
      // asymmetric containment at the same duplication rate: replica
      // cliques are mutual containments, so output grows like setsim's;
      // the probe watches that the full-index probe join stays linear
      time(s"containment_$tag")(
        operators.Dedup.containmentJoin(spark, dir).count())
      // graph family: 10x FACTS over FIXED dims means the distinct
      // (cust, supp) edge list saturates — cost should track the
      // distinct-input scan (linear), while the iterative rounds' cost
      // (keyed on the saturated edge list) should stay nearly flat
      time(s"pagerank_$tag")(operators.Graph.pagerank(spark, dir).count())
      time(s"degree_stats_$tag")(
        operators.Graph.degreeStats(spark, dir).count())
      // round-9 two-phase ops: 10x facts rank/bucket through the same 64
      // slices — cost should track the scan, the offset table stays 64
      // rows at any scale
      time(s"rank_transform_$tag")(
        operators.Analytics.rankTransform(spark, dir).count())
      // shared support-2 pair stage priced SEPARATELY (the Bench
      // discipline): its three consumers below then report marginal
      // cost. Basket self-join at 10x line items over FIXED parts:
      // pair generation scales with Σb² over 10x baskets — linear
      operators.Graph.clearStageCaches()
      time(s"support2_stage_$tag") {
        operators.Graph.materializeSupport2(spark, dir); 0L }
      time(s"copurchase_$tag")(
        operators.Analytics.copurchase(spark, dir).count())
      // iterative peel at 10x: support-2 edges densify (10x co-purchase
      // support), rounds stay bounded by cascade depth — the probe
      // watches per-round cost, which is keyed on the edge list
      time(s"kcore_$tag")(operators.Graph.kcore(spark, dir).count())
      // fixed-round LPA over the same densified edge list: 4 rounds of
      // one edge-keyed join + two partial aggs — cost per round is
      // O(edges), so the 10x ratio should track the edge densification
      time(s"lpa_$tag")(
        operators.Graph.labelPropagation(spark, dir).count())
      // AS-OF union trick at 10x facts per customer: ONE hash exchange
      // on cust + a per-partition sort over the 10x-deep tagged stream —
      // the probe watches that no range join creeps in (linear-ish)
      time(s"temporal_join_$tag")(
        operators.JoinsSetOps.temporalJoin(spark, dir).count())
      // two-phase distributed ECDF at 10x tallies over a FIXED value
      // domain: per-value group rows are constant, offsets stay 64 —
      // cost should track the events scan
      time(s"ks_drift_$tag")(
        operators.DataQuality.ksDrift(spark, dir).count())
      // snapshot diff at 10x keys: scan-local fingerprints, the
      // full-outer join shuffles (key, fp, cents) only — linear in keys
      time(s"table_diff_$tag")(
        operators.Relational.tableDiff(spark, dir).count())
      // round-10 ops over the replicated events: the attribution join's
      // expansion is bounded by per-user in-window activity (replicas
      // live in disjoint user namespaces, so per-user density is FIXED
      // and the window join grows ~linearly with users); the gini
      // rank recipe and the concurrency sweep both ride the two-phase
      // prefix sum — no single-partition sort to blow up
      time(s"attribution_$tag")(
        operators.Analytics.attribution(spark, dir).count())
      time(s"gini_$tag")(operators.Analytics.gini(spark, dir).count())
      time(s"max_concurrency_$tag")(
        operators.Analytics.maxConcurrency(spark, dir).count())
      // second round-10 batch: the Apriori mine (candidates bounded by
      // the pair prefix-join), the two-window clamped-balance closed
      // form, the two-phase prefix-max lateness histogram, and the
      // sequence-walk transition matrix — all one-exchange shapes that
      // should track the scan, not the corpus order
      time(s"itemsets3_$tag")(
        operators.Graph.itemsets3(spark, dir).count())
      time(s"clamped_balance_$tag")(
        operators.Analytics.clampedBalance(spark, dir).count())
      time(s"lateness_$tag")(
        operators.DataQuality.latenessHistogram(spark, dir).count())
      time(s"markov_$tag")(
        operators.Analytics.markovTransitions(spark, dir).count())
      // r11: the session-2 tail (r10 verdict №5). cheapest_path rides the
      // support-2 stage priced above — its marginal cost is 4 relaxation
      // rounds, O(edges) each, so the 10x ratio should track the edge
      // densification like kcore/lpa. incremental_sessions' cost is
      // delta-scan + user-keyed merge: 10x users at fixed per-user
      // density (disjoint namespaces) → linear. sketch_rollup is one
      // corpus scan into ≤O(days) 64-register sketches; the merge fold
      // is day-bounded, so the ratio should track the scan.
      time(s"cheapest_path_$tag")(
        operators.Graph.cheapestPath(spark, dir).count())
      time(s"incremental_sessions_$tag")(
        operators.Analytics.incrementalSessions(spark, dir).count())
      time(s"sketch_rollup_$tag")(
        operators.ApproxAgg.sketchRollup(spark, dir).count())
      // r11 second wave. clustering_coeff enumerates triangles on the
      // densified support-2 graph (10x facts over fixed parts densify
      // edges) — expect a kcore/lpa-like super-linear ratio tracking
      // edge growth, bounded by arboricity, never corpus². spearman's
      // cost is two midrank maps + one cents-keyed equi-join — scan-
      // dominated, ~linear. roc_auc collapses to the FIXED score
      // domain, so the window input is constant — the scan is the
      // whole cost, ~linear (flat past overhead).
      time(s"clustering_coeff_$tag")(
        operators.Graph.clusteringCoeff(spark, dir).count())
      time(s"spearman_$tag")(
        operators.MlEval.spearman(spark, dir).count())
      time(s"roc_auc_$tag")(
        operators.MlEval.rocAuc(spark, dir).count())
      // r11 third wave. pca_power's corpus stage is the per-vec_id Gram
      // self-join (64 rows a side per vector → linear in vectors); the
      // four mat-vec rounds run on the bounded 64x64 relation — expect
      // ~linear. acf collapses to the fixed ~2.4k-day relation — the
      // daily rollup scan is the whole 10x cost. policy_replay is one
      // shared-spec window over 10x users at fixed per-user depth —
      // linear. isotonic's corpus stage is the 64-bin partial agg; the
      // minimax triple-join is bounded — scan-dominated.
      time(s"pca_power_$tag")(
        operators.Similarity.pcaPower(spark, dir).count())
      time(s"acf_$tag")(operators.Analytics.acf(spark, dir).count())
      time(s"policy_replay_$tag")(
        operators.MlEval.policyReplay(spark, dir).count())
      time(s"isotonic_$tag")(
        operators.MlEval.isotonic(spark, dir).count())
      // r11 fourth wave: next_item's marginal cost over the (already
      // probed) support-2 stage is the candidate join — bounded by
      // query-parts × pair-degree; shapley's corpus cost is one
      // 550-cell partial agg, everything after is bounded rollups
      time(s"next_item_$tag")(
        operators.Graph.nextItemEval(spark, dir).count())
      time(s"shapley_$tag")(
        operators.MlEval.shapleyR2(spark, dir).count())
      // r12 wave (r11 verdict №5): hits' four half-rounds are edge-keyed
      // join+aggs over the distinct cust×part relation, O(edges) each —
      // 10x facts over FIXED dims saturate that edge list (the pagerank
      // regime), so the ratio reads against distinct-edge growth, not
      // raw facts. lsh_scurve pools candidates from two generators over
      // ONE shared 64-perm signature stage: the signature stage is
      // linear in docs, pooled pairs grow with the replica cliques
      // (~45x output like setsim) — the probe watches that the exact-J
      // verification stays candidate-bounded. semantic_dedup's pair
      // generation is cluster-bounded (k = n/32 keeps ~32-member
      // cells); exact replica cliques are cut within cells, never
      // across the corpus.
      time(s"hits_$tag")(operators.Graph.hits(spark, dir).count())
      time(s"lsh_scurve_$tag")(
        operators.Dedup.lshScurve(spark, dir).count())
      time(s"semantic_dedup_$tag")(
        operators.Dedup.semanticDedup(spark, dir).count())
      // r12 second wave. link_prediction's wedge join enumerates
      // Σ C(deg z, 2) open triads on the densified support-2 graph —
      // expect a kcore/triangles-like super-linear ratio tracking edge
      // growth, bounded by the support cut, never parts². ndcg and
      // rec_coverage are marginal consumers of the priced stage
      // (candidate join bounded by query-parts × pair-degree;
      // exposure census dimension-bounded). tree_depth2 is ONE corpus
      // pass to ≤3,200 cells — scan-dominated, ~linear. seq_pairs
      // collapses to ≤5 rows/user (disjoint user namespaces → linear).
      // rp_jl's projection is one explode+broadcast-join partial agg —
      // linear; its audit grid is FIXED (20×50 original ids), so the
      // audit cost is flat and the projection is what scales. knn_eval
      // is DELIBERATELY the brute-force audit: queries and corpus both
      // grow 10x → ~100x candidate pairs; the measured blowup is the
      // evidence for swapping the candidate generator to the q289
      // persisted IVF-PQ probe at scale (protocol invariant) — the
      // probe prices the flat path honestly rather than hiding it.
      time(s"link_prediction_$tag")(
        operators.Graph.linkPrediction(spark, dir).count())
      time(s"ndcg_$tag")(operators.Graph.ndcgEval(spark, dir).count())
      time(s"rec_coverage_$tag")(
        operators.Graph.recCoverage(spark, dir).count())
      time(s"tree_depth2_$tag")(
        operators.MlEval.treeDepth2(spark, dir).count())
      time(s"seq_pairs_$tag")(
        operators.Analytics.seqPairs(spark, dir).count())
      time(s"rp_jl_$tag")(operators.Similarity.rpJl(spark, dir).count())
      time(s"knn_eval_$tag")(
        operators.Similarity.knnEval(spark, dir).count())
      // r12 third wave. retrieval_agreement's lexical side is the
      // 20-query token posting join (bounded by the FIXED query slice
      // times posting-list growth — near-dup replicas inflate postings
      // ~10x); the dense side is the q38-audit shape. kaplan_meier and
      // hill_tail collapse to bounded relations (duration census /
      // top-101) — the scan is the whole cost. anova and wilcoxon are
      // one dim-join partial agg each — linear. seq of both stays
      // scan-dominated.
      time(s"retrieval_agree_$tag")(
        operators.Similarity.retrievalAgreement(spark, dir).count())
      time(s"kaplan_meier_$tag")(
        operators.Analytics.kaplanMeier(spark, dir).count())
      time(s"hill_tail_$tag")(
        operators.Analytics.hillTail(spark, dir).count())
      time(s"anova_$tag")(operators.MlEval.anova(spark, dir).count())
      time(s"wilcoxon_$tag")(
        operators.MlEval.wilcoxon(spark, dir).count())
    }

    // geometry/placement probes: customer as the growing FACT (see the
    // scale10cust staging note). dbscan's density-scaled eps keeps
    // expected neighbors fixed, so candidates and CC edges grow ~n; the
    // ring's broadcast NL join is keys x 144 — strictly linear.
    for (round <- 1 to 2; (tag, dir) <- Seq("1x" -> base,
        "10x" -> outCust)) {
      println(s"--- customer-fact $tag round $round ($dir) ---")
      time(s"dbscan_$tag")(operators.Graph.dbscan(spark, dir).count())
      time(s"ring_rebalance_$tag")(
        operators.Layout.ringRebalance(spark, dir).count())
    }

    calib("post_batch")
    streamingProbe(spark, base)
    calib("post_stream")
    spark.stop()
  }

  /** 100× weak-scaling wave (r11 verdict №8): convert the flagship
    * families' "would survive 100×" claims from extrapolated 10× ratios
    * to measured ones. Staging differs DELIBERATELY from the 10× wave:
    * there, replicas are near-dup cliques (max duplication rate — the
    * dedup worst case); here, document words carry a per-replica tag so
    * replicas are shingle-DISJOINT and the natural in-replica dup rate
    * is held CONSTANT while the corpus grows 100× — a 100-member clique
    * per doc would C(100,2) ≈ 5000× the verify stage by construction
    * (and trip the hot-bucket cap), measuring the clique, not the
    * scale-out. Embedding replicas stay exact dups: their cliques live
    * INSIDE ~bounded cells, which is precisely the boundedness being
    * probed. Facts shift keys into disjoint namespaces (events also
    * shift user_id: fixed per-user density — the r10 lesson). One timed
    * round per scale, flagships only: candidate-join dedup, CC, the
    * 64-bucket prefix-sum recipe, two-phase ECDF, and the watermarked
    * streaming agg at a 100× time axis (800 micro-batches, same
    * per-file volume as the 1× feed). */
  /** Round-13 wave, 1x vs 10x (same staging discipline as the default
    * probe): stats/eval ops that collapse to bounded relations should be
    * scan-dominated; the text-selection pair rides the token shuffle;
    * substring dedup sees the replica near-dup cliques as REAL
    * cross-doc spans (every non-marker window of a replica duplicates
    * the original — the 10x duplication-rate stress); the clustering
    * audits ride the k·N dense score pass, which grows 100x when both k
    * and N grow 10x — the declared q289-probe swap point, same as
    * q37/q296. */
  private def r13Probe(spark: SparkSession, base: String): Unit = {
    val out = "target/scale10"
    val keySpan = 100000000L
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    def calib(tag: String): Unit =
      println(f"calib_${tag}%-22s ${Calib.min3(32)}%8.3fs  (32 thr, min-of-3)")
    if (!new java.io.File(s"$out/documents.parquet").exists()) {
      def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
        (0 until 10).map(i => f(df, i)).reduce(_ unionByName _)
      rep(Tables.load(spark, base, "documents")) { (d, i) =>
        d.withColumn("doc_id", col("doc_id") + i * keySpan)
          .withColumn("text",
            if (i == 0) col("text") else concat(lit(s"r$i "), col("text")))
      }.write.mode("overwrite").parquet(s"$out/documents.parquet")
      rep(Tables.load(spark, base, "orders")) { (d, i) =>
        d.withColumn("o_orderkey", col("o_orderkey") + i * keySpan)
      }.write.mode("overwrite").parquet(s"$out/orders.parquet")
      rep(Tables.load(spark, base, "lineitem")) { (d, i) =>
        d.withColumn("l_orderkey", col("l_orderkey") + i * keySpan)
      }.write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      rep(Tables.load(spark, base, "embeddings")) { (d, i) =>
        d.withColumn("vec_id", col("vec_id") + i * keySpan)
      }.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
        Tables.load(spark, base, t).write.mode("overwrite")
          .parquet(s"$out/$t.parquet")
      }
    }
    calib("pre")
    Seq(base, out).foreach { d =>
      operators.Relational.starFact(spark, d).count()
      operators.Dedup.exact(spark, d).count()
    }
    for (round <- 1 to 2; (tag, dir) <- Seq("1x" -> base, "10x" -> out)) {
      println(s"--- $tag round $round ($dir) ---")
      time(s"logrank_$tag")(operators.Analytics.logRank(spark, dir).count())
      time(s"mann_whitney_$tag")(
        operators.MlEval.mannWhitney(spark, dir).count())
      time(s"kendall_tau_$tag")(
        operators.MlEval.kendallTau(spark, dir).count())
      time(s"conformal_$tag")(operators.MlEval.conformal(spark, dir).count())
      time(s"logistic_irls_$tag")(
        operators.MlEval.logisticIrls(spark, dir).count())
      time(s"bradley_terry_$tag")(
        operators.MlEval.bradleyTerry(spark, dir).count())
      time(s"moore_lewis_$tag")(
        operators.TextAnalysis.mooreLewis(spark, dir).count())
      time(s"dsir_weights_$tag")(
        operators.TextAnalysis.dsirWeights(spark, dir).count())
      time(s"substr_dedup_$tag")(
        operators.Dedup.substringDedup(spark, dir).count())
      // shared k-means stage priced separately (the Bench discipline);
      // the audits below then report marginal cost
      operators.Dedup.clearStageCaches()
      time(s"kmeans_stage_$tag") {
        operators.Dedup.materializeCells(spark, dir); 0L }
      time(s"silhouette_$tag")(
        operators.Dedup.silhouette(spark, dir).count())
      time(s"davies_bouldin_$tag")(
        operators.Dedup.daviesBouldin(spark, dir).count())
      // wave 2: bounded-census stats (scan-dominated expected), the
      // CV/causal pair (one cell grid + one scoring scan), and the
      // token-census text gauges (one token shuffle each)
      time(s"cochran_armitage_$tag")(
        operators.MlEval.cochranArmitage(spark, dir).count())
      time(s"ipw_ate_$tag")(operators.MlEval.ipwAte(spark, dir).count())
      time(s"mcnemar_$tag")(operators.MlEval.mcnemar(spark, dir).count())
      time(s"levene_$tag")(operators.MlEval.levene(spark, dir).count())
      time(s"kfold_cv_$tag")(operators.MlEval.kfoldCv(spark, dir).count())
      time(s"partial_corr_$tag")(
        operators.MlEval.partialCorr(spark, dir).count())
      time(s"heaps_law_$tag")(
        operators.TextAnalysis.heapsLaw(spark, dir).count())
      time(s"vocab_coverage_$tag")(
        operators.TextAnalysis.vocabCoverage(spark, dir).count())
      time(s"js_divergence_$tag")(
        operators.TextAnalysis.jsDivergence(spark, dir).count())
      time(s"distinct_n_$tag")(
        operators.TextAnalysis.distinctN(spark, dir).count())
      // wave 3: all bounded-census shapes — the scans are the cost
      time(s"gumbel_$tag")(
        operators.Analytics.gumbelMaxima(spark, dir).count())
      time(s"changepoint_$tag")(
        operators.Analytics.changepoint(spark, dir).count())
      time(s"theil_sen_$tag")(
        operators.Analytics.theilSen(spark, dir).count())
      time(s"mase_$tag")(operators.Analytics.mase(spark, dir).count())
      time(s"jarque_bera_$tag")(
        operators.MlEval.jarqueBera(spark, dir).count())
      time(s"eb_shrinkage_$tag")(
        operators.MlEval.ebShrinkage(spark, dir).count())
    }
    calib("post")
  }

  /** 100x graph wave (r12 verdict №8). The x100 staging replicates
    * FACTS with shifted order/vec keys over FIXED dims, so the distinct
    * co-occurrence graphs SATURATE: every replica contributes the same
    * (part, part) and (cust, part) pairs. That is the measurement — at
    * 100x facts the graph ops' cost must track the scan + distinct
    * collapse while the per-edge iterative work stays FLAT (the edge
    * census printed alongside proves the axis). DBSCAN takes customer
    * as its FACT, so it gets a dedicated 100x point set (the scale10cust
    * discipline); eps shrinks 1/√n keeping expected in-disc neighbors
    * ~2 — the candidate join should stay linear. */
  /** 1x/100x matched pairs for the five costliest round-13 wave-2/3
    * operators (by 10x cost: changepoint 2.32 s, theil_sen 1.52,
    * kfold_cv 1.33, levene 1.14, distinct_n 0.99). Growth axes: orders
    * facts ×100 over a FIXED date span and dim set (the bounded-census
    * claim under test: day/month/cell censuses stay constant-size while
    * tallies grow), documents ×100 with per-replica token prefixes so
    * the vocabulary ALSO grows ×100 (distinct_n's state is
    * vocab-domain — it must grow with vocab, not corpus). Stages only
    * the tables these five read, per-file idempotent. */
  private def x100R13Probe(spark: SparkSession, base: String): Unit = {
    val out = "target/scale100"
    val keySpan = 100000000L
    val reps = 100
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    def calib(tag: String): Unit =
      println(f"calib_${tag}%-22s ${Calib.min3(32)}%8.3fs  (32 thr, min-of-3)")
    def repped(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(reps).toDF("rep"))
    if (!new java.io.File(s"$out/orders.parquet").exists())
      repped(Tables.load(spark, base, "orders"))
        .withColumn("o_orderkey", col("o_orderkey") + col("rep") * keySpan)
        .drop("rep")
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
    if (!new java.io.File(s"$out/documents.parquet").exists())
      repped(Tables.load(spark, base, "documents"))
        .withColumn("doc_id", col("doc_id") + col("rep") * keySpan)
        .withColumn("text", concat_ws(" ",
          transform(split(col("text"), " "),
            w => concat(lit("r"), col("rep"), lit("_"), w))))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
    Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
      if (!new java.io.File(s"$out/$t.parquet").exists())
        Tables.load(spark, base, t).write.mode("overwrite")
          .parquet(s"$out/$t.parquet")
    }
    calib("pre")
    Seq(base, out).foreach { d =>
      operators.Analytics.changepoint(spark, d).count()
    }
    for (round <- 1 to 2; (tag, dir) <- Seq("1x" -> base, "100x" -> out)) {
      println(s"--- $tag round $round ($dir) ---")
      time(s"changepoint_$tag")(
        operators.Analytics.changepoint(spark, dir).count())
      time(s"theil_sen_$tag")(
        operators.Analytics.theilSen(spark, dir).count())
      time(s"kfold_cv_$tag")(operators.MlEval.kfoldCv(spark, dir).count())
      time(s"levene_$tag")(operators.MlEval.levene(spark, dir).count())
      time(s"distinct_n_$tag")(
        operators.TextAnalysis.distinctN(spark, dir).count())
    }
    calib("post")
  }

  /** 1x/10x matched pairs for the round-14 operators over the standard
    * scale10 staging (near-dup document replicas, orderkey-shifted fact
    * replicas, fixed dims). Memoized stages (BPE merge table, support-2
    * pairs) are cleared at each round boundary so both rounds pay the
    * stage build — the matched-pair discipline. The Avro staged-dir
    * memo is NOT cleared: like the bench, the one-time staged write is
    * priced out and the round-trip READ path is what's timed. */
  private def r14Probe(spark: SparkSession, base: String): Unit = {
    val out = "target/scale10"
    val keySpan = 100000000L
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    def calib(tag: String): Unit =
      println(f"calib_${tag}%-22s ${Calib.min3(32)}%8.3fs  (32 thr, min-of-3)")
    if (!new java.io.File(s"$out/documents.parquet").exists()) {
      def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
        (0 until 10).map(i => f(df, i)).reduce(_ unionByName _)
      rep(Tables.load(spark, base, "documents")) { (d, i) =>
        d.withColumn("doc_id", col("doc_id") + i * keySpan)
          .withColumn("text",
            if (i == 0) col("text") else concat(lit(s"r$i "), col("text")))
      }.write.mode("overwrite").parquet(s"$out/documents.parquet")
      rep(Tables.load(spark, base, "orders")) { (d, i) =>
        d.withColumn("o_orderkey", col("o_orderkey") + i * keySpan)
      }.write.mode("overwrite").parquet(s"$out/orders.parquet")
      rep(Tables.load(spark, base, "lineitem")) { (d, i) =>
        d.withColumn("l_orderkey", col("l_orderkey") + i * keySpan)
      }.write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      rep(Tables.load(spark, base, "embeddings")) { (d, i) =>
        d.withColumn("vec_id", col("vec_id") + i * keySpan)
      }.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
        Tables.load(spark, base, t).write.mode("overwrite")
          .parquet(s"$out/$t.parquet")
      }
    }
    calib("pre")
    Seq(base, out).foreach { d =>
      operators.Relational.starFact(spark, d).count()
    }
    for (round <- 1 to 2; (tag, dir) <- Seq("1x" -> base, "10x" -> out)) {
      operators.Dedup.clearStageCaches()
      operators.Graph.clearStageCaches()
      operators.TextAnalysis.clearStageCaches()
      println(s"--- $tag round $round ($dir) ---")
      time(s"bpe_merges_$tag")(
        operators.TextAnalysis.bpeMergeTable(spark, dir).count())
      time(s"bpe_encode_$tag")(
        operators.TextAnalysis.bpeEncode(spark, dir).count())
      time(s"louvain_$tag")(operators.Graph.louvain(spark, dir).count())
      time(s"substr_l25_$tag")(
        operators.Dedup.substringDedup25(spark, dir).count())
      time(s"avro_roundtrip_$tag")(
        operators.Relational.avroRoundTrip(spark, dir).count())
      time(s"theil_sen_$tag")(
        operators.Analytics.theilSen(spark, dir).count())
      time(s"logrank_$tag")(
        operators.Analytics.logRank(spark, dir).count())
      time(s"davies_bouldin_$tag")(
        operators.Dedup.daviesBouldin(spark, dir).count())
      time(s"mmr_rerank_$tag")(
        operators.Similarity.mmrRerank(spark, dir).count())
      time(s"kneser_ney_$tag")(
        operators.TextAnalysis.kneserNey(spark, dir).count())
      time(s"mann_kendall_$tag")(
        operators.Analytics.mannKendall(spark, dir).count())
      time(s"louvain_two_level_$tag")(
        operators.Graph.louvainTwoLevel(spark, dir).count())
    }
    calib("post")
  }

  private def r15Probe(spark: SparkSession, base: String): Unit = {
    val out = "target/scale10"
    val keySpan = 100000000L
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    def calib(tag: String): Unit =
      println(f"calib_${tag}%-22s ${Calib.min3(32)}%8.3fs  (32 thr, min-of-3)")
    if (!new java.io.File(s"$out/documents.parquet").exists()) {
      def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
        (0 until 10).map(i => f(df, i)).reduce(_ unionByName _)
      rep(Tables.load(spark, base, "documents")) { (d, i) =>
        d.withColumn("doc_id", col("doc_id") + i * keySpan)
          .withColumn("text",
            if (i == 0) col("text") else concat(lit(s"r$i "), col("text")))
      }.write.mode("overwrite").parquet(s"$out/documents.parquet")
      rep(Tables.load(spark, base, "orders")) { (d, i) =>
        d.withColumn("o_orderkey", col("o_orderkey") + i * keySpan)
      }.write.mode("overwrite").parquet(s"$out/orders.parquet")
      rep(Tables.load(spark, base, "lineitem")) { (d, i) =>
        d.withColumn("l_orderkey", col("l_orderkey") + i * keySpan)
      }.write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      rep(Tables.load(spark, base, "embeddings")) { (d, i) =>
        d.withColumn("vec_id", col("vec_id") + i * keySpan)
      }.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
        Tables.load(spark, base, t).write.mode("overwrite")
          .parquet(s"$out/$t.parquet")
      }
    }
    calib("pre")
    Seq(base, out).foreach { d =>
      operators.Relational.starFact(spark, d).count()
    }
    for (round <- 1 to 2; (tag, dir) <- Seq("1x" -> base, "10x" -> out)) {
      operators.Dedup.clearStageCaches()
      println(s"--- $tag round $round ($dir) ---")
      time(s"kmeans_stage_$tag") {
        operators.Dedup.materializeCells(spark, dir); 0L }
      time(s"phash_ball_$tag")(
        operators.Multimodal.mediaPhashBall(spark, dir).count())
      time(s"crossmodal_contam_$tag")(
        operators.Multimodal.crossmodalContam(spark, dir).count())
      time(s"rec_coverage_$tag")(
        operators.Graph.recCoverage(spark, dir).count())
      time(s"conformal_$tag")(
        operators.MlEval.conformal(spark, dir).count())
      time(s"bradley_terry_$tag")(
        operators.MlEval.bradleyTerry(spark, dir).count())
    }
    calib("post")
  }

  private def r16Probe(spark: SparkSession, base: String): Unit = {
    val out = "target/scale10"
    val keySpan = 100000000L
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    def calib(tag: String): Unit =
      println(f"calib_${tag}%-22s ${Calib.min3(32)}%8.3fs  (32 thr, min-of-3)")
    if (!new java.io.File(s"$out/documents.parquet").exists()) {
      def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
        (0 until 10).map(i => f(df, i)).reduce(_ unionByName _)
      rep(Tables.load(spark, base, "documents")) { (d, i) =>
        d.withColumn("doc_id", col("doc_id") + i * keySpan)
          .withColumn("text",
            if (i == 0) col("text") else concat(lit(s"r$i "), col("text")))
      }.write.mode("overwrite").parquet(s"$out/documents.parquet")
    }
    calib("pre")
    Seq(base, out).foreach { d =>
      operators.Multimodal.mediaQuality(spark, d).count()
    }
    for (round <- 1 to 2; (tag, dir) <- Seq("1x" -> base, "10x" -> out)) {
      println(s"--- $tag round $round ($dir) ---")
      time(s"frame_dedup_$tag")(
        operators.Multimodal.frameDedup(spark, dir).count())
      System.gc() // piece-hash dedups localCheckpoint (cutLineage)
      time(s"media_quality_$tag")(
        operators.Multimodal.mediaQuality(spark, dir).count())
      time(s"cdc_chunks_$tag")(
        operators.Multimodal.cdcChunkDedup(spark, dir).count())
      System.gc()
    }
    calib("post")
  }

  private def x100R16Probe(spark: SparkSession, base: String): Unit = {
    val out = "target/scale100"
    val keySpan = 100000000L
    val reps = 100
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    def calib(tag: String): Unit =
      println(f"calib_${tag}%-22s ${Calib.min3(32)}%8.3fs  (32 thr, min-of-3)")
    def repped(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(reps).toDF("rep"))
    if (!new java.io.File(s"$out/documents.parquet").exists()) {
      // token-tagged replicas (the x100-r15 recipe): replica r's tokens
      // only match within replica r, so similarity/piece structure per
      // replica mirrors 1x — corpus bytes x100 at a constant dup rate
      repped(Tables.load(spark, base, "documents"))
        .withColumn("doc_id", col("doc_id") + col("rep") * keySpan)
        .withColumn("text", concat_ws(" ",
          transform(split(col("text"), " "),
            w => concat(lit("r"), col("rep"), lit("_"), w))))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
    }
    calib("pre")
    Seq(base, out).foreach { d =>
      operators.Multimodal.mediaQuality(spark, d).count()
    }
    for (round <- 1 to 2; (tag, dir) <- Seq("1x" -> base, "100x" -> out)) {
      operators.Dedup.clearStageCaches()
      println(s"--- $tag round $round ($dir) ---")
      time(s"frame_dedup_$tag")(
        operators.Multimodal.frameDedup(spark, dir).count())
      System.gc()
      time(s"cdc_chunks_$tag")(
        operators.Multimodal.cdcChunkDedup(spark, dir).count())
      System.gc()
      time(s"shingle_stage_$tag") {
        operators.Dedup.materializeShingles(spark, dir); 0L }
      time(s"setsim_exact_$tag")(
        operators.Dedup.setsimExact(spark, dir).count())
      System.gc()
      time(s"lsh_scurve_$tag")(
        operators.Dedup.lshScurve(spark, dir).count())
      System.gc()
    }
    calib("post")
  }

  private def x100R15Probe(spark: SparkSession, base: String): Unit = {
    val out = "target/scale100"
    val keySpan = 100000000L
    val reps = 100
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    def calib(tag: String): Unit =
      println(f"calib_${tag}%-22s ${Calib.min3(32)}%8.3fs  (32 thr, min-of-3)")
    def repped(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(reps).toDF("rep"))
    if (!new java.io.File(s"$out/documents.parquet").exists()) {
      // replica-tagged tokens: vocab grows ~100x too — the honest shape
      // for Kneser-Ney, whose continuation census rides the bigram TYPE
      // surface (each replica's tokens only pair within the replica)
      repped(Tables.load(spark, base, "documents"))
        .withColumn("doc_id", col("doc_id") + col("rep") * keySpan)
        .withColumn("text", concat_ws(" ",
          transform(split(col("text"), " "),
            w => concat(lit("r"), col("rep"), lit("_"), w))))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      repped(Tables.load(spark, base, "orders"))
        .withColumn("o_orderkey", col("o_orderkey") + col("rep") * keySpan)
        .drop("rep")
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      repped(Tables.load(spark, base, "lineitem"))
        .withColumn("l_orderkey", col("l_orderkey") + col("rep") * keySpan)
        .drop("rep")
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
        Tables.load(spark, base, t).write.mode("overwrite")
          .parquet(s"$out/$t.parquet")
      }
    }
    calib("pre")
    Seq(base, out).foreach { d =>
      operators.Relational.starFact(spark, d).count()
    }
    for (round <- 1 to 2; (tag, dir) <- Seq("1x" -> base, "100x" -> out)) {
      operators.Graph.clearStageCaches()
      println(s"--- $tag round $round ($dir) ---")
      time(s"kneser_ney_$tag")(
        operators.TextAnalysis.kneserNey(spark, dir).count())
      time(s"support2_stage_$tag") {
        operators.Graph.materializeSupport2(spark, dir); 0L }
      time(s"louvain_l1_stage_$tag") {
        operators.Graph.materializeLouvainL1(spark, dir); 0L }
      time(s"louvain_two_level_$tag")(
        operators.Graph.louvainTwoLevel(spark, dir).count())
      time(s"substr_l25_$tag")(
        operators.Dedup.substringDedup25(spark, dir).count())
    }
    calib("post")
  }

  private def x100GraphProbe(spark: SparkSession, base: String): Unit = {
    val out = "target/scale100"
    val outCust = "target/scale100cust"
    val keySpan = 100000000L
    val reps = 100
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    def calib(tag: String): Unit =
      println(f"calib_${tag}%-22s ${Calib.min3(32)}%8.3fs  (32 thr, min-of-3)")
    def repped(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(reps).toDF("rep"))
    if (!new java.io.File(s"$out/lineitem.parquet").exists()) {
      repped(Tables.load(spark, base, "orders"))
        .withColumn("o_orderkey", col("o_orderkey") + col("rep") * keySpan)
        .drop("rep")
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      repped(Tables.load(spark, base, "lineitem"))
        .withColumn("l_orderkey", col("l_orderkey") + col("rep") * keySpan)
        .drop("rep")
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
        Tables.load(spark, base, t).write.mode("overwrite")
          .parquet(s"$out/$t.parquet")
      }
    }
    if (!new java.io.File(s"$outCust/customer.parquet").exists())
      repped(Tables.load(spark, base, "customer"))
        .withColumn("c_custkey", col("c_custkey") + col("rep") * keySpan)
        .drop("rep")
        .write.mode("overwrite").parquet(s"$outCust/customer.parquet")

    calib("pre")
    Seq(base, out).foreach { d =>
      operators.Relational.starFact(spark, d).count()
    }
    // edge-axis census: distinct co-purchase edges + distinct (c, p)
    // bipartite edges — the denominators every ratio below reads against
    for ((tag, dir) <- Seq("1x" -> base, "100x" -> out)) {
      val l = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val ecnt = l.as("a").join(l.as("b"), Seq("ok"))
        .filter(col("a.pk") < col("b.pk"))
        .select(col("a.pk"), col("b.pk")).distinct().count()
      val bcnt = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("l_partkey")).distinct().count()
      println(s"edge_census_$tag  copurchase=$ecnt  bipartite=$bcnt")
    }
    for ((tag, dir) <- Seq("1x" -> base, "100x" -> out)) {
      println(s"--- $tag ($dir) ---")
      time(s"triangles_$tag")(operators.Graph.triangles(spark, dir).count())
      time(s"hits_$tag")(operators.Graph.hits(spark, dir).count())
    }
    for ((tag, dir) <- Seq("1x" -> base, "100x" -> outCust)) {
      time(s"dbscan_$tag")(operators.Graph.dbscan(spark, dir).count())
    }
    calib("post")
  }

  private def x100Probe(spark: SparkSession, base: String): Unit = {
    val out = "target/scale100"
    val keySpan = 100000000L
    val reps = 100
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    def calib(tag: String): Unit =
      println(f"calib_${tag}%-22s ${Calib.min3(32)}%8.3fs  (32 thr, min-of-3)")
    def repped(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(reps).toDF("rep"))
    repped(Tables.load(spark, base, "documents"))
      .withColumn("doc_id", col("doc_id") + col("rep") * keySpan)
      .withColumn("text", concat_ws(" ",
        transform(split(col("text"), " "),
          w => concat(lit("r"), col("rep"), lit("_"), w))))
      .drop("rep")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    repped(Tables.load(spark, base, "orders"))
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * keySpan)
      .drop("rep")
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    repped(Tables.load(spark, base, "lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * keySpan)
      .drop("rep")
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    repped(Tables.load(spark, base, "embeddings"))
      .withColumn("vec_id", col("vec_id") + col("rep") * keySpan)
      .drop("rep")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    repped(Tables.load(spark, base, "events"))
      .withColumn("event_id", col("event_id") + col("rep") * keySpan)
      .withColumn("user_id", col("user_id") + col("rep") * keySpan)
      .drop("rep")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    // dims copied 1:1 (the realistic growth shape: more facts per
    // unchanged dimension) — starFact and friends need them present
    Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
      Tables.load(spark, base, t).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    }

    calib("pre")
    // warm both dirs outside timing
    Seq(base, out).foreach { d =>
      operators.Relational.starFact(spark, d).count()
      operators.Dedup.exact(spark, d).count()
    }
    for ((tag, dir) <- Seq("1x" -> base, "100x" -> out)) {
      println(s"--- $tag ($dir) ---")
      // relational scan/join baseline: the pure-linear reference line
      time(s"star_fact_$tag")(
        operators.Relational.starFact(spark, dir).count())
      // dedup candidate joins: signature stage linear in docs, pairs
      // track bucket collisions at the CONSTANT natural dup rate
      time(s"minhash_$tag")(operators.Dedup.minhash(spark, dir).count())
      // embedding dedup: k = min(4096, n/32) — the cap binds at 100x
      // (200k vecs → 4096 cells of ~49), so pairs/cell grow ~(49/32)²;
      // the probe reads the candidate join against THAT, never n²
      time(s"emb_dedup_$tag")(
        operators.Dedup.embeddingCosine(spark, dir).count())
      // CC at 100x edges (in-replica near-dup pairs only): pointer
      // jumping should stay O(log n) rounds, cost O(edges) per round
      operators.Dedup.clearStageCaches()
      time(s"cc_labels_stage_$tag") {
        operators.Dedup.materializeLabels(spark, dir); 0L }
      time(s"dup_clusters_$tag")(
        operators.Dedup.dupClusters(spark, dir).count())
      // 64-bucket prefix-sum recipe: offset table stays 64 rows at any
      // scale; cost should track the scan
      time(s"rank_transform_$tag")(
        operators.Analytics.rankTransform(spark, dir).count())
      // two-phase distributed ECDF over the 100x events
      time(s"ks_drift_$tag")(
        operators.DataQuality.ksDrift(spark, dir).count())
    }
    calib("post_batch")
    streamingProbe(spark, base,
      Seq(("stream1x", 1, 8), ("stream100x", 100, 800)))
    calib("post_stream")
  }

  /** Streaming rate/backpressure probe: the same watermarked tumbling
    * aggregation over a 1x and a 10x events feed, staged as time-ordered
    * chunk files replayed one file per micro-batch (maxFilesPerTrigger=1),
    * APPEND mode — so the watermark genuinely advances between batches and
    * evicts closed windows from the state store. The 10x feed extends the
    * TIME axis (replica i shifts ts by i*span), the worst case for naive
    * state: 10x the windows ever seen. Evidence for the watermark-bounded-
    * state claim = peak state-store rows stay flat at 1x vs 10x (bounded by
    * watermark horizon / window size × event types, NOT by input size)
    * while rows/s stays in the same band. */
  private def streamingProbe(spark: SparkSession, base: String,
      cases: Seq[(String, Int, Int)] =
        Seq(("stream1x", 1, 8), ("stream10x", 10, 80))): Unit = {
    import java.nio.file.{Files, Path, Paths}
    import org.apache.spark.sql.streaming.Trigger
    def rmTree(p: Path): Unit = if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
    }
    val keySpan = 100000000L
    val evBase = Tables.load(spark, base, "events")
    val bounds = evBase.agg(min(col("ts")), max(col("ts"))).head()
    val spanSec = java.time.Duration.between(
      bounds.getTimestamp(0).toInstant,
      bounds.getTimestamp(1).toInstant).getSeconds + 60
    val minTs = bounds.getTimestamp(0).toInstant.getEpochSecond

    // Stage `reps` time-shifted replicas as `chunks` time-contiguous files
    // (same per-file volume at both scales → comparable micro-batches).
    def stage(tag: String, reps: Int, chunks: Int): String = {
      val dir = Paths.get(s"target/stream_$tag")
      rmTree(dir); Files.createDirectories(dir)
      val ev = (0 until reps).map { i =>
        evBase.withColumn("event_id", col("event_id") + lit(i * keySpan))
          .withColumn("ts",
            col("ts") + expr(s"INTERVAL ${i * spanSec} SECONDS"))
      }.reduce(_ unionByName _)
      val chunkLen = math.max(1L, spanSec.toDouble.toLong * reps / chunks)
      val chunked = ev.withColumn("chunk",
        least(lit(chunks - 1),
          floor((unix_timestamp(col("ts")) - lit(minTs)) / chunkLen)))
      // ONE staging pass: hash-repartition on chunk puts each chunk's
      // rows in exactly one task, so partitionBy writes one file per
      // chunk dir. (The previous per-chunk filtered-write loop was one
      // FULL scan of the replicated feed per chunk — fine at 8/80
      // chunks, pathological at the 100x wave's 800.)
      val tmp = Paths.get(s"target/stream_${tag}_tmp")
      rmTree(tmp)
      chunked.repartition(col("chunk"))
        .write.partitionBy("chunk").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      (0 until chunks).foreach { i =>
        val cdir = tmp.resolve(s"chunk=$i")
        if (Files.exists(cdir)) { // a time-gap chunk may be empty
          val part = Files.list(cdir).iterator().asScala
            .find(_.toString.endsWith(".parquet")).get
          val dst = dir.resolve(f"chunk-$i%03d.parquet")
          Files.move(part, dst)
          // file-source batch order follows modification time
          dst.toFile.setLastModified(1700000000000L + i * 1000L)
        }
      }
      rmTree(tmp)
      dir.toString
    }

    // Replay the staged feed through the watermarked tumbling agg; report
    // (input rows, processing secs, peak state rows, final state rows).
    def run(tag: String, stageDir: String): (Long, Double, Long, Long) = {
      val ckpt = Files.createTempDirectory("graft_probe_ckpt")
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      // recentProgress retains only ~100 entries by default — an
      // 800-micro-batch feed would report rows/proc from the LAST 100
      // batches only (measured: "rows=1.2M" on a 10M-row feed)
      spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "1000")
      try {
        val ev = spark.readStream.schema(evBase.schema)
          .option("maxFilesPerTrigger", "1").parquet(stageDir)
        val q = streaming.EventStreams.tumblingCounts(ev).writeStream
          .format("memory").queryName(s"probe_$tag")
          .outputMode("append")
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val progs = q.recentProgress.toSeq
        val inRows = progs.map(_.numInputRows).sum
        val secs = progs.map(p =>
          Option(p.durationMs.get("triggerExecution"))
            .fold(0L)(_.longValue())).sum / 1000.0
        val states = progs.flatMap(_.stateOperators.map(_.numRowsTotal))
        (inRows, secs, states.maxOption.getOrElse(0L),
          states.lastOption.getOrElse(0L))
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        rmTree(ckpt)
      }
    }

    println("--- streaming probe (watermarked tumbling agg, append) ---")
    cases.foreach {
      case (tag, reps, chunks) =>
        val dir = stage(tag, reps, chunks)
        val (rows, secs, peak, fin) = run(tag, dir)
        println(f"$tag%-12s rows=$rows%9d  proc=$secs%7.2fs  " +
          f"rate=${rows / math.max(secs, 0.001)}%9.0f rows/s  " +
          f"state_peak=$peak%7d  state_final=$fin%7d")
    }
  }
}
