package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Ckpt.CutOps
import graft.Q
import graft.functions.{KMinValuesAgg, TextOps}
import graft.sources.Tables

/** Approximate and order-statistic aggregates.
  *
  * At 100 TB, exact distinct counts and exact quantiles need either a
  * full shuffle of the distinct values or a global sort; the sketch forms
  * (HyperLogLog for distinct, a mergeable summary for percentiles) are
  * single-pass, mergeable, fixed-memory — the default choice at scale.
  * Every sketch here is built on PORTABLE primitives (md5-derived
  * hashes, fixed-grid histograms), so estimates themselves are
  * oracle-checked — including q46, which until r10 was the contract's
  * one rows-only entry (it used the engine-private HLL++/GK summaries;
  * it now runs on the q244/q163 portable recipes).
  */
object ApproxAgg {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Approximate distinct + approximate median per order status — the
    * q46 flagship sketch query, on fully PORTABLE sketches (retiring
    * its `no_oracle` exemption, r10 verdict №4): distinct customers via
    * the 64-register portable-HLL (md5-derived `portableHash60`
    * registers, raw harmonic-mean estimator with Flajolet linear
    * counting below 2.5m — q244's proven recipe), median order total
    * via the fixed-grid equi-width histogram with linear interpolation
    * inside the crossing bin (q163's recipe; 64 bins × 8192 over the
    * declared [0, 524288) range). Both sketches are deterministic
    * functions of the data, so estimate AND error are hash-gated
    * against DuckDB computing the same registers/bins. Scale shape:
    * one scan, two partial-agg'd groupBys whose exchanges carry 64
    * longs (registers) or ≤64 cells (bins) per status — never the
    * distinct keys or a global sort; the quantile window runs over 64
    * rows per group. */
  def approxAgg(spark: SparkSession, dir: String): DataFrame = {
    val width = 8192.0
    val o = t(spark, dir, "orders")
      .select(col("o_orderstatus").as("status"),
        TextOps.portableHash60(col("o_custkey").cast("string")).as("h"),
        least(lit(63L), greatest(lit(0L),
          floor(col("o_totalprice") / lit(width)).cast("long")))
          .as("bin"))
    val hll = o.groupBy(col("status"))
      .agg(count(lit(1)).as("n"),
        graft.functions.HllAgg.hllRegs(col("h"), 64).as("regs"))
      .select(col("status"), col("n"),
        expr("aggregate(regs, CAST(0 AS BIGINT), " +
          "(a, r) -> a + shiftleft(CAST(1 AS BIGINT), 55 - r))").as("s"),
        expr("aggregate(regs, 0, (a, r) -> a + IF(r = 0, 1, 0))")
          .as("vz"))
      .withColumn("raw", lit(graft.functions.HllAgg.Alpha(64)) *
        lit(4096.0) * lit((1L << 55).toDouble) / col("s"))
      .select(col("status"), col("n"),
        (round(when(col("raw") < lit(160.0) && col("vz") > 0,
          lit(64.0) * log(lit(64.0) / col("vz")))
          .otherwise(col("raw")), 4) + lit(0.0)).as("approx_cust"))
    val cum = o.groupBy(col("status"), col("bin"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c"))
        .over(Window.partitionBy(col("status")).orderBy(col("bin"))))
      .withColumn("nn", sum(col("c"))
        .over(Window.partitionBy(col("status"))))
    val target = lit(0.5) * col("nn")
    val med = cum.groupBy(col("status"))
      .agg(max(when((col("cum") - col("c")) < target && target <= col("cum"),
        round(lit(width) * (col("bin") +
          (target - (col("cum") - col("c"))) / col("c")), 4)))
        .as("approx_median"))
    hll.join(med, Seq("status"))
      .select(col("status").as("o_orderstatus"), col("approx_cust"),
        col("approx_median"), col("n"))
  }

  /** Exact interpolated percentiles (quantile_cont semantics — identical
    * definition in Spark `percentile` and DuckDB `quantile_cont`). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").as("ps"),
           count(lit(1)).as("n"))
      .select(col("o_orderstatus"),
        round(element_at(col("ps"), 1), 4).as("p25"),
        round(element_at(col("ps"), 2), 4).as("p50"),
        round(element_at(col("ps"), 3), 4).as("p75"),
        col("n"))

  /** K-Minimum-Values distinct sketch per return flag — the
    * approximate-distinct whose estimate IS oracle-checkable: the k
    * smallest distinct portable hashes are order- and merge-independent,
    * so both engines compute the identical sketch and the identical
    * (k−1)·2^32/h_k estimate (unlike HLL in q46, whose register layout is
    * engine-private). The `exact_distinct` column is the accuracy
    * reference — at 100 TB you would drop it; the sketch column is the
    * one whose exchange carries k longs per group instead of the
    * distinct-key set. Groups with fewer than k distinct values report
    * the buffer size, which is exact. */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"), col("l_partkey"),
        TextOps.portableHash(col("l_partkey").cast("string")).as("h"))
      .groupBy(col("flag"))
      .agg(KMinValuesAgg.kMinValues(col("h"), k).as("kmv"),
        countDistinct(col("l_partkey")).as("exact_distinct"))
      .select(col("flag"),
        size(col("kmv")).cast("long").as("n_buf"),
        round(when(size(col("kmv")) < k,
            size(col("kmv")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
            element_at(col("kmv"), k).cast("double")), 4)
          .as("est_distinct"),
        col("exact_distinct"))
  }

  /** Week-over-week audience retention from a STORED per-week KMV
    * sketch table — q244's pre-aggregated-sketch architecture applied
    * to SET OPERATIONS (Beyer et al. 2007): one corpus scan builds a
    * per-week sketch of active users (bounded 64-long
    * [[graft.functions.KMinValuesAgg]] state, partial-agg'd), and every
    * consecutive-week overlap question is then answered from the
    * sketches alone — K_k(A∪B) is the k smallest of K(A) ∪ K(B) (k-mins
    * of the union are a subset of the union of k-mins), Jaccard ≈
    * |{h ∈ K_k(A∪B) : h ∈ K(A) ∧ h ∈ K(B)}| / |K_k(A∪B)|, retained ≈
    * J × union estimate. This is where KMV beats HLL for a stored
    * sketch table: HLL registers support union only (q244) — KMV gives
    * union AND intersection from the same bounded state. Everything is
    * a deterministic function of sorted 64-long arrays, so estimates
    * AND errors are oracle-checked (q106/q196 precedent — q196 sketches
    * two JOIN sides ad hoc; here the sketches are a reusable per-group
    * TABLE and the set algebra runs per week pair). Below k distinct
    * users a week's sketch degenerates to exact by construction (the
    * sf0.001 arm). `retained_exact` is the accuracy witness — at 100 TB
    * you would drop it and keep only the sketch table. */
  def kmvRetention(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    val ev = t(spark, dir, "events")
      .select(expr("CAST(ts AS LONG) div 604800").as("wk"),
        col("user_id"),
        TextOps.portableHash(col("user_id").cast("string")).as("h"))
      .cutLineage() // one scan feeds the sketch table + the exact witness
    val sketches = ev.groupBy(col("wk"))
      .agg(KMinValuesAgg.kMinValues(col("h"), k).as("kmv"),
        countDistinct(col("user_id")).as("n_users"))
    val wkUsers = ev.select(col("wk"), col("user_id")).distinct()
    val retained = wkUsers.as("a")
      .join(wkUsers.as("b"),
        col("b.user_id") === col("a.user_id") &&
          col("b.wk") === col("a.wk") + 1)
      .groupBy(col("a.wk").as("wk"))
      .agg(count(lit(1)).as("retained_exact"))
    sketches.as("sa")
      .join(sketches.as("sb"), col("sb.wk") === col("sa.wk") + 1)
      .join(retained.as("r"), col("r.wk") === col("sa.wk"), "left_outer")
      .withColumn("merged",
        slice(array_sort(array_union(col("sa.kmv"), col("sb.kmv"))), 1, k))
      .withColumn("n_merged", size(col("merged")).cast("long"))
      .withColumn("matches",
        size(filter(col("merged"), x =>
          array_contains(col("sa.kmv"), x) &&
            array_contains(col("sb.kmv"), x))).cast("long"))
      .withColumn("union_est",
        when(col("n_merged") < k, col("n_merged").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
            element_at(col("merged"), k).cast("double")))
      .select(col("sa.wk").as("wk_from"),
        col("sa.n_users").as("n_a"), col("sb.n_users").as("n_b"),
        coalesce(col("retained_exact"), lit(0L)).as("retained_exact"),
        col("n_merged"), col("matches"),
        expr("matches * 1000000 div n_merged").as("jacc_ppm"),
        round(col("union_est"), 4).as("union_est_r"),
        round(col("matches").cast("double") / col("n_merged") *
          col("union_est"), 4).as("retained_est_r"))
  }

  /** Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005) over
    * corpus tokens: d=4 portable-hash rows × w=64 counters, estimate =
    * min over rows, reported beside the exact count for the top-20 tokens.
    * The sketch is built as ONE hash-partitioned aggregation over
    * (row, bucket) — 256 cells total regardless of corpus size — which is
    * the point at 100 TB: counter build is a partial-agg'd shuffle of 256
    * keys, never a per-token state. The md5-derived
    * [[graft.functions.TextOps.portableHash]] makes every cell value and
    * hence the ESTIMATE itself replicable in DuckDB, so unlike HLL (q46)
    * the full sketch pipeline is oracle-checked, like KMV (q106).
    * CMS guarantee (est >= true, overestimate only) is asserted in spec.
    */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val d = 4
    val w = 64
    def buckets(tok: org.apache.spark.sql.Column) = array(
      (0 until d).map(i =>
        TextOps.portableHash(concat(lit(s"cms$i:"), tok)) % w): _*)
    val toks = t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val counters = toks
      .select(posexplode(buckets(col("tok"))).as(Seq("seed", "bucket")))
      .groupBy(col("seed"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val truth = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("true_cnt"))
    truth
      .select(col("tok"), col("true_cnt"),
        posexplode(buckets(col("tok"))).as(Seq("seed", "bucket")))
      .join(counters, Seq("seed", "bucket"))
      .groupBy(col("tok"), col("true_cnt"))
      .agg(min(col("cnt")).as("cms_est"))
      .orderBy(col("true_cnt").desc, col("tok").asc)
      .limit(20)
  }

  /** Portable-HLL distinct per return flag — the HLL whose ESTIMATE is
    * oracle-checked, closing the gap q46 documents (the built-in HLL++'s
    * registers are engine-private; [[graft.functions.HllAgg]]'s are the
    * deterministic function of portable md5 hashes). The harmonic-mean
    * denominator is the exact integer Σ 2^(55−M[j]) folded sequentially
    * over the 64-register array; the raw-HLL estimate α·m²·2⁵⁵/S uses
    * only IEEE multiply/divide on that integer — bit-identical in both
    * engines at any parallelism. `exact_distinct` rides along as the
    * accuracy reference (drop it at 100 TB — it is the expensive one:
    * ITS exchange carries the distinct keys, the sketch's carries 64
    * bytes per group). */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"), col("l_partkey"),
        TextOps.portableHash60(col("l_partkey").cast("string")).as("h"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("l_partkey")).as("exact_distinct"),
        graft.functions.HllAgg.hllRegs(col("h"), 64).as("regs"))
      .select(col("flag"), col("n_rows"), col("exact_distinct"),
        expr("aggregate(regs, CAST(0 AS BIGINT), " +
          "(a, r) -> a + shiftleft(CAST(1 AS BIGINT), 55 - r))").as("s"))
      .select(col("flag"), col("n_rows"), col("exact_distinct"),
        round(lit(graft.functions.HllAgg.Alpha(64)) * lit(4096.0) *
          lit((1L << 55).toDouble) / col("s"), 4).as("hll_estimate"))

  /** Fixed-range equi-width histogram sketch with quantile read-out —
    * the quantile summary that is actually deployable at 100 TB: 64
    * integer bin counts over a declared [0, 131072) value range, built by
    * ONE partial-agg'd `groupBy(flag, bin)` (map-side combine collapses
    * every partition to ≤64 cells before the shuffle), mergeable across
    * partitions/engines/streams by plain addition, and — unlike
    * `percentile_approx`'s engine-private GK summary — a deterministic
    * function of the data, so estimate AND error vs the exact quantile
    * are both oracle-checked. Quantile read-out interpolates linearly
    * inside the bin that crosses the target rank (cum−c < q·n ≤ cum);
    * the window that finds it runs over 64 rows per group, never the
    * data. Bin width 2048 over a fixed range is the sketch's declared
    * contract, exactly like CMS's (d, w) or HLL's m — fixed constants
    * are what make the state mergeable without re-binning. */
  def histogramQuantile(spark: SparkSession, dir: String): DataFrame = {
    val width = 2048.0
    val binned = t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        least(lit(63L), greatest(lit(0L),
          floor(col("l_extendedprice") / lit(width)).cast("long")))
          .as("bin"))
      .groupBy(col("flag"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val cum = binned
      .withColumn("cum", sum(col("c"))
        .over(Window.partitionBy(col("flag")).orderBy(col("bin"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("flag"))))
    def est(q: Double) = {
      val target = lit(q) * col("n")
      val crosses = (col("cum") - col("c")) < target && target <= col("cum")
      max(when(crosses, round(lit(width) * (col("bin") +
        (target - (col("cum") - col("c"))) / col("c")), 4)))
    }
    val exact = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag").as("flag"))
      .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4)
          .as("p50_exact"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95_exact"))
    cum.groupBy(col("flag"))
      .agg(max(col("n")).as("n_rows"),
        est(0.5).as("p50_hist"), est(0.95).as("p95_hist"))
      .join(exact, Seq("flag"))
  }

  /** Sketch-driven join-cardinality estimation: how many keys of
    * events.user_id also appear in customer.c_custkey — WITHOUT joining
    * the tables — from two 64-value KMV (k-minimum-values) sketches:
    * merge the per-side k-mins, take the k smallest of the union, and
    * (a) estimate the union size from the k-th smallest hash
    * ((k−1)·2^32 div h_k), (b) estimate Jaccard as the fraction of the
    * merged sketch present in BOTH sides (any union-k-min drawn from a
    * side is necessarily in that side's own k-min), (c) intersection ≈
    * J·U. This is what a planner consults before choosing a join
    * strategy at 100 TB — each side's sketch is one TakeOrderedAndProject
    * over distinct keys (per-partition heaps, k values to the driver
    * region, no global sort), sides never meet until the 64-row sketch
    * join. Exact counts ride along as the error audit (cheap at gate
    * SFs; the thing the sketch replaces at scale). md5-derived hashes →
    * the whole estimator is oracle-checked, estimate included. */
  def joinCardinality(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    def keyed(df: DataFrame, keyCol: String): DataFrame =
      df.select(col(keyCol).cast("long").as("key")).distinct()
        .withColumn("h", TextOps.portableHash(
          concat(lit("jc:"), col("key").cast("string"))))
    val a = keyed(t(spark, dir, "events"), "user_id").cutLineage()
    val b = keyed(t(spark, dir, "customer"), "c_custkey").cutLineage()
    val ka = a.select(col("h")).distinct()
      .orderBy(col("h").asc).limit(k).cutLineage()
    val kb = b.select(col("h")).distinct()
      .orderBy(col("h").asc).limit(k).cutLineage()
    val merged = ka.unionByName(kb).distinct()
      .orderBy(col("h").asc).limit(k).cutLineage()
    val jn = merged.join(ka, Seq("h"), "left_semi")
      .join(kb, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("j_num"))
    val ms = merged.agg(count(lit(1)).as("kmin_m"), max(col("h")).as("hk"))
    val ex = a.select(col("key")).intersect(b.select(col("key")))
      .agg(count(lit(1)).as("n_inter"))
    val un = a.select(col("key")).union(b.select(col("key"))).distinct()
      .agg(count(lit(1)).as("n_union"))
    a.agg(count(lit(1)).as("n_a"))
      .crossJoin(broadcast(b.agg(count(lit(1)).as("n_b"))))
      .crossJoin(broadcast(ex)).crossJoin(broadcast(un))
      .crossJoin(broadcast(ms)).crossJoin(broadcast(jn))
      .withColumn("union_est", expr(
        s"CAST(CASE WHEN kmin_m < $k THEN kmin_m " +
          "ELSE 63 * 4294967296 div hk END AS BIGINT)"))
      .select(col("n_a"), col("n_b"), col("n_inter"), col("n_union"),
        col("kmin_m"), col("union_est"),
        // greatest(..,1): kmin_m = 0 on an empty corpus and ANSI
        // division would throw (r16 adversarial sweep; oracle mirrored)
        expr("CAST(j_num * union_est div greatest(kmin_m, 1L) AS BIGINT)")
          .as("inter_est"),
        expr("j_num * 1000000 div greatest(kmin_m, 1L)")
          .as("jaccard_ppm_est"),
        expr("n_inter * 1000000 div greatest(n_union, 1L)")
          .as("jaccard_ppm_exact"))
  }

  /** Pre-aggregated sketch rollup — the production distinct-counting
    * architecture: ONE scan builds a per-day HLL register table (the
    * "sketch table" materialized at ingest), and arbitrary date-range
    * distinct-user questions are then answered by MERGING the stored
    * daily sketches (register-wise max — associative, so any range
    * composes from any partition of it) without touching raw events
    * again. Three ranges (whole span / last 7 days / first half) are
    * answered from the SAME daily table; the oracle computes each
    * range's registers DIRECTLY from the raw rows, so the hash gate
    * proves the algebraic identity merge-of-daily == direct-on-range —
    * the property the whole pattern rests on. Exact distincts ride
    * along as the audit column (at 100 TB you'd drop them; here they
    * let the gate also pin the estimates' error). Register merge uses
    * a bounded fold over the ≤O(days) collected register arrays —
    * 64 ints per day — with a commutative max, so collect order is
    * irrelevant. */
  def sketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(expr("unix_timestamp(ts) DIV 86400").as("day"),
        col("user_id"),
        TextOps.portableHash60(col("user_id").cast("string")).as("h"))
    val daily = ev.groupBy(col("day"))
      .agg(graft.functions.HllAgg.hllRegs(col("h"), 64).as("regs"))
      .cutLineage() // the stored sketch table
    val bounds = daily.agg(min(col("day")).as("mn"),
      max(col("day")).as("mx"))
    def tagsOf(dayCol: String): org.apache.spark.sql.Column =
      expr(s"filter(array(" +
        s"'all', " +
        s"IF($dayCol > mx - 7, 'last7', NULL), " +
        s"IF($dayCol < mn + (mx - mn) DIV 2, 'first_half', NULL)), " +
        "x -> x IS NOT NULL)")
    val merged = daily.crossJoin(broadcast(bounds))
      .select(explode(tagsOf("day")).as("tag"), col("regs"))
      .groupBy(col("tag"))
      .agg(collect_list(col("regs")).as("rl"))
      .select(col("tag"),
        expr("aggregate(rl, array_repeat(0, 64), " +
          "(acc, x) -> zip_with(acc, x, (a, b) -> greatest(a, b)))")
          .as("regs"))
    val exact = ev.crossJoin(broadcast(bounds))
      .select(explode(tagsOf("day")).as("tag"), col("user_id"))
      .groupBy(col("tag"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    merged.join(exact, Seq("tag"))
      .select(col("tag"), col("exact_distinct"),
        expr("aggregate(regs, CAST(0 AS BIGINT), " +
          "(a, r) -> a + shiftleft(CAST(1 AS BIGINT), 55 - r))").as("s"),
        expr("aggregate(regs, 0, (a, r) -> a + IF(r = 0, 1, 0))")
          .as("vz"))
      .withColumn("raw", lit(graft.functions.HllAgg.Alpha(64)) *
        lit(4096.0) * lit((1L << 55).toDouble) / col("s"))
      // Flajolet's small-range regime: below 2.5m the raw harmonic-mean
      // estimator biases high; linear counting over the V empty
      // registers is the standard correction (identical CASE both
      // engines, single ln — portable per the q229 precedent)
      .select(col("tag"), col("exact_distinct"),
        (round(when(col("raw") < lit(160.0) && col("vz") > 0,
          lit(64.0) * log(lit(64.0) / col("vz")))
          .otherwise(col("raw")), 4) + lit(0.0)).as("hll_estimate"))
  }

  /** Pre-aggregated HISTOGRAM rollup — the quantile sibling of q244's
    * HLL sketch table, completing the pre-aggregated-sketch-serving
    * pair: ONE scan builds a per-day 64-bin fixed-grid histogram table
    * (bin counts are plain integers, so range merge is ADDITION —
    * associative and commutative, any date range composes from any
    * partition of it), and arbitrary date-range quantile questions
    * (p50/p95 here) are answered by the q163 in-bin interpolation over
    * the merged 64 rows — never a raw-event rescan or a global sort.
    * This is how OLAP/observability stores serve percentile-over-range
    * (Prometheus-style bucketed histograms): the sketch table is
    * days×64 integers regardless of corpus size. The oracle computes
    * each range's histogram DIRECTLY from the raw rows, so the hash
    * gate proves merge-of-daily == direct-on-range; exact
    * `quantile_cont` audits ride along (at 100 TB you'd drop them —
    * they are the cost the sketch removes). Same three ranges as q244
    * (whole span / last 7 days / first half) from the SAME daily
    * table. */
  def histogramRollup(spark: SparkSession, dir: String): DataFrame = {
    val width = 512.0
    val ev = t(spark, dir, "events")
      .select(expr("unix_timestamp(ts) DIV 86400").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .withColumn("bin", least(lit(63L), greatest(lit(0L),
        floor(col("cents") / lit(width)).cast("long"))))
    val daily = ev.groupBy(col("day"), col("bin"))
      .agg(count(lit(1)).as("c"))
      .cutLineage() // the stored sketch table: days × ≤64 integer cells
    val bounds = daily.agg(min(col("day")).as("mn"),
      max(col("day")).as("mx"))
    def tagsOf(dayCol: String): org.apache.spark.sql.Column =
      expr(s"filter(array(" +
        s"'all', " +
        s"IF($dayCol > mx - 7, 'last7', NULL), " +
        s"IF($dayCol < mn + (mx - mn) DIV 2, 'first_half', NULL)), " +
        "x -> x IS NOT NULL)")
    val merged = daily.crossJoin(broadcast(bounds))
      .select(explode(tagsOf("day")).as("tag"), col("bin"), col("c"))
      .groupBy(col("tag"), col("bin"))
      .agg(sum(col("c")).as("c")) // range merge = addition
    val cum = merged
      .withColumn("cum", sum(col("c"))
        .over(Window.partitionBy(col("tag")).orderBy(col("bin"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("tag"))))
    def est(q: Double) = {
      val target = lit(q) * col("n")
      val crosses = (col("cum") - col("c")) < target && target <= col("cum")
      max(when(crosses, round(lit(width) * (col("bin") +
        (target - (col("cum") - col("c"))) / col("c")), 4)))
    }
    // + 0.0: cents can be negative (value is a signed delta), so an
    // exact percentile in (-5e-5, 0) would round to -0.0 in DuckDB but
    // +0.0 via Spark's BigDecimal round (see Analytics.statsProfile)
    val exact = ev.crossJoin(broadcast(bounds))
      .select(explode(tagsOf("day")).as("tag"), col("cents"))
      .groupBy(col("tag"))
      .agg((round(expr("percentile(cents, 0.5)"), 4) + lit(0.0))
          .as("p50_exact"),
        (round(expr("percentile(cents, 0.95)"), 4) + lit(0.0))
          .as("p95_exact"))
    cum.groupBy(col("tag"))
      .agg(max(col("n")).as("n_rows"),
        est(0.5).as("p50_hist"), est(0.95).as("p95_hist"))
      .join(exact, Seq("tag"))
  }

  val catalog: Seq[Q] = Seq(
    Q("q257_kmv_retention", kmvRetention _,
      """WITH ev AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk,
        |    user_id,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |      AS h
        |  FROM events),
        |hw AS (SELECT DISTINCT wk, h FROM ev),
        |sk AS MATERIALIZED (
        |  SELECT wk, h FROM (
        |    SELECT wk, h,
        |      row_number() OVER (PARTITION BY wk ORDER BY h) AS r
        |    FROM hw) WHERE r <= 64),
        |nn AS (SELECT wk, count(DISTINCT user_id) AS n_users
        |       FROM ev GROUP BY 1),
        |wks AS (SELECT a.wk AS wf FROM (SELECT DISTINCT wk FROM sk) a
        |        JOIN (SELECT DISTINCT wk FROM sk) b ON b.wk = a.wk + 1),
        |cand AS (
        |  SELECT DISTINCT p.wf, s.h FROM wks p
        |    JOIN sk s ON s.wk = p.wf OR s.wk = p.wf + 1),
        |merged AS MATERIALIZED (
        |  SELECT wf, h FROM (
        |    SELECT wf, h,
        |      row_number() OVER (PARTITION BY wf ORDER BY h) AS r
        |    FROM cand) WHERE r <= 64),
        |mm AS (SELECT wf, count(*) AS n_merged, max(h) AS tau
        |       FROM merged GROUP BY 1),
        |mt AS (
        |  SELECT m.wf, count(*) AS matches FROM merged m
        |    JOIN sk a ON a.wk = m.wf AND a.h = m.h
        |    JOIN sk b ON b.wk = m.wf + 1 AND b.h = m.h
        |  GROUP BY 1),
        |wu AS (SELECT DISTINCT wk, user_id FROM ev),
        |ret AS (
        |  SELECT a.wk AS wf, count(*) AS retained_exact
        |  FROM wu a JOIN wu b
        |    ON b.user_id = a.user_id AND b.wk = a.wk + 1
        |  GROUP BY 1),
        |u AS (SELECT wf, n_merged, tau,
        |  CASE WHEN n_merged < 64 THEN CAST(n_merged AS DOUBLE)
        |    ELSE 63.0 * 4294967296.0 / CAST(tau AS DOUBLE) END
        |    AS union_est
        |  FROM mm)
        |SELECT u.wf AS wk_from,
        |  CAST(na.n_users AS BIGINT) AS n_a,
        |  CAST(nb.n_users AS BIGINT) AS n_b,
        |  CAST(coalesce(ret.retained_exact, 0) AS BIGINT)
        |    AS retained_exact,
        |  CAST(u.n_merged AS BIGINT) AS n_merged,
        |  CAST(coalesce(mt.matches, 0) AS BIGINT) AS matches,
        |  CAST(coalesce(mt.matches, 0) * 1000000 // u.n_merged AS BIGINT)
        |    AS jacc_ppm,
        |  round(u.union_est, 4) AS union_est_r,
        |  round(CAST(coalesce(mt.matches, 0) AS DOUBLE) / u.n_merged *
        |    u.union_est, 4) AS retained_est_r
        |FROM u
        |  JOIN nn na ON na.wk = u.wf
        |  JOIN nn nb ON nb.wk = u.wf + 1
        |  LEFT JOIN mt ON mt.wf = u.wf
        |  LEFT JOIN ret ON ret.wf = u.wf""".stripMargin),
    Q("q246_histogram_rollup", histogramRollup _,
      """WITH ev AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    least(63, greatest(0,
        |      CAST(floor(CAST(floor(value * 100 + 0.5) AS BIGINT)
        |        / 512.0) AS BIGINT))) AS bin,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |bd AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
        |t AS (
        |  SELECT 'all' AS tag, bin, cents FROM ev
        |  UNION ALL
        |  SELECT 'last7', bin, cents FROM ev CROSS JOIN bd
        |  WHERE day > mx - 7
        |  UNION ALL
        |  SELECT 'first_half', bin, cents FROM ev CROSS JOIN bd
        |  WHERE day < mn + (mx - mn) // 2),
        |b AS (SELECT tag, bin, count(*) AS c FROM t GROUP BY 1, 2),
        |w AS (
        |  SELECT tag, bin, c,
        |    CAST(sum(c) OVER (PARTITION BY tag ORDER BY bin)
        |      AS BIGINT) AS cum,
        |    CAST(sum(c) OVER (PARTITION BY tag) AS BIGINT) AS n
        |  FROM b),
        |x AS (
        |  SELECT tag, max(n) AS n_rows,
        |    max(CASE WHEN cum - c < 0.5 * n AND 0.5 * n <= cum
        |        THEN round(512.0 * (bin + (0.5 * n - (cum - c)) / c), 4)
        |        END) AS p50_hist,
        |    max(CASE WHEN cum - c < 0.95 * n AND 0.95 * n <= cum
        |        THEN round(512.0 * (bin + (0.95 * n - (cum - c)) / c), 4)
        |        END) AS p95_hist
        |  FROM w GROUP BY 1),
        |e AS (
        |  SELECT tag,
        |    round(quantile_cont(cents, 0.5), 4) + 0.0 AS p50_exact,
        |    round(quantile_cont(cents, 0.95), 4) + 0.0 AS p95_exact
        |  FROM t GROUP BY 1)
        |SELECT x.tag AS tag, n_rows, p50_hist, p95_hist,
        |  p50_exact, p95_exact
        |FROM x JOIN e USING (tag)""".stripMargin),
    Q("q244_sketch_rollup", sketchRollup _,
      """WITH ev AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    user_id,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |      ::BIGINT AS h
        |  FROM events),
        |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
        |t AS (
        |  SELECT 'all' AS tag, user_id, h FROM ev
        |  UNION ALL
        |  SELECT 'last7', user_id, h FROM ev CROSS JOIN b
        |  WHERE day > mx - 7
        |  UNION ALL
        |  SELECT 'first_half', user_id, h FROM ev CROSS JOIN b
        |  WHERE day < mn + (mx - mn) // 2),
        |r AS (
        |  SELECT tag, h >> 54 AS bkt,
        |    max(CASE WHEN (h & ((1::BIGINT << 54) - 1)) = 0 THEN 55
        |        ELSE 55 - len(bin(h & ((1::BIGINT << 54) - 1))) END) AS m
        |  FROM t GROUP BY 1, 2),
        |g AS (
        |  SELECT f.tag, tt.b AS bkt, COALESCE(r.m, 0) AS m
        |  FROM (SELECT DISTINCT tag FROM t) f
        |  CROSS JOIN range(0, 64) tt(b)
        |  LEFT JOIN r ON r.tag = f.tag AND r.bkt = tt.b),
        |s AS (
        |  SELECT tag, CAST(sum(1::BIGINT << (55 - m)) AS BIGINT) AS s,
        |    CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS INT) AS vz
        |  FROM g GROUP BY 1),
        |e AS (
        |  SELECT tag, CAST(count(DISTINCT user_id) AS BIGINT)
        |    AS exact_distinct
        |  FROM t GROUP BY 1),
        |est AS (
        |  SELECT tag, 0.709::DOUBLE * 4096.0::DOUBLE
        |    * 36028797018963968.0::DOUBLE / s AS raw, vz
        |  FROM s)
        |SELECT e.tag, e.exact_distinct,
        |  round(CASE WHEN est.raw < 160.0 AND est.vz > 0
        |    THEN 64.0 * ln(64.0 / est.vz) ELSE est.raw END, 4) + 0.0
        |    AS hll_estimate
        |FROM e JOIN est USING (tag)""".stripMargin),
    Q("q196_join_cardinality", joinCardinality _,
      """WITH a AS (
        |  SELECT key, ('0x' || substr(md5('jc:' ||
        |    CAST(key AS VARCHAR)), 1, 8))::BIGINT AS h
        |  FROM (SELECT DISTINCT user_id AS key FROM events)),
        |b AS (
        |  SELECT key, ('0x' || substr(md5('jc:' ||
        |    CAST(key AS VARCHAR)), 1, 8))::BIGINT AS h
        |  FROM (SELECT DISTINCT c_custkey AS key FROM customer)),
        |ka AS (SELECT DISTINCT h FROM a ORDER BY h LIMIT 64),
        |kb AS (SELECT DISTINCT h FROM b ORDER BY h LIMIT 64),
        |merged AS (
        |  SELECT DISTINCT h
        |  FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
        |  ORDER BY h LIMIT 64),
        |jn AS (
        |  SELECT count(*) AS j_num FROM merged m
        |  WHERE EXISTS (SELECT 1 FROM ka WHERE ka.h = m.h)
        |    AND EXISTS (SELECT 1 FROM kb WHERE kb.h = m.h)),
        |ms AS (SELECT count(*) AS kmin_m, max(h) AS hk FROM merged),
        |ex AS (
        |  SELECT
        |    (SELECT count(*) FROM a) AS n_a,
        |    (SELECT count(*) FROM b) AS n_b,
        |    (SELECT count(*) FROM
        |      (SELECT key FROM a INTERSECT SELECT key FROM b)) AS n_inter,
        |    (SELECT count(*) FROM
        |      (SELECT key FROM a UNION SELECT key FROM b)) AS n_union)
        |SELECT n_a, n_b, n_inter, n_union, kmin_m,
        |  CAST(CASE WHEN kmin_m < 64 THEN kmin_m
        |    ELSE 63 * 4294967296 // hk END AS BIGINT) AS union_est,
        |  CAST(j_num * (CASE WHEN kmin_m < 64 THEN kmin_m
        |    ELSE 63 * 4294967296 // hk END) // greatest(kmin_m, 1)
        |    AS BIGINT)
        |    AS inter_est,
        |  CAST(j_num * 1000000 // greatest(kmin_m, 1) AS BIGINT)
        |    AS jaccard_ppm_est,
        |  CAST(n_inter * 1000000 // greatest(n_union, 1) AS BIGINT)
        |    AS jaccard_ppm_exact
        |FROM ex CROSS JOIN ms CROSS JOIN jn""".stripMargin),
    Q("q163_histogram_quantile", histogramQuantile _,
      """WITH d AS (
        |  SELECT l_returnflag AS flag,
        |    least(63, greatest(0,
        |      CAST(floor(l_extendedprice / 2048.0) AS BIGINT))) AS bin
        |  FROM lineitem),
        |b AS (SELECT flag, bin, count(*) AS c FROM d GROUP BY 1, 2),
        |w AS (
        |  SELECT flag, bin, c,
        |    CAST(sum(c) OVER (PARTITION BY flag ORDER BY bin)
        |      AS BIGINT) AS cum,
        |    CAST(sum(c) OVER (PARTITION BY flag) AS BIGINT) AS n
        |  FROM b),
        |x AS (
        |  SELECT flag, max(n) AS n_rows,
        |    max(CASE WHEN cum - c < 0.5 * n AND 0.5 * n <= cum
        |        THEN round(2048.0 * (bin + (0.5 * n - (cum - c)) / c), 4)
        |        END) AS p50_hist,
        |    max(CASE WHEN cum - c < 0.95 * n AND 0.95 * n <= cum
        |        THEN round(2048.0 * (bin + (0.95 * n - (cum - c)) / c), 4)
        |        END) AS p95_hist
        |  FROM w GROUP BY 1),
        |e AS (
        |  SELECT l_returnflag AS flag,
        |    round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
        |    round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_exact
        |  FROM lineitem GROUP BY 1)
        |SELECT x.flag AS flag, n_rows, p50_hist, p95_hist,
        |  p50_exact, p95_exact
        |FROM x JOIN e USING (flag)""".stripMargin),
    Q("q160_hll_portable", hllDistinct _,
      """WITH h AS (
        |  SELECT l_returnflag AS flag, l_partkey AS pk,
        |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
        |      ::BIGINT AS h
        |  FROM lineitem),
        |r AS (
        |  SELECT flag, h >> 54 AS bkt,
        |    max(CASE WHEN (h & ((1::BIGINT << 54) - 1)) = 0 THEN 55
        |        ELSE 55 - len(bin(h & ((1::BIGINT << 54) - 1))) END) AS m
        |  FROM h GROUP BY 1, 2),
        |g AS (
        |  SELECT f.flag, t.b AS bkt, COALESCE(r.m, 0) AS m
        |  FROM (SELECT DISTINCT flag FROM h) f
        |  CROSS JOIN range(0, 64) t(b)
        |  LEFT JOIN r ON r.flag = f.flag AND r.bkt = t.b),
        |s AS (
        |  SELECT flag, CAST(sum(1::BIGINT << (55 - m)) AS BIGINT) AS s
        |  FROM g GROUP BY 1),
        |e AS (
        |  SELECT flag, count(*) AS n_rows,
        |    CAST(count(DISTINCT pk) AS BIGINT) AS exact_distinct
        |  FROM h GROUP BY 1)
        |SELECT e.flag AS flag, e.n_rows, e.exact_distinct,
        |  round(0.709::DOUBLE * 4096.0::DOUBLE
        |    * 36028797018963968.0::DOUBLE / s.s, 4) AS hll_estimate
        |FROM e JOIN s USING (flag)""".stripMargin),
    Q("q46_approx_agg", approxAgg _,
      """WITH o AS (
        |  SELECT o_orderstatus AS status,
        |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
        |      ::BIGINT AS h,
        |    least(63, greatest(0,
        |      CAST(floor(o_totalprice / 8192.0) AS BIGINT))) AS bin
        |  FROM orders),
        |r AS (
        |  SELECT status, h >> 54 AS bkt,
        |    max(CASE WHEN (h & ((1::BIGINT << 54) - 1)) = 0 THEN 55
        |        ELSE 55 - len(bin(h & ((1::BIGINT << 54) - 1))) END) AS m
        |  FROM o GROUP BY 1, 2),
        |g AS (
        |  SELECT f.status, tt.b AS bkt, COALESCE(r.m, 0) AS m
        |  FROM (SELECT DISTINCT status FROM o) f
        |  CROSS JOIN range(0, 64) tt(b)
        |  LEFT JOIN r ON r.status = f.status AND r.bkt = tt.b),
        |s AS (
        |  SELECT status, CAST(sum(1::BIGINT << (55 - m)) AS BIGINT) AS s,
        |    CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS INT) AS vz
        |  FROM g GROUP BY 1),
        |hll AS (
        |  SELECT status, 0.709::DOUBLE * 4096.0::DOUBLE
        |    * 36028797018963968.0::DOUBLE / s AS raw, vz
        |  FROM s),
        |n AS (SELECT status, count(*) AS n FROM o GROUP BY 1),
        |b AS (SELECT status, bin, count(*) AS c FROM o GROUP BY 1, 2),
        |w AS (
        |  SELECT status, bin, c,
        |    CAST(sum(c) OVER (PARTITION BY status ORDER BY bin)
        |      AS BIGINT) AS cum,
        |    CAST(sum(c) OVER (PARTITION BY status) AS BIGINT) AS nn
        |  FROM b),
        |med AS (
        |  SELECT status,
        |    max(CASE WHEN cum - c < 0.5 * nn AND 0.5 * nn <= cum
        |        THEN round(8192.0 * (bin + (0.5 * nn - (cum - c)) / c), 4)
        |        END) AS approx_median
        |  FROM w GROUP BY 1)
        |SELECT n.status AS o_orderstatus,
        |  round(CASE WHEN hll.raw < 160.0 AND hll.vz > 0
        |    THEN 64.0 * ln(64.0 / hll.vz) ELSE hll.raw END, 4) + 0.0
        |    AS approx_cust,
        |  med.approx_median, n.n
        |FROM n JOIN hll USING (status) JOIN med USING (status)"""
        .stripMargin),
    Q("q112_cms_heavy_hitters", cmsHeavyHitters _,
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |seeds AS (SELECT unnest([0, 1, 2, 3]) AS seed),
        |seeded AS (
        |  SELECT seed,
        |    ('0x' || substr(md5('cms' || CAST(seed AS VARCHAR) || ':'
        |      || tok), 1, 8))::BIGINT % 64 AS bucket
        |  FROM toks CROSS JOIN seeds),
        |counters AS (
        |  SELECT seed, bucket, count(*) AS cnt
        |  FROM seeded GROUP BY 1, 2),
        |truth AS (SELECT tok, count(*) AS true_cnt FROM toks GROUP BY 1),
        |tb AS (
        |  SELECT tok, true_cnt, seed,
        |    ('0x' || substr(md5('cms' || CAST(seed AS VARCHAR) || ':'
        |      || tok), 1, 8))::BIGINT % 64 AS bucket
        |  FROM truth CROSS JOIN seeds)
        |SELECT tok, true_cnt, min(cnt) AS cms_est
        |FROM tb JOIN counters USING (seed, bucket)
        |GROUP BY 1, 2
        |ORDER BY true_cnt DESC, tok ASC LIMIT 20""".stripMargin),
    Q("q106_kmv_distinct", kmvDistinct _,
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag AS flag,
        |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT
        |      AS h
        |  FROM lineitem),
        |r AS (
        |  SELECT flag, h,
        |    row_number() OVER (PARTITION BY flag ORDER BY h) AS rk
        |  FROM h),
        |cnt AS (SELECT flag, count(*) AS nh FROM h GROUP BY 1),
        |k64 AS (SELECT flag, h AS h64 FROM r WHERE rk = 64),
        |e AS (
        |  SELECT l_returnflag AS flag,
        |    count(DISTINCT l_partkey) AS exact_distinct
        |  FROM lineitem GROUP BY 1)
        |SELECT cnt.flag AS flag,
        |  CAST(least(nh, 64) AS BIGINT) AS n_buf,
        |  round(CASE WHEN nh < 64 THEN CAST(nh AS DOUBLE)
        |    ELSE 63.0 * 4294967296.0 / CAST(h64 AS DOUBLE) END, 4)
        |    AS est_distinct,
        |  exact_distinct
        |FROM cnt LEFT JOIN k64 ON cnt.flag = k64.flag
        |  JOIN e ON cnt.flag = e.flag""".stripMargin),
    Q("q47_percentiles", percentiles _,
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        |  count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin)
  )
}
