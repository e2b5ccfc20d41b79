package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Rule-driven data-quality gate: declarative constraints evaluated as ONE
  * aggregation pass over the table — every rule becomes a conditional sum,
  * so N rules cost one scan and one constant-size exchange regardless of
  * table size (the shape that lets an ingestion pipeline gate every batch).
  * NULL handling is explicit: a row that cannot prove the predicate
  * (NULL input) counts as a violation, so rules are contracts, not hints.
  *
  * The long-form output (one row per rule) keeps downstream alerting
  * column-generic, same rationale as [[Analytics.profileTable]].
  */
object DataQuality {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** (rule name, predicate that valid rows satisfy). */
  private def orderRules: Seq[(String, Column)] = Seq(
    "totalprice_positive" -> (col("o_totalprice") > 0),
    "custkey_present" -> col("o_custkey").isNotNull,
    "status_in_domain" -> col("o_orderstatus").isin("F", "O", "P"),
    "orderdate_in_range" ->
      (col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1992-01-01 00:00:00")) &&
       col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00"))))

  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val aggs = count(lit(1)).as("n_rows") +:
      orderRules.map { case (name, pred) =>
        sum(when(pred, 0).otherwise(1)).as(s"v_$name")
      }
    val wide = o.agg(aggs.head, aggs.tail: _*)
    orderRules.map { case (name, _) =>
      wide.select(lit(name).as("rule_name"), col("n_rows"),
        col(s"v_$name").as("n_violations"),
        round(col(s"v_$name") / col("n_rows"), 6).as("violation_rate"))
    }.reduce(_ unionByName _)
  }

  /** Robust outlier detection via MAD (median absolute deviation): the
    * modified z-score 0.6745·(x − med)/MAD flags anomalies without the
    * mean/stddev's sensitivity to the outliers themselves (one extreme
    * value drags a z-score gate, never a MAD gate) — the screen an
    * ingestion pipeline runs on value-like columns per segment.
    *
    * Exactness: both engines interpolate the median identically
    * (percentile ↔ quantile_cont, the proven q61 recipe); the per-row
    * abs/sub/mul/div are single IEEE ops on identical doubles.
    * Groups with MAD = 0 (degenerate: over half the values identical)
    * are excluded in BOTH engines rather than dividing by zero.
    *
    * Scale shape: two partial-agg'd percentile passes (the per-group
    * sketch buffers are bounded) + two broadcast join-backs of the tiny
    * per-group medians; the flagging pass is scan-local.
    *
    * Sibling: [[graft.operators.Analytics.madCountGate]] (q168) is the
    * un-normalized 3×MAD count gate on customer balances. */
  def robustZscoreGate(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_orderpriority").as("priority"),
        col("o_totalprice").as("p"))
    val med = o.groupBy(col("priority"))
      .agg(expr("percentile(p, 0.5D)").as("med"))
    val dev = o.join(broadcast(med), Seq("priority"))
      .withColumn("ad", abs(col("p") - col("med")))
    val mad = dev.groupBy(col("priority"))
      .agg(expr("percentile(ad, 0.5D)").as("mad"))
    dev.join(broadcast(mad.filter(col("mad") > 0)), Seq("priority"))
      .withColumn("z", lit(0.6745) * (col("p") - col("med")) / col("mad"))
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(abs(col("z")) > 3.5, 1L).otherwise(0L)).as("n_outliers"),
        round(max(abs(col("z"))), 6).as("max_robust_z"))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic between the click and
    * purchase value distributions — the distribution-level companion to
    * the per-column moment drift of q90: D = max |F̂_click − F̂_purchase|
    * over the value support, the standard "did this slice's distribution
    * shift" monitor for training-data feeds. Everything is exact
    * integers: per-value group tallies, CDF differences compared as
    * cross-multiplied counts (`cc·n_p − cp·n_c`), the final D in ppm by
    * one integer division, and the argmax location tie-broken to the
    * smallest value via an integer composite key.
    *
    * The ECDF is computed DISTRIBUTED with the q190/q193 two-phase
    * recipe — monotone `width_bucket` value slices, within-slice
    * running sums under bounded windows, exclusive prefix sums over the
    * 64 slice totals — never a corpus-wide single-partition sort. The
    * oracle is the one-sort ECDF, so the gate proves the two-phase CDF
    * equals it. */
  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type").as("g"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val bounds = ev.agg(min(col("cents")).as("mn"),
      max(col("cents")).as("mx"),
      count(when(col("g") === "click", 1)).as("n_c"),
      count(when(col("g") === "purchase", 1)).as("n_p"))
    val vals = ev.groupBy(col("cents"))
      .agg(count(when(col("g") === "click", 1)).as("c"),
        count(when(col("g") === "purchase", 1)).as("p"))
      .crossJoin(broadcast(bounds))
      .withColumn("b", expr("width_bucket(cents, mn, mx + 1, 64)"))
    val wIn = Window.partitionBy(col("b")).orderBy(col("cents").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vals
      .withColumn("cc", sum(col("c")).over(wIn))
      .withColumn("cp", sum(col("p")).over(wIn))
    val wOff = Window.orderBy(col("b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = cum.groupBy(col("b"))
      .agg(sum(col("c")).as("bc"), sum(col("p")).as("bp"))
      .withColumn("oc", coalesce(sum(col("bc")).over(wOff), lit(0L)))
      .withColumn("op", coalesce(sum(col("bp")).over(wOff), lit(0L)))
      .select(col("b"), col("oc"), col("op"))
    val d = cum.join(broadcast(offs), Seq("b"))
      .select(col("cents"), col("n_c"), col("n_p"),
        abs((col("oc") + col("cc")) * col("n_p") -
          (col("op") + col("cp")) * col("n_c")).as("ad"))
    // Argmax location as a TWO-STAGE aggregation (max ad, then min cents
    // among rows attaining it) — a packed integer key (ad·10^7 − cents)
    // would silently wrap once ad exceeds ~9·10^11 (ad ≤ n_c·n_p, far
    // below the 100-TB design point) and assumed cents < 10^7. The extra
    // pass re-reads only the per-distinct-value frame, not the corpus.
    // (d_ppm's `ad · 10^6` stays in-range while n_c·n_p < 2^43 ≈ 9·10^12;
    // past that, divide both counts by a common decimation factor first.)
    val mx = d.agg(max(col("ad")).as("mx_ad"))
    // counts come from `bounds`, not max-over-d: with no click/purchase
    // rows d is EMPTY and max() would report the counts as NULL where
    // the oracle's scalar subquery says 0 (r16 adversarial sweep); the
    // greatest(..,1) guard keeps the ppm division defined when either
    // side's count is zero (identically in the oracle SQL)
    val dm = d.crossJoin(broadcast(mx))
      .agg(expr("CAST(max(ad) * 1000000 div " +
          "greatest(max(n_c) * max(n_p), 1L) AS BIGINT)").as("d_ppm"),
        min(when(col("ad") === col("mx_ad"), col("cents")))
          .as("d_at_cents"))
    bounds
      .select(col("n_c").as("n_click"), col("n_p").as("n_purchase"))
      .crossJoin(broadcast(dm))
  }

  /** Exact Q-Q (quantile–quantile) table between the click and purchase
    * value distributions — the 16-point drill-down behind q195's single
    * KS statistic: for each sixteenth q, the exact order statistic of
    * BOTH distributions (smallest cents whose cumulative count reaches
    * ⌈q·n/16⌉ — the q207 weighted-median recipe generalized to a
    * quantile grid) plus their integer-ppm ratio. The table a drift
    * triage reads to see WHERE two distributions diverge, not just by
    * how much. Scale shape: per-group cumulative counts over DISTINCT
    * cents (domain-bounded, as q207); the 16-row quantile grid
    * cross-joins broadcast; everything else is partial-agg'd. */
  def qqTable(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type").as("g"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val counts = ev.groupBy(col("g"), col("cents"))
      .agg(count(lit(1)).as("c"))
    val tot = counts.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val wc = Window.partitionBy(col("g")).orderBy(col("cents").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum(col("c")).over(wc))
      .join(broadcast(tot), Seq("g"))
    val grid = spark.range(1, 17).select(col("id").as("q"))
    val qv = cum.crossJoin(broadcast(grid))
      // target rank ⌈q·n/16⌉ computed as (q·n + 15) div 16 — integer-only
      .filter(col("cum") >= expr("(q * n + 15) div 16"))
      .groupBy(col("g"), col("q"))
      .agg(min(col("cents")).as("v"))
    qv.filter(col("g") === "click")
      .select(col("q"), col("v").as("click_cents"))
      .join(qv.filter(col("g") === "purchase")
        .select(col("q"), col("v").as("purchase_cents")), Seq("q"))
      .select(col("q"), col("click_cents"), col("purchase_cents"),
        expr("click_cents * 1000000 div greatest(purchase_cents, 1)")
          .as("ratio_ppm"))
  }

  /** SEASONAL anomaly detection — the periodic complement to q184's
    * local EWMA baseline: each (event type, calendar hour)'s revenue is
    * compared against that slice's HOUR-OF-DAY baseline (the mean over
    * all days at the same clock hour), and the top deviations surface
    * as exact integer ratios (cents·n_hours·10^6 div hod_total — no
    * float averaging). Catches the "3 AM spike" that a trailing-window
    * baseline normalizes away after a few periods and a global mean
    * never sees. Scale shape: two partial-agg'd groupBys (hourly
    * totals ≪ events; baselines = 24·types rows, broadcast back); the
    * top-20 is TakeOrderedAndProject under a total (ratio, hr, type)
    * order — per-partition heaps, no global sort. Magnitude bound:
    * `cents·n_hours·10^6` stays in-range while hourly cents stay below
    * ~10^10 (≈10^8 $/hour/type); past that, switch the ratio to the
    * q208/q210 decimal(38) discipline before dividing. */
  def seasonalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = t(spark, dir, "events")
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hr"))
      .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
        .as("cents"))
    val baseline = hourly
      .groupBy(col("event_type"), hour(col("hr")).as("hod"))
      .agg(sum(col("cents")).as("hod_total"),
        count(lit(1)).as("n_hours"))
    hourly.withColumn("hod", hour(col("hr")))
      .join(broadcast(baseline), Seq("event_type", "hod"))
      .filter(col("hod_total") > 0)
      .select(col("event_type"), col("hr").cast("long").as("hr_sec"),
        col("cents"), col("n_hours"),
        expr("cents * n_hours * 1000000 div hod_total").as("ratio_ppm"))
      .orderBy(col("ratio_ppm").desc, col("hr_sec").asc,
        col("event_type").asc)
      .limit(20)
  }

  /** Per-slice OLS trend: slope / intercept / Pearson r of value-cents
    * against time for each event type — the "is this metric drifting,
    * and how fast" monitor that complements q90 (moment deltas) and
    * q195 (distribution shift) with a fitted MODEL per slice. One
    * mergeable pass: the five sufficient statistics (n, Σx, Σy, Σxy,
    * Σx², Σy²) accumulate as EXACT decimal(38) integers (x = seconds
    * from a fixed epoch, y = cents — products fit well inside 38
    * digits), so partial aggregation is order-independent and the
    * closed-form doubles are computed from bit-identical operands in a
    * fixed expression order — cross-engine hashable, unlike any
    * float-accumulating regression. Scale: one partial-agg'd shuffle of
    * six numbers per group; nothing else. */
  def groupRegression(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("event_type"),
        (unix_timestamp(col("ts")) - lit(1704067200L)).as("x"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("y"))
    val s = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x").cast("decimal(19,0)") * col("y"))
          .cast("decimal(38,0)")).as("sxy"),
        sum((col("x").cast("decimal(19,0)") * col("x"))
          .cast("decimal(38,0)")).as("sxx"),
        sum((col("y").cast("decimal(19,0)") * col("y"))
          .cast("decimal(38,0)")).as("syy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double")
    val num = nD * col("sxy").cast("double") - sxD * syD
    val den = nD * col("sxx").cast("double") - sxD * sxD
    // nullif: a one-row (or constant-x) group has zero x-variance —
    // slope/corr undefined, NULL in both engines (r16 sweep)
    s.select(col("event_type"), col("n"),
      (round(num / nullif(den, lit(0.0)), 9) + lit(0.0)).as("slope_r"),
      (round((syD - (num / nullif(den, lit(0.0))) * sxD) / nD, 6)
        + lit(0.0))
        .as("intercept_r"),
      (round(num / nullif(sqrt(den *
        (nD * col("syy").cast("double") - syD * syD)), lit(0.0)), 9)
        + lit(0.0))
        .as("corr_r"))
  }

  /** Shannon entropy + KL divergence of each customer segment's
    * event-type mix against the global mix — the information-theoretic
    * drift/skew monitor complementing q195's KS statistic (KS compares
    * one numeric distribution's shape; KL here scores CATEGORICAL
    * composition, the "this segment's traffic mix looks nothing like
    * the corpus" alarm, and entropy flags near-deterministic segments
    * outright). Numerics: all counts are exact integers from one
    * partial-agg'd pass; `ln` appears only in per-term closed-form
    * expressions evaluated in an identical order in both engines (the
    * q60/q95 precedent), the per-segment term count is bounded by the
    * type alphabet — so the float sums span ≤|types| addends and the
    * stabilizing round(·,6) sits ~10 orders above any summation-order
    * wobble. Shape: counts collapse to a |segments|×|types| relation
    * before ANY float math; the global mix and its total broadcast. */
  def typeEntropy(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val cu = t(spark, dir, "customer")
    val counts = ev.join(cu, ev("user_id") === cu("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val glob = counts.groupBy(col("event_type"))
      .agg(sum(col("c")).as("g"))
    val tot = glob.agg(sum(col("g")).as("nn"))
    counts.join(broadcast(glob), Seq("event_type"))
      .crossJoin(broadcast(tot))
      .groupBy(col("segment"))
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_types"),
        sum(col("c") * log(col("c"))).as("clc"),
        sum(col("c") * log(col("g"))).as("clg"),
        min(col("nn")).as("nn"))
      .select(col("segment"), col("n"), col("n_types"),
        (round(log(col("n")) - col("clc") / col("n"), 6) + lit(0.0))
          .as("entropy"),
        (round(col("clc") / col("n") - log(col("n"))
          - col("clg") / col("n") + log(col("nn")), 6) + lit(0.0))
          .as("kl_vs_global"))
  }

  /** Pipeline-observed DQ counters (`Dataset.observe` → `CollectMetrics`
    * + `Observation`): row counts, exact cent sums, return-flag and
    * null-discount tallies collected DURING the pipeline's own action —
    * the accumulator-style pass that gives every production write its
    * quality counters for free, where a naive DQ layer re-scans the
    * table (at 100 TB the second scan IS the cost). The observed
    * metrics are themselves the query result, and the DuckDB oracle
    * recomputes them declaratively — proving the side-channel counters
    * equal the first-class aggregation. All metrics are exact integers
    * (counts + floor-cents sums), so merge order across tasks cannot
    * wobble them. The downstream aggregate the pipeline "really" runs
    * (a per-flag census) is consumed inside the operator; its action is
    * what populates the observation. NOTE for bench/plan-dump consumers:
    * this catalog function is EAGER by necessity — `Observation.get`
    * blocks until an action ran, so the corpus scan happens inside the
    * call and the returned DataFrame is a 1-row local relation (a later
    * .count() re-times only that). Observed sums are NULL on an
    * empty/fully-filtered input (kept as NULL columns, matching the
    * oracle's SQL `sum` semantics — never unboxed through
    * null.asInstanceOf, which would silently read 0). */
  /** Population stability index per bin — the standard production
    * score-drift monitor (banking/ML-monitoring folklore; same family
    * as q229's KL): event values bucket into 16 fixed equal-width
    * slices over the GLOBAL min/max (pure integer bin arithmetic — the
    * bin id is output, so no float boundary math), the corpus splits
    * into an early
    * and a late half at the midpoint timestamp, and each bin reports
    * its signed PSI contribution (p−q)·ln(p/q) — Σ over bins is the
    * PSI, > 0.2 is the classic "investigate" threshold. All counting is
    * exact integers collapsing to ≤ 16 rows before ANY float math; the
    * contribution is one fixed-order closed-form expression (the
    * q229/q60 ln precedent), NULL for bins empty on either side (the
    * conventional exclude-and-flag treatment, deterministic in both
    * engines). One corpus scan, one 16-key partial-agg'd shuffle. */
  def psiDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("ts").cast("long").as("sec"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val bounds = ev.agg(min(col("sec")).as("mn_s"), max(col("sec")).as("mx_s"),
      min(col("cents")).as("mn_c"), max(col("cents")).as("mx_c"))
    val binned = ev.crossJoin(broadcast(bounds))
      .withColumn("late", col("sec") >= expr("(mn_s + mx_s) div 2"))
      // pure-integer bin id (bin is OUTPUT here, so no float boundary
      // arithmetic — unlike the internal-only width_bucket slices)
      .withColumn("bin",
        expr("(cents - mn_c) * 16 div (mx_c + 1 - mn_c)"))
      .groupBy(col("bin"))
      .agg(sum(when(!col("late"), 1L).otherwise(0L)).as("n_early"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"))
    val totals = binned.agg(sum(col("n_early")).as("tot_early"),
      sum(col("n_late")).as("tot_late"))
    binned.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_early"), col("n_late"),
        when(col("n_early") > 0 && col("n_late") > 0,
          round((col("n_early").cast("double") / col("tot_early") -
            col("n_late").cast("double") / col("tot_late")) *
            log(col("n_early").cast("double") * col("tot_late") /
              (col("n_late").cast("double") * col("tot_early"))), 6)
            + lit(0.0))
          .as("psi_contrib_r"))
  }

  def observeMetrics(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Observation
    val obs = Observation()
    val pipeline = t(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 10)
      .observe(obs,
        count(lit(1)).as("n_kept"),
        sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
          .as("kept_cents"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("n_returned"),
        sum(when(col("l_discount").isNull, 1L).otherwise(0L))
          .as("n_null_discount"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    // the pipeline's own terminal action populates the observation;
    // nothing is scanned twice
    pipeline.count()
    val m = obs.get
    import spark.implicits._
    // count is never null; the three sums are NULL when every row was
    // filtered — keep them as Option so empty input yields NULL columns
    // exactly like the oracle's SQL sums (not a silent unboxed 0).
    // A ZERO-TASK plan (all-empty scan) never evaluates CollectMetrics
    // at all, leaving the observation map empty — surface the same row
    // a SQL aggregate returns on empty input (r16 adversarial sweep)
    def optLong(k: String): Option[Long] =
      m.get(k).flatMap(Option(_)).map(_.asInstanceOf[Long])
    Seq((optLong("n_kept").getOrElse(0L), optLong("kept_cents"),
      optLong("n_returned"), optLong("n_null_discount")))
      .toDF("n_kept", "kept_cents", "n_returned", "n_null_discount")
  }

  /** Benford first-digit audit: the leading-digit distribution of order
    * totals against Benford's law — the classic forensic/DQ screen for
    * fabricated or truncated monetary data (organic multi-scale
    * quantities follow P(d) = log10(1+1/d); human-invented numbers
    * don't). The digit is extracted from the DECIMAL STRING of exact
    * cents — no float log10 in the hot path, so the census is pure
    * integer counting; the nine expected ppm constants are each one
    * ln/division chain rounded to an integer ≥10⁻² away from any
    * rounding boundary (a last-ulp ln divergence sits ~10⁻¹¹ away —
    * cannot flip). Scale: scan-local digit extraction, partial-agg'd
    * 9-row census, deviations computed on the census. */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy(lit(1))
    t(spark, dir, "orders")
      .select(expr(
        "CAST(substring(CAST(CAST(floor(o_totalprice * 100 + 0.5)" +
          " AS BIGINT) AS STRING), 1, 1) AS INT)").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(wAll))
      .select(col("digit"), col("n"),
        expr("CAST(n * 1000000 DIV total AS BIGINT)").as("obs_ppm"),
        expr("CAST(round(ln(1.0 + 1.0 / digit) / ln(10.0) * 1000000, 0)" +
          " AS BIGINT)").as("benford_ppm"))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("benford_ppm")))
  }

  /** Event lateness histogram — THE statistic that tunes a streaming
    * watermark delay: for each event, lateness = (max event-time seen
    * so far in ARRIVAL order) − (own event-time); its distribution
    * tells you what `withWatermark` delay keeps p99/p999 of events
    * inside the window (q76/q91/q147's delays become measured, not
    * guessed). Arrival order models the standard multi-producer merge:
    * 8 round-robin producer lanes (event_id mod 8), each delivering in
    * event-time order but with a deterministic per-lane skew of 0–14
    * minutes — so the merged arrival stream is genuinely out of order,
    * exactly the disorder watermarks exist for (the raw staged feed is
    * append-ordered BY event time, which would make every lateness 0
    * and the histogram vacuous). The running prefix-max over the
    * corpus-wide arrival order is the same single-partition trap as
    * q190's global rank, broken the same way: contiguous arrival-key
    * ranges form ~64 buckets, per-bucket running maxima use bounded
    * window partitions, bucket maxima (64 rows) take an exclusive
    * prefix-max, and the two combine per row. The oracle IS the
    * one-sort global running max — the gate proves the decomposition.
    * Census per power-of-two lateness band (the q128 bin trick). */
  def latenessHistogram(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("ak",
        expr("us + (event_id % 8) * 120000000"))
    val wdt = ev.agg(min(col("ak")).as("mn"), max(col("ak")).as("mx"))
      .select(col("mn"),
        greatest(expr("(mx - mn + 1) DIV 64"), lit(1L)).as("w"))
    val bucketed = ev.crossJoin(broadcast(wdt))
      .withColumn("bucket", expr("(ak - mn) DIV w"))
    val wIn = Window.partitionBy(col("bucket"))
      .orderBy(col("ak").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPre = Window.orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = bucketed.groupBy(col("bucket"))
      .agg(max(col("us")).as("bmax"))
      .withColumn("pmax", max(col("bmax")).over(wPre))
      .select(col("bucket"), col("pmax"))
    bucketed
      .withColumn("imax", max(col("us")).over(wIn))
      .join(broadcast(pre), Seq("bucket"))
      .withColumn("wm", greatest(coalesce(col("pmax"), col("imax")),
        col("imax")))
      .withColumn("late_s", expr("(wm - us) DIV 1000000"))
      .groupBy(expr("CAST(length(bin(late_s)) AS INT)").as("band"))
      .agg(count(lit(1)).as("n_events"),
        min(col("late_s")).as("min_late_s"),
        max(col("late_s")).as("max_late_s"))
  }

  /** Trailing-window OLS trend per slice — q208's global regression
    * turned into a ROLLING monitor: for every (event type, day), the
    * 7-day slope of daily revenue from the five sufficient statistics
    * accumulated by RANGE-frame window sums (RANGE, not ROWS: a gap
    * day must shrink the window, not silently stretch it to 7
    * arbitrary rows). All sums are exact longs; the closed-form slope
    * divides two exact integers (< 2^53, so their double images are
    * exact) in a fixed order; windows shorter than 3 days emit NULL
    * rather than a degenerate fit. One exchange on the type key; the
    * series relation is days×types, not corpus-sized. */
  def rollingRegression(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"),
        expr("unix_timestamp(ts) DIV 86400").as("d"))
      .agg(expr("CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))" +
        " AS BIGINT)").as("y"))
    val wr = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rangeBetween(-6, 0)
    daily
      .withColumn("n", count(lit(1)).over(wr))
      .withColumn("sx", sum(col("d")).over(wr))
      .withColumn("sy", sum(col("y")).over(wr))
      .withColumn("sxy", sum(col("d") * col("y")).over(wr))
      .withColumn("sxx", sum(col("d") * col("d")).over(wr))
      .select(col("event_type"), col("d"), col("y"), col("n"),
        (when(col("n") >= 3,
          round(expr("CAST(n * sxy - sx * sy AS DOUBLE)" +
            " / CAST(n * sxx - sx * sx AS DOUBLE)"), 6) + lit(0.0))
          ).as("slope7"))
  }

  /** Seasonal-naive forecast backtest: forecast(day) = actual(day − 7),
    * scored as exact integer MAPE and bias ppm per event type — the
    * baseline every real forecasting pipeline must beat, and the
    * EVALUATION half q214's anomaly baseline doesn't do (q214 flags
    * deviations from a seasonal mean; this scores a predictor against
    * ground truth). The lag-7 lookup is a self-equi-join on (type,
    * day−7) — gap-robust where `lag(7)` would silently pair across
    * gaps. Scale: the join runs on the days×types series relation. */
  def naiveForecast(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"),
        expr("unix_timestamp(ts) DIV 86400").as("d"))
      .agg(expr("CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))" +
        " AS BIGINT)").as("y"))
    val fc = daily.select(col("event_type"), (col("d") + 7).as("d"),
      col("y").as("f"))
    daily.join(fc, Seq("event_type", "d"))
      .withColumn("ape_ppm",
        expr("abs(y - f) * 1000000 DIV greatest(y, 1)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_scored"),
        expr("CAST(sum(ape_ppm) DIV count(1) AS BIGINT)").as("mape_ppm"),
        expr("CAST((sum(f) - sum(y)) * 1000000 DIV greatest(sum(y), 1)" +
          " AS BIGINT)").as("bias_ppm"))
  }

  /** Exact 1-D earth mover's distance between the click and purchase
    * value distributions — the INTEGRAL drift metric completing q195's
    * KS maximum (KS sees the worst single point; EMD = ∫|F₁−F₂| dv
    * weighs how much probability mass must move how far, the metric
    * that distinguishes a narrow spike from a broad shift). Exact
    * arithmetic throughout: on each interval between consecutive
    * distinct values, |F_c−F_p| is the rational |cc·n_p − cp·n_c| /
    * (n_c·n_p), so EMD·n_c·n_p = Σ |cc·n_p − cp·n_c|·Δv is an exact
    * integer accumulated as decimal(38) (== DuckDB HUGEINT). The
    * cumulative tallies ride q195's two-phase bucket recipe; the
    * interval width needs each distinct value's SUCCESSOR, which the
    * same decomposition provides — lead within bucket, stitched at
    * bucket boundaries by the 64-row bucket-min table's lead. The
    * oracle is the one-sort global form: the gate proves the stitch. */
  def emdDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type").as("g"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val bounds = ev.agg(min(col("cents")).as("mn"),
      max(col("cents")).as("mx"),
      count(when(col("g") === "click", 1)).as("n_c"),
      count(when(col("g") === "purchase", 1)).as("n_p"))
    val vals = ev.groupBy(col("cents"))
      .agg(count(when(col("g") === "click", 1)).as("c"),
        count(when(col("g") === "purchase", 1)).as("p"))
      .crossJoin(broadcast(bounds))
      .withColumn("b", expr("width_bucket(cents, mn, mx + 1, 64)"))
    val wIn = Window.partitionBy(col("b")).orderBy(col("cents").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.partitionBy(col("b")).orderBy(col("cents").asc)
    val cum = vals
      .withColumn("cc", sum(col("c")).over(wIn))
      .withColumn("cp", sum(col("p")).over(wIn))
      .withColumn("nxt_in", lead(col("cents"), 1).over(wLead))
    val wOff = Window.orderBy(col("b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wBLead = Window.orderBy(col("b").asc)
    val offs = cum.groupBy(col("b"))
      .agg(sum(col("c")).as("bc"), sum(col("p")).as("bp"),
        min(col("cents")).as("bmin"))
      .withColumn("oc", coalesce(sum(col("bc")).over(wOff), lit(0L)))
      .withColumn("op", coalesce(sum(col("bp")).over(wOff), lit(0L)))
      .withColumn("nb_min", lead(col("bmin"), 1).over(wBLead))
      .select(col("b"), col("oc"), col("op"), col("nb_min"))
    cum.join(broadcast(offs), Seq("b"))
      .withColumn("nxt", coalesce(col("nxt_in"), col("nb_min")))
      .filter(col("nxt").isNotNull)
      .select(col("n_c"), col("n_p"),
        (abs((col("oc") + col("cc")) * col("n_p") -
          (col("op") + col("cp")) * col("n_c")) *
          (col("nxt") - col("cents"))).cast("decimal(38,0)").as("term"))
      .groupBy(col("n_c"), col("n_p"))
      .agg(sum(col("term")).as("emd_num"))
      .select(col("n_c").as("n_click"), col("n_p").as("n_purchase"),
        col("emd_num").cast("string").as("emd_num"),
        (round(col("emd_num").cast("double") /
          (col("n_c") * col("n_p")).cast("double"), 4) + lit(0.0))
          .as("emd_cents"))
  }

  /** One-sided CUSUM change-point detection (Page 1954) on each event
    * type's daily revenue: S_i = max(0, S_{i−1} + (x_i − μ − slack)),
    * alarm while S exceeds the decision threshold h — THE classical
    * "did the level shift" monitor, catching slow drifts that q184's
    * EWMA and q214's seasonal baseline both smooth over. The fold is
    * exactly q232's clamped running sum, so the same reflection
    * identity S_i = T_i − min(0, min_{j≤i} T_j) (T = running sum of
    * deviations) turns the sequential recursion into two plain windows
    * — in exact integer cents (μ as cents·n-scaled comparisons: x_i·n
    * − Σx − slack·n stays integral, avoiding a fractional mean).
    * Reference μ and the k/h constants derive from each series' own
    * global mean — self-calibrating, deterministic. Output: per type,
    * days observed, days in alarm, peak CUSUM (n-scaled), first alarm
    * day (NULL when never). Series relation is days×types. */
  def cusum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"),
        expr("unix_timestamp(ts) DIV 86400").as("d"))
      .agg(expr("CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))" +
        " AS BIGINT)").as("y"))
    val mu = daily.groupBy(col("event_type"))
      .agg(sum(col("y")).as("sy"), count(lit(1)).as("nd"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d").asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(mu), Seq("event_type"))
      // deviation scaled by nd so the mean needs no division:
      // dev = y·nd − sy − slack, slack = sy DIV 20 (5% of the mean·nd)
      .withColumn("dev", expr("y * nd - sy - sy DIV 20"))
      .withColumn("tt", sum(col("dev")).over(wRun))
      .withColumn("rm", min(col("tt")).over(wRun))
      .withColumn("s", col("tt") -
        least(coalesce(col("rm"), lit(0L)), lit(0L)))
      // alarm while S > h; h = sy DIV 4 is in the same nd-scaled cents
      // units as S (≈ a quarter of one mean day, accumulated)
      .withColumn("alarm", col("s") > expr("sy DIV 4"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarm_days"),
        max(col("s")).as("peak_cusum"),
        min(when(col("alarm"), col("d"))).as("first_alarm_day"))
  }

  /** Manifest-driven data-contract validation — q78's one-pass rule
    * gate with the rules turned into DATA: a staged versioned rules
    * table (column, operator, argument — the "data contract" artifact
    * a producer publishes) is COMPILED at plan time into one
    * conditional-sum aggregate per rule, all riding a single scan of
    * the fact table; `stack` unpivots the one result row back into
    * per-rule verdicts. Rule operators: not_null, min/max (numeric),
    * min_ts/max_ts (temporal), in_set, unique (count vs distinct —
    * an aggregate-level rule sharing the same pass). The staged
    * contract deliberately contains failing rules (a price cap the
    * feed exceeds, a freshness bound 2001 data violates) so both
    * verdict arms are exercised at every SF. At 100 TB the single
    * shared scan is the entire point — contracts with one scan per
    * rule are unrunnable. */
  def contractCheck(spark: SparkSession, dir: String): DataFrame = {
    val base = Relational.stagedDir("contract_rules", dir) { b =>
      import spark.implicits._
      Seq(
        (1L, "o_custkey", "not_null", ""),
        (2L, "o_totalprice", "min", "0"),
        (3L, "o_totalprice", "max", "600000"),
        (4L, "o_orderdate", "min_ts", "1995-01-01 00:00:00"),
        (5L, "o_orderdate", "max_ts", "2000-12-31 23:59:59"),
        (6L, "o_orderpriority", "in_set",
          "1-URGENT|2-HIGH|3-MEDIUM|4-NOT SPECIFIED|5-LOW"),
        (7L, "o_orderstatus", "in_set", "O|F|P"),
        (8L, "o_orderkey", "unique", ""),
        (9L, "o_totalprice", "max", "200000"))
        .toDF("rule_id", "col_name", "op", "arg")
        .coalesce(1).write.mode("overwrite").parquet(s"$b/rules")
    }
    val rules = spark.read.parquet(s"$base/rules").collect()
      .map(r => (r.getAs[Long]("rule_id"), r.getAs[String]("col_name"),
        r.getAs[String]("op"), r.getAs[String]("arg")))
      .sortBy(_._1)
    def violations(cn: String, op: String, arg: String)
        : org.apache.spark.sql.Column = op match {
      case "not_null" => sum(when(col(cn).isNull, 1L).otherwise(0L))
      case "min" => sum(when(col(cn) < lit(arg.toDouble), 1L)
        .otherwise(0L))
      case "max" => sum(when(col(cn) > lit(arg.toDouble), 1L)
        .otherwise(0L))
      case "min_ts" => sum(when(col(cn) < to_timestamp(lit(arg)), 1L)
        .otherwise(0L))
      case "max_ts" => sum(when(col(cn) > to_timestamp(lit(arg)), 1L)
        .otherwise(0L))
      case "in_set" => sum(when(!col(cn).isin(
        arg.split('|').toIndexedSeq: _*), 1L).otherwise(0L))
      case "unique" => count(lit(1)) - countDistinct(col(cn))
      case other => throw new IllegalArgumentException(
        s"unknown contract op: $other") // fail loudly, never skip a rule
    }
    // coalesce(...,0): an EMPTY table violates nothing — sum() over
    // zero rows is NULL, which would render every rule's verdict NULL
    // instead of pass (r16 adversarial sweep; oracle mirrored)
    val aggs = rules.zipWithIndex.map { case ((_, cn, op, arg), i) =>
      coalesce(violations(cn, op, arg), lit(0L)).as(s"v$i") }
    val row = t(spark, dir, "orders").agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex.map { case ((id, cn, op, _), i) =>
      s"CAST($id AS BIGINT), '$cn', '$op', v$i" }.mkString(", ")
    row.selectExpr(s"stack(${rules.length}, $stackArgs)" +
        " AS (rule_id, col_name, op, n_violations)")
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** Weight-of-evidence / information-value feature screen — the
    * supervised sibling of q258's PSI (same per-bin signed log-ratio
    * algebra, but the two distributions are label classes instead of
    * time halves): price bins into 10 equal-width PURE-INTEGER bins
    * (bin id is output — no float boundary math, the q258 rule);
    * per bin WOE = ln(p_pos/p_neg) and IV contribution
    * (p_pos − p_neg)·WOE say how much the feature separates returned
    * from kept lineitems — the classic credit-scoring screen that
    * ranks features BEFORE any model is trained. Counts are exact
    * integers in ONE partial-agg'd shuffle of ≤ 10 keys; the two
    * floats are single fixed-order expressions; single-sided bins
    * (a class count of 0 makes WOE undefined) emit NULL, mirrored in
    * the oracle. */
  def woeIv(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
        .as("cents"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    val bounds = li.agg(min(col("cents")).as("mn"),
      max(col("cents")).as("mx"))
    val binned = li.crossJoin(broadcast(bounds))
      .withColumn("bin", expr("(cents - mn) * 10 div (mx + 1 - mn)"))
      .groupBy(col("bin"))
      .agg(sum(col("y")).as("n_pos"),
        (count(lit(1)) - sum(col("y"))).as("n_neg"))
    val totals = binned.agg(sum(col("n_pos")).as("tot_pos"),
      sum(col("n_neg")).as("tot_neg"))
    binned.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(log(col("n_pos").cast("double") * col("tot_neg") /
            (col("n_neg").cast("double") * col("tot_pos"))), 6)
            + lit(0.0)).as("woe_r"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("n_pos").cast("double") / col("tot_pos") -
            col("n_neg").cast("double") / col("tot_neg")) *
            log(col("n_pos").cast("double") * col("tot_neg") /
              (col("n_neg").cast("double") * col("tot_pos"))), 6)
            + lit(0.0)).as("iv_contrib_r"))
  }

  /** Fano factor / index of dispersion of daily event arrivals per
    * type (Fano 1947; Cox & Lewis 1966 on point-process diagnostics) —
    * the burstiness screen that tells a pipeline whether a feed's
    * volume is Poisson-stable (F ≈ 1), bursty/clumped (F > 1, e.g.
    * batch replays or incident storms) or suspiciously regular (F < 1,
    * e.g. a rate-limited or synthesized feed; this corpus's uniform
    * generator reads under-dispersed, which the gate pins). Days
    * WITHOUT events count as zeros via the closed form over the global
    * span D: F = (D·Σn² − S²)/(D·S) — exact integer numerator and
    * denominator from one per-(type, day) partial agg, one double
    * rounding; the verdict thresholds the rounded value so both
    * engines band identically. */
  def fanoDispersion(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_type"),
        expr("unix_timestamp(ts) DIV 86400").as("d"))
    val bounds = ev.agg(min(col("d")).as("mn"), max(col("d")).as("mx"))
    ev.groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_active_days"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("s2"))
      .crossJoin(broadcast(bounds))
      .withColumn("n_days", col("mx") - col("mn") + 1)
      .withColumn("fano_r",
        round((col("n_days") * col("s2") - col("s") * col("s"))
          .cast("double") / (col("n_days") * col("s")).cast("double"), 6)
          + lit(0.0))
      .select(col("event_type"), col("n_active_days"), col("n_days"),
        col("s").as("n_events"), col("fano_r"),
        when(col("fano_r") > 1.2, "overdispersed")
          .when(col("fano_r") < 0.8, "underdispersed")
          .otherwise("poisson_like").as("verdict"))
  }

  val catalog: Seq[Q] = Seq(
    Q("q283_fano_dispersion", fanoDispersion _,
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d
        |  FROM events),
        |b AS (SELECT min(d) AS mn, max(d) AS mx FROM ev),
        |pd AS (
        |  SELECT event_type, d, count(*) AS n
        |  FROM ev GROUP BY 1, 2),
        |agg AS (
        |  SELECT event_type, count(*) AS n_active_days,
        |    CAST(sum(n) AS BIGINT) AS s,
        |    CAST(sum(n * n) AS BIGINT) AS s2
        |  FROM pd GROUP BY 1),
        |f AS (
        |  SELECT event_type, n_active_days, mx - mn + 1 AS n_days,
        |    s AS n_events,
        |    round(CAST((mx - mn + 1) * s2 - s * s AS DOUBLE) /
        |      CAST((mx - mn + 1) * s AS DOUBLE), 6) + 0.0 AS fano_r
        |  FROM agg, b)
        |SELECT event_type, n_active_days, n_days, n_events, fano_r,
        |  CASE WHEN fano_r > 1.2 THEN 'overdispersed'
        |       WHEN fano_r < 0.8 THEN 'underdispersed'
        |       ELSE 'poisson_like' END AS verdict
        |FROM f""".stripMargin),
    Q("q270_woe_iv", woeIv _,
      """WITH li AS (
        |  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |    AS cents,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM li),
        |binned AS (
        |  SELECT (cents - mn) * 10 // (mx + 1 - mn) AS bin,
        |    CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(count(*) - sum(y) AS BIGINT) AS n_neg
        |  FROM li, b GROUP BY 1),
        |t AS (
        |  SELECT CAST(sum(n_pos) AS BIGINT) AS tot_pos,
        |    CAST(sum(n_neg) AS BIGINT) AS tot_neg
        |  FROM binned)
        |SELECT bin, n_pos, n_neg,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    round(ln(CAST(n_pos AS DOUBLE) * tot_neg /
        |      (CAST(n_neg AS DOUBLE) * tot_pos)), 6) + 0.0
        |  END AS woe_r,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    round((CAST(n_pos AS DOUBLE) / tot_pos -
        |      CAST(n_neg AS DOUBLE) / tot_neg) *
        |      ln(CAST(n_pos AS DOUBLE) * tot_neg /
        |        (CAST(n_neg AS DOUBLE) * tot_pos)), 6) + 0.0
        |  END AS iv_contrib_r
        |FROM binned, t""".stripMargin),
    Q("q258_psi_drift", psiDrift _,
      """WITH ev AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |b AS (SELECT min(sec) AS mn_s, max(sec) AS mx_s,
        |      min(cents) AS mn_c, max(cents) AS mx_c FROM ev),
        |binned AS (
        |  SELECT (cents - mn_c) * 16 // (mx_c + 1 - mn_c) AS bin,
        |    CAST(sum(CASE WHEN sec >= (mn_s + mx_s) // 2
        |      THEN 0 ELSE 1 END) AS BIGINT) AS n_early,
        |    CAST(sum(CASE WHEN sec >= (mn_s + mx_s) // 2
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        |  FROM ev, b GROUP BY 1),
        |t AS (SELECT CAST(sum(n_early) AS BIGINT) AS tot_early,
        |      CAST(sum(n_late) AS BIGINT) AS tot_late FROM binned)
        |SELECT bin, n_early, n_late,
        |  CASE WHEN n_early > 0 AND n_late > 0 THEN
        |    round((CAST(n_early AS DOUBLE) / tot_early -
        |      CAST(n_late AS DOUBLE) / tot_late) *
        |      ln(CAST(n_early AS DOUBLE) * tot_late /
        |        (CAST(n_late AS DOUBLE) * tot_early)), 6) + 0.0
        |    ELSE NULL END AS psi_contrib_r
        |FROM binned, t""".stripMargin),
    Q("q242_contract_check", contractCheck _,
      """WITH o AS (SELECT * FROM orders)
        |SELECT rule_id, col_name, op,
        |  coalesce(n_violations, 0) AS n_violations,
        |  coalesce(n_violations, 0) = 0 AS pass FROM (
        |  SELECT CAST(1 AS BIGINT) AS rule_id, 'o_custkey' AS col_name,
        |    'not_null' AS op,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_violations FROM o
        |  UNION ALL
        |  SELECT 2, 'o_totalprice', 'min',
        |    CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) FROM o
        |  UNION ALL
        |  SELECT 3, 'o_totalprice', 'max',
        |    CAST(sum(CASE WHEN o_totalprice > 600000 THEN 1 ELSE 0 END)
        |      AS BIGINT) FROM o
        |  UNION ALL
        |  SELECT 4, 'o_orderdate', 'min_ts',
        |    CAST(sum(CASE WHEN o_orderdate <
        |      TIMESTAMP '1995-01-01 00:00:00' THEN 1 ELSE 0 END)
        |      AS BIGINT) FROM o
        |  UNION ALL
        |  SELECT 5, 'o_orderdate', 'max_ts',
        |    CAST(sum(CASE WHEN o_orderdate >
        |      TIMESTAMP '2000-12-31 23:59:59' THEN 1 ELSE 0 END)
        |      AS BIGINT) FROM o
        |  UNION ALL
        |  SELECT 6, 'o_orderpriority', 'in_set',
        |    CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT',
        |      '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM o
        |  UNION ALL
        |  SELECT 7, 'o_orderstatus', 'in_set',
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM o
        |  UNION ALL
        |  SELECT 8, 'o_orderkey', 'unique',
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM o
        |  UNION ALL
        |  SELECT 9, 'o_totalprice', 'max',
        |    CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END)
        |      AS BIGINT) FROM o)""".stripMargin),
    Q("q240_cusum", cusum _,
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |mu AS (
        |  SELECT event_type, CAST(sum(y) AS BIGINT) AS sy,
        |    count(*) AS nd
        |  FROM daily GROUP BY 1),
        |dv AS (
        |  SELECT d.event_type, d.d, y * nd - sy - sy // 20 AS dev, sy
        |  FROM daily d JOIN mu USING (event_type)),
        |r AS (
        |  SELECT event_type, d, sy,
        |    sum(dev) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tt
        |  FROM dv),
        |m AS (
        |  SELECT event_type, d, sy, tt,
        |    min(tt) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rm
        |  FROM r),
        |c AS (
        |  SELECT event_type, d, sy,
        |    tt - least(coalesce(rm, 0), 0) AS s
        |  FROM m)
        |SELECT event_type, count(*) AS n_days,
        |  CAST(sum(CASE WHEN s > sy // 4 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_alarm_days,
        |  CAST(max(s) AS BIGINT) AS peak_cusum,
        |  min(CASE WHEN s > sy // 4 THEN d END) AS first_alarm_day
        |FROM c GROUP BY 1""".stripMargin),
    Q("q237_rolling_regression", rollingRegression _,
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, d, y,
        |    count(*) OVER wr AS n,
        |    sum(d) OVER wr AS sx, sum(y) OVER wr AS sy,
        |    sum(d * y) OVER wr AS sxy, sum(d * d) OVER wr AS sxx
        |  FROM daily
        |  WINDOW wr AS (PARTITION BY event_type ORDER BY d
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, d, y, n,
        |  CASE WHEN n >= 3 THEN
        |    round(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE), 6) + 0.0
        |  END AS slope7
        |FROM w""".stripMargin),
    Q("q238_naive_forecast", naiveForecast _,
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT a.event_type, a.y, f.y AS f
        |  FROM daily a JOIN daily f
        |    ON a.event_type = f.event_type AND a.d = f.d + 7)
        |SELECT event_type, count(*) AS n_scored,
        |  CAST(sum(abs(y - f) * 1000000 // greatest(y, 1))
        |    // count(*) AS BIGINT) AS mape_ppm,
        |  CAST((sum(f) - sum(y)) * 1000000 // greatest(sum(y), 1)
        |    AS BIGINT) AS bias_ppm
        |FROM j GROUP BY 1""".stripMargin),
    Q("q239_emd_drift", emdDrift _,
      """WITH ev AS (
        |  SELECT event_type AS g,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |b AS (
        |  SELECT count(*) FILTER (WHERE g = 'click') AS n_c,
        |    count(*) FILTER (WHERE g = 'purchase') AS n_p
        |  FROM ev),
        |vals AS (
        |  SELECT cents,
        |    count(*) FILTER (WHERE g = 'click') AS c,
        |    count(*) FILTER (WHERE g = 'purchase') AS p
        |  FROM ev GROUP BY 1),
        |cum AS (
        |  SELECT cents,
        |    sum(c) OVER w AS cc, sum(p) OVER w AS cp,
        |    lead(cents) OVER (ORDER BY cents) AS nxt
        |  FROM vals
        |  WINDOW w AS (ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT b.n_c AS n_click, b.n_p AS n_purchase,
        |  CAST(sum(abs(cc * b.n_p - cp * b.n_c)::HUGEINT
        |    * (nxt - cents)) AS VARCHAR) AS emd_num,
        |  round(CAST(sum(abs(cc * b.n_p - cp * b.n_c)::HUGEINT
        |      * (nxt - cents)) AS DOUBLE)
        |    / CAST(b.n_c * b.n_p AS DOUBLE), 4) + 0.0 AS emd_cents
        |FROM cum CROSS JOIN b
        |WHERE nxt IS NOT NULL
        |GROUP BY 1, 2""".stripMargin),
    Q("q234_benford", benford _,
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)
        |    AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders),
        |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        |SELECT digit, n,
        |  CAST(n * 1000000 // total AS BIGINT) AS obs_ppm,
        |  CAST(round(ln(1.0 + 1.0 / digit) / ln(10.0) * 1000000, 0)
        |    AS BIGINT) AS benford_ppm,
        |  abs(CAST(n * 1000000 // total AS BIGINT)
        |    - CAST(round(ln(1.0 + 1.0 / digit) / ln(10.0) * 1000000, 0)
        |        AS BIGINT)) AS dev_ppm
        |FROM c CROSS JOIN t""".stripMargin),
    Q("q235_lateness_histogram", latenessHistogram _,
      """WITH ev AS (
        |  SELECT event_id, epoch_us(ts) AS us,
        |    epoch_us(ts) + (event_id % 8) * 120000000 AS ak
        |  FROM events),
        |r AS (
        |  SELECT us,
        |    max(us) OVER (ORDER BY ak, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wm
        |  FROM ev),
        |l AS (SELECT (wm - us) // 1000000 AS late_s FROM r)
        |SELECT CAST(len(bin(late_s)) AS INT) AS band,
        |  count(*) AS n_events,
        |  CAST(min(late_s) AS BIGINT) AS min_late_s,
        |  CAST(max(late_s) AS BIGINT) AS max_late_s
        |FROM l GROUP BY 1""".stripMargin),
    Q("q230_observe_metrics", observeMetrics _,
      """SELECT count(*) AS n_kept,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS kept_cents,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_returned,
        |  CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_null_discount
        |FROM lineitem WHERE l_quantity >= 10""".stripMargin),
    Q("q229_type_entropy", typeEntropy _,
      """WITH counts AS (
        |  SELECT c_mktsegment AS segment, event_type, count(*) AS c
        |  FROM events JOIN customer ON user_id = c_custkey
        |  GROUP BY 1, 2),
        |gmix AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS g
        |  FROM counts GROUP BY 1),
        |tot AS (SELECT CAST(sum(g) AS BIGINT) AS nn FROM gmix),
        |agg AS (
        |  SELECT segment, CAST(sum(c) AS BIGINT) AS n,
        |    count(*) AS n_types,
        |    sum(c * ln(c)) AS clc, sum(c * ln(g)) AS clg,
        |    min(nn) AS nn
        |  FROM counts JOIN gmix USING (event_type) CROSS JOIN tot
        |  GROUP BY 1)
        |SELECT segment, n, n_types,
        |  round(ln(n) - clc / n, 6) + 0.0 AS entropy,
        |  round(clc / n - ln(n) - clg / n + ln(nn), 6) + 0.0
        |    AS kl_vs_global
        |FROM agg""".stripMargin),
    Q("q220_qq_table", qqTable _,
      """WITH e AS (
        |  SELECT event_type AS g,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |counts AS (
        |  SELECT g, cents, count(*) AS c FROM e GROUP BY 1, 2),
        |tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n
        |        FROM counts GROUP BY 1),
        |cum AS (
        |  SELECT counts.g, cents,
        |    sum(c) OVER (PARTITION BY counts.g ORDER BY cents) AS cum,
        |    t.n
        |  FROM counts JOIN tot t ON counts.g = t.g),
        |qv AS (
        |  SELECT g, gr.q, min(cents) AS v
        |  FROM cum CROSS JOIN range(1, 17) gr(q)
        |  WHERE cum >= (gr.q * n + 15) // 16
        |  GROUP BY 1, 2)
        |SELECT c.q, c.v AS click_cents, p.v AS purchase_cents,
        |  CAST(c.v * 1000000 // greatest(p.v, 1) AS BIGINT) AS ratio_ppm
        |FROM (SELECT q, v FROM qv WHERE g = 'click') c
        |JOIN (SELECT q, v FROM qv WHERE g = 'purchase') p USING (q)"""
        .stripMargin),
    Q("q214_seasonal_anomaly", seasonalAnomaly _,
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |base AS (
        |  SELECT event_type, hour(hr) AS hod,
        |    CAST(sum(cents) AS BIGINT) AS hod_total,
        |    count(*) AS n_hours
        |  FROM hourly GROUP BY 1, 2)
        |SELECT h.event_type, CAST(epoch(h.hr) AS BIGINT) AS hr_sec,
        |  h.cents, b.n_hours,
        |  CAST(h.cents * b.n_hours * 1000000 // b.hod_total AS BIGINT)
        |    AS ratio_ppm
        |FROM hourly h JOIN base b
        |  ON h.event_type = b.event_type AND hour(h.hr) = b.hod
        |WHERE b.hod_total > 0
        |ORDER BY ratio_ppm DESC, hr_sec ASC, h.event_type ASC
        |LIMIT 20""".stripMargin),
    Q("q208_group_regression", groupRegression _,
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS x,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        |  FROM events),
        |s AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
        |    sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx,
        |    sum(y::HUGEINT * y) AS syy
        |  FROM e GROUP BY 1)
        |SELECT event_type, n,
        |  round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
        |    nullif(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE,
        |      0.0), 9) + 0.0
        |    AS slope_r,
        |  round((sy::DOUBLE -
        |    ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
        |     nullif(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE,
        |       0.0))
        |    * sx::DOUBLE) / n::DOUBLE, 6) + 0.0 AS intercept_r,
        |  round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
        |    nullif(
        |    sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) *
        |      (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
        |    0.0), 9)
        |    + 0.0 AS corr_r
        |FROM s""".stripMargin),
    Q("q195_ks_drift", ksDrift _,
      """WITH e AS (
        |  SELECT event_type AS g,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |n AS (
        |  SELECT count(CASE WHEN g = 'click' THEN 1 END) AS n_c,
        |    count(CASE WHEN g = 'purchase' THEN 1 END) AS n_p
        |  FROM e),
        |v AS (
        |  SELECT cents,
        |    count(CASE WHEN g = 'click' THEN 1 END) AS c,
        |    count(CASE WHEN g = 'purchase' THEN 1 END) AS p
        |  FROM e GROUP BY 1),
        |w AS (
        |  SELECT cents,
        |    sum(c) OVER (ORDER BY cents) AS cc,
        |    sum(p) OVER (ORDER BY cents) AS cp
        |  FROM v),
        |d AS (
        |  SELECT cents, abs(cc * n.n_p - cp * n.n_c) AS ad
        |  FROM w CROSS JOIN n)
        |SELECT (SELECT n_c FROM n) AS n_click,
        |  (SELECT n_p FROM n) AS n_purchase,
        |  CAST(max(ad) * 1000000 //
        |    greatest((SELECT n_c FROM n) * (SELECT n_p FROM n), 1)
        |    AS BIGINT) AS d_ppm,
        |  min(CASE WHEN ad = (SELECT max(ad) FROM d) THEN cents END)
        |    AS d_at_cents
        |FROM d""".stripMargin),
    Q("q179_robust_zscore", robustZscoreGate _,
      """WITH o AS (
        |  SELECT o_orderpriority AS priority, o_totalprice AS p
        |  FROM orders),
        |m AS (
        |  SELECT priority, quantile_cont(p, 0.5) AS med
        |  FROM o GROUP BY 1),
        |d AS (
        |  SELECT o.priority, p, med, abs(p - med) AS ad
        |  FROM o JOIN m USING (priority)),
        |md AS (
        |  SELECT priority, quantile_cont(ad, 0.5) AS mad
        |  FROM d GROUP BY 1),
        |s AS (
        |  SELECT d.priority, p, med, mad,
        |    0.6745 * (p - med) / mad AS z
        |  FROM d JOIN md USING (priority) WHERE mad > 0)
        |SELECT priority, count(*) AS n_orders,
        |  CAST(sum(CASE WHEN abs(z) > 3.5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  round(max(abs(z)), 6) AS max_robust_z
        |FROM s GROUP BY 1""".stripMargin),
    Q("q78_dq_checks", dqChecks _,
      """WITH w AS (
        |  SELECT count(*) AS n_rows,
        |    sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)
        |      AS v_totalprice_positive,
        |    sum(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END)
        |      AS v_custkey_present,
        |    sum(CASE WHEN o_orderstatus IN ('F', 'O', 'P') THEN 0 ELSE 1 END)
        |      AS v_status_in_domain,
        |    sum(CASE WHEN o_orderdate >= TIMESTAMP '1992-01-01 00:00:00'
        |              AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |             THEN 0 ELSE 1 END) AS v_orderdate_in_range
        |  FROM orders)
        |SELECT 'totalprice_positive' AS rule_name, n_rows,
        |  CAST(v_totalprice_positive AS BIGINT) AS n_violations,
        |  round(v_totalprice_positive / n_rows, 6) AS violation_rate FROM w
        |UNION ALL
        |SELECT 'custkey_present', n_rows,
        |  CAST(v_custkey_present AS BIGINT),
        |  round(v_custkey_present / n_rows, 6) FROM w
        |UNION ALL
        |SELECT 'status_in_domain', n_rows,
        |  CAST(v_status_in_domain AS BIGINT),
        |  round(v_status_in_domain / n_rows, 6) FROM w
        |UNION ALL
        |SELECT 'orderdate_in_range', n_rows,
        |  CAST(v_orderdate_in_range AS BIGINT),
        |  round(v_orderdate_in_range / n_rows, 6) FROM w""".stripMargin)
  )
}
