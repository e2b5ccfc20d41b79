package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Join-variant, set-operation, and multi-dimensional grouping operators —
  * engine breadth beyond the reference's three inner joins (SURVEY.md §2.3
  * notes the full join surface as roadmap).
  *
  * Scale notes: semi/anti joins shuffle only the join keys of the filtered
  * side; rollup/cube expand grouping sets map-side with partial aggregation,
  * so the exchange carries one partial row per (group, grouping-set) — not
  * per input row.
  */
object JoinsSetOps {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Left outer join preserving customers with no orders; null-aware
    * aggregation (count(col) skips nulls, unlike count(*)). */
  def outerJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_nationkey").as("nation_id"))
      .agg(countDistinct(col("c_custkey")).as("n_customers"),
           count(col("o_orderkey")).as("n_orders"),
           countDistinct(when(col("o_orderkey").isNull, col("c_custkey")))
             .as("n_no_order"))
  }

  /** Left-semi join — EXISTS semantics, no row multiplication. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o95 = t(spark, dir, "orders")
      .filter(Relational.inYear(col("o_orderdate"), 1995))
    c.join(o95, c("c_custkey") === o95("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** Left-anti join — NOT EXISTS semantics. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("nation_id"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** ROLLUP with grouping_id — hierarchical subtotals. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("l_quantity")), 2).as("qty"),
           grouping_id().as("gid"))

  /** CUBE — all grouping-set combinations. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("o_totalprice")), 2).as("spend"),
           grouping_id().as("gid"))

  /** INTERSECT / EXCEPT (both DISTINCT semantics, as in ANSI SQL):
    * customers active in 1995 vs 1996. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    def custs(y: Int): DataFrame =
      o.filter(Relational.inYear(col("o_orderdate"), y))
        .select(col("o_custkey"))
    val both = custs(1995).intersect(custs(1996))
      .agg(count(lit(1)).as("n")).select(lit("intersect").as("op"), col("n"))
    val only95 = custs(1995).except(custs(1996))
      .agg(count(lit(1)).as("n")).select(lit("except").as("op"), col("n"))
    both.unionByName(only95)
  }

  /** Shipping-priority composite (the TPC-H Q3 shape): 3-way
    * customer⋈orders⋈lineitem join filtered on both date sides, grouped
    * revenue per order, top 10 by revenue. The canonical "join big facts
    * then rank" OLAP composite: both date filters push to the scans,
    * revenue is per-row integer cents summed exactly, and the top-10 is
    * TakeOrderedAndProject. */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = java.sql.Timestamp.valueOf("1996-07-01 00:00:00")
    val c = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit(cutoff))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val l = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(cutoff))
      .select(col("l_orderkey"),
        expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) " +
          "AS BIGINT)").as("rev_cents"))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderkey").as("order_id"),
        col("o_orderdate").cast("date").cast("string").as("order_date"))
      .agg(sum(col("rev_cents")).as("revenue_cents"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue_cents").desc, col("order_id").asc)
      .limit(10)
  }

  /** Returned-items report (the TPC-H Q10 shape): revenue lost to
    * returns per customer over a quarter — customer⋈orders⋈lineitem
    * with a return-flag filter, top 20 by lost revenue. Same discipline
    * as [[shippingPriority]]: pushed filters, exact cents, heap top-k. */
  def returnedItems(spark: SparkSession, dir: String): DataFrame = {
    val lo = java.sql.Timestamp.valueOf("1995-10-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(lo) && col("o_orderdate") < lit(hi))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) " +
          "AS BIGINT)").as("rev_cents"))
    val c = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey").as("cust_id"), col("c_mktsegment"))
      .agg(sum(col("rev_cents")).as("lost_cents"),
        count(lit(1)).as("n_returned"))
      .orderBy(col("lost_cents").desc, col("cust_id").asc)
      .limit(20)
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * MATCH each other — the semantic a plain equi-join silently drops
    * (its NULL = NULL is UNKNOWN). Sides derive nullable keys from the
    * order status ('O' → NULL, the q58 trick); the result's NULL-key
    * group is exactly what the plain join would lose. Catalyst still
    * plans `<=>` as a hash join (the null-safe comparison is a valid
    * equi key), so the scale shape is unchanged. */
  def nullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(expr("nullif(o_orderstatus, 'O')").as("k"),
        col("o_totalprice"))
    val a = o.groupBy(col("k")).agg(count(lit(1)).as("n_a"))
    val b = o.groupBy(col("k").as("kb"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .as("cents_b"))
    a.join(b, a("k") <=> b("kb"))
      .select(coalesce(col("k"), lit("<null>")).as("status"),
        col("n_a"), col("cents_b"))
  }

  /** INTERSECT ALL / EXCEPT ALL — the BAG-semantics set operations
    * (multiplicities preserved: a customer ordering 3× in 1995 and 2× in
    * 1996 contributes 2 to the intersection and 1 to the difference),
    * a different operator contract from q21's set forms — Spark plans
    * them as a count-compare aggregation + generate, never a distinct.
    * Same partial-agg'd shuffle shape as any groupBy at scale. */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    def custs(y: Int): DataFrame =
      o.filter(Relational.inYear(col("o_orderdate"), y))
        .select(col("o_custkey"))
    val ia = custs(1995).intersectAll(custs(1996))
      .agg(count(lit(1)).as("n"))
      .select(lit("intersect_all").as("op"), col("n"))
    val ea = custs(1995).exceptAll(custs(1996))
      .agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), col("n"))
    ia.unionByName(ea)
  }

  /** HAVING — post-aggregation filter. */
  def havingFilter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("part_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .filter(col("n") >= 5)

  /** Full outer join — union of match, left-only, and right-only rows:
    * yearly spend per customer in 1995 vs 1996, keeping customers active
    * in either year. At scale both sides pre-aggregate to one row per key
    * before the join, so the full-outer shuffle carries reduced data, and
    * `coalesce` over the two key copies rebuilds a total key. */
  def fullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    def spend(y: Int): DataFrame =
      o.filter(Relational.inYear(col("o_orderdate"), y))
        .groupBy(col("o_custkey").as(s"cust_$y"))
        .agg(sum(col("o_totalprice")).as(s"spend_$y"))
    spend(1995).join(spend(1996),
        col("cust_1995") === col("cust_1996"), "full_outer")
      .select(
        when(col("cust_1995").isNotNull && col("cust_1996").isNotNull, "both")
          .when(col("cust_1995").isNotNull, "only_1995")
          .otherwise("only_1996").as("presence"),
        coalesce(col("spend_1995"), lit(0.0)).as("s95"),
        coalesce(col("spend_1996"), lit(0.0)).as("s96"))
      .groupBy(col("presence"))
      .agg(count(lit(1)).as("n_customers"),
           round(sum(col("s95")), 2).as("spend_1995"),
           round(sum(col("s96")), 2).as("spend_1996"))
  }

  /** Range join: equi-key + interval predicate — each lineitem matched to
    * its order only if shipped within 60 days of the order date. The
    * equi-key (l_orderkey = o_orderkey) makes this a plain shuffled hash
    * join with the range as a cheap post-join filter — the at-scale shape
    * for "event within window of parent" joins. A pure interval join with
    * NO equi key degrades to a nested-loop; always surface an equi
    * component (key, or a coarse time-bucket) so Catalyst hash-partitions. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("o_orderpriority").as("priority"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("lag_days"))
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n_in_window"),
           round(avg(col("lag_days")), 4).as("avg_lag_days"),
           max(col("lag_days")).as("max_lag_days"))
  }

  /** Explicit GROUPING SETS — the general form rollup/cube specialize:
    * (lang, source) detail, per-lang subtotal, grand total, tagged by
    * grouping_id so consumers can tell a NULL group key from a subtotal
    * row. Spark expands grouping sets map-side then partially aggregates —
    * the exchange carries one partial row per (group, set), not per input
    * row. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "documents").createOrReplaceTempView("gs_documents")
    spark.sql(
      """SELECT lang, source, count(*) AS n,
        |  round(avg(n_chars), 4) AS avg_chars,
        |  grouping_id(lang, source) AS gid
        |FROM gs_documents
        |GROUP BY GROUPING SETS ((lang, source), (lang), ())""".stripMargin)
  }

  /** List aggregation with deterministic order: the distinct segments per
    * nation as a sorted comma-joined string — collect_set is unordered and
    * engine-specific, so the portable spelling is sort + join (DuckDB:
    * string_agg DISTINCT ... ORDER BY). Set sizes are dim-bounded, so the
    * grouped state stays small at any fact scale. */
  def collectAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .groupBy(col("c_nationkey").as("nation_id"))
      .agg(array_join(sort_array(collect_set(col("c_mktsegment"))), ",")
             .as("segments"),
           countDistinct(col("c_mktsegment")).as("n_segments"))

  /** Exact multi-expression distinct counts. */
  def countDistinctAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
           countDistinct(col("o_orderstatus")).as("n_status"),
           countDistinct(concat_ws("|", col("o_orderstatus"),
             col("o_orderpriority"))).as("n_combo"))

  /** Bucketed interval-index lookup — a PURE interval join (no natural
    * equi key: classify each order's price into irregular bands), made
    * hash-joinable by interval bucketing: each band explodes into the
    * fixed-width buckets it overlaps, each probe row computes its single
    * bucket, and the join runs as a bucket EQUI-join with the exact
    * interval check as a post-join verify. The discipline that keeps
    * IP-geo/price-band/time-slab lookups off BroadcastNestedLoopJoin at
    * scale (`PlanSpec` pins no-NL) — q68's advice ("always surface an
    * equi component") applied when no key exists naturally. Bands are
    * quadratic-width (genuinely irregular, so no single stride could
    * serve as the band id directly). */
  def intervalIndex(spark: SparkSession, dir: String): DataFrame = {
    val step = 6000L
    val bands = spark.range(10).select(col("id").as("band"),
        (col("id") * col("id") * step).as("lo"),
        ((col("id") + 1) * (col("id") + 1) * step).as("hi"))
      .withColumn("bucket",
        explode(sequence(expr(s"lo div $step"),
          expr(s"(hi - 1) div $step"))))
    val probes = t(spark, dir, "orders")
      .select(col("o_totalprice"),
        expr(s"CAST(floor(o_totalprice / $step.0) AS BIGINT)").as("bucket"))
    probes.join(broadcast(bands), Seq("bucket"))
      .filter(col("o_totalprice") >= col("lo") &&
        col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"))
  }

  /** Blocked fuzzy join (record linkage): candidate pairs come from a
    * BLOCKING-KEY equi-join (the last name token), then an exact
    * edit-distance verify keeps pairs with levenshtein ≤ 3. The classic
    * dedup/linkage shape at scale: never all-pairs — candidates are
    * C(block size, 2) per block, shuffled on the block key like any
    * equi-join; the expensive distance runs on candidates only. Names are
    * de-duplicated first (the value domain, typically ≪ row count). */
  def fuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val names = t(spark, dir, "part").select(col("p_name")).distinct()
      .withColumn("block_key", element_at(split(col("p_name"), " "), -1))
    val a = names.select(col("p_name").as("name_a"), col("block_key"))
    val b = names.select(col("p_name").as("name_b"), col("block_key"))
    a.join(b, Seq("block_key"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")))
      .filter(col("lev") <= 3)
      .select(col("block_key"), col("name_a"), col("name_b"), col("lev"))
  }

  /** Correlated EXISTS / NOT EXISTS, written as SQL subqueries (the form
    * analysts actually write) and DECORRELATED by Catalyst into the
    * semi/anti hash joins q17/q18 build explicitly — customers with at
    * least one urgent order and no completed order above 9000. The value
    * of declaring this through the optimizer rather than hand-building
    * the joins: at 100 TB the same query text survives statistics
    * changes (broadcast vs shuffle side-picking is AQE's call), and a
    * correlated subquery that DIDN'T decorrelate would be a per-row
    * nested loop — `PlanSpec` pins that both subqueries plan as hash
    * joins, no nested loop. */
  def existsJoin(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("ex_customer")
    t(spark, dir, "orders").createOrReplaceTempView("ex_orders")
    spark.sql(
      """SELECT c_custkey AS cust_id, c_name AS name
        |FROM ex_customer c
        |WHERE EXISTS (
        |    SELECT 1 FROM ex_orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (
        |    SELECT 1 FROM ex_orders o2
        |    WHERE o2.o_custkey = c.c_custkey
        |      AND o2.o_orderstatus = 'F'
        |      AND o2.o_totalprice > 9000)""".stripMargin)
  }

  /** Point-in-time (temporal / AS-OF dimension) join — each fact row is
    * matched to the dimension VERSION valid at its own timestamp: the
    * warehouse time-travel join every SCD2 history (q86) exists to
    * serve. Facts are line items at their ship date; the dimension is
    * the customer's order-priority version history (consecutive runs
    * collapsed, as in q86).
    *
    * The scalable formulation is the asof-union trick (q63's recipe,
    * lifted cross-table): version-start rows and fact rows are tagged
    * into ONE per-customer ordered stream (dims sort before facts at an
    * equal second; among same-second dims the later version sorts last)
    * and `last(dim_priority, ignoreNulls)` carries the valid version
    * onto every fact — one hash exchange on cust + one per-partition
    * sort, never a range join, never per-fact probing. The oracle is
    * the declarative interval formulation (LEFT join on `vsec <= fsec`,
    * arg_max over the version key) — the gate proves the two agree.
    * Facts that predate every version (the feed ships some items before
    * their order date) keep a NULL valid version — the honest AS-OF
    * miss, not a dropped row. Rolled up by valid priority; `n_switched`
    * counts facts whose valid version differs from their own order's
    * priority (the rows a naive fact⋈dim-current join would get
    * wrong). */
  def temporalJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val versions = t(spark, dir, "orders")
      .withColumn("prev_p", lag(col("o_orderpriority"), 1).over(wOrd))
      .filter(col("prev_p").isNull ||
        col("prev_p") =!= col("o_orderpriority"))
      .withColumn("version", row_number().over(wOrd).cast("long"))
      .select(col("o_custkey").as("cust"),
        col("o_orderdate").cast("timestamp_ltz").cast("long").as("sec"),
        col("o_orderpriority").as("dim_priority"), col("version"))
    val facts = t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"),
        col("l_shipdate").cast("timestamp_ltz").cast("long").as("sec"),
        col("l_orderkey").as("okey"), col("l_linenumber").as("lineno"),
        col("o_orderpriority").as("own_priority"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
          .as("cents"))
    val tagged = versions
      .select(col("cust"), col("sec"), lit(1).as("is_dim"),
        col("version").as("ord"), col("dim_priority"),
        lit(null).cast("string").as("own_priority"),
        lit(null).cast("long").as("cents"))
      .unionByName(facts
        .select(col("cust"), col("sec"), lit(0).as("is_dim"),
          (col("okey") * 100 + col("lineno")).as("ord"),
          lit(null).cast("string").as("dim_priority"),
          col("own_priority"), col("cents")))
    val wPit = Window.partitionBy(col("cust"))
      .orderBy(col("sec").asc, col("is_dim").desc, col("ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("valid_priority",
        last(col("dim_priority"), ignoreNulls = true).over(wPit))
      .filter(col("is_dim") === 0)
      .groupBy(col("valid_priority"))
      .agg(count(lit(1)).as("n_lines"),
        count(when(col("valid_priority") =!= col("own_priority"), 1))
          .as("n_switched"),
        sum(col("cents")).as("cents"))
  }

  /** Typed COGROUP reconciliation — the `KeyValueGroupedDataset.cogroup`
    * surface: both relations hash to the key once and each key's two
    * iterators stream through ARBITRARY Scala logic — the typed escape
    * hatch for per-key algorithms that outgrow SQL (sequence alignment,
    * custom matching). Here the per-key logic is an invoice audit (does
    * the order's stored total equal the recomputed line-item sum at the
    * TPC-H formula, within per-line rounding slack; orphans on either
    * side classified), chosen precisely BECAUSE it is also
    * SQL-expressible — the DuckDB oracle proves the typed path computes
    * exactly what the relational one would, so reaching for cogroup
    * never silently changes semantics. Money stays exact: per-line
    * cents from one fixed-order double product + floor, summed as
    * longs. Scale: one co-partitioned shuffle on the key; per-key state
    * is the iterators, never a collected corpus. */
  def cogroupReconcile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .as[(Long, Double, String)]
    val lines = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"))
      .as[(Long, Double, Double, Double)]
    orders.groupByKey(_._1).cogroup(lines.groupByKey(_._1)) {
      (_, os, ls) =>
        val osSeq = os.toSeq
        var n = 0L
        var cents = 0L
        ls.foreach { l =>
          n += 1
          cents += math.floor(
            l._2 * (1 - l._3) * (1 + l._4) * 100 + 0.5).toLong
        }
        if (osSeq.isEmpty)
          Iterator.single(("orphan_lines", "none", n, cents))
        else {
          val o = osSeq.head
          val oc = math.floor(o._2 * 100 + 0.5).toLong
          val delta = cents - oc
          val status =
            if (n == 0) "no_lines"
            else if (math.abs(delta) <= n) "matched"
            else "drifted"
          Iterator.single((status, o._3, n, delta))
        }
    }.toDF("status", "priority", "n_lines", "delta_cents")
      .groupBy(col("status"), col("priority"))
      .agg(count(lit(1)).as("n_orders"), sum(col("n_lines")).as("n_lines"),
        sum(col("delta_cents")).as("delta_cents"))
  }

  /** Join-preserving PSEUDONYMIZATION — the privacy primitive q117's
    * redaction can't give: both sides' identifiers are replaced
    * SCAN-LOCAL by a deterministic salted digest (md5 here, standing in
    * for keyed HMAC — same plumbing, swap the kernel in deployment),
    * and the join runs ON TOKENS, so raw identifiers never leave their
    * scans, never co-locate, never ride a shuffle — the minimization
    * property a data-clean-room or GDPR-pipelined join is built on.
    * Determinism keeps equality (and therefore join semantics and
    * distinct-user counts) intact; the distinct-token count rides along
    * as the in-result injectivity evidence. The oracle tokenizes with
    * the same portable digest, so the gate pins cross-engine token
    * identity, not just the rollup. Spec-pinned invariant: the
    * tokenized join equals the raw join row-for-row. */
  def tokenizedJoin(spark: SparkSession, dir: String): DataFrame = {
    def tok(c: org.apache.spark.sql.Column) =
      md5(concat(lit("tok:"), c.cast("string")))
    val ev = t(spark, dir, "events")
      .select(tok(col("user_id")).as("token"), col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val dim = t(spark, dir, "customer")
      .select(tok(col("c_custkey")).as("token"),
        col("c_mktsegment").as("segment"))
    ev.join(dim, Seq("token"))
      .groupBy(col("segment"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
        countDistinct(col("token")).as("n_users"))
  }

  /** INTERVAL-OVERLAP join — the two-sided completion of the interval
    * family (q68 probes points into ranges, q137 indexes ranges for
    * point lookups; THIS joins two interval sets on overlap): user
    * sessions (q30 gap rule) against a daily promotion window
    * (12:00–14:00 UTC), reporting per day how many sessions touched the
    * window and the total overlap seconds — the campaign-exposure
    * measurement shape.
    *
    * Scale recipe: candidates come from an EQUI-join on the day bucket
    * (each session explodes to the days it spans — bounded by session
    * length; `sequence` of day indices, pure integer arithmetic), and
    * the exact half-open overlap `greatest(0, least(e+1, pe) −
    * greatest(s, ps))` verifies on candidates only — the bucketed
    * interval-join discipline (never a full interval cross product, the
    * q34/q137 candidate-then-verify shape applied to time). */
  def intervalOverlapJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(spark, dir, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
    val wU = Window.partitionBy(col("user_id")).orderBy(col("sec").asc)
    val wCum = wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = ev
      .withColumn("prev", lag(col("sec"), 1).over(wU))
      .withColumn("ns", when(col("prev").isNull ||
        col("sec") - col("prev") > 1800, 1).otherwise(0))
      .withColumn("sid", sum(col("ns")).over(wCum))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("sec")).as("s"), max(col("sec")).as("e"))
    val promos = ev.select((col("sec") / 86400).cast("long").as("day"))
      .distinct()
      .select(col("day"), (col("day") * 86400 + 12 * 3600).as("ps"),
        (col("day") * 86400 + 14 * 3600).as("pe"))
    sess
      .withColumn("day", explode(sequence(
        (col("s") / 86400).cast("long"), (col("e") / 86400).cast("long"))))
      .join(promos, Seq("day"))
      .withColumn("ov", greatest(lit(0L),
        least(col("e") + 1, col("pe")) - greatest(col("s"), col("ps"))))
      .filter(col("ov") > 0)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("ov")).as("overlap_secs"))
  }

  /** NOT IN vs NOT EXISTS under NULLs — the three-valued-logic trap
    * every blocklist filter eventually hits: `k NOT IN (S)` is UNKNOWN
    * (row dropped) when k is NULL, and returns ZERO rows for everyone
    * the moment S contains a single NULL, while `NOT EXISTS` treats the
    * same NULLs as simple non-matches and keeps the rows. One pass
    * emits all four counts (NOT IN, NOT EXISTS, null probes, NOT IN
    * against a NULL-polluted list) plus the conservation identity
    * n_not_exists − n_not_in = n_null_probe. Spark plans the
    * single-column NOT IN as its null-aware anti join (the NAAJ
    * machinery built exactly because a plain left-anti rewrite would
    * KEEP null probes); the DuckDB oracle is the same standard SQL, so
    * the gate pins both engines to the same three-valued semantics.
    * Scale: each branch is one anti/semi join against a broadcast-sized
    * blocklist; the null-polluted branch short-circuits to empty. */
  def notInSemantics(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("nis_orders")
    t(spark, dir, "customer").createOrReplaceTempView("nis_customer")
    spark.sql(
      """WITH probe AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_custkey % 7 = 0 THEN NULL
        |         ELSE o_custkey END AS k
        |  FROM nis_orders),
        |bl AS (
        |  SELECT c_custkey AS bk FROM nis_customer WHERE c_acctbal < 0)
        |SELECT
        |  (SELECT count(*) FROM probe
        |     WHERE k NOT IN (SELECT bk FROM bl)) AS n_not_in,
        |  (SELECT count(*) FROM probe p
        |     WHERE NOT EXISTS (SELECT 1 FROM bl WHERE bk = p.k))
        |    AS n_not_exists,
        |  (SELECT count(*) FROM probe WHERE k IS NULL) AS n_null_probe,
        |  (SELECT count(*) FROM probe WHERE k NOT IN
        |     (SELECT bk FROM bl UNION ALL SELECT CAST(NULL AS BIGINT)))
        |    AS n_not_in_nullset""".stripMargin)
  }

  /** Spatial radius join — the geo family's core operator: for every
    * supplier, the customers within 10 km, joined WITHOUT a cross
    * product by the standard grid-cell recipe: suppliers explode over
    * their 3×3 cell neighborhood, candidates come from an EQUI-join on
    * the cell key, and the exact predicate runs on candidates only —
    * geohash bucketing in its minimal exact form, the same
    * candidate/verify discipline as the interval and similarity joins.
    * Coordinates are deterministic synthetic micro-degrees in a 1°×1°
    * city box (the feed carries no geo columns; the staged-fixture
    * discipline of the multimodal/manifest queries — the OPERATOR is
    * the artifact). Distance is the planar approximation with a fixed
    * latitude correction (·cos 40.5° as the exact rational 7604/10000)
    * applied PER POINT (slon = lon·7604 DIV 10000), kept in PURE
    * INTEGER µ°-equivalents: no transcendental in any predicate, so a
    * boundary point cannot flip between engines; all divided
    * quantities are non-negative, so trunc-vs-floor `div` semantics
    * cannot diverge either. Both grid axes live in METRIC units (lat,
    * scaled lon), so cell side = radius guarantees any within-radius
    * pair differs by ≤1 cell on each axis — the ±1 explode misses
    * nothing (a pair with d2 ≤ r² has |Δlat| ≤ r AND |Δslon| ≤ r).
    * The r10 advice found the earlier raw-longitude grid violated this
    * (raw Δlon can reach r/cos40.5° ≈ 1.3 cells → two cells apart);
    * the fix moves the grid onto the scaled axis AND the oracle to a
    * grid-free brute-force cross join, so the hash gate now proves
    * candidate completeness instead of replicating the grid. Output
    * one row per supplier (within-radius census + exact nearest),
    * absent matches as an explicit 0/NULL class. */
  def spatialJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextOps
    val cell = 89830L // ~10 km in latitude micro-degrees = cell side
    def coords(df: DataFrame, key: String, tagOut: String): DataFrame =
      df.select(col(key).as(tagOut),
        (lit(40000000L) + TextOps.portableHash(
          concat(lit("lat:"), col(key).cast("string"))) % 1000000L)
          .as(s"lat_$tagOut"),
        (lit(106000000L) + TextOps.portableHash(
          concat(lit("lon:"), col(key).cast("string"))) % 1000000L)
          .as(s"rawlon_$tagOut"))
        .withColumn(s"slon_$tagOut",
          expr(s"rawlon_$tagOut * 7604 DIV 10000"))
        .drop(s"rawlon_$tagOut")
    val su = coords(t(spark, dir, "supplier"), "s_suppkey", "sk")
      .withColumn("d", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("e", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("sk"), col("lat_sk"), col("slon_sk"),
        (expr("lat_sk DIV 89830") + col("d")).as("clat"),
        (expr("slon_sk DIV 89830") + col("e")).as("clon"))
    val cu = coords(t(spark, dir, "customer"), "c_custkey", "ck")
      .select(col("ck"), col("lat_ck"), col("slon_ck"),
        expr("lat_ck DIV 89830").as("clat"),
        expr("slon_ck DIV 89830").as("clon"))
    val cand = su.join(cu, Seq("clat", "clon"))
      .withColumn("d2",
        expr("""(lat_sk - lat_ck) * (lat_sk - lat_ck) +
          (slon_sk - slon_ck) * (slon_sk - slon_ck)"""))
      .filter(col("d2") <= lit(cell * cell))
    t(spark, dir, "supplier").select(col("s_suppkey").as("supp"))
      .join(cand.groupBy(col("sk"))
          .agg(count(lit(1)).as("n_within"),
            min(col("d2")).as("d2_min"),
            min_by(col("ck"), struct(col("d2"), col("ck")))
              .as("nearest_cust")),
        col("supp") === col("sk"), "left_outer")
      .select(col("supp"), coalesce(col("n_within"), lit(0L))
        .as("n_within"), col("d2_min"), col("nearest_cust"))
  }

  val catalog: Seq[Q] = Seq(
    // Oracle is deliberately GRID-FREE (brute-force cross join with the
    // exact predicate): the gate proves the Spark side's grid candidate
    // set is COMPLETE, not merely self-consistent (r10 advice).
    Q("q236_spatial_join", spatialJoin _,
      """WITH su AS (
        |  SELECT s_suppkey AS sk,
        |    40000000 + ('0x' || substr(md5('lat:' ||
        |      CAST(s_suppkey AS VARCHAR)), 1, 8))::BIGINT % 1000000
        |      AS lat_sk,
        |    (106000000 + ('0x' || substr(md5('lon:' ||
        |      CAST(s_suppkey AS VARCHAR)), 1, 8))::BIGINT % 1000000)
        |      * 7604 // 10000 AS slon_sk
        |  FROM supplier),
        |cu AS (
        |  SELECT c_custkey AS ck,
        |    40000000 + ('0x' || substr(md5('lat:' ||
        |      CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 1000000
        |      AS lat_ck,
        |    (106000000 + ('0x' || substr(md5('lon:' ||
        |      CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 1000000)
        |      * 7604 // 10000 AS slon_ck
        |  FROM customer),
        |cand AS (
        |  SELECT sk, ck,
        |    (lat_sk - lat_ck) * (lat_sk - lat_ck) +
        |    (slon_sk - slon_ck) * (slon_sk - slon_ck) AS d2
        |  FROM su, cu),
        |hit AS (
        |  SELECT sk, count(*) AS n_within,
        |    CAST(min(d2) AS BIGINT) AS d2_min,
        |    arg_min(ck, d2::HUGEINT * 18446744073709551616 + ck)
        |      AS nearest_cust
        |  FROM cand WHERE d2 <= CAST(89830 AS BIGINT) * 89830
        |  GROUP BY 1)
        |SELECT s.s_suppkey AS supp,
        |  coalesce(h.n_within, 0) AS n_within, h.d2_min, h.nearest_cust
        |FROM supplier s LEFT JOIN hit h ON s.s_suppkey = h.sk"""
        .stripMargin),
    Q("q231_not_in_semantics", notInSemantics _,
      """WITH probe AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_custkey % 7 = 0 THEN NULL
        |         ELSE o_custkey END AS k
        |  FROM orders),
        |bl AS (
        |  SELECT c_custkey AS bk FROM customer WHERE c_acctbal < 0)
        |SELECT
        |  (SELECT count(*) FROM probe
        |     WHERE k NOT IN (SELECT bk FROM bl)) AS n_not_in,
        |  (SELECT count(*) FROM probe p
        |     WHERE NOT EXISTS (SELECT 1 FROM bl WHERE bk = p.k))
        |    AS n_not_exists,
        |  (SELECT count(*) FROM probe WHERE k IS NULL) AS n_null_probe,
        |  (SELECT count(*) FROM probe WHERE k NOT IN
        |     (SELECT bk FROM bl UNION ALL SELECT CAST(NULL AS BIGINT)))
        |    AS n_not_in_nullset""".stripMargin),
    Q("q222_cogroup_reconcile", cogroupReconcile _,
      """WITH l AS (
        |  SELECT l_orderkey AS k, count(*) AS n,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
        |      * (1 + l_tax) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |o AS (
        |  SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS oc,
        |    o_orderpriority AS priority
        |  FROM orders),
        |j AS (
        |  SELECT COALESCE(o.priority, 'none') AS priority,
        |    COALESCE(l.n, 0) AS n,
        |    CASE WHEN o.k IS NULL THEN l.cents
        |      ELSE COALESCE(l.cents, 0) - o.oc END AS delta,
        |    CASE WHEN o.k IS NULL THEN 'orphan_lines'
        |      WHEN COALESCE(l.n, 0) = 0 THEN 'no_lines'
        |      WHEN abs(COALESCE(l.cents, 0) - o.oc) <= l.n
        |        THEN 'matched'
        |      ELSE 'drifted' END AS status
        |  FROM o FULL JOIN l ON o.k = l.k)
        |SELECT status, priority, count(*) AS n_orders,
        |  CAST(sum(n) AS BIGINT) AS n_lines,
        |  CAST(sum(delta) AS BIGINT) AS delta_cents
        |FROM j GROUP BY 1, 2""".stripMargin),
    Q("q218_tokenized_join", tokenizedJoin _,
      """WITH ev AS (
        |  SELECT md5('tok:' || CAST(user_id AS VARCHAR)) AS token,
        |    event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |dim AS (
        |  SELECT md5('tok:' || CAST(c_custkey AS VARCHAR)) AS token,
        |    c_mktsegment AS segment
        |  FROM customer)
        |SELECT segment, event_type, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  count(DISTINCT token) AS n_users
        |FROM ev JOIN dim USING (token)
        |GROUP BY 1, 2""".stripMargin),
    Q("q215_interval_overlap", intervalOverlapJoin _,
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events),
        |f AS (
        |  SELECT user_id, sec,
        |    CASE WHEN lag(sec) OVER w IS NULL
        |      OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)),
        |sx AS (
        |  SELECT user_id, sec,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY sec
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f),
        |sess AS (
        |  SELECT user_id, sid, min(sec) AS s, max(sec) AS e
        |  FROM sx GROUP BY 1, 2),
        |promos AS (
        |  SELECT day, day * 86400 + 12 * 3600 AS ps,
        |    day * 86400 + 14 * 3600 AS pe
        |  FROM (SELECT DISTINCT sec // 86400 AS day FROM e)),
        |cand AS (
        |  SELECT s.user_id, s.sid, s.s, s.e,
        |    unnest(range(s.s // 86400, s.e // 86400 + 1)) AS day
        |  FROM sess s),
        |ov AS (
        |  SELECT c.day, c.user_id, c.sid,
        |    greatest(0, least(c.e + 1, p.pe) - greatest(c.s, p.ps)) AS ov
        |  FROM cand c JOIN promos p ON c.day = p.day)
        |SELECT day, count(*) AS n_sessions,
        |  CAST(sum(ov) AS BIGINT) AS overlap_secs
        |FROM ov WHERE ov > 0 GROUP BY 1""".stripMargin),
    Q("q189_temporal_join", temporalJoin _,
      """WITH v0 AS (
        |  SELECT o_custkey AS cust, o_orderdate, o_orderkey,
        |    o_orderpriority,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev_p
        |  FROM orders),
        |versions AS (
        |  SELECT cust, CAST(epoch(o_orderdate) AS BIGINT) AS vsec,
        |    o_orderpriority AS dim_priority,
        |    row_number() OVER (PARTITION BY cust
        |      ORDER BY o_orderdate, o_orderkey) AS version
        |  FROM v0 WHERE prev_p IS NULL OR prev_p <> o_orderpriority),
        |facts AS (
        |  SELECT o_custkey AS cust,
        |    CAST(epoch(l_shipdate) AS BIGINT) AS fsec,
        |    l_orderkey, l_linenumber, o_orderpriority AS own_priority,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |pit AS (
        |  SELECT f.l_orderkey, f.l_linenumber, f.own_priority, f.cents,
        |    arg_max(v.dim_priority, v.vsec * 1000000 + v.version)
        |      AS valid_priority
        |  FROM facts f LEFT JOIN versions v
        |    ON f.cust = v.cust AND v.vsec <= f.fsec
        |  GROUP BY 1, 2, 3, 4)
        |SELECT valid_priority, count(*) AS n_lines,
        |  count(CASE WHEN valid_priority <> own_priority THEN 1 END)
        |    AS n_switched,
        |  CAST(sum(cents) AS BIGINT) AS cents
        |FROM pit GROUP BY 1""".stripMargin),
    Q("q156_exists_join", existsJoin _,
      """SELECT c_custkey AS cust_id, c_name AS name
        |FROM customer c
        |WHERE EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o2
        |    WHERE o2.o_custkey = c.c_custkey
        |      AND o2.o_orderstatus = 'F'
        |      AND o2.o_totalprice > 9000)""".stripMargin),
    Q("q143_shipping_priority", shippingPriority _,
      """SELECT o_orderkey AS order_id,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
        |    + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_lines
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < '1996-07-01'
        |  AND l_shipdate >= '1996-07-01'
        |GROUP BY 1, 2
        |ORDER BY revenue_cents DESC, order_id ASC LIMIT 10""".stripMargin),
    Q("q144_returned_items", returnedItems _,
      """SELECT c_custkey AS cust_id, c_mktsegment,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
        |    + 0.5) AS BIGINT)) AS BIGINT) AS lost_cents,
        |  count(*) AS n_returned
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate >= '1995-10-01' AND o_orderdate < '1996-01-01'
        |  AND l_returnflag = 'R'
        |GROUP BY 1, 2
        |ORDER BY lost_cents DESC, cust_id ASC LIMIT 20""".stripMargin),
    Q("q145_nullsafe_join", nullSafeJoin _,
      """WITH o AS (
        |  SELECT nullif(o_orderstatus, 'O') AS k, o_totalprice
        |  FROM orders),
        |a AS (SELECT k, count(*) AS n_a FROM o GROUP BY 1),
        |b AS (SELECT k AS kb,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS cents_b
        |  FROM o GROUP BY 1)
        |SELECT coalesce(a.k, '<null>') AS status, a.n_a, b.cents_b
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.kb""".stripMargin),
    Q("q139_setops_all", setOpsAll _,
      """WITH c95 AS (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'),
        |c96 AS (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'),
        |ia AS (SELECT count(*) AS n FROM
        |  (SELECT * FROM c95 INTERSECT ALL SELECT * FROM c96)),
        |ea AS (SELECT count(*) AS n FROM
        |  (SELECT * FROM c95 EXCEPT ALL SELECT * FROM c96))
        |SELECT 'intersect_all' AS op, n FROM ia
        |UNION ALL
        |SELECT 'except_all' AS op, n FROM ea""".stripMargin),
    Q("q137_interval_index", intervalIndex _,
      """WITH bands AS (
        |  SELECT i AS band, i * i * 6000 AS lo,
        |    (i + 1) * (i + 1) * 6000 AS hi
        |  FROM (SELECT unnest(range(10)) AS i))
        |SELECT b.band, count(*) AS n,
        |  round(min(o.o_totalprice), 2) AS min_price,
        |  round(max(o.o_totalprice), 2) AS max_price
        |FROM orders o JOIN bands b
        |  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        |GROUP BY 1""".stripMargin),
    Q("q114_fuzzy_join", fuzzyJoin _,
      """WITH n AS (SELECT DISTINCT p_name FROM part),
        |k AS (SELECT p_name, string_split(p_name, ' ')[-1] AS block_key
        |      FROM n)
        |SELECT a.block_key, a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev
        |FROM k a JOIN k b
        |  ON a.block_key = b.block_key AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin),
    Q("q16_outer_join", outerJoin _,
      """SELECT c_nationkey AS nation_id,
        |  count(DISTINCT c_custkey) AS n_customers,
        |  count(o_orderkey) AS n_orders,
        |  count(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END)
        |    AS n_no_order
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin),
    Q("q17_semi_join", semiJoin _,
      """SELECT c_mktsegment AS segment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
        |GROUP BY 1""".stripMargin),
    Q("q18_anti_join", antiJoin _,
      """SELECT c_nationkey AS nation_id, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1""".stripMargin),
    Q("q19_rollup", rollupAgg _,
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty,
        |  GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |HAVING count(*) > 0""".stripMargin),
      // HAVING n > 0 = "materialized groups only": Spark's
      // Expand+HashAggregate emits NO grand-total row over empty input
      // (vs the SQL-standard ()-set row of NULL/0 aggregates DuckDB
      // emits) — declared semantics follow Spark: an empty corpus
      // yields an empty census, which the HAVING mirrors exactly and
      // which is a no-op on any non-empty input (r16 sweep)
    Q("q20_cube", cubeAgg _,
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS spend,
        |  GROUPING(o_orderstatus, o_orderpriority) AS gid
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |HAVING count(*) > 0""".stripMargin),
      // same declared empty-corpus semantics as q19 (see note there)
    Q("q21_setops", setOps _,
      """SELECT 'intersect' AS op, count(*) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |UNION ALL
        |SELECT 'except' AS op, count(*) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)""".stripMargin),
    Q("q67_full_outer", fullOuterJoin _,
      """WITH s95 AS (
        |  SELECT o_custkey AS cust, sum(o_totalprice) AS spend
        |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
        |s96 AS (
        |  SELECT o_custkey AS cust, sum(o_totalprice) AS spend
        |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1)
        |SELECT CASE
        |    WHEN s95.cust IS NOT NULL AND s96.cust IS NOT NULL THEN 'both'
        |    WHEN s95.cust IS NOT NULL THEN 'only_1995'
        |    ELSE 'only_1996' END AS presence,
        |  count(*) AS n_customers,
        |  round(sum(coalesce(s95.spend, 0.0)), 2) AS spend_1995,
        |  round(sum(coalesce(s96.spend, 0.0)), 2) AS spend_1996
        |FROM s95 FULL OUTER JOIN s96 ON s95.cust = s96.cust
        |GROUP BY 1""".stripMargin),
    Q("q68_range_join", rangeJoin _,
      """SELECT o_orderpriority AS priority, count(*) AS n_in_window,
        |  round(avg(datediff('day', o_orderdate, l_shipdate)), 4)
        |    AS avg_lag_days,
        |  CAST(max(datediff('day', o_orderdate, l_shipdate)) AS INT)
        |    AS max_lag_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate < o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1""".stripMargin),
    Q("q69_grouping_sets", groupingSets _,
      """SELECT lang, source, count(*) AS n,
        |  round(avg(n_chars), 4) AS avg_chars,
        |  GROUPING(lang, source) AS gid
        |FROM documents
        |GROUP BY GROUPING SETS ((lang, source), (lang), ())
        |HAVING count(*) > 0""".stripMargin),
      // same declared empty-corpus semantics as q19 (see note there)
    Q("q84_collect_agg", collectAgg _,
      """SELECT c_nationkey AS nation_id,
        |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
        |    AS segments,
        |  count(DISTINCT c_mktsegment) AS n_segments
        |FROM customer GROUP BY 1""".stripMargin),
    Q("q28_having", havingFilter _,
      """SELECT l_partkey AS part_id, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY 1 HAVING count(*) >= 5""".stripMargin),
    Q("q29_count_distinct", countDistinctAgg _,
      """SELECT count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT o_orderstatus) AS n_status,
        |  count(DISTINCT o_orderstatus || '|' || o_orderpriority) AS n_combo
        |FROM orders""".stripMargin)
  )
}
