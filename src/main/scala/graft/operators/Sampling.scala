package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q
import graft.functions.TextOps
import graft.sources.Tables

/** Deterministic sampling and dataset-split operators for training-data
  * pipelines. At 100 TB a corpus is never sampled with `rand()` — runs must
  * be reproducible and splits must stay stable as documents are added or
  * re-processed, so every operator here keys on a content-derived hash
  * ([[TextOps.portableHash]]) instead of a random number generator:
  *
  *   - the same row always lands in the same sample/split (idempotent
  *     re-runs, no train/test leakage across pipeline versions);
  *   - the decision is a narrow per-row map (hash + compare) — no shuffle,
  *     no driver coordination, trivially parallel across 1000 executors;
  *   - the oracle can replicate it exactly (md5 is engine-portable).
  *
  * The reference has no sampling surface (its 104-row tables need none);
  * these are north-star extensions sized for the `documents` corpus.
  */
object Sampling {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Hash of the stable row key into [0, 100) — the sampling/split bucket.
    * Salting the key string ("smp:" prefix) decorrelates these buckets from
    * any other md5-derived partitioning in the pipeline. */
  private def pctBucket(key: Column): Column =
    TextOps.portableHash(concat(lit("smp:"), key.cast("string"))) % 100

  /** Deterministic ~10% Bernoulli sample of `documents` keyed on doc_id.
    * Equivalent to TABLESAMPLE but reproducible across runs and engines —
    * the filter is a scan-level predicate, so at scale this reads every
    * row once and forwards one in ten (no shuffle at all; the aggregation
    * below is just the checkable summary). */
  def hashSample(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(pctBucket(col("doc_id")) < 10)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
           round(avg(col("n_chars")), 4).as("avg_chars"),
           min(col("doc_id")).as("min_doc"),
           max(col("doc_id")).as("max_doc"))

  /** Deterministic 80/10/10 train/validation/test split. The split label is
    * a pure function of doc_id, so re-running the pipeline (or adding new
    * documents) never moves an existing document between splits — the
    * property that prevents train-on-test leakage across dataset versions. */
  def trainTestSplit(spark: SparkSession, dir: String): DataFrame = {
    val b = pctBucket(col("doc_id"))
    t(spark, dir, "documents")
      .withColumn("split",
        when(b < 80, "train").when(b < 90, "valid").otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           round(avg(col("n_chars")), 4).as("avg_chars"),
           round(sum(col("n_chars")) / 1000.0, 3).as("kchars"))
  }

  /** Stratified fixed-quota sample: exactly `perStratum` documents per
    * (lang, source) stratum, chosen by hash order with a unique tie-break —
    * deterministic, engine-portable, and balanced across strata regardless
    * of how skewed the corpus is.
    *
    * Scale: the window partitions by stratum, so the shuffle carries rows
    * grouped by (lang, source); with a bounded quota per stratum the
    * rank-filter is the standard per-group top-k that AQE handles even for
    * hot strata (and a `filter(bucket < p)` pre-pass can bound the sort
    * input when strata are huge). */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("h"), col("doc_id"))
    t(spark, dir, "documents")
      .withColumn("h", pctBucket(col("doc_id")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 25)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_picked"),
           round(avg(col("n_chars")), 4).as("avg_chars"))
  }

  /** Train→test contamination check: test-split documents whose normalized
    * content fingerprint also appears in the train split. Composes the
    * deterministic split with [[TextAnalysis]]-style fingerprinting; the
    * at-scale shape is a semi-style join on the fingerprint — the train
    * side reduces to DISTINCT fingerprints first, so the shuffle carries
    * one row per distinct train fingerprint, and no document text ever
    * moves. Run before training, not after the eval is compromised. */
  def crossSplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val fp = md5(regexp_replace(lower(col("text")), "\\s+", " "))
    val docs = t(spark, dir, "documents")
      .withColumn("split",
        when(pctBucket(col("doc_id")) < 80, "train")
          .when(pctBucket(col("doc_id")) < 90, "valid")
          .otherwise("test"))
      .withColumn("fp", fp)
    val trainFps = docs.filter(col("split") === "train")
      .select(col("fp")).distinct().withColumn("leaked", lit(1))
    docs.filter(col("split") === "test")
      .join(trainFps, Seq("fp"), "left_outer")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_test"),
           sum(coalesce(col("leaked"), lit(0))).as("n_leaked"))
  }

  /** Per-domain document cap — the domain-balancing pass (C4's and
    * RefinedWeb's per-host limits): keep at most `cap` documents per
    * source, chosen by deterministic hash rank, so no single domain
    * dominates the training mix however skewed the crawl is. Emits one
    * row per KEPT document (doc granularity — the strongest oracle) with
    * its rank and the source's pre-cap size.
    *
    * Scale shape: one shuffle keyed on source; per-key state is the
    * window's running counter only. A pathologically hot domain is the
    * classic skew case — at 100 TB the `rk <= cap` filter composes with a
    * hash-bucket pre-filter (keep only buckets that can rank under the
    * cap) to bound the sorted input, the same guard noted on
    * [[stratifiedSample]]. */
  def domainCap(spark: SparkSession, dir: String): DataFrame = {
    val cap = 10
    val w = Window.partitionBy(col("source"))
      .orderBy(col("hv").asc, col("doc_id").asc)
    t(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        TextOps.portableHash(
          concat(lit("cap:"), col("doc_id").cast("string"))).as("hv"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n_in_source",
        count(lit(1)).over(Window.partitionBy(col("source"))))
      .filter(col("rk") <= cap)
      .select(col("source"), col("doc_id"), col("rk"), col("n_in_source"))
  }

  private val bucketSql =
    "(('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"

  /** Training-data MIXING: per-source sampling rates (the Pile/Dolma-style
    * source-weighting step that rebalances a crawl before training).
    * Rates here derive deterministically from the source name (hash into
    * [25, 100)% — a stand-in for the curated weight table, which at scale
    * is a broadcast dim); membership is the same scan-local hash-bucket
    * decision as every sampler in this file, so re-runs and corpus growth
    * never flip a document's fate. Output: per-source kept/total/rate. */
  def dataMix(spark: SparkSession, dir: String): DataFrame = {
    val rate =
      TextOps.portableHash(concat(lit("mix:"), col("source"))) % 75 + 25
    val keep =
      TextOps.portableHash(
        concat(lit("mixdoc:"), col("doc_id").cast("string"))) % 100 < rate
    t(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(keep, 1).otherwise(0)).as("n_kept"),
        min(rate).as("rate_pct"))
  }

  /** Temperature-weighted mixing (α = 0.5): per-source sampling weights
    * ∝ n^α flatten the source distribution — the standard LLM-corpus
    * rebalancing (rare sources over-sampled relative to their share,
    * dominant sources down-sampled). Quota_s = min(n_s, ceil(T·w_s/Σw)),
    * then a DETERMINISTIC hash-ranked selection fills each quota — no
    * rand(), so re-runs and incremental corpus versions keep selections
    * stable (same discipline as [[hashSample]]).
    *
    * Cross-engine determinism notes: α is exactly 0.5 because `sqrt` is
    * correctly rounded IEEE (a general `pow(n, α)` is not portable);
    * weights are rounded to a 6-decimal DECIMAL before summing so Σw is
    * an EXACT order-independent sum (the q73 discipline).
    *
    * Scale shape: weights/quotas are one tiny aggregate (rows = #sources,
    * broadcast back); selection is a per-source window rank — per-key
    * state, no global sort. */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val quotas = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", round(sqrt(col("n_docs")), 6).cast("decimal(18,6)"))
      .crossJoin(broadcast(
        docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
          .select(round(sqrt(col("n")), 6).cast("decimal(18,6)").as("w1"))
          .agg(sum(col("w1")).as("w_total"))))
      .select(col("source"), col("n_docs"),
        least(col("n_docs"),
          ceil(lit(200.0) * col("w").cast("double") /
            col("w_total").cast("double")).cast("long")).as("quota"))
    val rk = Window.partitionBy(col("source")).orderBy(
      TextOps.portableHash(
        concat(lit("tmix:"), col("doc_id").cast("string"))).asc,
      col("doc_id").asc)
    docs.withColumn("rk", row_number().over(rk))
      .join(broadcast(quotas), Seq("source"))
      .filter(col("rk") <= col("quota"))
      .groupBy(col("source"))
      .agg(min(col("n_docs")).as("n_docs"), min(col("quota")).as("quota"),
        count(lit(1)).as("n_selected"),
        round(avg(col("n_chars")), 4).as("avg_chars_sel"))
  }

  /** WINDOW-FREE deterministic per-group sampling: k orders per priority
    * class, elected by content hash through the bounded-heap
    * [[graft.functions.TopKAgg]] — same reproducible-sampling semantics
    * as [[domainCap]] (q121), but where q121's window must SORT each
    * partition's full group to rank it, the heap aggregate keeps O(k)
    * state per group and combines map-side, so the shuffle carries at
    * most k (hash, id) pairs per group per mapper instead of every row.
    * At 100 TB with hot groups (a domain with 10⁹ docs), that is the
    * difference between a skew-prone sort and a flat mergeable agg.
    * Hash order is descending with id-asc ties — the exact order the
    * oracle's window replicates; determinism is inherited from the
    * md5-derived hash ([[TextOps.portableHash]]). */
  def groupSample(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderpriority").as("priority"),
        TextOps.portableHash(
          concat(lit("gs:"), col("o_orderkey").cast("string"))).as("h"),
        col("o_orderkey"))
      .groupBy(col("priority"))
      .agg(graft.functions.TopKAgg.topK(col("h"), col("o_orderkey"), 5)
        .as("top"))
      .select(col("priority"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("priority"), (col("pos") + 1).cast("int").as("rk"),
        col("s.id").as("order_id"), col("s.key").as("h"))

  /** Per-key rate limiting — the abuse/robot throttle an event-ingestion
    * pipeline applies before anything downstream: keep the FIRST 3 events
    * per (user, hour), count the rest as dropped. Window-free via the
    * bounded-heap [[graft.functions.TopKAgg]] (key = negated epoch second
    * → earliest-first; ties to the lowest event id): O(k) state per
    * user-hour through partial aggregation, immune to a hot key that
    * floods one hour with millions of events — exactly the key shape
    * rate limiting exists to absorb. A window row_number would SORT the
    * flood; the heap carries 3 rows of it. Oracle is the window form. */
  def rateLimit(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"),
        date_trunc("hour", col("ts")).cast("long").as("hr_start"),
        col("ts").cast("long").as("sec"), col("event_id"))
    ev.groupBy(col("user_id"), col("hr_start"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.TopKAgg.topK(-col("sec"), col("event_id"), 3)
          .as("top"))
      .select(col("user_id"), col("hr_start"), col("n_events"),
        posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("user_id"), col("hr_start"),
        (col("pos") + 1).cast("int").as("rk"),
        col("s.id").as("event_id"), col("n_events"))
  }

  /** Deterministic contrastive negative sampling — the pair-mining step
    * of embedding/reranker training (in-batch negatives leak structure;
    * corpus-wide uniform negatives need exactly this shape). For each
    * anchor document, k=4 negatives are drawn by hashing (anchor, slot)
    * onto the dense doc_id domain — no `rand()` (re-runs must rebuild
    * identical training pairs) and, critically at 100 TB, no global
    * row_number to index the corpus: the id domain IS the address space,
    * so sampling is a narrow per-row map and the only shuffle is the
    * equi-join that fetches each negative's metadata. A hash that lands
    * on the anchor itself steps forward one slot (mod n), so every
    * anchor gets exactly k true negatives. The corpus size is a
    * broadcast scalar. */
  def negativeSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val n = docs.agg(count(lit(1)).as("n"))
    val raw = docs.select(col("doc_id"), col("lang"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("lang"), col("n"),
        explode(sequence(lit(0), lit(3))).as("slot"))
      .withColumn("cand",
        TextOps.portableHash(concat(lit("neg:"), col("doc_id").cast("string"),
          lit("#"), col("slot").cast("string"))) % col("n"))
      .withColumn("neg_id",
        when(col("cand") === col("doc_id"),
          (col("cand") + 1) % col("n")).otherwise(col("cand")))
    raw.join(docs.select(col("doc_id").as("neg_id"),
        col("lang").as("neg_lang"), col("source").as("neg_source")),
        Seq("neg_id"))
      .select(col("doc_id"), col("slot"), col("lang"), col("neg_id"),
        col("neg_lang"), col("neg_source"),
        (col("lang") === col("neg_lang")).as("same_lang"))
  }

  /** Weighted systematic sampling — select ~16 documents per source with
    * inclusion probability proportional to size (n_chars), the classic
    * PPS design for building a size-faithful corpus subsample. No
    * rand() and no transcendental priority keys (`u^(1/w)` of A-Res is
    * not engine-portable): rows are laid on a deterministic hash order,
    * weights accumulate as an integer cumulative sum, and a row is
    * picked iff its weight interval spans a multiple of `step =
    * total/16` — pure integer arithmetic (`div`), bit-identical in any
    * engine, idempotent across runs.
    *
    * Scale: one hash exchange on source + per-partition sort (same shape
    * as q121's domain cap). Per-source running sums assume a source's
    * rows fit one partition's scan — at 100 TB sub-shard the running sum
    * (hash-bucket within source, sample per bucket, resample the union)
    * exactly as SCALE.md describes for q121. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("source"))
      .orderBy(col("hk").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
    t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars").as("weight"),
        TextOps.portableHash(
          concat(lit("wsmp:"), col("doc_id").cast("string"))).as("hk"))
      .withColumn("cum", sum(col("weight")).over(wOrd))
      .withColumn("total", sum(col("weight")).over(wAll))
      .withColumn("step", greatest(expr("total div 16"), lit(1L)))
      .filter(expr("cum div step > (cum - weight) div step"))
      .select(col("source"), col("doc_id"), col("weight"),
        expr("cum div step").as("tick"))
  }

  /** Priority sampling (Duffield–Lund–Thorup, JACM 2007): weighted
    * without-replacement top-k per stratum with the Horvitz–Thompson
    * threshold estimator. Each row gets priority w/u (u uniform from the
    * deterministic md5 hash); the k highest-priority rows are the
    * sample, and ŵ = max(w, τ) with τ = the (k+1)-th priority makes
    * subset-sum estimates unbiased — the published scheme q187's
    * systematic sampler deliberately avoided (its scaladoc: `u^(1/w)`
    * is transcendental, not engine-portable). The portability fix here
    * is a FIXED-POINT priority: p = w·2^42 div (h+1) is pure integer
    * arithmetic — bit-identical in any engine, and order-isomorphic to
    * w/u up to the 2^-42 quantization grid (ties broken by doc_id).
    * That integer key is exactly what [[graft.functions.TopKAgg]]
    * carries: the shuffle moves ≤6 pairs per stratum through partial
    * aggregation — no per-stratum sort, the scale-correct shape q149
    * established — and the sampled ids then fetch their rows back by a
    * broadcast join (rank-then-fetch, as q201's rerank). τ returns to
    * weight units through one correctly-rounded division, so the HT
    * weight is portable too. */
  def prioritySample(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val wSrc = Window.partitionBy(col("source"))
    val top = docs
      .select(col("doc_id"), col("source"), col("n_chars"),
        TextOps.portableHash(
          concat(lit("pri:"), col("doc_id").cast("string"))).as("hk"))
      .withColumn("p", expr("n_chars * 4398046511104 DIV (hk + 1)"))
      .groupBy(col("source"))
      .agg(graft.functions.TopKAgg.topK(col("p"), col("doc_id"), 6)
        .as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("source"), (col("pos") + 1).cast("int").as("rk"),
        col("s.id").as("doc_id"), col("s.key").as("p"))
      .withColumn("tau", max(when(col("rk") === 6, col("p"))).over(wSrc))
      .filter(col("rk") <= 5)
    docs.select(col("doc_id").as("d_id"), col("n_chars").as("weight"))
      .join(broadcast(top), col("doc_id") === col("d_id"))
      .select(col("source"), col("rk"), col("doc_id"), col("weight"),
        col("p"),
        (round(greatest(
          coalesce(col("tau").cast("double") / lit(4398046511104.0),
            lit(0.0)),
          col("weight").cast("double")), 9) + lit(0.0)).as("ht_weight"))
  }

  /** Variance-proportional stratified allocation — the survey-sampling
    * answer to "I can afford n=1000 rows, how do I split them across
    * strata?": Neyman allocation minimizes estimator variance with
    * n_h ∝ N_h·S_h; this deterministic variant allocates on the EXACT
    * integer variance mass v_h = N_h·ΣX²_h − (ΣX_h)² (= N_h²·Var_h —
    * no square root, so the allocation is pure integral arithmetic both
    * engines reproduce bit-for-bit, where stddev would put a float
    * boundary inside an integer output). Selection within each stratum
    * is the smallest-hash prefix (q64's deterministic coin), sized by
    * the allocation — a per-stratum row_number over the hash order.
    * Output per stratum: population, variance mass, allocation, what
    * was actually selected, and exact micro-cent means of sample vs
    * population — the over/under-sampling audit. One scan builds the
    * moments; the rank runs per stratum (|strata| partitions). At
    * 100 TB replace the within-stratum row_number with the q224
    * bounded-heap TopKAgg when allocations are small, and widen the
    * moment sums (n·Σx² crosses 2⁶³ past ~100× this SF) to decimal(38)
    * like the allocation multiply already is. */
  def stratAllocation(spark: SparkSession, dir: String): DataFrame = {
    val budget = 1000L
    val ev = t(spark, dir, "events")
      .select(col("event_type"), col("event_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"),
        TextOps.portableHash(
          concat(lit("na:"), col("event_id").cast("string"))).as("hk"))
    val moments = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pop"), sum(col("cents")).as("s1"),
        sum(col("cents") * col("cents")).as("s2"))
      .withColumn("v_mass", col("n_pop") * col("s2") - col("s1") * col("s1"))
    val totV = moments.agg(sum(col("v_mass")).as("tot_v"))
    // budget·v_mass overflows 2⁶³ already near this SF (v_mass ~ 10¹⁶)
    // — the multiply runs in decimal(38), the integral divide lands
    // back in long
    val alloc = moments.crossJoin(broadcast(totV))
      .withColumn("n_alloc",
        // nullif: single-row strata leave every v_mass (and so tot_v)
        // zero — allocation undefined, NULL in both engines (r16 sweep)
        expr(s"CAST(($budget * CAST(v_mass AS DECIMAL(38,0))) div " +
          "nullif(CAST(tot_v AS DECIMAL(38,0)), 0) AS BIGINT)"))
    val wRk = Window.partitionBy(col("event_type"))
      .orderBy(col("hk").asc, col("event_id").asc)
    val selected = ev.withColumn("rk", row_number().over(wRk).cast("long"))
      .join(broadcast(alloc.select(col("event_type"), col("n_alloc"))),
        Seq("event_type"))
      .filter(col("rk") <= col("n_alloc"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_sel"), sum(col("cents")).as("sel_s1"))
    alloc.join(selected, Seq("event_type"), "left_outer")
      .select(col("event_type"), col("n_pop"), col("v_mass"),
        col("n_alloc"),
        coalesce(col("n_sel"), lit(0L)).as("n_sel"),
        expr("s1 * 1000000 div n_pop").as("pop_mean_micro"),
        when(col("n_sel") > 0,
          expr("sel_s1 * 1000000 div n_sel")).as("sample_mean_micro"))
  }

  /** Poisson(1) inverse-CDF integer thresholds on a 32-bit hash:
    * floor(CDF(k)·2³²) for k = 0..7 (mass beyond 7 → weight 8,
    * ~1.0e-5). Integer comparison against a fixed constant — no float
    * boundary math, so both engines draw the identical weight. */
  private val poissonCdf32: Seq[Long] = Seq(1580030168L, 3160060337L,
    3950075421L, 4213413783L, 4279248373L, 4292415291L, 4294609777L,
    4294923276L)

  private def poissonWeight(u: Column): Column =
    poissonCdf32.zipWithIndex.foldRight(lit(8L): Column) {
      case ((c, k), rest) => when(u < c, lit(k.toLong)).otherwise(rest)
    }

  private def poissonWeightSql(u: String): String =
    "CASE " + poissonCdf32.zipWithIndex
      .map { case (c, k) => s"WHEN $u < $c THEN $k" }
      .mkString(" ") + " ELSE 8 END"

  /** Poisson-bootstrap confidence interval for the mean order total
    * (Hanley & MacGibbon 2006; Chamandy et al., Google 2012 — the
    * bootstrap that actually runs at corpus scale): classic resampling
    * draws B dependent multinomial replicates (impossible to
    * distribute), but for n large each row's replicate multiplicity is
    * ≈ independent Poisson(1) — so replicate b just weights every row
    * by w_b = F⁻¹(hash_b(key)), and ALL B replicates accumulate in ONE
    * partial-agg'd scan (2B+2 conditional sums, map-side combined; no
    * shuffle wider than one row). Weights are deterministic
    * [[poissonCdf32]] inverse-CDF draws on the portable hash — same
    * row, same replicate, same weight, in both engines. The replicate
    * means land in a 32-slot array; the percentile CI reads its order
    * statistics (2nd / 31st ≈ 5%/95%) after one 32-element sort. All
    * integer micro-units end-to-end (weighted sums < 2⁶³ to ~100×
    * this SF; switch s1/swx to decimal(38) beyond, the q261
    * precedent). */
  def poissonBootstrap(spark: SparkSession, dir: String): DataFrame = {
    val B = 32
    val base = t(spark, dir, "orders").select(col("o_orderkey").as("k"),
      expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    // one projection computes each replicate hash ONCE (the CASE chain
    // then reuses the materialized column — no md5 re-evaluation per
    // aggregate expression)
    val withW = (1 to B).foldLeft(base) { (df, b) =>
      df.withColumn(s"w_$b", poissonWeight(TextOps.portableHash(
        concat(lit(s"bs$b:"), col("k").cast("string")))))
    }
    val aggs = Seq(count(lit(1)).as("n"), sum(col("cents")).as("s1")) ++
      (1 to B).flatMap(b => Seq(
        sum(col(s"w_$b") * col("cents")).as(s"swx_$b"),
        sum(col(s"w_$b")).as(s"sw_$b")))
    val meanArr = array((1 to B).map(b =>
      // nullif: a Poisson replicate can draw total weight 0 on a
      // tiny slice — that replicate's mean is undefined/NULL (r16)
      expr(s"swx_$b * 1000000 div nullif(sw_$b, 0)")): _*)
    withW.agg(aggs.head, aggs.tail: _*)
      .select(col("n"), expr("s1 * 1000000 div n").as("point_mean_micro"),
        array_sort(meanArr).as("ms"))
      .select(col("n"), col("point_mean_micro"),
        element_at(col("ms"), 2).as("boot_lo_micro"),
        expr("(element_at(ms, 16) + element_at(ms, 17)) div 2")
          .as("boot_med_micro"),
        element_at(col("ms"), 31).as("boot_hi_micro"))
  }

  private def poissonBootstrapOracle: String = {
    val B = 32
    val us = (1 to B).map(b =>
      s"    ('0x' || substr(md5('bs$b:' || CAST(k AS VARCHAR)), 1, 8))" +
        s"::BIGINT AS u_$b").mkString(",\n")
    val ws = (1 to B).map(b =>
      s"    ${poissonWeightSql(s"u_$b")} AS w_$b").mkString(",\n")
    val sums = (1 to B).map(b =>
      s"    CAST(sum(w_$b * cents) AS BIGINT) AS swx_$b,\n" +
        s"    CAST(sum(w_$b) AS BIGINT) AS sw_$b").mkString(",\n")
    val means = (1 to B).map(b =>
      s"swx_$b * 1000000 // nullif(sw_$b, 0)")
      .mkString(", ")
    s"""WITH base AS (
       |  SELECT o_orderkey AS k,
       |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
       |  FROM orders),
       |h AS (
       |  SELECT cents,
       |$us
       |  FROM base),
       |w AS (
       |  SELECT cents,
       |$ws
       |  FROM h),
       |s AS (
       |  SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS s1,
       |$sums
       |  FROM w),
       |m AS (
       |  SELECT n, s1, list_sort([$means]) AS ms FROM s)
       |SELECT n, CAST(s1 * 1000000 // n AS BIGINT) AS point_mean_micro,
       |  CAST(ms[2] AS BIGINT) AS boot_lo_micro,
       |  CAST((ms[16] + ms[17]) // 2 AS BIGINT) AS boot_med_micro,
       |  CAST(ms[31] AS BIGINT) AS boot_hi_micro
       |FROM m""".stripMargin
  }

  val catalog: Seq[Q] = Seq(
    Q("q264_poisson_bootstrap", poissonBootstrap _, poissonBootstrapOracle),
    Q("q261_strat_allocation", stratAllocation _,
      """WITH ev AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |    ('0x' || substr(md5('na:' || CAST(event_id AS VARCHAR)),
        |      1, 8))::BIGINT AS hk
        |  FROM events),
        |m AS (
        |  SELECT event_type, count(*) AS n_pop,
        |    CAST(sum(cents) AS BIGINT) AS s1,
        |    CAST(sum(cents * cents) AS BIGINT) AS s2
        |  FROM ev GROUP BY 1),
        |mv AS (
        |  SELECT event_type, n_pop, s1, s2,
        |    n_pop * s2 - s1 * s1 AS v_mass
        |  FROM m),
        |tv AS (SELECT CAST(sum(v_mass) AS BIGINT) AS tot_v FROM mv),
        |al AS (
        |  SELECT event_type, n_pop, s1, v_mass,
        |    CAST(1000 * CAST(v_mass AS HUGEINT) // nullif(tot_v, 0)
        |      AS BIGINT)
        |      AS n_alloc
        |  FROM mv, tv),
        |rk AS (
        |  SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY hk ASC, event_id ASC) AS rk
        |  FROM ev),
        |sel AS (
        |  SELECT r.event_type, count(*) AS n_sel,
        |    CAST(sum(r.cents) AS BIGINT) AS sel_s1
        |  FROM rk r JOIN al ON al.event_type = r.event_type
        |  WHERE r.rk <= al.n_alloc GROUP BY 1)
        |SELECT al.event_type, al.n_pop,
        |  CAST(al.v_mass AS BIGINT) AS v_mass,
        |  CAST(al.n_alloc AS BIGINT) AS n_alloc,
        |  CAST(coalesce(sel.n_sel, 0) AS BIGINT) AS n_sel,
        |  CAST(al.s1 * 1000000 // al.n_pop AS BIGINT) AS pop_mean_micro,
        |  CASE WHEN sel.n_sel > 0 THEN
        |    CAST(sel.sel_s1 * 1000000 // sel.n_sel AS BIGINT)
        |    ELSE NULL END AS sample_mean_micro
        |FROM al LEFT JOIN sel ON sel.event_type = al.event_type"""
        .stripMargin),
    Q("q224_priority_sample", prioritySample _,
      """WITH d AS (
        |  SELECT doc_id, source, n_chars,
        |    ('0x' || substr(md5('pri:' || CAST(doc_id AS VARCHAR)),
        |      1, 8))::BIGINT AS hk
        |  FROM documents),
        |pr AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(n_chars * 4398046511104 // (hk + 1) AS BIGINT) AS p
        |  FROM d),
        |r AS (
        |  SELECT source, doc_id, n_chars, p,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY p DESC, doc_id ASC) AS rk
        |  FROM pr),
        |tt AS (
        |  SELECT source, doc_id, n_chars, p, rk,
        |    max(CASE WHEN rk = 6 THEN p END)
        |      OVER (PARTITION BY source) AS tau
        |  FROM r)
        |SELECT source, CAST(rk AS INT) AS rk, doc_id,
        |  n_chars AS weight, p,
        |  round(greatest(
        |    coalesce(CAST(tau AS DOUBLE) / 4398046511104.0, 0.0),
        |    CAST(n_chars AS DOUBLE)), 9) + 0.0 AS ht_weight
        |FROM tt WHERE rk <= 5""".stripMargin),
    Q("q187_weighted_sample", weightedSample _,
      """WITH d AS (
        |  SELECT doc_id, source, n_chars AS weight,
        |    ('0x' || substr(md5('wsmp:' || CAST(doc_id AS VARCHAR)),
        |      1, 8))::BIGINT AS hk
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, weight,
        |    sum(weight) OVER (PARTITION BY source ORDER BY hk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    greatest(sum(weight) OVER (PARTITION BY source) // 16, 1)
        |      AS step
        |  FROM d)
        |SELECT source, doc_id, weight, CAST(cum // step AS BIGINT) AS tick
        |FROM c
        |WHERE cum // step > (cum - weight) // step""".stripMargin),
    Q("q178_rate_limit", rateLimit _,
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hr_start,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
        |  FROM events),
        |r AS (
        |  SELECT user_id, hr_start, event_id,
        |    row_number() OVER (PARTITION BY user_id, hr_start
        |      ORDER BY sec ASC, event_id ASC) AS rk,
        |    count(*) OVER (PARTITION BY user_id, hr_start) AS n_events
        |  FROM e)
        |SELECT user_id, hr_start, CAST(rk AS INT) AS rk, event_id,
        |  n_events
        |FROM r WHERE rk <= 3""".stripMargin),
    Q("q167_negative_sampling", negativeSample _,
      """WITH n AS (SELECT count(*) AS n FROM documents),
        |raw AS (
        |  SELECT d.doc_id, d.lang, n.n, s.slot,
        |    ('0x' || substr(md5('neg:' || CAST(d.doc_id AS VARCHAR) || '#'
        |        || CAST(s.slot AS VARCHAR)), 1, 8))::BIGINT % n.n AS cand
        |  FROM documents d
        |  CROSS JOIN n
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS slot) s),
        |fix AS (
        |  SELECT doc_id, slot, lang,
        |    CASE WHEN cand = doc_id THEN (cand + 1) % n ELSE cand END
        |      AS neg_id
        |  FROM raw)
        |SELECT fix.doc_id, CAST(fix.slot AS INT) AS slot, fix.lang,
        |  fix.neg_id,
        |  d2.lang AS neg_lang, d2.source AS neg_source,
        |  fix.lang = d2.lang AS same_lang
        |FROM fix JOIN documents d2 ON d2.doc_id = fix.neg_id""".stripMargin),
    Q("q152_group_sample", groupSample _,
      """WITH h AS (
        |  SELECT o_orderpriority AS priority, o_orderkey,
        |    ('0x' || substr(md5('gs:' || CAST(o_orderkey AS VARCHAR)), 1, 8))
        |      ::BIGINT AS h
        |  FROM orders),
        |r AS (
        |  SELECT priority, o_orderkey, h,
        |    row_number() OVER (PARTITION BY priority
        |      ORDER BY h DESC, o_orderkey ASC) AS rk
        |  FROM h)
        |SELECT priority, CAST(rk AS INT) AS rk, o_orderkey AS order_id, h
        |FROM r WHERE rk <= 5""".stripMargin),
    Q("q121_domain_cap", domainCap _,
      """WITH h AS (
        |  SELECT source, doc_id,
        |    ('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT AS hv
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY hv ASC, doc_id ASC) AS INT) AS rk,
        |    count(*) OVER (PARTITION BY source) AS n_in_source
        |  FROM h)
        |SELECT source, doc_id, rk, n_in_source FROM r
        |WHERE rk <= 10""".stripMargin),
    Q("q107_temperature_mix", temperatureMix _,
      """WITH c AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(round(sqrt(count(*)), 6) AS DECIMAL(18,6)) AS w
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(w) AS w_total FROM c),
        |q AS (
        |  SELECT source, n_docs,
        |    least(n_docs, CAST(ceil(200.0 * CAST(w AS DOUBLE) /
        |      CAST(w_total AS DOUBLE)) AS BIGINT)) AS quota
        |  FROM c CROSS JOIN t),
        |r AS (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      ('0x' || substr(md5('tmix:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |        ::BIGINT ASC, doc_id ASC) AS rk
        |  FROM documents)
        |SELECT q.source AS source,
        |  CAST(q.n_docs AS BIGINT) AS n_docs,
        |  q.quota AS quota,
        |  count(*) AS n_selected,
        |  round(avg(r.n_chars), 4) AS avg_chars_sel
        |FROM r JOIN q ON r.source = q.source
        |WHERE r.rk <= q.quota
        |GROUP BY 1, 2, 3""".stripMargin),
    Q("q97_data_mix", dataMix _,
      """SELECT source, count(*) AS n_total,
        |  CAST(sum(CASE WHEN
        |    (('0x' || substr(md5('mixdoc:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT % 100) <
        |    ((('0x' || substr(md5('mix:' || source), 1, 8))
        |      ::BIGINT % 75) + 25)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  min((('0x' || substr(md5('mix:' || source), 1, 8))
        |    ::BIGINT % 75) + 25) AS rate_pct
        |FROM documents GROUP BY 1""".stripMargin),
    Q("q64_hash_sample", hashSample _,
      s"""SELECT lang, count(*) AS n_sampled,
         |  round(avg(n_chars), 4) AS avg_chars,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM documents
         |WHERE $bucketSql < 10
         |GROUP BY 1""".stripMargin),
    Q("q65_train_test_split", trainTestSplit _,
      s"""SELECT CASE WHEN $bucketSql < 80 THEN 'train'
         |            WHEN $bucketSql < 90 THEN 'valid'
         |            ELSE 'test' END AS split,
         |  lang, count(*) AS n_docs,
         |  round(avg(n_chars), 4) AS avg_chars,
         |  round(sum(n_chars) / 1000.0, 3) AS kchars
         |FROM documents
         |GROUP BY 1, 2""".stripMargin),
    Q("q75_cross_split_leakage", crossSplitLeakage _,
      s"""WITH d AS (
         |  SELECT lang,
         |    CASE WHEN $bucketSql < 80 THEN 'train'
         |         WHEN $bucketSql < 90 THEN 'valid'
         |         ELSE 'test' END AS split,
         |    md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
         |  FROM documents),
         |train_fps AS (
         |  SELECT DISTINCT fp FROM d WHERE split = 'train')
         |SELECT lang, count(*) AS n_test,
         |  CAST(sum(CASE WHEN t.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_leaked
         |FROM d LEFT JOIN train_fps t ON d.fp = t.fp
         |WHERE d.split = 'test'
         |GROUP BY 1""".stripMargin),
    Q("q66_stratified_sample", stratifiedSample _,
      s"""WITH ranked AS (
         |  SELECT lang, source, n_chars,
         |    row_number() OVER (PARTITION BY lang, source
         |                       ORDER BY $bucketSql, doc_id) AS rk
         |  FROM documents)
         |SELECT lang, source, count(*) AS n_picked,
         |  round(avg(n_chars), 4) AS avg_chars
         |FROM ranked WHERE rk <= 25
         |GROUP BY 1, 2""".stripMargin)
  )
}
