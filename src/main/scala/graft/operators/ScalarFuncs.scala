package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Scalar-function suites: string, date/time, math, conditional, JSON,
  * array/higher-order — engine breadth (SURVEY.md §2.6: absent in the
  * reference, M2 roadmap). All are `org.apache.spark.sql.functions._`
  * built-ins → whole-stage-codegen'd, no UDFs in the hot path.
  */
object ScalarFuncs {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** String functions over part names: upper/length/replace/substr/
    * trim/lpad/concat + LIKE predicate. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_name").like("%e%"))
      .groupBy(upper(col("p_type")).as("type_u"))
      .agg(count(lit(1)).as("n"),
           sum(length(col("p_name"))).as("total_chars"),
           min(substring(replace(col("p_name"), lit(" "), lit("_")), 1, 6))
             .as("first6"),
           max(lpad(trim(col("p_name")), 20, ".")).as("padded"),
           min(concat(col("p_brand"), lit(":"), col("p_type"))).as("tagged"))

  /** Date/time functions over orders: year/month/quarter/dayofweek,
    * date_trunc, weekend classification. dayofweek is normalized to
    * 0=Sunday (DuckDB's convention; Spark's builtin is 1=Sunday). */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("dow", dayofweek(col("o_orderdate")) - 1)
      .groupBy(year(col("o_orderdate")).as("yr"),
               month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n"),
           min(quarter(col("o_orderdate"))).as("q"),
           min(date_format(date_trunc("month", col("o_orderdate")),
             "yyyy-MM-dd")).as("month_start"),
           sum(when(col("dow") === 0 || col("dow") === 6, 1).otherwise(0))
             .as("n_weekend"))

  /** Math functions: sqrt/ln/power/abs/floor/ceil aggregated per flag.
    * Transcendentals are summed then rounded to absorb last-ulp libm
    * differences across engines (SURVEY.md §7.4). */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag").as("flag"))
      .agg(count(lit(1)).as("n"),
           round(sum(sqrt(col("l_quantity"))), 4).as("sqrt_sum"),
           round(sum(log(col("l_extendedprice"))), 4).as("ln_sum"),
           round(sum(pow(col("l_discount"), 2)), 6).as("pow_sum"),
           round(avg(abs(col("l_quantity") - 25)), 4).as("abs_avg"),
           sum(floor(col("l_quantity"))).as("floor_sum"),
           sum(ceil(col("l_quantity"))).as("ceil_sum"))

  /** CASE WHEN bucketing. */
  def caseWhen(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("bucket",
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
           round(avg(col("o_totalprice")), 2).as("avg_price"))

  /** JSON extraction from events.props (`{"k": <int>}`) via from_json with
    * a declared schema — parsed once, codegen-friendly, no string re-scan
    * per field at scale. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("k", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("k")).as("k_sum"),
           min(col("k")).as("k_min"),
           max(col("k")).as("k_max"))

  /** Semi-structured JSON via the VARIANT type (Spark 4) — the
    * schema-FLEXIBLE complement to q26's declared-schema from_json:
    * `parse_json` shreds each props payload once into the binary
    * variant encoding, then typed paths extract with `variant_get`
    * (here through `try_variant_get`, which nulls rather than throws on
    * a type mismatch — the tolerant read a heterogeneous 100-TB logging
    * feed needs, where q26's fixed struct would silently null WHOLE
    * payloads that don't match). A synthetic malformed slice (every
    * 7th event's props corrupted) exercises the null path:
    * `try_parse_json` nulls those rows and the census counts them —
    * the malformed-share audit a real ingest reports. At scale the
    * shredding is one codegen'd pass; the variant column is columnar
    * binary, far cheaper to re-extract than re-parsing strings. */
  def variantJson(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("raw", when(col("event_id") % 7 === 0,
        concat(lit("not json:"), col("props"))).otherwise(col("props")))
      .withColumn("v", try_parse_json(col("raw")))
      .withColumn("k", expr("try_variant_get(v, '$.k', 'long')"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count(when(col("v").isNull, 1)).as("n_malformed"),
        sum(col("k")).as("k_sum"),
        count(when(col("k") % 2 === 0, 1)).as("n_even"))

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Array / higher-order functions over embeddings: size, element_at,
    * transform + aggregate (fold). Elements are cast float→double before
    * summing so both engines fold the identical double sequence. */
  def arrayOps(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .filter(col("vec_id") < 100)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first"),
        round(aggregate(asDouble(col("embedding")), lit(0.0), _ + _), 4)
          .as("el_sum"),
        round(sqrt(aggregate(transform(col("embedding"),
          x => x.cast("double") * x.cast("double")), lit(0.0), _ + _)), 4)
          .as("l2_norm"))

  /** NULL semantics: nullif-injected nulls through count/count(col)/
    * coalesce/null-safe equality — the rules the reference leaves implicit
    * (its inner joins silently drop unmatched rows; its golden data
    * carries a real NULL — see CensusParitySpec's Puerto Rico case). */
  def nullSemantics(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderpriority").as("priority"),
        expr("nullif(o_orderstatus, 'O')").as("st"))
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n_rows"),
           count(col("st")).as("n_nonnull"),
           sum(when(col("st").isNull, 1).otherwise(0)).as("n_null"),
           count(coalesce(col("st"), lit("none"))).as("n_coal"),
           sum(when(col("st") <=> "F", 1).otherwise(0)).as("n_f"))

  /** MapType surface: typed map construction + key lookup + cardinality. */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("m", map(lit("k"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k")))
      .groupBy(col("event_type"))
      .agg(sum(element_at(col("m"), "k")).as("k_sum"),
           max(size(col("m"))).as("max_card"),
           count(lit(1)).as("n"))

  val catalog: Seq[Q] = Seq(
    Q("q56_null_semantics", nullSemantics _,
      """SELECT o_orderpriority AS priority, count(*) AS n_rows,
        |  count(st) AS n_nonnull,
        |  CAST(sum(CASE WHEN st IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null,
        |  count(coalesce(st, 'none')) AS n_coal,
        |  CAST(sum(CASE WHEN st IS NOT DISTINCT FROM 'F' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_f
        |FROM (SELECT o_orderpriority,
        |        nullif(o_orderstatus, 'O') AS st FROM orders)
        |GROUP BY 1""".stripMargin),
    Q("q57_map_funcs", mapFuncs _,
      """SELECT event_type,
        |  CAST(sum(map(['k'],
        |    [CAST(json_extract_string(props, '$.k') AS INT)])['k'][1])
        |    AS BIGINT) AS k_sum,
        |  CAST(max(cardinality(map(['k'],
        |    [CAST(json_extract_string(props, '$.k') AS INT)]))) AS INT)
        |    AS max_card,
        |  count(*) AS n
        |FROM events GROUP BY 1""".stripMargin),
    Q("q22_string_funcs", stringFuncs _,
      """SELECT upper(p_type) AS type_u, count(*) AS n,
        |  CAST(sum(length(p_name)) AS BIGINT) AS total_chars,
        |  min(substr(replace(p_name, ' ', '_'), 1, 6)) AS first6,
        |  max(lpad(trim(p_name), 20, '.')) AS padded,
        |  min(p_brand || ':' || p_type) AS tagged
        |FROM part WHERE p_name LIKE '%e%'
        |GROUP BY 1""".stripMargin),
    Q("q23_date_funcs", dateFuncs _,
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  count(*) AS n,
        |  CAST(min(quarter(o_orderdate)) AS INT) AS q,
        |  min(strftime(date_trunc('month', o_orderdate), '%Y-%m-%d'))
        |    AS month_start,
        |  CAST(sum(CASE WHEN dayofweek(o_orderdate) IN (0, 6)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend
        |FROM orders GROUP BY 1, 2""".stripMargin),
    Q("q24_math_funcs", mathFuncs _,
      """SELECT l_returnflag AS flag, count(*) AS n,
        |  round(sum(sqrt(l_quantity)), 4) AS sqrt_sum,
        |  round(sum(ln(l_extendedprice)), 4) AS ln_sum,
        |  round(sum(power(l_discount, 2)), 6) AS pow_sum,
        |  round(avg(abs(l_quantity - 25)), 4) AS abs_avg,
        |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS floor_sum,
        |  CAST(sum(CAST(ceil(l_quantity) AS BIGINT)) AS BIGINT) AS ceil_sum
        |FROM lineitem GROUP BY 1""".stripMargin),
    Q("q25_case_when", caseWhen _,
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
        |  WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS bucket,
        |  count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
        |FROM orders GROUP BY 1""".stripMargin),
    Q("q212_variant_json", variantJson _,
      """WITH e AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE props END AS raw
        |  FROM events),
        |x AS (
        |  SELECT event_type, raw,
        |    CAST(json_extract_string(raw, '$.k') AS BIGINT) AS k
        |  FROM e)
        |SELECT event_type, count(*) AS n,
        |  count(CASE WHEN raw IS NULL THEN 1 END) AS n_malformed,
        |  CAST(sum(k) AS BIGINT) AS k_sum,
        |  count(CASE WHEN k % 2 = 0 THEN 1 END) AS n_even
        |FROM x GROUP BY 1""".stripMargin),
    Q("q26_json_extract", jsonExtract _,
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
        |    AS k_sum,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
        |    AS k_min,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
        |    AS k_max
        |FROM events GROUP BY 1""".stripMargin),
    Q("q27_array_ops", arrayOps _,
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS first,
        |  round(list_aggregate(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE)), 'sum'), 4) AS el_sum,
        |  round(sqrt(list_aggregate(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4)
        |    AS l2_norm
        |FROM embeddings WHERE vec_id < 100""".stripMargin)
  )
}
