package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** The reference's end-to-end pipeline, faithfully re-expressed
  * (SURVEY.md §2.7 DAG; reference `extractCensusACS5.py` + `report.md`).
  *
  * EP1 extract: per-year API payload → decode → header-promote → literal
  * year column → union-all → rename (`extractCensusACS5.py:17-45,66-84`).
  * EP2 model: distinct dim/measure views over the typed tables
  * (`report.md:451-477`).
  * EP3 consume: 3-join fact view, year filter, group-by-average
  * (`report.md:489-494,509-515`).
  */
object CensusPipeline {

  /** EP1: payloads keyed by year → one renamed table.
    * pandas `concat` aligns on column names → `unionByName`. */
  def extract(spark: SparkSession,
              payloadsByYear: Seq[(Int, String)],
              renames: Map[String, String]): DataFrame = {
    val unioned = payloadsByYear.map { case (y, payload) =>
      Ingest.arrayOfArrays(spark, payload).withColumn("year", lit(y))
    }.reduce(_ unionByName _)
    renames.foldLeft(unioned) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to)
    }
  }

  /** EP2+EP3 on the three typed tables (states, incomes, rates — schemas
    * per `report.md:380-434`): returns the fact view
    * `income_vs_graduation_fact` (`report.md:489-494`). */
  def fact(states: DataFrame, incomes: DataFrame,
           rates: DataFrame): DataFrame = {
    val stateDim = states
      .select(col("state_id"), col("state").as("State")).distinct()
    val yearDim = states
      .select(col("year").as("Year")).distinct()
    val incomeMeasure = incomes
      .select(col("median_household_income").as("Median_Household_Income"),
              col("state_id"), col("year").as("year_id")).distinct()
    val gradMeasure = rates
      .select(col("graduation_rate").as("Graduation_Rate"),
              col("state_id"), col("year").as("year_id")).distinct()
    incomeMeasure.alias("i")
      .join(gradMeasure.alias("g"),
            col("i.state_id") === col("g.state_id") &&
              col("i.year_id") === col("g.year_id"))
      .join(stateDim, col("g.state_id") === stateDim("state_id"))
      .join(yearDim, col("g.year_id") === yearDim("Year"))
      .select(col("State"), col("Year"),
              col("Median_Household_Income"), col("Graduation_Rate"))
  }

  /** EP3 chart query: filter one year, average measures by state
    * (`report.md:509-515`). */
  def chart(fact: DataFrame, yr: Int): DataFrame =
    fact.filter(col("Year") === yr)
      .groupBy(col("State"))
      .agg(round(avg(col("Graduation_Rate")), 6).as("avg_graduation_rate"),
           round(avg(col("Median_Household_Income")), 6).as("avg_income"))
}
