package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Q1/Q2 — the validation gates the reference runs as Airflow tasks
  * (/root/reference/dags/weather_etl_pipeline.py:95-116, 194-215).
  */
object Checks {

  /** Pre-transform structural validation: expected record count, required
    * nested fields present, non-empty time series.
    */
  def validateRaw(df: DataFrame, expectedCities: Int): Unit = {
    val n = df.count()
    require(n == expectedCities, s"expected $expectedCities city records, got $n")
    val fields = df.schema.fieldNames.toSet
    require(fields.contains("daily"), "missing 'daily' struct")
    val dailyFields = df.schema("daily").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    require(dailyFields.contains("temperature_2m_max"), "missing daily.temperature_2m_max")
    val empty = df.filter(size(col("daily.time")) === 0).count()
    require(empty == 0, s"$empty city records have an empty time series")
  }

  /** Post-load quality gate: the ds slice must be non-empty. */
  def qualityCheck(fact: DataFrame, ds: String): Long = {
    val n = fact.filter(col("date") === to_date(lit(ds))).count()
    require(n > 0, s"no records loaded for date $ds")
    n
  }
}

/** Q3/Q4 — the orchestration collapsed Spark-natively: the reference's
  * seven Airflow tasks (extract → validate → transform → create_tables →
  * load → quality_check) become one sequential driver over SparkSession
  * (SURVEY.md §3), with the reference's retry envelope (3 tries, linear
  * backoff) around each stage. Idempotency comes from overwrite-by-ds
  * writes, so re-running any stage for the same ds converges.
  */
object Pipeline {

  def retry[T](tries: Int = 3, delayMs: Long = 0)(body: => T): T = {
    var last: Throwable = null
    var i = 0
    while (i < tries) {
      try return body
      catch { case t: Throwable => last = t; i += 1; if (delayMs > 0) Thread.sleep(delayMs) }
    }
    throw last
  }

  /** Full run for one execution date over already-extracted raw JSON.
    * Single lineage with one cache of the enriched frame before fan-out to
    * the two staging writes — deliberately NOT replicating the reference's
    * repeated count() recomputations (SURVEY.md §7 risk 6).
    */
  def run(spark: SparkSession, rawPath: String, warehouseRoot: String, ds: String,
      expectedCities: Int = 5): Map[String, Long] = {
    val wh = Warehouse(spark, warehouseRoot)
    val raw = retry() {
      spark.read.schema(Schemas.raw).option("multiLine", value = true).json(rawPath)
    }
    retry() { Checks.validateRaw(raw, expectedCities) }
    val enriched = retry() {
      Transform.addDerivedMetrics(Transform.flattenDaily(raw)).cache()
    }
    retry() { wh.overwrite("staging_weather", enriched) }
    retry() { wh.overwrite("staging_weather_summary", Transform.computeAggregates(enriched)) }
    retry() { wh.seedWeatherCodes() }
    retry() { wh.seedCities(enriched) }
    retry() { wh.upsertFacts(enriched, ds) }
    retry() { wh.overwrite("agg_monthly_weather", Transform.monthlyRollup(enriched)) }
    val loaded = retry() { Checks.qualityCheck(wh.read("fact_daily_weather"), ds) }
    retry() { wh.assertUniqueKeys() }
    // count() while still cached — counting after unpersist would re-run
    // the whole flatten+enrich lineage (SURVEY §7 risk 6)
    val staged = enriched.count()
    enriched.unpersist()
    Map("staged" -> staged, "loaded" -> loaded)
  }
}
