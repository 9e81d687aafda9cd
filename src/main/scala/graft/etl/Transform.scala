package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's signature transform chain, Spark-Scala native:
  * flatten (C1–C3) → enrich (P3–P6) → aggregate (A1), semantics per
  * /root/reference/spark_jobs/transform_weather.py:64-163.
  *
  * All three stages are narrow until the final group-by: arrays_zip and
  * explode expand rows in place (Generate node, no shuffle), the derived
  * columns are codegen'd projections, and the city summary is the single
  * exchange of the whole pipeline (partial+final HashAggregate). At scale
  * the input arrives partitioned by ingest date, so even the aggregate
  * shuffles only a day's slice.
  */
object Transform {

  /** C1–C3: zip the six parallel daily arrays, explode to one row per
    * (city, day), extract struct fields to flat columns
    * (/root/reference/spark_jobs/transform_weather.py:64-113). `date`
    * stays a string here, exactly like the reference staging table;
    * Warehouse.load coerces it (F8). `extracted_at` becomes TIMESTAMP
    * right here (F9) — the reference staging DDL types it TIMESTAMP
    * (/root/reference/sql/create_weather_tables.sql:14).
    */
  def flattenDaily(df: DataFrame): DataFrame = {
    val zipped = df.withColumn(
      "daily_zipped",
      arrays_zip(
        col("daily.time"),
        col("daily.temperature_2m_max"),
        col("daily.temperature_2m_min"),
        col("daily.precipitation_sum"),
        col("daily.windspeed_10m_max"),
        col("daily.weathercode")))
    zipped
      .select(
        col("city").alias("city_name"),
        col("latitude"),
        col("longitude"),
        col("timezone"),
        to_timestamp(col("extracted_at")).alias("extracted_at"),
        explode(col("daily_zipped")).alias("daily_record"))
      .select(
        col("city_name"),
        col("latitude"),
        col("longitude"),
        col("timezone"),
        col("extracted_at"),
        col("daily_record.time").alias("date"),
        col("daily_record.temperature_2m_max").alias("temp_max"),
        col("daily_record.temperature_2m_min").alias("temp_min"),
        col("daily_record.precipitation_sum").alias("precipitation"),
        col("daily_record.windspeed_10m_max").alias("wind_speed_max"),
        col("daily_record.weathercode").alias("weather_code"))
  }

  /** P3–P6: temp_range, precipitation null→0.0, range-based CASE
    * categorization (thresholds 3/50/70/80 — intentionally NOT the
    * dim_weather_code mapping, see Schemas.weatherCodeSeed note), and the
    * processed_at stamp (/root/reference/spark_jobs/transform_weather.py:116-142).
    */
  def addDerivedMetrics(df: DataFrame, stamp: Boolean = true): DataFrame = {
    val enriched = df
      .withColumn("temp_range", round(col("temp_max") - col("temp_min"), 1))
      .withColumn("precipitation",
        when(col("precipitation").isNull, 0.0).otherwise(col("precipitation")))
      .withColumn("weather_category",
        when(col("weather_code") < 3, "Clear")
          .when(col("weather_code") < 50, "Cloudy")
          .when(col("weather_code") < 70, "Rain")
          .when(col("weather_code") < 80, "Snow")
          .otherwise("Severe"))
    if (stamp) enriched.withColumn("processed_at", current_timestamp()) else enriched
  }

  /** A1: per-city summary with the reference's exact rounding (1 decimal
    * on temps/range, 2 on precipitation)
    * (/root/reference/spark_jobs/transform_weather.py:145-163).
    */
  def computeAggregates(df: DataFrame, stamp: Boolean = true): DataFrame = {
    val agg = df.groupBy("city_name").agg(
      round(avg("temp_max"), 1).alias("avg_temp_max"),
      round(avg("temp_min"), 1).alias("avg_temp_min"),
      round(avg("precipitation"), 2).alias("avg_precipitation"),
      max("wind_speed_max").alias("max_wind_speed"),
      round(avg("temp_range"), 1).alias("avg_temp_range"))
    if (stamp) agg.withColumn("computed_at", current_timestamp()) else agg
  }

  /** A6: the monthly rollup the reference declares but never populates
    * (agg_monthly_weather, /root/reference/sql/create_weather_tables.sql:118-131)
    * — implemented to honor the schema: per (city, year, month) temps,
    * total precipitation, rainy_days (A2 conditional count), max wind.
    */
  def monthlyRollup(enriched: DataFrame): DataFrame = {
    val withDate = enriched.withColumn("d", to_date(col("date")))
    withDate.groupBy(
      col("city_name"),
      year(col("d")).cast("long").alias("year"),
      month(col("d")).cast("long").alias("month"))
      .agg(
        round(avg("temp_max"), 1).alias("avg_temp_max"),
        round(avg("temp_min"), 1).alias("avg_temp_min"),
        round(sum("precipitation"), 2).alias("total_precipitation"),
        count(when(col("weather_category") === "Rain", 1)).alias("rainy_days"),
        max("wind_speed_max").alias("max_wind_speed"))
  }
}
