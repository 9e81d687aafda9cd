package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.etl.{Schemas, Transform}

/** Deterministic weather fixture shaped exactly like the reference's raw
  * API payload (FIXTURES.md §A1): one record per city, `daily` struct of
  * six parallel arrays, precipitation containing nulls, weather codes
  * covering every CASE band including the 80/81 dim-vs-CASE disagreement
  * (SURVEY.md §7 risk 4).
  *
  * The SAME in-memory rows render both the Spark input Dataset and the
  * DuckDB VALUES oracle (numbers serialized via shortest-round-trip
  * toString, parsed back to identical doubles by both engines), so the
  * flatten→enrich→aggregate chain is cross-checked end-to-end without any
  * weather parquet fixture.
  */
object WeatherFixture {

  final case class DailyArrays(
      time: Seq[String],
      temperature_2m_max: Seq[Double],
      temperature_2m_min: Seq[Double],
      precipitation_sum: Seq[Option[Double]],
      windspeed_10m_max: Seq[Double],
      weathercode: Seq[Double])

  final case class RawCity(
      city: String,
      latitude: Double,
      longitude: Double,
      timezone: String,
      extracted_at: String,
      daily: DailyArrays)

  private val codes = Seq(0.0, 2.0, 45.0, 61.0, 75.0, 82.0, 95.0, 3.0, 51.0, 80.0)
  private val start = java.time.LocalDate.of(2024, 2, 25)
  val nCities = 6
  val nDays = 10

  // Value formulas are chosen so every rounded aggregate sits ≥ 0.01 away
  // from a round-half boundary — float noise can never flip the oracle.
  val rows: Seq[RawCity] = (0 until nCities).map { c =>
    val days = 0 until nDays
    RawCity(
      city = s"City$c",
      latitude = 40.0 + c * 1.5,
      longitude = -74.0 - c * 2.25,
      timezone = "UTC",
      extracted_at = "2024-03-11T06:00:00",
      daily = DailyArrays(
        time = days.map(d => start.plusDays(d).toString),
        temperature_2m_max = days.map(d => 10.0 + c * 2 + d + (d % 3) * 0.3),
        temperature_2m_min = days.map(d => 10.0 + c * 2 + d + (d % 3) * 0.3 - (5.0 + (d % 4) * 0.7 + 0.13)),
        precipitation_sum = days.map(d => if ((c + d) % 5 == 0) None else Some(((c * d) % 7) * 0.2)),
        windspeed_10m_max = days.map(d => 8.0 + ((c * 3 + d) % 10) * 0.9),
        weathercode = days.map(d => codes((c + d) % 10))))
  }

  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }

  // string-literal cast → DuckDB strtod's the shortest-round-trip repr
  // directly to the identical double; a bare numeric literal would be
  // parsed as DECIMAL and double-rounded on the way to DOUBLE
  private def num(d: Double): String = s"CAST('${d.toString}' AS DOUBLE)"
  private def numOpt(d: Option[Double]): String =
    d.map(num).getOrElse("CAST(NULL AS DOUBLE)")
  private def strs(xs: Seq[String]): String = xs.map(s => s"'$s'").mkString("[", ", ", "]")
  private def nums(xs: Seq[Double]): String = xs.map(num).mkString("[", ", ", "]")

  /** The fixture as a DuckDB VALUES CTE named raw(city, latitude, …). */
  val valuesSql: String = rows.map { r =>
    s"('${r.city}', ${num(r.latitude)}, ${num(r.longitude)}, '${r.timezone}', '${r.extracted_at}', " +
      s"${strs(r.daily.time)}, ${nums(r.daily.temperature_2m_max)}, ${nums(r.daily.temperature_2m_min)}, " +
      s"${r.daily.precipitation_sum.map(numOpt).mkString("[", ", ", "]")}, " +
      s"${nums(r.daily.windspeed_10m_max)}, ${nums(r.daily.weathercode)})"
  }.mkString(
    "raw(city, latitude, longitude, timezone, extracted_at, times, tmax, tmin, precip, wind, code) AS (VALUES\n",
    ",\n", ")")

  /** DuckDB twin of Transform.flattenDaily + addDerivedMetrics: lockstep
    * co-unnest of the parallel arrays (≡ arrays_zip + explode) + derived
    * columns.
    */
  val enrichedSql: String =
    s"""WITH $valuesSql,
       |flat AS (
       |  SELECT city AS city_name, latitude, longitude, timezone,
       |         CAST(extracted_at AS TIMESTAMP) AS extracted_at,
       |         unnest(times) AS date, unnest(tmax) AS temp_max,
       |         unnest(tmin) AS temp_min, unnest(precip) AS precipitation,
       |         unnest(wind) AS wind_speed_max, unnest(code) AS weather_code
       |  FROM raw),
       |enriched AS (
       |  SELECT city_name, latitude, longitude, timezone, extracted_at, date,
       |         temp_max, temp_min,
       |         coalesce(precipitation, 0.0) AS precipitation,
       |         wind_speed_max, weather_code,
       |         round(temp_max - temp_min, 1) AS temp_range,
       |         CASE WHEN weather_code < 3 THEN 'Clear'
       |              WHEN weather_code < 50 THEN 'Cloudy'
       |              WHEN weather_code < 70 THEN 'Rain'
       |              WHEN weather_code < 80 THEN 'Snow'
       |              ELSE 'Severe' END AS weather_category
       |  FROM flat)""".stripMargin
}

/** Oracle-checked parity queries for the reference's signature transform
  * chain (C1–C3, P3–P6, A1, A6, W1) running on the embedded fixture — the
  * sfDir argument is unused by design.
  */
object WeatherOps {

  private def enriched(spark: SparkSession): DataFrame =
    Transform.addDerivedMetrics(
      Transform.flattenDaily(WeatherFixture.toDF(spark)), stamp = false)

  /** C1–C3 + P3–P6: the full flatten + enrich surface, row-per-(city,day). */
  def q26FlattenEnrich(spark: SparkSession, dir: String): DataFrame =
    enriched(spark).orderBy(col("city_name"), col("date"))

  val q26Sql: String =
    s"""${WeatherFixture.enrichedSql}
       |SELECT * FROM enriched ORDER BY city_name, date""".stripMargin

  /** A1: the reference's per-city summary with its exact rounding. */
  def q27CitySummary(spark: SparkSession, dir: String): DataFrame =
    Transform.computeAggregates(enriched(spark), stamp = false)
      .orderBy(col("city_name"))

  val q27Sql: String =
    s"""${WeatherFixture.enrichedSql}
       |SELECT city_name,
       |  round(avg(temp_max), 1) AS avg_temp_max,
       |  round(avg(temp_min), 1) AS avg_temp_min,
       |  round(avg(precipitation), 2) AS avg_precipitation,
       |  max(wind_speed_max) AS max_wind_speed,
       |  round(avg(temp_range), 1) AS avg_temp_range
       |FROM enriched GROUP BY city_name ORDER BY city_name""".stripMargin

  /** W1: v_latest_weather — DISTINCT ON (city) ORDER BY date DESC rewrite. */
  def q28LatestWeather(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("city_name")).orderBy(col("date").desc)
    enriched(spark)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("city_name", "date", "temp_max", "temp_min", "precipitation", "weather_category")
      .orderBy(col("city_name"))
  }

  val q28Sql: String =
    s"""${WeatherFixture.enrichedSql}
       |SELECT city_name, date, temp_max, temp_min, precipitation, weather_category
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY city_name ORDER BY date DESC) AS rn
       |      FROM enriched)
       |WHERE rn = 1 ORDER BY city_name""".stripMargin

  /** A6 + A2: the monthly rollup (fixture spans Feb/Mar on purpose). */
  def q29MonthlyRollup(spark: SparkSession, dir: String): DataFrame =
    Transform.monthlyRollup(enriched(spark))
      .orderBy(col("city_name"), col("year"), col("month"))

  val q29Sql: String =
    s"""${WeatherFixture.enrichedSql}
       |SELECT city_name,
       |  CAST(year(CAST(date AS DATE)) AS BIGINT) AS year,
       |  CAST(month(CAST(date AS DATE)) AS BIGINT) AS month,
       |  round(avg(temp_max), 1) AS avg_temp_max,
       |  round(avg(temp_min), 1) AS avg_temp_min,
       |  round(sum(precipitation), 2) AS total_precipitation,
       |  count(*) FILTER (WHERE weather_category = 'Rain') AS rainy_days,
       |  max(wind_speed_max) AS max_wind_speed
       |FROM enriched GROUP BY 1, 2, 3
       |ORDER BY city_name, year, month""".stripMargin

  /** J1/J2 + S6: the full weather star — fact ⋈ dim_city ⋈
    * dim_weather_code, both dims broadcast. dim_city is derived exactly
    * as Warehouse.seedCities assigns it (surrogate city_id = alphabetical
    * rank, reference sql/create_weather_tables.sql:40-48); the code dim
    * is the reference's 21-row WMO seed. Note the dim's category for
    * codes 80/81 deliberately disagrees with the enrich CASE chain
    * (SURVEY §7 risk 4) — this query reports the DIM's category, like
    * the reference's star joins.
    */
  def q43WeatherStar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = enriched(spark)
    // unpartitioned window is deliberate: input is the distinct city list
    // (single-digit rows, scale-invariant) and the surrogate key must be
    // globally dense — the WindowExec warning is expected, not a hazard
    val dimCity = e.select($"city_name", $"timezone").distinct()
      .withColumn("city_id", row_number().over(Window.orderBy($"city_name")).cast("long"))
    val dimCode = Schemas.weatherCodeSeed.toDF("weather_code", "description", "category")
    e.select($"city_name", $"weather_code".cast("int").as("wc"),
        $"temp_max", $"precipitation")
      .join(broadcast(dimCity), "city_name")
      .join(broadcast(dimCode), $"wc" === dimCode("weather_code"))
      .groupBy($"city_id", $"city_name", $"timezone", $"category")
      .agg(
        count(lit(1)).as("n_days"),
        round(avg($"temp_max"), 1).as("avg_high"),
        round(sum($"precipitation"), 2).as("total_precip"))
      .orderBy($"city_id", $"category")
  }

  val q43Sql: String = {
    val codeValues = Schemas.weatherCodeSeed
      .map { case (c, d, cat) => s"($c, '$d', '$cat')" }.mkString(",\n    ")
    s"""${WeatherFixture.enrichedSql},
       |dim_code(weather_code, description, category) AS (VALUES
       |    $codeValues),
       |dim_city AS (
       |  SELECT city_name, timezone,
       |         CAST(row_number() OVER (ORDER BY city_name) AS BIGINT) AS city_id
       |  FROM (SELECT DISTINCT city_name, timezone FROM enriched))
       |SELECT c.city_id, e.city_name, c.timezone, d.category,
       |  count(*) AS n_days,
       |  round(avg(e.temp_max), 1) AS avg_high,
       |  round(sum(e.precipitation), 2) AS total_precip
       |FROM enriched e
       |JOIN dim_city c ON e.city_name = c.city_name
       |JOIN dim_code d ON CAST(e.weather_code AS INTEGER) = d.weather_code
       |GROUP BY c.city_id, e.city_name, c.timezone, d.category
       |ORDER BY c.city_id, d.category""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q26_weather_flatten_enrich", q26FlattenEnrich, Some(q26Sql), Seq("C1", "C2", "C3", "P1", "P2", "P3", "P4", "P5", "S8"),
      "reference flatten+enrich chain on the embedded fixture"),
    Q("q43_weather_star", q43WeatherStar, Some(q43Sql), Seq("J1", "J2", "S6", "A1"),
      "weather star: fact joined to dim_city and dim_weather_code"),
    Q("q27_weather_city_summary", q27CitySummary, Some(q27Sql), Seq("A1", "A4", "F1"),
      "reference per-city summary aggregates"),
    Q("q28_weather_latest", q28LatestWeather, Some(q28Sql), Seq("W1", "O1"),
      "v_latest_weather DISTINCT ON rewrite"),
    Q("q29_weather_monthly", q29MonthlyRollup, Some(q29Sql), Seq("A6", "A2"),
      "agg_monthly_weather rollup across a month boundary"))
}
