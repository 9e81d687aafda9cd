package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.time.Duration

/** S1/S2 — the extraction stage
  * (/root/reference/dags/weather_etl_pipeline.py:60-92): per-city HTTP GET
  * against an Open-Meteo-style daily-forecast API, each payload tagged with
  * `city` and `extracted_at`, all records written as ONE pretty-printed
  * JSON array under `raw/weather/<ds>/weather_raw.json`.
  *
  * Driver-side by design: 5 requests don't warrant a DataSource V2. The
  * fetcher is pluggable so the pipeline runs offline (tests inject a
  * deterministic fake); `httpFetcher` is the production implementation.
  * The pretty-printed-array byte shape is load-bearing — it's what forces
  * the `multiLine=true` reader path (SURVEY.md §1.2 gotcha).
  */
object WeatherExtract {

  final case class City(name: String, lat: Double, lon: Double)

  /** The reference's configured cities
    * (/root/reference/dags/weather_etl_pipeline.py:24-30).
    */
  val defaultCities: Seq[City] = Seq(
    City("New York", 40.7128, -74.0060),
    City("Los Angeles", 34.0522, -118.2437),
    City("Chicago", 41.8781, -87.6298),
    City("Houston", 29.7604, -95.3698),
    City("Phoenix", 33.4484, -112.0740))

  /** Returns the raw API response body (a JSON object) for one city. */
  type Fetcher = City => String

  /** Production fetcher: the reference's exact query shape
    * (daily metrics list, timezone pin, past_days=7). Kept driver-side and
    * injectable; exercised against an in-process HTTP stub in
    * ExternalIoSpec (request shape, happy path, non-2xx propagation).
    */
  def httpFetcher(baseUrl: String = "https://api.open-meteo.com/v1/forecast",
      pastDays: Int = 7, timeoutSec: Long = 30): Fetcher = {
    val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(timeoutSec)).build()
    city => {
      val url = s"$baseUrl?latitude=${city.lat}&longitude=${city.lon}" +
        "&daily=temperature_2m_max,temperature_2m_min,precipitation_sum," +
        "windspeed_10m_max,weathercode" +
        "&timezone=America/New_York" +
        s"&past_days=$pastDays"
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(timeoutSec)).GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() / 100 == 2, s"HTTP ${resp.statusCode()} for ${city.name}")
      resp.body()
    }
  }

  /** Tag a raw payload object with city/extracted_at (the reference
    * mutates the parsed dict; we splice the fields into the JSON object
    * text — payload stays verbatim for replayability).
    */
  private[sources] def tag(payload: String, city: City, extractedAt: String): String = {
    val t = payload.trim
    require(t.startsWith("{") && t.endsWith("}"), "payload must be a JSON object")
    val body = t.substring(1, t.length - 1).trim
    val extra = s""""city": "${city.name}", "extracted_at": "$extractedAt""""
    if (body.isEmpty) s"{ $extra }" else s"{ $body, $extra }"
  }

  /** Extract all cities for one execution date → pretty-printed JSON array
    * at `<dataDir>/raw/weather/<ds>/weather_raw.json`; returns the path.
    */
  def extract(dataDir: String, ds: String, fetcher: Fetcher,
      cities: Seq[City] = defaultCities,
      extractedAt: String = java.time.LocalDateTime.now().toString): String = {
    val records = cities.map(c => tag(fetcher(c), c, extractedAt))
    val dir = Paths.get(s"$dataDir/raw/weather/$ds")
    Files.createDirectories(dir)
    val out = dir.resolve("weather_raw.json")
    // json.dump(..., indent=2)-shaped: a multi-line array
    Files.writeString(out, records.mkString("[\n", ",\n", "\n]"))
    out.toString
  }
}
