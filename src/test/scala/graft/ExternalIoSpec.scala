package graft

import java.net.InetSocketAddress
import java.util.Properties

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Warehouse
import graft.sources.WeatherExtract

/** The two external-I/O legs the offline oracle gate cannot reach:
  *
  *  - S5 relational flavor: `Warehouse.overwriteJdbc` against an embedded
  *    Derby database (the Derby driver ships with Spark for the Hive
  *    metastore, so this exercises the REAL `df.write.jdbc` path — dialect,
  *    DDL generation, batch insert — without network). Mirrors the
  *    reference's live-Postgres CI job
  *    (/root/reference/.github/workflows/ci.yml:105-134).
  *  - S5 PG-dialect contract (r15 verdict order 4): the reference
  *    warehouse is Postgres whose DDL declares `FLOAT` = float8
  *    (/root/reference/sql/create_weather_tables.sql:11-21) while the
  *    Spark staging frame carries Float32 (SURVEY §1.2) — the INSERT…
  *    SELECT load widens float4→float8 at the DDL boundary, and
  *    DATE/TIMESTAMP must round-trip unchanged. Exercised against
  *    DuckDB over JDBC (file-backed, PG-flavored types), comparing the
  *    widened warehouse read-back against `overwriteJdbc`'s own staging
  *    output.
  *  - S1 live HTTP: `WeatherExtract.httpFetcher` against an in-process JDK
  *    HttpServer serving the reference payload shape
  *    (/root/reference/dags/weather_etl_pipeline.py:62-78) — covers the
  *    request shape, 2xx happy path, and non-2xx error propagation.
  */
class ExternalIoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Derby writes derby.log into user.dir unless told otherwise
  System.setProperty("derby.stream.error.file", "target/derby.log")

  private val jdbcUrl = "jdbc:derby:memory:graftwh;create=true"
  private def jdbcProps: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def staging = Seq(
    ("New York", "2024-01-15", 42.8, 30.5, 0.25),
    ("Chicago", "2024-01-15", 35.2, 22.8, 0.0),
    ("Phoenix", "2024-01-15", 75.1, 55.3, 0.0)
  ).toDF("city_name", "date", "temp_max", "temp_min", "precipitation")

  test("S5 JDBC: overwriteJdbc round-trips schema and rows through Derby") {
    val wh = Warehouse(spark, TestSpark.scratch("jdbc-wh"))
    wh.overwriteJdbc("staging_weather", staging, jdbcUrl, jdbcProps)
    val back = spark.read.jdbc(jdbcUrl, "staging_weather", jdbcProps)
    // Derby uppercases identifiers; compare names case-insensitively
    assert(back.schema.fieldNames.map(_.toLowerCase).toSeq ===
      staging.schema.fieldNames.toSeq)
    val rows = back
      .select(col("CITY_NAME"), col("TEMP_MAX"), col("PRECIPITATION"))
      .as[(String, Double, Double)].collect().sortBy(_._1)
    assert(rows === Array(
      ("Chicago", 35.2, 0.0), ("New York", 42.8, 0.25), ("Phoenix", 75.1, 0.0)))
  }

  test("S5 JDBC: overwrite-per-run replaces, never appends") {
    val wh = Warehouse(spark, TestSpark.scratch("jdbc-wh2"))
    wh.overwriteJdbc("staging_weather_rerun", staging, jdbcUrl, jdbcProps)
    wh.overwriteJdbc("staging_weather_rerun", staging.filter($"city_name" =!= "Phoenix"),
      jdbcUrl, jdbcProps)
    val back = spark.read.jdbc(jdbcUrl, "staging_weather_rerun", jdbcProps)
    assert(back.count() === 2L) // second run's rows only — same semantics as the reference's overwrite load
  }

  test("S5 JDBC PG dialect: float4 staging widens to float8 at the DDL boundary; DATE/TIMESTAMP round-trip (DuckDB)") {
    val dbPath = TestSpark.scratch("duckwh") + "/wh.db"
    val duckUrl = s"jdbc:duckdb:$dbPath"
    val duckProps = new Properties()
    duckProps.setProperty("driver", "org.duckdb.DuckDBDriver")
    // staging exactly as SURVEY §1.2 types it: Float32 metrics, string
    // date at the boundary, a processed_at timestamp
    val stagingPg = Seq(
      ("New York", "2024-01-15", 42.8f, 30.5f),
      ("Chicago", "2024-01-15", 35.2f, 22.8f)
    ).toDF("city_name", "date", "temp_max", "temp_min")
      .select($"city_name", to_date($"date").as("date"),
        $"temp_max", $"temp_min",
        lit(java.sql.Timestamp.valueOf("2024-01-15 10:00:00"))
          .as("processed_at"))
      .coalesce(1)
    // Pin one connection for the whole test: embedded DuckDB shuts the
    // database instance down when its last connection closes and
    // re-deserializes the file on the next open — Spark's JDBC paths
    // open/close several short-lived connections (probe, DDL, insert
    // task, read task), and the repeated checkpoint/reload cycles were
    // flaky under suite-level GC pressure ("field id mismatch" at
    // startup). A held connection keeps the instance live so every
    // Spark connection attaches to it instead.
    val pin = java.sql.DriverManager.getConnection(duckUrl)
    try {
      // DuckDB prepares eagerly (catalog-validates at prepareStatement),
      // so Spark's tableExists probe on a MISSING table surfaces as an
      // SQLException instead of a clean false — seed an empty table first;
      // overwrite mode then drops and recreates it with Spark's own DDL,
      // which is the path under test
      pin.createStatement()
        .execute("CREATE TABLE IF NOT EXISTS staging_pg (dummy INTEGER)")
      // leg 1: overwriteJdbc's OWN output — Spark-generated DDL keeps the
      // staging width (REAL/float4) and must round-trip values exactly
      val wh = Warehouse(spark, TestSpark.scratch("jdbc-pgwh"))
      wh.overwriteJdbc("staging_pg", stagingPg, duckUrl, duckProps)
      val stagedBack = spark.read.jdbc(duckUrl, "staging_pg", duckProps)
      assert(stagedBack.schema("date").dataType.typeName === "date")
      assert(stagedBack.schema("processed_at").dataType.typeName === "timestamp")
      val staged = stagedBack
        .select($"city_name", $"date".cast("string"),
          $"temp_max".cast("double"), $"processed_at".cast("string"))
        .as[(String, String, Double, String)].collect().sortBy(_._1)
      // leg 2: the reference's INSERT…SELECT into DDL-as-code float8
      // columns (dags/weather_etl_pipeline.py:172-182 into
      // sql/create_weather_tables.sql:90-105) — the widening boundary
      val st = pin.createStatement()
      st.execute("""CREATE OR REPLACE TABLE fact_pg (
        city_name VARCHAR(100), date DATE,
        temp_max DOUBLE, temp_min DOUBLE, processed_at TIMESTAMP)""")
      st.execute("""INSERT INTO fact_pg
        SELECT city_name, date, temp_max, temp_min, processed_at
        FROM staging_pg""")
      st.close()
      val factBack = spark.read.jdbc(duckUrl, "fact_pg", duckProps)
      // the contract: float4 staging → float8 warehouse columns
      assert(factBack.schema("temp_max").dataType.typeName === "double")
      assert(factBack.schema("temp_min").dataType.typeName === "double")
      val fact = factBack
        .select($"city_name", $"date".cast("string"),
          $"temp_max", $"processed_at".cast("string"))
        .as[(String, String, Double, String)].collect().sortBy(_._1)
      // widened values are the EXACT float→double embeddings (42.8f →
      // 42.79999923706055, not 42.8) — the same number overwriteJdbc's
      // staging read-back yields, so the two paths agree bit-for-bit
      assert(fact === staged)
      assert(fact.map(_._3) === Array(35.2f.toDouble, 42.8f.toDouble))
      // DATE and TIMESTAMP round-trip unchanged through both legs
      assert(fact.map(_._2).distinct === Array("2024-01-15"))
      assert(fact.map(_._4).distinct === Array("2024-01-15 10:00:00"))
    } finally pin.close()
  }

  /** Minimal Open-Meteo-shaped daily payload (the fields the transform
    * consumes — dags/weather_etl_pipeline.py:62-78).
    */
  private val payload =
    """{
      |  "daily": {
      |    "time": ["2024-01-14", "2024-01-15"],
      |    "temperature_2m_max": [45.2, 42.8],
      |    "temperature_2m_min": [32.1, 30.5],
      |    "precipitation_sum": [0.0, 0.25],
      |    "windspeed_10m_max": [15.3, 22.1],
      |    "weathercode": [1.0, 61.0]
      |  }
      |}""".stripMargin

  private def withServer(f: (HttpServer, Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.start()
      f(server, server.getAddress.getPort)
    } finally server.stop(0)
  }

  test("S1 HTTP: httpFetcher sends the reference query shape and returns the body") {
    withServer { (server, port) =>
      @volatile var seenQuery: String = null
      server.createContext("/v1/forecast", exchange => {
        seenQuery = exchange.getRequestURI.getQuery
        val bytes = payload.getBytes("UTF-8")
        exchange.sendResponseHeaders(200, bytes.length.toLong)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      })
      val fetch = WeatherExtract.httpFetcher(s"http://127.0.0.1:$port/v1/forecast")
      val city = WeatherExtract.City("New York", 40.7128, -74.006)
      assert(fetch(city) === payload)
      assert(seenQuery.contains("latitude=40.7128"))
      assert(seenQuery.contains("longitude=-74.006"))
      assert(seenQuery.contains(
        "daily=temperature_2m_max,temperature_2m_min,precipitation_sum,windspeed_10m_max,weathercode"))
      assert(seenQuery.contains("past_days=7"))
    }
  }

  test("S1 HTTP: non-2xx fails the extract with the status in the message") {
    withServer { (server, port) =>
      server.createContext("/v1/forecast", exchange => {
        exchange.sendResponseHeaders(503, -1)
        exchange.close()
      })
      val fetch = WeatherExtract.httpFetcher(s"http://127.0.0.1:$port/v1/forecast")
      val e = intercept[IllegalArgumentException] {
        fetch(WeatherExtract.City("Chicago", 41.8781, -87.6298))
      }
      assert(e.getMessage.contains("HTTP 503"))
      assert(e.getMessage.contains("Chicago"))
    }
  }

  test("S1→S2 end-to-end over live HTTP: tagged pretty-printed array lands on disk") {
    withServer { (server, port) =>
      server.createContext("/v1/forecast", exchange => {
        val bytes = payload.getBytes("UTF-8")
        exchange.sendResponseHeaders(200, bytes.length.toLong)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      })
      val dir = TestSpark.scratch("http-extract")
      val out = WeatherExtract.extract(dir, "2024-01-15",
        WeatherExtract.httpFetcher(s"http://127.0.0.1:$port/v1/forecast"),
        extractedAt = "2024-01-15T10:00:00")
      // the multiLine reader path must see one array of 5 tagged objects
      val raw = spark.read.option("multiLine", "true").json(out)
      assert(raw.count() === 5L)
      assert(raw.select("city").as[String].collect().sorted ===
        WeatherExtract.defaultCities.map(_.name).sorted.toArray)
      assert(raw.select("extracted_at").distinct().as[String].collect() ===
        Array("2024-01-15T10:00:00"))
      assert(raw.schema.fieldNames.contains("daily"))
    }
  }
}
