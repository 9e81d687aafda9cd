package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Delimited-text (CSV/TSV) scan surface — the sibling of the JSON scan
  * paths in WeatherJson, for pipelines whose raw drops arrive as
  * delimited exports rather than API payloads.
  *
  * Design mirrors the JSON surface:
  *   - schema ENFORCED, never inferred, on the production path — schema
  *     inference reads the data twice and silently widens types when a
  *     late partition disagrees (`readInferred` exists for exploration
  *     only);
  *   - malformed rows are an explicit decision, not a default:
  *     `readStrict` fails the job on the first bad row (FAILFAST — an
  *     ingestion contract violation should stop the load), while
  *     `readPermissive` captures bad rows in a `_corrupt_record` column
  *     so a quality gate can count and quarantine them without losing
  *     the batch.
  */
object DelimitedText {

  val CorruptColumn = "_corrupt_record"

  /** Production scan: enforced schema, FAILFAST on malformed rows. */
  def readStrict(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ",", header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "FAILFAST")
      .csv(path)

  /** Quarantine scan: enforced schema plus a corrupt-record column; rows
    * that fail to parse land there with every data column null, so the
    * caller can split clean rows from quarantined ones in one pass.
    */
  def readPermissive(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ",", header: Boolean = true): DataFrame = {
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptColumn, StringType, nullable = true))
    spark.read
      .schema(withCorrupt)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptColumn)
      .csv(path)
  }

  /** Exploration-only inferred scan (two passes over the data). */
  def readInferred(spark: SparkSession, path: String,
      delimiter: String = ",", header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("inferSchema", "true")
      .csv(path)
}
