package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Every table is a plain parquet scan; Catalyst pushes filters and prunes
  * columns into the `FileSourceScanExec`, so callers should express
  * selection/projection declaratively and never pre-collect. At 100 TB these
  * become partitioned/bucketed warehouse tables — the loader is the single
  * seam where that swap happens.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.parquet has shipped with two `ts` encodings across fixture
    * generations: TIMESTAMP(NANOS) (rejected by Spark's vectorized reader —
    * read nanos as long via the legacy flag and narrow with integer
    * division; `div`, not `/`, to keep precision at 1e18 ns magnitudes)
    * and plain TIMESTAMP(MICROS), which needs no conversion. Branch on the
    * actual file schema so either generation loads.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // plain TIMESTAMP(MICROS) parquet surfaces as NTZ; present it as
        // TIMESTAMP (LTZ) like the legacy path did — the session runs in
        // UTC so the cast is value-preserving, and watermarks/windows in
        // the streaming twins require LTZ event time
        raw.withColumn("ts",
          raw("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
