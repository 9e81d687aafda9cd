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
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read nanos as long and narrow to microseconds with
    * integer division (`div` — a double division would lose precision at
    * 1e18 ns magnitudes).
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
