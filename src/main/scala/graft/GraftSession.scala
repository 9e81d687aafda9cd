package graft

import org.apache.spark.sql.SparkSession

/** The library's session entry point: a SparkSession with the engine's
  * recommended configuration and extensions (native SQL functions +
  * optimizer rules) pre-installed.
  *
  * Cluster deployments pass `spark.sql.extensions=graft.plans.GraftExtensions`
  * to spark-submit instead; this builder is the programmatic equivalent.
  */
object GraftSession {

  def builder(appName: String = "graft", master: String = "local[*]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")

  /** Local session sized for this machine; registers the custom top-k
    * strategy too (idempotent).
    */
  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = builder(master = s"local[$cpus]", shufflePartitions = cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    plans.TopKPerKey.register(spark)
    spark
  }
}
