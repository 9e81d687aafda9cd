package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-profiling operators — the diagnostics a pipeline runs BEFORE
  * committing a partition strategy at scale. The first question on a new
  * 100 TB table is "which join keys are skewed, and how badly": the
  * answer decides salting factors (graft.functions.Skew), AQE skew-join
  * thresholds, and bucketing column choices.
  *
  * Shape: per-key counts are a partial+final hash aggregate (one shuffle
  * whose payload is |distinct keys| rows, not |rows|); the second-level
  * statistics aggregate a frame that is already tiny. Nothing here
  * collects raw data to the driver.
  */
object Profiling {

  /** Key-distribution profile of one column: cardinality, hottest-key
    * count, exact p95 of the per-key counts, and the skew ratio
    * (hottest key's count over the mean count — 1.0 means perfectly
    * uniform). All portable arithmetic: exact counts, interpolated
    * percentile (q37 precedent), integer-ratio doubles.
    */
  def keySkew(df: DataFrame, keyCol: String, label: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    counts.agg(
      lit(label).as("key_col"),
      sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"),
      round(expr("percentile(cnt, 0.95D)"), 4).as("p95_cnt"),
      // max/mean = max*n_keys/n_rows: exact ints in, one double division
      (max(col("cnt")).cast("double") * count(lit(1)) / sum(col("cnt")))
        .as("skew_ratio"))
  }

  /** Registered surface: profiles of the two natural fact join keys. */
  def q53SkewProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    keySkew(t.orders, "o_custkey", "orders.o_custkey")
      .unionByName(keySkew(t.lineitem, "l_suppkey", "lineitem.l_suppkey"))
      .orderBy($"key_col")
  }

  val q53Sql: String =
    """WITH oc AS (
      |  SELECT count(*) AS cnt FROM orders GROUP BY o_custkey),
      |ls AS (
      |  SELECT count(*) AS cnt FROM lineitem GROUP BY l_suppkey),
      |po AS (
      |  SELECT 'orders.o_custkey' AS key_col,
      |    CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_keys,
      |    max(cnt) AS max_cnt,
      |    round(quantile_cont(cnt, 0.95), 4) AS p95_cnt,
      |    CAST(max(cnt) AS DOUBLE) * count(*) / sum(cnt) AS skew_ratio
      |  FROM oc),
      |pl AS (
      |  SELECT 'lineitem.l_suppkey' AS key_col,
      |    CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_keys,
      |    max(cnt) AS max_cnt,
      |    round(quantile_cont(cnt, 0.95), 4) AS p95_cnt,
      |    CAST(max(cnt) AS DOUBLE) * count(*) / sum(cnt) AS skew_ratio
      |  FROM ls)
      |SELECT * FROM po UNION ALL SELECT * FROM pl
      |ORDER BY key_col""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q53_skew_profile", q53SkewProfile, Some(q53Sql), Seq("X-scale"),
      "join-key skew profiler: cardinality, hot-key count, p95, skew ratio"))
}
