package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps

/** Array/collection operator surface (SURVEY.md §2.7 — the reference's
  * signature arrays_zip→explode flatten, /root/reference/spark_jobs/
  * transform_weather.py:75-95 — exercised here over the embeddings
  * fixture; the weather-shaped twin lives in WeatherOps).
  */
object Collections {

  /** C2 — explode array → rows (Generate plan node). Narrow op: each task
    * expands its own rows, no shuffle; the orderBy exists only for the
    * deterministic oracle hash.
    */
  def q13Explode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).embeddings
      .select($"vec_id", explode($"embedding").as("v"))
      .select($"vec_id", $"v".cast("double").as("val"))
      .orderBy($"vec_id", $"val")
  }

  // raw float32→double widening is bit-exact in both engines — no rounding
  val q13Sql: String =
    """SELECT vec_id, CAST(v AS DOUBLE) AS val
      |FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings)
      |ORDER BY vec_id, val""".stripMargin

  /** Higher-order array math — per-row fold over `array<float>` (no
    * explode, no shuffle): dimension, L1/L2 norms. This is the codegen
    * path the similarity ops build on.
    */
  def q14VectorNorms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).embeddings
      .select(
        $"vec_id",
        size($"embedding").cast("long").as("dim"),
        round(VectorOps.l1Norm($"embedding"), 4).as("l1"),
        round(VectorOps.l2Norm($"embedding"), 4).as("l2"))
      .orderBy($"vec_id")
  }

  val q14Sql: String =
    """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
      |  round(sum(abs(v)), 4) AS l1,
      |  round(sqrt(sum(v * v)), 4) AS l2
      |FROM (SELECT vec_id, embedding, CAST(unnest(embedding) AS DOUBLE) AS v
      |      FROM embeddings)
      |GROUP BY vec_id, embedding
      |ORDER BY vec_id""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q13_explode", q13Explode, Some(q13Sql), Seq("C2"),
      "explode array<float> to rows"),
    Q("q14_vector_norms", q14VectorNorms, Some(q14Sql), Seq("C1", "C3"),
      "per-row higher-order fold: vector norms"))
}
