package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query.
  *
  * @param name   stable id, referenced by the driver's correctness gate
  * @param run    Spark implementation over the fixture dir
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet
  *               tables (None → driver records a weaker rows-only check;
  *               used for ops whose hash functions are engine-specific)
  * @param covers SURVEY.md §2 operator ids this query exercises
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    covers: Seq[String],
    doc: String)

/** Central registry: every operator surface of the engine, one entry each.
  * SparkEntry derives the driver contract maps from this.
  */
object Registry {
  lazy val all: Seq[Q] =
    Relational.queries ++
      Collections.queries ++
      TextOps.queries ++
      DedupOps.queries ++
      SimilarityOps.queries ++
      WeatherOps.queries ++
      MultimodalOps.queries ++
      TemporalOps.queries ++
      Profiling.queries ++
      GraphOps.queries ++
      CurationOps.queries ++
      LayoutOps.queries ++
      CorpusPipeline.queries

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
