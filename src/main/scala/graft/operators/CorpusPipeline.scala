package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The capstone composite: a training-corpus preparation pipeline chaining
  * the engine's operators end-to-end —
  *
  *   1. quality gate: drop documents under a word-count floor;
  *   2. exact dedup: keep the smallest doc_id per md5 fingerprint;
  *   3. near-dup removal: word-3-gram Jaccard ≥ 0.5 over the df-capped
  *      inverted-index join (DedupOps.jaccardPairs), greedily dropping
  *      the higher doc_id of each surviving pair;
  *   4. deterministic stratified sample: top-3 per language by md5
  *      content priority.
  *
  * Every stage is portable arithmetic/hash (no engine-specific hashing),
  * so the WHOLE pipeline is DuckDB-oracle checked — the strongest
  * end-to-end correctness statement the gate can make. Execution profile:
  * stages 1–2 are one scan + one digest-keyed shuffle; stage 3's cost is
  * bounded by posting lists exactly like q20; stage 4 is one window over
  * the survivors.
  */
object CorpusPipeline {

  def q42Corpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
    // 1. quality gate (single-space corpus word count, as in TextOps)
    val words = (length($"text") - length(translate($"text", " ", "")) + 1).cast("long")
    val quality = docs.select($"doc_id", $"lang", $"text", words.as("n_words"))
      .filter($"n_words" >= 20)
    // 2. exact dedup: keep min doc_id per content fingerprint
    val wFp = Window.partitionBy($"fp").orderBy($"doc_id")
    val exact = quality.withColumn("fp", md5($"text"))
      .withColumn("rn", row_number().over(wFp)).filter($"rn" === 1)
      .drop("fp", "rn")
    // 3. near-dup removal over the deduped set (capped Jaccard ≥ 0.5, as
    //    in q20)
    val dropped = DedupOps.jaccardPairs(exact, 0.5)
      .select($"doc_b".as("doc_id")).distinct()
    val survivors = exact.join(dropped, Seq("doc_id"), "left_anti")
    // 4. deterministic stratified sample, 3 per language
    val wSample = Window.partitionBy($"lang")
      .orderBy(md5(concat($"doc_id".cast("string"), lit(":"), $"text")), $"doc_id")
    survivors.withColumn("rk", row_number().over(wSample))
      .filter($"rk" <= 3)
      .select($"lang", $"rk".cast("long").as("rk"), $"doc_id", $"n_words")
      .orderBy($"lang", $"rk")
  }

  val q42Sql: String =
    s"""WITH quality AS (
      |  SELECT doc_id, lang, text,
      |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words
      |  FROM documents
      |  WHERE length(text) - length(replace(text, ' ', '')) + 1 >= 20),
      |exact AS (
      |  SELECT doc_id, lang, text, n_words
      |  FROM (SELECT *, row_number() OVER (
      |          PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |        FROM quality)
      |  WHERE rn = 1),
      |sh AS (
      |  SELECT doc_id, list_distinct(${DedupOps.TrigramSqlExpr}) AS shingles
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM exact)
      |  WHERE len(t) >= 3),
      |counts AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
      |post AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
      |rare AS (SELECT s FROM post GROUP BY s HAVING count(*) <= 25),
      |pr AS (SELECT post.doc_id, post.s FROM post JOIN rare USING (s)),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM pr a JOIN pr b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |neardup AS (
      |  SELECT DISTINCT doc_b AS doc_id
      |  FROM pairs
      |  JOIN counts ca ON doc_a = ca.doc_id
      |  JOIN counts cb ON doc_b = cb.doc_id
      |  WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.5),
      |survivors AS (
      |  SELECT e.* FROM exact e
      |  WHERE NOT EXISTS (SELECT 1 FROM neardup n WHERE n.doc_id = e.doc_id))
      |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, n_words
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY lang
      |        ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || text), doc_id) AS rk
      |      FROM survivors)
      |WHERE rk <= 3
      |ORDER BY lang, rk""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q42_corpus_pipeline", q42Corpus, Some(q42Sql), Seq("X-pipeline"),
      "end-to-end corpus prep: quality -> exact dedup -> near-dup -> sample"))
}
