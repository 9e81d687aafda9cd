package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, and decode / feature-extraction as
  * batched per-partition transforms.
  *
  * The decode step itself is a STUB (this environment has no image/audio
  * codecs): `decodeStub` derives deterministic fake "pixel statistics"
  * from the payload bytes. Everything around it is real and is the part
  * that matters at 100 TB:
  *   - schema: (media_id, kind, payload binary, width, height) rows —
  *     payloads travel as parquet binary, never through the driver;
  *   - execution: `mapPartitions` with explicit micro-batching (batch of
  *     64 payloads per decoder call — the same batch shape an Arrow-based
  *     decode UDF would see), so a native decoder amortizes setup per
  *     batch, not per row;
  *   - partitioning: decode is narrow — rows are decoded where they were
  *     scanned; only the small feature vectors continue into shuffles.
  */
object MultimodalOps {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      mean_byte: Double, checksum: Long)

  val BatchSize = 64

  /** STUB decoder: stands in for an image/audio decode. Deterministic pure
    * function of the payload so tests and reruns agree. A real deployment
    * swaps only this function (same batch-in, batch-out signature).
    */
  def decodeStub(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      var sum = 0L
      var check = 1125899906842597L
      m.payload.foreach { b =>
        sum += (b & 0xff)
        check = check * 31 + (b & 0xff)
      }
      MediaFeatures(m.media_id, m.kind,
        m.payload.length.toLong,
        if (m.payload.isEmpty) 0.0 else sum.toDouble / m.payload.length,
        check)
    }

  /** Batched decode over a distributed media Dataset. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(batch => decodeStub(batch))
    }
  }

  /** Deterministic media table derived from `documents` (payload = UTF-8
    * text bytes posing as an encoded frame) — the fixture generator for
    * the multimodal path; kind/width/height are synthesized metadata.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select(
        $"doc_id".as("media_id"),
        when($"doc_id" % 3 === 0, "image").when($"doc_id" % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode($"text", "UTF-8").as("payload"),
        (($"doc_id" % 4) * 160 + 320).cast("int").as("width"),
        (($"doc_id" % 4) * 90 + 180).cast("int").as("height"))
      .as[MediaRow]
  }

  /** Frame-sampling stub for video payloads: every k-th BatchSize-byte
    * slice as a "frame" (real codec would seek keyframes; the slicing /
    * row-explosion plumbing is what's exercised).
    */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.payload.grouped(BatchSize).zipWithIndex.collect {
        case (frame, i) if i % everyK == 0 => (m.media_id, i, frame.length.toLong)
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Resize stub for image payloads: keep every `stride`-th byte and
    * scale the metadata (a real codec re-encodes pixels; the
    * binary-in/binary-out batch shape, metadata rewrite, and
    * narrow/no-shuffle execution are what's exercised). Batched like
    * decodeStub so a native resizer amortizes setup per batch.
    */
  def resizeStub(media: Dataset[MediaRow], stride: Int = 4): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { m =>
        val out = m.payload.indices.collect {
          case i if i % stride == 0 => m.payload(i)
        }.toArray
        m.copy(payload = out,
          width = math.max(1, m.width / stride),
          height = math.max(1, m.height / stride))
      })
    }
  }

  /** Registered frame-sampling surface: every 4th 64-byte slice of each
    * video payload. Pure byte arithmetic over the UTF-8 fixture
    * payloads, so the whole row-explosion path hash-checks against a
    * DuckDB twin (same ASCII-corpus contract as q30).
    */
  def q57FrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sampleFrames(mediaFromDocuments(spark, dir))
      .select($"media_id", $"frame_idx".cast("long").as("frame_idx"), $"frame_bytes")
      .orderBy($"media_id", $"frame_idx")
  }

  val q57Sql: String =
    s"""WITH media AS (
      |  SELECT doc_id AS media_id, CAST(strlen(text) AS BIGINT) AS n
      |  FROM documents WHERE doc_id % 3 = 2),
      |f AS (
      |  SELECT media_id,
      |    unnest(range(0, CAST(ceil(CAST(n AS DOUBLE) / $BatchSize) AS BIGINT))) AS frame_idx,
      |    n
      |  FROM media)
      |SELECT media_id, frame_idx,
      |  least($BatchSize, n - frame_idx * $BatchSize) AS frame_bytes
      |FROM f
      |WHERE frame_idx % 4 = 0
      |ORDER BY media_id, frame_idx""".stripMargin

  /** End-to-end multimodal query: synthesize media → batched stub decode →
    * per-kind feature aggregate. The aggregated features (byte counts and
    * mean byte value of the UTF-8 payloads) are portable arithmetic, so
    * the whole decode path hash-checks against a DuckDB twin; the
    * non-portable rolling checksum stays spec-checked in MultimodalSpec.
    */
  def q30Multimodal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(mediaFromDocuments(spark, dir)).toDF()
      .groupBy($"kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum($"n_bytes").as("total_bytes"),
        round(avg($"mean_byte"), 4).as("avg_mean_byte"))
      .orderBy($"kind")
  }

  /** DuckDB twin of q30: the payload is the UTF-8 encoding of an
    * all-ASCII corpus (a CONTRACT of this oracle: one multi-byte char
    * would break strlen/ascii byte reconstruction — the oracle then
    * fails closed rather than silently diverging), so n_bytes = strlen
    * and the byte values are the character codepoints — the decode
    * stub's per-row features reconstructed in portable SQL. The LEFT
    * JOIN + coalesce keeps an empty-text doc in the aggregate with
    * mean_byte 0.0, matching decodeStub.
    */
  val q30Sql: String =
    """WITH ch AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
      |mb AS (
      |  SELECT doc_id, CAST(sum(ascii(c)) AS DOUBLE) / count(*) AS mean_byte
      |  FROM ch GROUP BY doc_id),
      |feats AS (
      |  SELECT d.doc_id,
      |    CASE WHEN d.doc_id % 3 = 0 THEN 'image'
      |         WHEN d.doc_id % 3 = 1 THEN 'audio'
      |         ELSE 'video' END AS kind,
      |    CAST(strlen(d.text) AS BIGINT) AS n_bytes,
      |    coalesce(mb.mean_byte, 0.0) AS mean_byte
      |  FROM documents d LEFT JOIN mb USING (doc_id))
      |SELECT kind, count(*) AS n_media,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  round(avg(mean_byte), 4) AS avg_mean_byte
      |FROM feats
      |GROUP BY kind
      |ORDER BY kind""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q30_multimodal", q30Multimodal, Some(q30Sql), Seq("X-multimodal"),
      "binary media columns: batched stub decode + feature aggregate"),
    Q("q57_frame_sample", q57FrameSample, Some(q57Sql), Seq("X-multimodal"),
      "video frame sampling: every k-th fixed-size payload slice"))
}
