package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-dimensional data layout: Z-order (Morton) clustering keys.
  *
  * At 100 TB the cheapest query is the one that never reads the file:
  * single-column layouts (sort, range partition, bucketing — see
  * `Warehouse.writeBucketed`) give min/max file skipping on ONE
  * dimension only. Interleaving the bits of two key columns gives a
  * space-filling curve whose contiguous ranges are axis-aligned tiles,
  * so range-partitioning + sorting by the z-key yields files whose
  * min/max stats prune on BOTH dimensions at once (the layout trick
  * behind Delta/Iceberg Z-ORDER clustering). The key computation itself
  * is pure codegen'd bit arithmetic — shiftleft/and/or, no UDF, no
  * custom expression needed — and therefore integer-exact in the DuckDB
  * twin as well.
  *
  * Reference anchor: the reference tunes physical access paths with
  * Postgres B-tree indexes on (city, date) pairs
  * (`/root/reference/sql/create_weather_tables.sql:108-115`); this is
  * the columnar-lake counterpart for composite-key access.
  */
object LayoutOps {

  /** Bit-spread masks for 32→64-bit Morton interleave (the classic
    * magic-number spread; each step doubles the gap between live bits).
    * Shared with the SQL twin via `spreadSql` so the two can never
    * drift.
    */
  private val Steps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Inputs are masked to 31 bits so the interleaved key stays positive
    * in a signed 64-bit long on both engines.
    */
  private val InMask = 0x7FFFFFFFL

  private def spread(c: Column): Column =
    Steps.foldLeft(c.cast("long").bitwiseAND(lit(InMask))) { case (x, (sh, m)) =>
      x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(m))
    }

  /** Z-order key of two non-negative (< 2³¹) integer columns: bits of
    * `a` on even positions, bits of `b` on odd.
    */
  def zorder64(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  private def spreadSql(expr: String): String =
    Steps.foldLeft(s"(CAST($expr AS BIGINT) & $InMask)") { case (x, (sh, m)) =>
      s"((($x | ($x << $sh)) & $m))"
    }

  def zorderSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"

  /** Coarseness of the demo tile id: dropping 16 z-bits = 8 bits per
    * dimension → 256×256-key tiles.
    */
  private val CellShift = 16

  /** Z-order layout of lineitem on (l_partkey, l_suppkey): the clustering
    * key plus the coarse tile each row lands in — the ordering a
    * `repartitionByRange(zkey).sortWithinPartitions(zkey)` write would
    * lay files out by (LayoutSpec demonstrates the resulting two-
    * dimensional file skipping against an unclustered layout). Row-local
    * bit arithmetic; the output ORDER BY is the clustering sort itself.
    */
  def q75ZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).lineitem
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      .withColumn("zkey", zorder64($"l_partkey", $"l_suppkey"))
      .withColumn("zcell", shiftright($"zkey", CellShift))
      .orderBy($"zkey", $"l_orderkey", $"l_linenumber")
  }

  val q75Sql: String = {
    val z = zorderSql("l_partkey", "l_suppkey")
    s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |  $z AS zkey,
       |  ($z >> $CellShift) AS zcell
       |FROM lineitem
       |ORDER BY zkey, l_orderkey, l_linenumber""".stripMargin
  }

  /** Small-file compaction planner: bin-pack a partition's file
    * inventory into target-size output groups. Small files are the
    * silent tax of streaming/incremental ingest at scale — a 100 TB
    * table accreting 10k tiny files per hour pays per-file open cost on
    * every scan until compacted; the planner turns a file listing into
    * the compaction job list (one output group per bin).
    *
    * Packing rule: within each partition, files in deterministic
    * (listing) order, a file joins the bin where its cumulative START
    * offset falls — `bin = (cumsum − size) div target` — so bins
    * overflow by at most one file rather than splitting it. One window
    * cumsum + one aggregate, both over |files| rows: the plan never
    * touches file CONTENTS, so it costs the same whether the table is
    * 1 GB or 100 TB. Documents stand in for the file inventory (source
    * = partition, n_chars = size).
    */
  def q101CompactionPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val target = 20000L
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir).documents
      .select($"source", $"doc_id", $"n_chars")
      .withColumn("bin_id",
        ((sum($"n_chars").over(w) - $"n_chars") / target).cast("long"))
      .groupBy($"source", $"bin_id")
      .agg(count(lit(1)).as("n_files"),
        sum($"n_chars").as("bytes"),
        min($"doc_id").as("first_file"),
        max($"doc_id").as("last_file"))
      .orderBy($"source", $"bin_id")
  }

  val q101Sql: String =
    """WITH c AS (
      |  SELECT source, doc_id, n_chars,
      |         (sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          - n_chars) // 20000 AS bin_id
      |  FROM documents)
      |SELECT source, CAST(bin_id AS BIGINT) AS bin_id,
      |  count(*) AS n_files,
      |  CAST(sum(n_chars) AS BIGINT) AS bytes,
      |  min(doc_id) AS first_file,
      |  max(doc_id) AS last_file
      |FROM c GROUP BY source, bin_id
      |ORDER BY source, bin_id""".stripMargin

  /** Copy-on-write rewrite planner with write-amplification accounting:
    * given a key-range file layout (512 orders per "file" — the fixed-
    * width stand-in for real file metadata) and an update predicate
    * (one week of order dates), compute per file how many rows change
    * and how many must be REWRITTEN — under copy-on-write, one changed
    * row rewrites its whole file. The trailing total row (file_id NULL)
    * is the number the lakehouse operator actually stares at: total
    * rows_rewritten / total n_changed is the write amplification, and
    * this layout makes the pathology visible — a date-scattered ~0.3%
    * update touches ~¾ of key-ranged files, which is exactly why
    * date-partitioned or Z-ordered layouts (q75) exist, and why
    * merge-on-read trades this write cost for read-time reconciliation.
    *
    * Scale shape: one scan, one groupBy on the file key (in production
    * the scan side is the file-metadata table joined against update-key
    * zone maps — never the data). The total row folds from the per-file
    * frame, not from the base, so the plan is per-file agg → tiny
    * re-agg.
    */
  def q134CowPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perFile = Tables(spark, dir).orders
      .select(expr("o_orderkey div 512").as("file_id"),
        to_date($"o_orderdate").between("1996-03-01", "1996-03-07")
          .cast("long").as("chg"))
      .groupBy($"file_id")
      .agg(count(lit(1)).as("n_rows"), sum($"chg").as("n_changed"))
      .withColumn("rows_rewritten",
        when($"n_changed" > 0, $"n_rows").otherwise(lit(0L)))
    val total = perFile.agg(
      lit(null).cast("long").as("file_id"),
      sum($"n_rows").as("n_rows"), sum($"n_changed").as("n_changed"),
      sum($"rows_rewritten").as("rows_rewritten"))
    perFile.unionByName(total).orderBy($"file_id".asc_nulls_last)
  }

  val q134Sql: String =
    """WITH f AS (
      |  SELECT o_orderkey // 512 AS file_id,
      |         CASE WHEN CAST(o_orderdate AS DATE)
      |                BETWEEN DATE '1996-03-01' AND DATE '1996-03-07'
      |              THEN 1 ELSE 0 END AS chg
      |  FROM orders),
      |pf AS (
      |  SELECT file_id, count(*) AS n_rows,
      |         CAST(sum(chg) AS BIGINT) AS n_changed
      |  FROM f GROUP BY file_id),
      |pr AS (
      |  SELECT file_id, n_rows, n_changed,
      |         CASE WHEN n_changed > 0 THEN n_rows ELSE 0 END
      |           AS rows_rewritten
      |  FROM pf)
      |SELECT * FROM pr
      |UNION ALL
      |SELECT NULL AS file_id, CAST(sum(n_rows) AS BIGINT),
      |       CAST(sum(n_changed) AS BIGINT),
      |       CAST(sum(rows_rewritten) AS BIGINT)
      |FROM pr
      |ORDER BY file_id NULLS LAST""".stripMargin

  /** q149: zone-map pruning estimator — the "what does this layout buy
    * my scans" number that decides whether a re-cluster (q75/q101) is
    * worth its write cost. Parquet/lakehouse readers skip a file when
    * its zone map (per-file min/max) excludes the predicate; how much
    * gets skipped is purely a function of LAYOUT. This query simulates
    * two layouts of the same lineitem rows — insert order (files =
    * orderkey ranges) and date-partitioned (files = shipmonth ×
    * orderkey bucket) — builds each file's shipdate zone map, and
    * reports how many files/rows a one-month predicate must scan under
    * each.
    *
    * Scale shape: one scan of the fact table per layout → groupBy
    * (layout, file) over |files| groups (min/max/count fold partial →
    * final) → a per-layout re-agg over the file inventory. The
    * predicate evaluation runs against zone STATS, never re-reading
    * rows — exactly how a real planner consults footer metadata. The
    * date-partitioned layout is derived with pure column arithmetic
    * (month key + key bucket), not a global sort — the same
    * shuffle-free derivation a partitioned writer applies.
    */
  def q149ZonemapPrune(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lo = lit(java.sql.Date.valueOf("1997-03-01"))
    val hi = lit(java.sql.Date.valueOf("1997-03-31"))
    val li = Tables(spark, dir).lineitem
      .select($"l_orderkey", to_date($"l_shipdate").as("sd"))
    val natural = li.select(lit("insert_order").as("layout"),
      expr("l_orderkey div 512").as("file_id"), $"sd")
    val parted = li.select(lit("date_partitioned").as("layout"),
      (date_format($"sd", "yyyyMM").cast("long") * 100 + pmod($"l_orderkey", lit(50)))
        .as("file_id"), $"sd")
    natural.unionByName(parted)
      .groupBy($"layout", $"file_id")
      .agg(count(lit(1)).as("n_rows"),
        min($"sd").as("mn"), max($"sd").as("mx"),
        sum($"sd".between(lo, hi).cast("long")).as("n_match"))
      .withColumn("scanned", ($"mn" <= hi && $"mx" >= lo).cast("long"))
      .groupBy($"layout")
      .agg(count(lit(1)).as("n_files"),
        sum($"scanned").as("files_scanned"),
        sum($"n_rows").as("rows_total"),
        sum($"scanned" * $"n_rows").as("rows_scanned"),
        sum($"n_match").as("rows_matching"))
      .withColumn("scan_fraction",
        $"rows_scanned".cast("double") / $"rows_total")
      .orderBy($"layout")
  }

  val q149Sql: String =
    """WITH li AS (
      |  SELECT l_orderkey, CAST(l_shipdate AS DATE) AS sd FROM lineitem),
      |tagged AS (
      |  SELECT 'insert_order' AS layout, l_orderkey // 512 AS file_id, sd FROM li
      |  UNION ALL
      |  SELECT 'date_partitioned',
      |         CAST(strftime(sd, '%Y%m') AS BIGINT) * 100 + l_orderkey % 50, sd
      |  FROM li),
      |zones AS (
      |  SELECT layout, file_id, count(*) AS n_rows,
      |         min(sd) AS mn, max(sd) AS mx,
      |         CAST(sum(CASE WHEN sd BETWEEN DATE '1997-03-01' AND DATE '1997-03-31'
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
      |         CASE WHEN min(sd) <= DATE '1997-03-31'
      |                AND max(sd) >= DATE '1997-03-01'
      |              THEN 1 ELSE 0 END AS scanned
      |  FROM tagged GROUP BY layout, file_id)
      |SELECT layout, count(*) AS n_files,
      |  CAST(sum(scanned) AS BIGINT) AS files_scanned,
      |  CAST(sum(n_rows) AS BIGINT) AS rows_total,
      |  CAST(sum(scanned * n_rows) AS BIGINT) AS rows_scanned,
      |  CAST(sum(n_match) AS BIGINT) AS rows_matching,
      |  CAST(sum(scanned * n_rows) AS DOUBLE) / sum(n_rows) AS scan_fraction
      |FROM zones
      |GROUP BY layout
      |ORDER BY layout""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q149_zonemap_prune", q149ZonemapPrune, Some(q149Sql), Seq("X-scale"),
      "zone-map pruning estimator: files/rows scanned under two layouts of the same rows"),
    Q("q75_zorder_layout", q75ZorderLayout, Some(q75Sql), Seq("X-scale"),
      "Z-order (Morton) clustering key + tile for two-dimensional file skipping"),
    Q("q101_compaction_plan", q101CompactionPlan, Some(q101Sql), Seq("X-scale"),
      "small-file compaction planner: cumsum bin-packing over the file inventory"),
    Q("q134_cow_plan", q134CowPlan, Some(q134Sql), Seq("X-scale"),
      "copy-on-write rewrite planner: per-file change counts + write amplification total"))
}
