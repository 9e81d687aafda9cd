package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LayoutOps

/** Z-order layout: interleave correctness against a reference Morton
  * implementation, and the actual two-dimensional file-skipping payoff
  * measured on written files — the property the operator exists for.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mortonRef(a: Long, b: Long): Long = {
    def spread(v: Long): Long = {
      var x = v & 0x7FFFFFFFL
      x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x << 2)) & 0x3333333333333333L
      (x | (x << 1)) & 0x5555555555555555L
    }
    spread(a) | (spread(b) << 1)
  }

  test("zorder64 matches bit-by-bit Morton interleave on random and edge pairs") {
    val rnd = new scala.util.Random(75)
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0x7FFFFFFFL, 0x7FFFFFFFL),
      (0x7FFFFFFFL, 0L), (0L, 0x7FFFFFFFL)) ++
      Seq.fill(300)((rnd.nextLong().abs & 0x7FFFFFFFL, rnd.nextLong().abs & 0x7FFFFFFFL))
    val out = pairs.toDF("a", "b")
      .withColumn("z", LayoutOps.zorder64($"a", $"b"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (a, b, z) =>
      assert(z == mortonRef(a, b), s"($a, $b)")
      assert(z >= 0L)
    }
    // bit-level decode round-trip on one nontrivial pair
    val (a0, b0) = (0x12345678L, 0x0EDCBA98L)
    val z0 = mortonRef(a0, b0)
    val backA = (0 until 31).map(i => ((z0 >> (2 * i)) & 1L) << i).reduce(_ | _)
    val backB = (0 until 31).map(i => ((z0 >> (2 * i + 1)) & 1L) << i).reduce(_ | _)
    assert(backA == a0 && backB == b0)
  }

  test("z-ordered files prune a two-dimensional box; unclustered files do not") {
    // 64×64 grid of (x, y) points, 16 output files each way. The box
    // x<8 ∧ y<8 is one contiguous z-range (the first 1/64 of the curve):
    // almost every z-range-partitioned file can be skipped on min/max
    // stats, while round-robin files all span the full key space.
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = grid.toDF("x", "y").withColumn("z", LayoutOps.zorder64($"x", $"y"))
    val base = TestSpark.scratch("zorder-layout")

    df.repartitionByRange(16, $"z").sortWithinPartitions($"z")
      .write.mode("overwrite").parquet(s"$base/zsorted")
    df.repartition(16)
      .write.mode("overwrite").parquet(s"$base/roundrobin")

    // per-file min/max stats — what a lake format's data skipping reads
    def touchedFiles(path: String): (Long, Long) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min($"x").as("x0"), max($"x").as("x1"),
          min($"y").as("y0"), max($"y").as("y1"))
        .collect()
      val touched = stats.count(r =>
        r.getAs[Long]("x0") < 8 && r.getAs[Long]("y0") < 8)
      (touched.toLong, stats.length.toLong)
    }
    val (zTouched, zTotal) = touchedFiles(s"$base/zsorted")
    val (rrTouched, rrTotal) = touchedFiles(s"$base/roundrobin")
    assert(zTotal == 16 && rrTotal == 16)
    // the box is 1/64 of the space: 1 z-file must contain it entirely
    assert(zTouched <= 2, s"z-layout touched $zTouched of $zTotal files")
    assert(rrTouched >= 12, s"round-robin touched only $rrTouched of $rrTotal files")
  }
  test("compaction planner: files join the bin of their start offset; oversized files overflow alone") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("compaction-docs")
    // target 20000; source s: sizes 15000,10000,10000,30000,5000 ->
    // start offsets 0,15000,25000,35000,65000 -> bins 0,0,1,1,3
    // (bin 2 is skipped because file 4 overflows bin 1 past it)
    Seq(
      (1L, "a", 15000L), (2L, "a", 10000L), (3L, "a", 10000L),
      (4L, "a", 30000L), (5L, "a", 5000L),
      (6L, "b", 100L))
      .toDF("doc_id", "source", "n_chars")
      .withColumn("text", lit("t")).withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.LayoutOps.q101CompactionPlan(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    assert(out === List(
      ("a", 0L, 2L, 25000L, 1L, 2L),
      ("a", 1L, 2L, 40000L, 3L, 4L),
      ("a", 3L, 1L, 5000L, 5L, 5L),
      ("b", 0L, 1L, 100L, 6L, 6L)))
  }

  test("copy-on-write planner: touched files rewrite whole, total row sums the amplification") {
    val dir = TestSpark.scratch("cow-orders")
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // file 0 (keys < 512): one changed row drags all 3 into the rewrite;
    // file 1 (512..1023): untouched → rewrites nothing; file 2 (1024..):
    // a 1-row file fully rewritten. Week boundary dates are inclusive.
    Seq(
      (1L, d("1996-03-01")), (2L, d("1995-01-01")), (3L, d("1997-12-31")),
      (512L, d("1995-06-01")), (513L, d("1996-03-08")), // day AFTER the window
      (514L, d("1996-02-29")), (515L, d("1994-01-01")), // day BEFORE the window
      (1024L, d("1996-03-07"))) // last day, inclusive
      .toDF("o_orderkey", "o_orderdate")
      .withColumn("o_custkey", lit(1L))
      .withColumn("o_totalprice", lit(1.0))
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = LayoutOps.q134CowPlan(spark, dir)
      .as[(Option[Long], Long, Long, Long)].collect().toList
    assert(out === List(
      (Some(0L), 3L, 1L, 3L),
      (Some(1L), 4L, 0L, 0L),
      (Some(2L), 1L, 1L, 1L),
      (None, 8L, 2L, 4L))) // write amplification: 4 rewritten / 2 changed
  }

  test("q149 zone maps: partitioned layout scans strictly less, matches agree") {
    val rows = LayoutOps.q149ZonemapPrune(spark, TestSpark.sf).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    val part = rows("date_partitioned")
    val ins = rows("insert_order")
    // both layouts hold the same rows and find the same matches
    assert(part.getAs[Long]("rows_total") == ins.getAs[Long]("rows_total"))
    assert(part.getAs[Long]("rows_matching") == ins.getAs[Long]("rows_matching"))
    assert(part.getAs[Long]("rows_matching") > 0)
    // pruning can only skip non-matching rows, never matches
    rows.values.foreach { r =>
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matching"))
      assert(r.getAs[Long]("files_scanned") <= r.getAs[Long]("n_files"))
    }
    // the point of the layout: the partitioned scan fraction is far smaller
    assert(part.getAs[Double]("scan_fraction") < ins.getAs[Double]("scan_fraction") / 10)
  }
}
