package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupOps

/** Direction safety of q178's runtime verify-skip bar (r13 verdict order
  * 3): the bar derived from a calibration frame may RAISE the fast-accept
  * threshold when a bin at-or-above the floor measures bad, but can never
  * sink below the vetted floor — and a miscalibrated high bin must push
  * its pairs onto the exact-verify path end to end.
  */
class CalibratedBarSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bins(rows: (Long, Long, Long)*) =
    rows.toDF("est16", "sum_inter", "sum_union")

  private def barOf(cal: org.apache.spark.sql.DataFrame): Long =
    DedupOps.fastAcceptBar(cal).collect().head.getAs[Long]("bar")

  test("all bins above the floor pass → bar stays at the floor") {
    // act = 0.9 everywhere ≥ 13
    assert(barOf(bins((13L, 9L, 10L), (14L, 9L, 10L), (16L, 10L, 10L))) == 13L)
  }

  test("a failing bin ≥ the floor raises the bar one past it") {
    // bin 14 reads act 0.55 < 0.6 → bar = 15 (13 passes; 15/16 pass)
    assert(barOf(bins(
      (13L, 9L, 10L), (14L, 11L, 20L), (15L, 9L, 10L), (16L, 10L, 10L))) == 15L)
  }

  test("the highest failing bin wins even when a higher bin passes below it") {
    // bins 13 AND 15 fail → bar = 16, not 14 (contiguous-safe rule)
    assert(barOf(bins(
      (13L, 1L, 10L), (14L, 9L, 10L), (15L, 5L, 10L), (16L, 10L, 10L))) == 16L)
  }

  test("failing bins BELOW the floor never move the bar (they verify exactly anyway)") {
    assert(barOf(bins((5L, 1L, 10L), (11L, 2L, 10L), (14L, 9L, 10L))) == 13L)
  }

  test("empty calibration → the floor (no evidence cannot widen the fast path)") {
    assert(barOf(bins()) == 13L)
  }

  test("the margin is part of the rule: act in [0.5, 0.6) fails its bin") {
    // act = 0.55 clears the keep threshold but not the margin → fail
    assert(barOf(bins((14L, 55L, 100L))) == 15L)
    // act exactly 0.6 passes (rule is strict-less-than the shared literal)
    assert(barOf(bins((14L, 60L, 100L))) == 13L)
  }

  test("end to end: a planted miscalibrated bin flips its pairs from sketch to verified") {
    // two exact copies → their pair agrees on all 16 lanes
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, base, "en", "src", 1L),
      (1L, base, "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val sh = DedupOps.shingledFrom(docs)
    // default calibration: bar at the floor → the pair rides the sketch path
    val fast = DedupOps.calibratedDedup(sh).collect().toSeq
    assert(fast.size == 1 && fast.head.getAs[String]("path") == "sketch")
    assert(fast.head.isNullAt(fast.head.fieldIndex("jaccard")))
    // planted miscalibration: "bin 16 measured act 0.1" → bar = 17, NO
    // fast accepts exist; the same pair must re-verify exactly (J = 1.0
    // here, so it survives — as 'verified', shingles actually read)
    val bad = bins((16L, 1L, 10L))
    val strict = DedupOps.calibratedDedup(sh, Some(bad)).collect().toSeq
    assert(strict.size == 1)
    assert(strict.head.getAs[String]("path") == "verified")
    assert(strict.head.getAs[Double]("jaccard") == 1.0)
  }

  test("end to end: calibration claiming low bins are great cannot lower the bar") {
    // docs whose pair lands BELOW the floor (est16 = 11 — the pinned
    // plant from the q178 verified-band spec) stay on the verify path
    // even when the calibration says bin 11 is perfect
    def variant(changed: Set[Int]): String =
      (1 to 60).map(i => if (changed(i)) s"chg$i" else s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, variant(Set.empty[Int]), "en", "src", 1L),
      (1L, variant(Set(1, 5)), "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val sh = DedupOps.shingledFrom(docs)
    val rosy = bins((11L, 10L, 10L)) // "bin 11 measured act 1.0"
    val rows = DedupOps.calibratedDedup(sh, Some(rosy)).collect().toSeq
    assert(rows.size == 1)
    assert(rows.head.getAs[Long]("est16") == 11L)
    assert(rows.head.getAs[String]("path") == "verified",
      "a sub-floor pair must never be sketch-accepted, whatever the calibration claims")
  }
}
