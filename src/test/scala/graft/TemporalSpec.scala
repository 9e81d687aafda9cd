package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TemporalOps

/** Edge semantics of the composed as-of join: equal-timestamp inclusion,
  * no-match nulls, per-key isolation, latest-wins.
  */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000)

  test("asofJoin picks latest right row at-or-before each left row, per key") {
    val left = Seq(
      (100L, 1L, ts(10)), // after r1, before r2 → r1
      (101L, 1L, ts(20)), // exactly at r2 → r2 (inclusive)
      (102L, 1L, ts(5)),  // before any right row → null
      (103L, 2L, ts(50)), // other key → its own right row only
      (104L, 3L, ts(50))  // key with no right rows → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (900L, 1L, ts(8)),
      (901L, 1L, ts(20)),
      (902L, 2L, ts(1))
    ).toDF("event_id", "user_id", "ts")
    val out = TemporalOps.asofJoin(left, right, "user_id", "ts", "ts",
        Map("event_id" -> "match_id"))
      .select($"event_id", $"match_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(100L).contains(900L))
    assert(out(101L).contains(901L))
    assert(out(102L).isEmpty)
    assert(out(103L).contains(902L))
    assert(out(104L).isEmpty)
  }

  test("asofJoin carries the matched row atomically and tie-breaks duplicate right ts") {
    val left = Seq((1L, 1L, ts(30))).toDF("event_id", "user_id", "ts")
    // matched right row (latest, highest tie-break) has a NULL payload:
    // it must NOT be back-filled from the older non-null row
    val right = Seq(
      (10L, 1L, ts(10), Option("old")),
      (20L, 1L, ts(20), Option.empty[String]),
      (21L, 1L, ts(20), Option.empty[String]) // duplicate (key, ts)
    ).toDF("rid", "user_id", "ts", "payload")
    val out = TemporalOps.asofJoin(left, right, "user_id", "ts", "ts",
        Map("rid" -> "match_id", "payload" -> "match_payload"))
      .select($"match_id", $"match_payload").as[(Long, Option[String])]
      .collect().toSeq
    // deterministic winner: max struct among the ts(20) duplicates → rid 21,
    // and its NULL payload stays NULL (no back-fill from rid 10's "old")
    assert(out == Seq((21L, None)))
  }

  test("banded range join plans as an equi hash join, never a nested loop") {
    val plan = TemporalOps.q44RangeJoin(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
    val rows = TemporalOps.q44RangeJoin(spark, TestSpark.sf)
    // band expansion must not duplicate signups
    assert(rows.groupBy("event_id").count().filter($"count" > 1).isEmpty)
  }
}
