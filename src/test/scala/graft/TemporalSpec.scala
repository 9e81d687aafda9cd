package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.lit
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

  test("batch sessionization: exact 30-minute gap continues, a second more splits") {
    val dir = TestSpark.scratch("sessionize-batch")
    def ns(min: Long): Long = min * 60000L * 1000000L // driver fixtures carry nanos
    val rows = Seq(
      (1L, 7L, ns(0), 1.0),   // session 1
      (2L, 7L, ns(30), 2.0),  // exactly 30 min later → same session
      (3L, 7L, ns(61), 3.0),  // 31 min later → new session
      (4L, 8L, ns(5), 4.0)    // other user → own session
    ).toDF("event_id", "user_id", "ts", "value")
      .withColumn("event_type", lit("click"))
      .withColumn("props", lit("{}"))
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = TemporalOps.q46Sessionize(spark, dir)
      .select($"user_id", $"session_idx", $"n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((7L, 1L, 2L), (7L, 2L, 1L), (8L, 1L, 1L)))
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

  test("dedupFirstInWindow keeps the earliest row per key and bucket, ties by id") {
    // 300 s buckets: [0,300) and [300,600). user 1 has three rows in the
    // first bucket (two tied at t=10) and one in the second; user 2 is
    // untouched in its own bucket.
    def sec(s: Long) = new java.sql.Timestamp(s * 1000)
    val df = Seq(
      (5L, 1L, sec(10)),  // tie at t=10 → lower event_id wins
      (4L, 1L, sec(10)),
      (6L, 1L, sec(299)), // same bucket → dropped
      (7L, 1L, sec(300)), // next bucket boundary → kept
      (8L, 2L, sec(10))   // other key → kept
    ).toDF("event_id", "user_id", "ts")
    val kept = TemporalOps.dedupFirstInWindow(
        df, Seq("user_id"), "ts", "event_id", 300)
      .select($"event_id").as[Long].collect().toSet
    assert(kept == Set(4L, 7L, 8L))
  }
}
