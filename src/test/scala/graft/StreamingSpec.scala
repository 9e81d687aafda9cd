package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventsStreaming
import graft.streaming.EventsStreaming.{Event, UserSession}

/** Structured Streaming specs: the incremental hourly aggregate must agree
  * with its batch twin, and the stateful sessionizer must close sessions
  * on gap boundaries only.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming hourly aggregate equals the batch twin over the events fixture") {
    // file-stream sources need a directory: stage the fixture file into one
    val dir = TestSpark.scratch("stream-in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val streamed = EventsStreaming.runToMemory(
      EventsStreaming.hourlyAgg(EventsStreaming.readEvents(spark, dir)),
      "hourly_stream", OutputMode.Complete())
      .select($"hour", $"event_type", $"n_events", $"total_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val batch = operators.Relational.q11EventsHourly(spark, TestSpark.sf)
      .select($"hour", $"event_type", $"n_events", $"total_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("streaming hopping window equals the batch twin's event counts") {
    val dir = TestSpark.scratch("stream-hop")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val streamed = EventsStreaming.runToMemory(
      EventsStreaming.hoppingAgg(EventsStreaming.readEvents(spark, dir)),
      "hopping_stream", OutputMode.Complete())
      .as[(Long, Long)].collect().toSet
    val batch = operators.TemporalOps.q97HoppingWindow(spark, TestSpark.sf)
      .select($"win_start", $"n_events")
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming throttle admits exactly the batch keep-K set per (user, hour)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    def ev(id: Long, user: Long, sec: Long) =
      Event(id, new java.sql.Timestamp(sec * 1000), user, "click", 0.0)
    // user 1 hour 0: five events → first 3 by (ts, id) kept, 4/5 shed;
    // user 1 hour 1: fresh quota; user 2 hour 0: two events, all kept.
    // Events 10/11 share a timestamp — the id tie-break decides.
    val all = Seq(
      ev(10, 1, 100), ev(11, 1, 100), ev(12, 1, 200), ev(13, 1, 300),
      ev(14, 1, 400),
      ev(20, 1, 3700), ev(21, 1, 3800), ev(22, 1, 3900), ev(23, 1, 3950),
      ev(30, 2, 500), ev(31, 2, 600))
    source.addData(all: _*)
    val q = EventsStreaming.throttle(source.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("throttled").start()
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("throttled").as[Event].collect().map(_.event_id).toSet
    assert(kept === Set(10L, 11L, 12L, 20L, 21L, 22L, 30L, 31L))
  }

  test("streaming CDC apply converges to the q118 batch snapshot, across multiple batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventsStreaming.{Change, CdcRow}
    val dir = TestSpark.scratch("cdc-stream-orders")
    def d(day: Int) = java.sql.Timestamp.valueOf(f"1995-01-$day%02d 00:00:00")
    // same fixture as TemporalSpec's CDC test — the batch twin is the oracle
    val rows = Seq(
      (1L, 1L, d(1), 100.0, "O"), (2L, 1L, d(2), 200.0, "F"),
      (3L, 2L, d(1), 300.0, "F"), (4L, 2L, d(2), 400.0, "O"),
      (5L, 3L, d(1), 500.0, "O"),
      (6L, 4L, d(1), 600.0, "O"), (7L, 4L, d(1), 700.0, "O"))
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
      "o_orderstatus")
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    def chg(r: (Long, Long, java.sql.Timestamp, Double, String)) =
      Change(r._1, r._2, r._3, if (r._5 == "F") "D" else "U",
        math.round(r._4 * 100))
    val source = MemoryStream[Change]
    val q = EventsStreaming.cdcApply(source.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("cdc_stream").start()
    // deliver OUT OF ORDER across two batches: the day-2 changes first,
    // then the day-1 ones — recency-by-(date, key) must not regress
    source.addData(rows.filter(_._3 == d(2)).map(chg): _*)
    q.processAllAvailable()
    source.addData(rows.filter(_._3 == d(1)).map(chg): _*)
    q.processAllAvailable()
    q.stop()
    // last emitted row per key = the maintained snapshot (minus deletes)
    // n_changes is monotone per key, so the max-n row IS the latest
    // emission regardless of sink row order
    val snapshot = spark.table("cdc_stream").as[CdcRow].collect()
      .groupBy(_.o_custkey).map { case (_, v) => v.maxBy(_.n_changes) }
      .toList
      // cust 1's last emission predates its delete: simulate a consumer
      // that applies tombstones by dropping keys whose FINAL state is
      // deleted — i.e. keys absent from the final batch's emissions are
      // resolved against the batch twin below
      .map(r => (r.o_custkey, r.current_price_cents, r.as_of, r.n_changes))
      .sortBy(_._1)
    val batch = graft.operators.TemporalOps.q118CdcApply(spark, dir)
      .as[(Long, Long, java.sql.Timestamp, Long)].collect().toList
    // every key the batch snapshot keeps must match the stream's last
    // emission exactly
    val streamByKey = snapshot.map(r => r._1 -> r).toMap
    batch.foreach { b => assert(streamByKey(b._1) === b) }
    // and the deleted key (cust 1) must have emitted nothing after its
    // delete arrived in batch 1: its last emission is from batch 2's
    // out-of-order day-1 upsert REJECTION — i.e. no emission with the
    // day-1 price
    assert(!snapshot.exists(r => r._1 == 1L && r._2 == 10000L))
  }

  test("cdc tombstone TTL drops the delete marker; default keeps it forever") {
    // drives the state transition directly via TestGroupState — a live
    // ProcessingTimeTimeout query busy-loops timeout-check microbatches
    // and starves processAllAvailable in this harness
    import graft.streaming.EventsStreaming.{cdcUpdate, CdcState, Change}
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    def day(n: Int) = java.sql.Timestamp.valueOf(f"2024-01-$n%02d 00:00:00")
    val ttl = Some(60000L)

    // delete arrives → tombstone stored, TTL armed, nothing emitted
    val s1 = TestGroupState.create[CdcState](Optional.empty(),
      GroupStateTimeout.ProcessingTimeTimeout, 1000L, Optional.empty(), hasTimedOut = false)
    assert(cdcUpdate(ttl)(10L, Iterator(Change(2L, 10L, day(2), "D", 0L)), s1)
      .isEmpty)
    assert(s1.get.op == "D" && s1.getTimeoutTimestampMs.get == 61000L)

    // TTL expires → tombstone removed (state bounded)
    val s2 = TestGroupState.create[CdcState](Optional.of(s1.get),
      GroupStateTimeout.ProcessingTimeTimeout, 62000L, Optional.empty(), hasTimedOut = true)
    assert(cdcUpdate(ttl)(10L, Iterator.empty, s2).isEmpty)
    assert(s2.isRemoved)

    // late OLDER upsert after expiry re-creates the key — the
    // documented resurrection window is the price of bounded state
    val s3 = TestGroupState.create[CdcState](Optional.empty(),
      GroupStateTimeout.ProcessingTimeTimeout, 63000L, Optional.empty(), hasTimedOut = false)
    val res = cdcUpdate(ttl)(10L,
      Iterator(Change(1L, 10L, day(1), "U", 100L)), s3).toList
    assert(res.map(r => (r.o_custkey, r.current_price_cents)) ==
      List((10L, 100L)))

    // WITHOUT a TTL the tombstone never times out and keeps rejecting
    // the same late older upsert — absolute resurrection guard
    val k1 = TestGroupState.create[CdcState](Optional.empty(),
      GroupStateTimeout.NoTimeout, 1000L, Optional.empty(), hasTimedOut = false)
    assert(cdcUpdate(None)(10L, Iterator(Change(2L, 10L, day(2), "D", 0L)), k1)
      .isEmpty)
    assert(!k1.getTimeoutTimestampMs.isPresent)
    val k2 = TestGroupState.create[CdcState](Optional.of(k1.get),
      GroupStateTimeout.NoTimeout, 999999000L, Optional.empty(), hasTimedOut = false)
    assert(cdcUpdate(None)(10L,
      Iterator(Change(1L, 10L, day(1), "U", 100L)), k2).isEmpty)
    assert(k2.get.op == "D")
  }

  test("streaming dedup drops watermark-window duplicates down to the distinct set") {
    val dir = TestSpark.scratch("stream-dedup")
    // two copies of the fixture → every event_id duplicated
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/b.parquet"))
    val out = EventsStreaming.runToMemory(
      EventsStreaming.dedupWithinWatermark(EventsStreaming.readEvents(spark, dir)),
      "dedup_stream")
    val distinctIds = Tables(spark, TestSpark.sf).events.select("event_id").distinct().count()
    assert(out.count() == distinctIds)
  }

  test("stream-stream interval join matches its batch twin") {
    val dir = TestSpark.scratch("stream-join")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val streamed = EventsStreaming.runToMemory(
      EventsStreaming.clickSignupJoin(EventsStreaming.readEvents(spark, dir)),
      "join_stream")
      .as[(Long, Long, Long)].collect().toSet
    val ev = Tables(spark, TestSpark.sf).events
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts"))
    val signups = ev.filter($"event_type" === "signup")
      .select($"event_id".as("signup_id"), $"user_id".as("su"), $"ts".as("signup_ts"))
    val batch = clicks.join(signups,
        $"user_id" === $"su" &&
          $"signup_ts" >= $"click_ts" - expr("INTERVAL 1 HOUR") &&
          $"signup_ts" <= $"click_ts")
      .select($"click_id", $"user_id", $"signup_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  // fixture minutes sit on a year-2000 base: a minute-0 event is epoch 0,
  // which the INITIAL watermark (also 0) already classifies as late and
  // silently drops before the stateful operator
  private val SessBase = 946684800000L / 60000 // 2000-01-01 in minutes

  test("streaming sessionizer agrees with the q46 batch twin on closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    def ev(id: Long, user: Long, minute: Long, v: Double) =
      Event(id, new java.sql.Timestamp((SessBase + minute) * 60000), user, "click", v)
    // user 7: three sessions (two gap-closed, one watermark-timed-out);
    // user 8: two sessions (one gap-closed, one open inside the horizon)
    val all = Seq(
      ev(1, 7, 0, 1.0), ev(2, 7, 10, 2.0), ev(3, 7, 41, 3.0),  // 31-min gap splits
      ev(4, 7, 200, 4.0),
      ev(5, 8, 0, 5.0), ev(6, 8, 30, 6.0),                     // exactly 30 → same
      ev(7, 8, 500, 7.0))
    source.addData(all: _*)
    val q = EventsStreaming.sessionize(source.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions_eq").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions_eq").as[UserSession].collect()
      .map(s => (s.user_id, s.start.getTime, s.end.getTime, s.n_events)).toSet
    // batch twin over the same rows written as a nanos events fixture
    val dir = TestSpark.scratch("sessionize-eq")
    all.map(e => (e.event_id, e.user_id, e.ts.getTime * 1000000L, e.value))
      .toDF("event_id", "user_id", "ts", "value")
      .withColumn("event_type", lit("click")).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batchAll = operators.TemporalOps.q46Sessionize(spark, dir)
      .select($"user_id", $"started", $"ended", $"n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
      .map(r => (r._1, r._2.getTime, r._3.getTime, r._4)).toSet
    // streaming emits gap-closed sessions PLUS event-time-timed-out ones:
    // the final watermark is max event time − 1 h, and any open session
    // whose end + gap is at or before it has been closed and its state
    // removed. Only sessions still inside the horizon are absent.
    val wmFinal = all.map(_.ts.getTime).max - 3600 * 1000L
    val gapMs = 30 * 60 * 1000L
    val lastPerUser = batchAll.groupBy(_._1).values.map(_.maxBy(_._2)).toSet
    val stillOpen = lastPerUser.filter(s => s._3 + gapMs > wmFinal)
    assert(streamed == batchAll -- stillOpen)
    // the fixture exercises BOTH absences and timeouts: user 8's last
    // session stays open, user 7's last session timed out and emitted
    assert(stillOpen.map(_._1) == Set(8L))
    assert(streamed.exists(s => s._1 == 7L && s._4 == 1L &&
      s._2 == (SessBase + 200) * 60000))
    assert(streamed.nonEmpty)
  }

  test("streaming LSH near-dup suppression matches the batch keep-first twin") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, java.sql.Timestamp, String)]
    def doc(id: Long, minute: Long, text: String) =
      (id, new java.sql.Timestamp((SessBase + minute) * 60000), text)
    val a = "the quick brown fox jumps over the lazy dog near the old river bank"
    val b = "completely different words entirely unrelated to anything seen before today"
    val c = "a third corpus entry sharing no trigrams with its two predecessors at all"
    val main = Seq(
      doc(1, 0, a),
      doc(2, 1, a), // exact dup of 1 → every band collides → suppressed
      doc(3, 2, b),
      doc(4, 3, a), // dup again → suppressed
      doc(5, 4, c),
      doc(6, 5, "hi")) // <3 words: no shingles, must pass unconditionally
    // far-future doc pushes the final watermark past main's window so the
    // windowed count emits; its own window never closes (absent by design)
    val flush = doc(99, 60 * 24 * 20, "late watermark flush document with enough words")
    source.addData(main: _*)
    source.addData(flush)
    val streamed = EventsStreaming.runToMemory(
      EventsStreaming.lshDedupWithinWatermark(source.toDF().toDF("doc_id", "ts", "text")),
      "lsh_dedup_stream")
      .select($"doc_id").as[Long].collect().toSet
    val cutoff = flush._2.getTime - 2 * 3600 * 1000L
    val batch = operators.DedupOps.lshDedupKeepFirst(
      (main :+ flush).toDF("doc_id", "ts", "text"), portable = false)
      .filter($"ts" < new java.sql.Timestamp(cutoff))
      .select($"doc_id").as[Long].collect().toSet
    assert(streamed == batch)
    assert(streamed == Set(1L, 3L, 5L, 6L)) // dups suppressed; uniques + short doc kept
  }

  test("sessionize closes sessions only across the inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    def ev(id: Long, minute: Long) =
      Event(id, new java.sql.Timestamp((SessBase + minute) * 60000), 7L, "click", 1.0)
    // session 1: minutes 0,10,20; gap > 30min; session 2: minutes 100,105
    source.addData(ev(1, 0), ev(2, 10), ev(3, 20))
    source.addData(ev(4, 100), ev(5, 105))
    val out = EventsStreaming.sessionize(source.toDS())
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions").start()
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sessions").as[UserSession].collect()
    // only the first session is closed; the second stays open in state
    // (its end + gap is beyond the final watermark of maxTs − 1 h, so no
    // event-time timeout fires for it)
    assert(sessions.length == 1)
    val s = sessions.head
    assert(s.n_events == 3 && s.total_value == 3.0)
    assert(s.start.getTime == SessBase * 60000 && s.end.getTime == (SessBase + 20) * 60000)
  }

  test("streaming running balance equals the batch Lindley windows, drops a late event") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventsStreaming.UserBalance
    val source = MemoryStream[Event]
    def ev(id: Long, user: Long, sec: Long, typ: String, v: Double) =
      Event(id, new java.sql.Timestamp(sec * 1000), user, typ, v)
    val b1 = Seq(
      ev(1, 1, 100, "purchase", 5.00), // +500 → bal 500
      ev(2, 1, 200, "click", 3.00),    // −300 → 200
      ev(3, 2, 100, "view", 4.00))     // −400 → 0: 400 lost, stockout
    val b2 = Seq(
      ev(4, 1, 300, "error", 4.00),     // −400 → 0: 200 lost, stockout
      ev(5, 1, 400, "purchase", 10.00), // +1000 → 1000
      ev(6, 1, 50, "purchase", 99.00),  // LATE (before user 1's last) → dropped
      ev(7, 2, 150, "purchase", 2.50))  // +250 → 250
    val q = EventsStreaming.runningBalance(source.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("balance_stream").start()
    source.addData(b1: _*); q.processAllAvailable()
    source.addData(b2: _*); q.processAllAvailable()
    q.stop()
    // Update mode re-emits per batch; the latest summary per user is the
    // one with the highest applied-event count
    val latest = spark.table("balance_stream").as[UserBalance].collect()
      .groupBy(_.user_id).map(_._2.maxBy(_.n_events))
      .map(b => (b.user_id, b.n_events, b.end_balance, b.peak_balance,
        b.lost_demand, b.stockouts)).toSet
    // batch twin: the SAME applied (in-order) events through the q139
    // Lindley windows — user→supplier, second→shipdate, id→orderkey
    val applied = Seq(
      (1L, 100L, 1L, 1L, 500L), (1L, 200L, 2L, 1L, -300L),
      (1L, 300L, 4L, 1L, -400L), (1L, 400L, 5L, 1L, 1000L),
      (2L, 100L, 3L, 1L, -400L), (2L, 150L, 7L, 1L, 250L))
      .toDF("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "delta")
    val batch = operators.TemporalOps.clampedBalance(applied)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(latest == batch)
    assert(latest == Set(
      (1L, 4L, 1000L, 1000L, 200L, 1L),
      (2L, 2L, 250L, 250L, 400L, 1L)))
  }

  test("streaming CUSUM alarm matches a hand fold and pages on threshold crossing") {
    import EventsStreaming.{CusumAlarm, DayCount}
    implicit val sqlCtx = spark.sqlContext
    def d(n: Int) = java.sql.Date.valueOf(f"2024-02-$n%02d")
    val source = MemoryStream[DayCount]
    // ref = 10/day, threshold = 15: type "a" runs hot (+10/day) from day 3
    // and must alarm once the excess accumulates past 15; "b" stays at ref
    val b1 = Seq(DayCount("a", d(1), 10), DayCount("a", d(2), 12),
      DayCount("b", d(1), 10))
    val b2 = Seq(DayCount("a", d(3), 20), DayCount("a", d(4), 20),
      DayCount("a", d(2), 99), // late replay of day 2 -> dropped
      DayCount("b", d(2), 10))
    val q = EventsStreaming.cusumAlarm(source.toDS(), ref = 10L, threshold = 15L)
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .format("memory").queryName("cusum_stream").start()
    source.addData(b1: _*); q.processAllAvailable()
    val mid = spark.table("cusum_stream").as[CusumAlarm].collect()
      .filter(_.event_type == "a").maxBy(_.days_seen)
    assert(mid.cusum == 2L && !mid.alarm) // (10-10)+(12-10)
    source.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val fin = spark.table("cusum_stream").as[CusumAlarm].collect()
      .groupBy(_.event_type).map { case (t, rows) => t -> rows.maxBy(_.days_seen) }
    // hand fold for "a": S = 0, 2, 12, 22 across days 1-4 (late replay
    // dropped) -> best |S| = 22 on day 4, over the 15 threshold
    assert(fin("a").days_seen == 4L && fin("a").cusum == 22L)
    assert(fin("a").best_abs == 22L)
    assert(fin("a").best_day == "2024-02-04" && fin("a").alarm)
    assert(fin("b").cusum == 0L && !fin("b").alarm)
  }

  // ---- q188 incremental decontamination streaming twins (r15 order 5) ----
  // Shared fixture, q188's id convention: doc_id < 5 = old benchmark
  // panel, 5..9 = newly-landing delta panel, >= 10 = corpus.
  //  - delta doc 5 "foo bar baz qux"    touches corpus doc 10 only
  //  - delta doc 6 is entirely KNOWN grams (must contribute nothing)
  //  - delta doc 7 "red green blue cyan" touches corpus doc 13 only
  //  - corpus doc 11 overlaps the OLD panel only (ledger unchanged → no row)
  //  - corpus doc 12 overlaps nothing
  private val oldPanelDocs = Seq(
    0L -> "alpha beta gamma delta", 1L -> "p1", 2L -> "p2", 3L -> "p3",
    4L -> "p4")
  private val deltaPanelDocs = Seq(
    5L -> "foo bar baz qux", 6L -> "alpha beta gamma",
    7L -> "red green blue cyan", 8L -> "p8", 9L -> "p9")
  private val corpusDocs = Seq(
    10L -> "intro1 intro2 intro3 foo bar baz qux tail1 tail2 tail3",
    11L -> "alpha beta gamma delta plus more words here fill1",
    12L -> "completely neutral text sharing nothing with any panel",
    13L -> "lead1 lead2 red green blue cyan end1 end2 end3")
  // hand-derived expected ledgers (DecontamN=3, MinFragTokens=3):
  //  doc 10: delta island [4,7] → excised 4; head frag 3 + tail 3 kept
  //  doc 13: delta island [3,6] → excised 4; head frag 2 drops, tail 3 kept
  private val expectedDiffs = Set(
    (10L, 0L, 4L, 4L, 10L, 6L),
    (13L, 0L, 4L, 4L, 9L, 3L))

  test("streaming decontam candidate discovery emits exactly the delta-touched corpus docs per closed window") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, java.sql.Timestamp, String)]
    def doc(id: Long, minute: Long, text: String) =
      (id, new java.sql.Timestamp((SessBase + minute) * 60000), text)
    source.addData(deltaPanelDocs.zipWithIndex.map { case ((id, t), i) =>
      doc(id, i.toLong, t)
    }: _*)
    // far-future flush (unique words, touches nothing) closes the window
    source.addData(doc(99, 60 * 24 * 20, "zq1 zq2 zq3 zq4"))
    val corpus = corpusDocs.toDF("doc_id", "text")
    val known = operators.DedupOps.windowGrams(
      oldPanelDocs.toDF("doc_id", "text")
        .select($"doc_id", split($"text", " ").as("t")),
      operators.DedupOps.DecontamN).select($"g").distinct()
    val got = EventsStreaming.runToMemory(
      EventsStreaming.decontamTouched(
        source.toDF().toDF("doc_id", "ts", "text"), corpus, known),
      "decontam_touched")
      .select($"doc_id", $"n_hits").as[(Long, Long)].collect().toSet
    // doc 6's grams are all known (anti-joined away); docs 11/12 untouched
    // by the delta; 2 novel grams hit each touched doc once
    assert(got == Set((10L, 2L), (13L, 2L)))
  }

  test("streaming incremental decontam loop equals batch q188 on a single delivery") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    source.addData(deltaPanelDocs: _*)
    val allDocs = (oldPanelDocs ++ deltaPanelDocs ++ corpusDocs)
      .toDF("doc_id", "text")
    val corpus = corpusDocs.toDF("doc_id", "text")
    val known = operators.DedupOps.windowGrams(
      oldPanelDocs.toDF("doc_id", "text")
        .select($"doc_id", split($"text", " ").as("t")),
      operators.DedupOps.DecontamN).select($"g").distinct()
    val got = collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long)]
    EventsStreaming.runIncrementalDecontam(
      source.toDF().toDF("doc_id", "text"), corpus, known,
      TestSpark.scratch("decontam-ckpt-1"),
      (out, _) => got ++= out
        .as[(Long, Long, Long, Long, Long, Long)].collect())
    assert(got.toSet == expectedDiffs)
    val batch = operators.DedupOps.incrementalDecontam(allDocs)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got.toSet == batch)
  }

  test("decontamTouched state is watermark-bounded: closed windows leave the store (O(open-window), not O(stream)) (r16 order 6)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, java.sql.Timestamp, String)]
    def doc(id: Long, minute: Long, text: String) =
      (id, new java.sql.Timestamp((SessBase + minute) * 60000), text)
    source.addData(deltaPanelDocs.zipWithIndex.map { case ((id, t), i) =>
      doc(id, i.toLong, t)
    }: _*)
    source.addData(doc(99, 60 * 24 * 20, "zq1 zq2 zq3 zq4"))
    val corpus = corpusDocs.toDF("doc_id", "text")
    val known = operators.DedupOps.windowGrams(
      oldPanelDocs.toDF("doc_id", "text")
        .select($"doc_id", split($"text", " ").as("t")),
      operators.DedupOps.DecontamN).select($"g").distinct()
    val q = EventsStreaming.decontamTouched(
      source.toDF().toDF("doc_id", "ts", "text"), corpus, known)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("decontam_state")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val stateTotals = q.recentProgress.toSeq
      .flatMap(_.stateOperators.map(_.numRowsTotal))
    // mid-stream the (window × touched-doc) aggregation really held the
    // first window's two groups...
    assert(stateTotals.max >= 2)
    // ...and the far-future flush's watermark advance EVICTED them: the
    // final snapshot holds at most the still-open flush window's group —
    // state tracks open windows, not stream history
    assert(stateTotals.last <= 1)
    // eviction didn't eat the output
    val got = spark.table("decontam_state")
      .select($"doc_id", $"n_hits").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 2L), (13L, 2L)))
  }

  test("incremental decontam RESUMES the persisted ledger across a restart (ADVICE r16)") {
    // run 1 lands delta docs {5, 6} on a file source; run 2 restarts on
    // the SAME checkpoint with doc 15 REPEATING run 1's text plus the
    // novel doc 7. Under the pre-r17 driver-side-var ledger, run 2 reset
    // to knownInit and re-flagged doc 10 (a second (10, ...) diff row);
    // the persisted ledger must treat doc 15's grams as already known.
    val in = TestSpark.scratch("decontam-restart-in")
    val ckpt = TestSpark.scratch("decontam-restart-ckpt")
    val corpus = corpusDocs.toDF("doc_id", "text")
    val known = operators.DedupOps.windowGrams(
      oldPanelDocs.toDF("doc_id", "text")
        .select($"doc_id", split($"text", " ").as("t")),
      operators.DedupOps.DecontamN).select($"g").distinct()
    def stream() = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(in)
    def run(): Set[(Long, Long, Long, Long, Long, Long)] = {
      val got = collection.mutable
        .ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long)]
      EventsStreaming.runIncrementalDecontam(stream(), corpus, known, ckpt,
        (out, _) => got ++= out
          .as[(Long, Long, Long, Long, Long, Long)].collect())
      got.toSet
    }
    deltaPanelDocs.filter(_._1 <= 6).toDF("doc_id", "text")
      .write.mode("append").parquet(in)
    assert(run() == Set((10L, 0L, 4L, 4L, 10L, 6L)))
    (Seq(15L -> "foo bar baz qux") ++ deltaPanelDocs.filter(_._1 == 7))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    assert(run() == Set((13L, 0L, 4L, 4L, 9L, 3L)))
  }

  test("incremental decontam survives a crash BETWEEN ledger write and sink commit (r17 order 7)") {
    // the ugliest boundary: decontamBatchStep has already persisted
    // ledger 0 when the sink throws, so the streaming commit log never
    // advances. The restart must replay batch 0, re-derive the SAME
    // base (ids strictly < 0 → knownInit, ledger 0's own grams
    // excluded), and deliver the diff exactly once — no dropped batch,
    // no doubled rows, ledger still at one entry per batch.
    val in = TestSpark.scratch("decontam-crash-in")
    val ckpt = TestSpark.scratch("decontam-crash-ckpt")
    val corpus = corpusDocs.toDF("doc_id", "text")
    val known = operators.DedupOps.windowGrams(
      oldPanelDocs.toDF("doc_id", "text")
        .select($"doc_id", split($"text", " ").as("t")),
      operators.DedupOps.DecontamN).select($"g").distinct()
    def stream() = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(in)
    val got = collection.mutable
      .ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long)]
    var killed = false
    def sink(out: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val rows = out.as[(Long, Long, Long, Long, Long, Long)].collect()
      if (!killed) {
        killed = true
        throw new RuntimeException("injected crash after ledger write")
      }
      got ++= rows
    }
    deltaPanelDocs.filter(_._1 <= 6).toDF("doc_id", "text")
      .write.mode("append").parquet(in)
    // run 1 dies mid-batch: the ledger landed, the sink did not commit
    intercept[Exception] {
      EventsStreaming.runIncrementalDecontam(stream(), corpus, known, ckpt, sink)
    }
    assert(EventsStreaming.appliedLedgers(spark, ckpt) == Seq(0L))
    assert(got.isEmpty)
    // restart on the SAME checkpoint: batch 0 replays through the
    // idempotent step and the diff arrives exactly once
    EventsStreaming.runIncrementalDecontam(stream(), corpus, known, ckpt, sink)
    assert(got.toSet == Set((10L, 0L, 4L, 4L, 10L, 6L)))
    assert(got.size == 1)
    // a follow-up delivery repeating run-1 text still sees those grams
    // as known (the replayed ledger advanced correctly, not doubly)
    (Seq(15L -> "foo bar baz qux") ++ deltaPanelDocs.filter(_._1 == 7))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    got.clear()
    EventsStreaming.runIncrementalDecontam(stream(), corpus, known, ckpt, sink)
    assert(got.toSet == Set((13L, 0L, 4L, 4L, 9L, 3L)))
  }

  test("decontamBatchStep is idempotent per batch id (foreachBatch retry / crash after ledger write)") {
    val ckpt = TestSpark.scratch("decontam-retry-ckpt")
    val ctoks = corpusDocs.toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("t"))
    val known = operators.DedupOps.windowGrams(
      oldPanelDocs.toDF("doc_id", "text")
        .select($"doc_id", split($"text", " ").as("t")),
      operators.DedupOps.DecontamN).select($"g").distinct()
    val b0 = Seq(5L -> "foo bar baz qux").toDF("doc_id", "text")
    def step(b: org.apache.spark.sql.DataFrame, id: Long) =
      EventsStreaming.decontamBatchStep(ctoks, known, ckpt, b, id)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val first = step(b0, 0L)
    assert(first == Set((10L, 0L, 4L, 4L, 10L, 6L)))
    assert(EventsStreaming.appliedLedgers(spark, ckpt) == Seq(0L))
    // a RETRY of batch 0 fires after its ledger already landed: the base
    // derives from ids strictly BELOW 0 (i.e. knownInit, never the
    // advanced set — the r16-flagged silent-drop path) → same output,
    // ledger overwritten in place
    assert(step(b0, 0L) == first)
    assert(EventsStreaming.appliedLedgers(spark, ckpt) == Seq(0L))
    // the next batch repeats batch 0's text: every gram is in the
    // advanced ledger → empty diff, but the ledger still records id 1
    val b1 = Seq(15L -> "foo bar baz qux").toDF("doc_id", "text")
    assert(step(b1, 1L).isEmpty)
    assert(EventsStreaming.appliedLedgers(spark, ckpt) == Seq(0L, 1L))
    // ledger retention (ADVICE r17): batch 2 prunes everything below its
    // own base — only {base=1, 2} survive, bounding checkpoint growth at
    // two snapshots instead of O(batches)
    val b2 = Seq(16L -> "unrelated novel words entirely").toDF("doc_id", "text")
    step(b2, 2L): Unit
    assert(EventsStreaming.appliedLedgers(spark, ckpt) == Seq(1L, 2L))
    // a RETRY of batch 2 after the prune still derives its base (ledger
    // 1 was kept precisely because a retry reads max(id' < id)) and
    // leaves retention unchanged
    step(b2, 2L): Unit
    assert(EventsStreaming.appliedLedgers(spark, ckpt) == Seq(1L, 2L))
  }

  test("streaming incremental decontam composes across deliveries (disjoint deltas)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    // two landings; each batch advances the known-gram ledger, so the
    // concatenated outputs must equal the one-shot q188 answer (the
    // deltas touch disjoint corpus docs)
    source.addData(deltaPanelDocs.filter(_._1 <= 6): _*)
    source.addData(deltaPanelDocs.filter(_._1 > 6): _*)
    val corpus = corpusDocs.toDF("doc_id", "text")
    val known = operators.DedupOps.windowGrams(
      oldPanelDocs.toDF("doc_id", "text")
        .select($"doc_id", split($"text", " ").as("t")),
      operators.DedupOps.DecontamN).select($"g").distinct()
    val got = collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long)]
    EventsStreaming.runIncrementalDecontam(
      source.toDF().toDF("doc_id", "text"), corpus, known,
      TestSpark.scratch("decontam-ckpt-2"),
      (out, _) => got ++= out
        .as[(Long, Long, Long, Long, Long, Long)].collect())
    assert(got.toSet == expectedDiffs)
  }
}
