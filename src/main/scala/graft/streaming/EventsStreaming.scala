package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events stream (extension beyond
  * the strictly-batch reference — SURVEY.md §2.9; the `events` fixture's
  * shape drives it).
  *
  * Design: the streaming pipelines are the SAME logical plans as their
  * batch twins in Relational (q11EventsHourly) — `readStream` swaps the
  * source, watermarks bound state, and the incremental engine takes care
  * of the rest. State size at scale is O(open windows × event types), not
  * O(stream), because the watermark lets Spark drop closed windows.
  */
object EventsStreaming {

  /** The long/nanos-at-rest schema of the legacy events fixture
    * (TIMESTAMP(NANOS) parquet — read as long, converted in-plan; see
    * graft.Tables.events). Newer fixture generations write plain
    * TIMESTAMP(MICROS), handled by the second branch of [[readEvents]].
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over a parquet directory of events. Streaming scans
    * need an explicit schema, so sniff the at-rest `ts` type with a cheap
    * batch footer read (driver-side metadata only, no data scan) and pick
    * the matching schema + conversion.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val atRest = spark.read.parquet(dir).schema
    atRest("ts").dataType match {
      case LongType =>
        spark.readStream
          .schema(eventsRawSchema)
          .parquet(dir)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        // NTZ-at-rest: watermarks demand TIMESTAMP (LTZ); the session is
        // pinned to UTC so the cast is value-preserving
        spark.readStream
          .schema(atRest)
          .parquet(dir)
          .withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Tumbling hourly aggregate per event type with a 1-hour watermark —
    * the incremental twin of Relational.q11EventsHourly. Output rows are
    * (window start, event_type, n_events, total_value).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // exact long-cents sum emitted as double — MUST stay in lockstep
      // with the batch twin (Relational.q11EventsHourly / moneySum): the
      // StreamingSpec equality test compares total_value bit-for-bit
      .agg(count(lit(1)).as("n_events"),
        graft.operators.Relational.moneySum(col("value")).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n_events"), col("total_value"))

  /** Hopping (sliding) 1h/15min window aggregate — the incremental twin
    * of TemporalOps.q97HoppingWindow. Same fan-out contract (each event
    * owns windowLength/slide = 4 windows, expanded row-locally before
    * the stateful aggregation); the watermark bounds state to the
    * windows still open within the horizon. countDistinct is not
    * supported in streaming aggregations, so the distinct-user leg
    * stays batch-only (or approx via HLL at scale).
    */
  def hoppingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("n_events"))

  /** Streaming per-key rate limiter — the incremental twin of
    * TemporalOps.q112RateLimit: each (user, hour) admits at most K
    * events (event-time order, event_id tie-break within a batch);
    * later arrivals are shed. State is ONE counter per open (user,
    * hour), removed by event-time timeout once the watermark passes
    * the hour — bounded by (active users × horizon hours), not stream
    * history.
    */
  def throttle(events: Dataset[Event], k: Int = 3,
      watermarkDelay: String = "1 hour"): Dataset[Event] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => (e.user_id, e.ts.getTime / 3600000L))
      .flatMapGroupsWithState[Long, Event](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, Long), evs: Iterator[Event], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var c = state.getOption.getOrElse(0L)
            val kept = evs.toSeq
              .sortBy(e => (e.ts.getTime, e.event_id))
              .filter { _ => if (c < k) { c += 1; true } else false }
            state.update(c)
            // clean the counter once the hour can no longer receive
            // events (strictly beyond the current watermark, or Spark
            // rejects the timestamp)
            state.setTimeoutTimestamp(
              math.max((key._2 + 1) * 3600000L, state.getCurrentWatermarkMs + 1))
            kept.iterator
          }
      }
  }

  /** Run a streaming frame to completion against a finite source and
    * return the result via an in-memory sink (test/dev harness).
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append): DataFrame = {
    val q: StreamingQuery = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }

  /** Streaming exact dedup: duplicates arriving within the watermark
    * horizon are dropped; state holds only ids seen inside the horizon
    * (bounded), not the stream's history — the streaming twin of the
    * batch dedup family.
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String] = Seq("event_id")): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Streaming LSH near-dup suppression over a document stream
    * (doc_id, ts, text): a document passes only if EVERY one of its
    * MinHash band buckets is first-seen inside the watermark horizon —
    * i.e. any band collision with an earlier document suppresses it, the
    * same any-band candidate rule as the batch LSH (DedupOps.minhashLsh).
    *
    * Composition of two watermark-bounded stateful operators, both with
    * O(horizon)-bounded state:
    *   1. row-local banded signatures (DedupOps.bandedDocs — array HOFs,
    *      no aggregation) → dropDuplicatesWithinWatermark on (band, h):
    *      state is the band-bucket keys seen inside the horizon;
    *   2. a tumbling-window count per doc: a doc whose {Bands} band rows
    *      all survived step 1 won every bucket → emit once the window
    *      closes.
    *
    * Batch twin: DedupOps.lshDedupKeepFirst (first-event-time occupant of
    * every bucket) — StreamingSpec pins the two on closed windows.
    *
    * CONTRACT — sub-3-word documents bypass dedup entirely (doc-unique
    * synthetic buckets, see DedupOps.bandedDocs): even exact-identical
    * short lines all pass through. Compose with exact dedup (content
    * hash + dropDuplicatesWithinWatermark, or batch q19) if identical
    * short boilerplate must be collapsed.
    */
  def lshDedupWithinWatermark(docs: DataFrame, watermarkDelay: String = "1 hour",
      windowSize: String = "1 hour", portable: Boolean = false): DataFrame =
    graft.operators.DedupOps.bandedDocs(docs, carry = Seq("ts"), portable = portable)
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("band", "h")
      .groupBy(window(col("ts"), windowSize), col("doc_id"))
      .agg(count(lit(1)).as("n_won"))
      .filter(col("n_won") === lit(graft.operators.DedupOps.Bands.toLong))
      .select(col("doc_id"), col("window.start").as("window_start"))

  /** Streaming twin of q188 incremental decontamination, surface 1 of 2
    * (r15 verdict order 5): DECLARATIVE delta-touched candidate
    * discovery. Benchmark-panel landings arrive as a document stream
    * (doc_id, ts, text); each doc's [[graft.operators.DedupOps.DecontamN]]-gram
    * windows derive row-locally (no shuffle), anti-join the static
    * KNOWN-gram set (grams already decontaminated against — only truly
    * novel grams survive), then probe the static corpus gram table; the
    * windowed count emits, per closed event-time window, every corpus
    * doc the window's novel grams touched (with its hit count). This is
    * exactly the batch twin's `touched` frame per window — the set q188
    * recomputes ledgers for.
    *
    * State is watermark-bounded: the only stateful operator is the
    * (window × touched-doc) aggregation, and the watermark closes and
    * drops windows — state never scales with the corpus or the stream's
    * history. The corpus/known sides are static re-planned per
    * micro-batch; at scale the known-gram set is the broadcast side and
    * the corpus probe prunes by gram digest.
    *
    * The ledger RECOMPUTE itself cannot be a pure streaming plan
    * (interval union needs analytic windows + a second aggregation
    * stage, both unsupported on streams) — that half is
    * [[runIncrementalDecontam]].
    */
  def decontamTouched(deltaDocs: DataFrame, corpus: DataFrame,
      knownGrams: DataFrame, watermarkDelay: String = "1 hour",
      windowSize: String = "1 hour"): DataFrame = {
    import graft.operators.DedupOps
    val dtoks = deltaDocs.withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"), split(col("text"), " ").as("t"))
    val novel = DedupOps.windowGrams(dtoks, DedupOps.DecontamN,
      carry = Seq("ts"))
      .select(col("ts"), col("g"))
      .join(knownGrams.select(col("g")), Seq("g"), "left_anti")
    val ctoks = corpus.select(col("doc_id"), split(col("text"), " ").as("t"))
    val corpusGrams = DedupOps.windowGrams(ctoks, DedupOps.DecontamN)
      .select(col("g"), col("doc_id").as("corpus_doc"))
    novel.join(corpusGrams, Seq("g"))
      .groupBy(window(col("ts"), windowSize), col("corpus_doc"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("corpus_doc").as("doc_id"),
        col("window.start").as("window_start"), col("n_hits"))
  }

  /** Streaming twin of q188, surface 2 of 2: the full incremental
    * maintenance LOOP. Each micro-batch of benchmark landings advances
    * the known-gram ledger exactly as one batch q188 step would:
    * the batch's grams anti-join the accumulated known set (broadcast),
    * [[graft.operators.DedupOps.decontamStep]] recomputes old/new
    * excision ledgers for the delta-touched corpus docs only, the sink
    * callback receives the changed-doc frame, and the known set
    * advances (published via ckpt so lineage never grows across
    * batches). Runs under `foreachBatch` because the ledger's interval
    * union needs analytic windows and stacked aggregations — legal in
    * a per-batch plan, unsupported in a continuous one; this is the
    * standard Structured Streaming shape for incremental view
    * maintenance against static tables.
    *
    * Delivered across N batches, the composition equals applying batch
    * q188 N times with the panel growing in arrival order — StreamingSpec
    * pins the single-delivery case against q188 itself and the
    * split-delivery case against the two-step batch composition.
    *
    * RESTART/RETRY SAFETY (ADVICE r16): the known-gram ledger is NOT a
    * driver-side var — it is persisted per applied batch id under
    * `checkpointDir/graft-known/<batchId>` (the accumulated set AFTER
    * that batch, `_SUCCESS`-marked). Each batch derives its base set
    * from the LARGEST persisted id strictly below its own (falling back
    * to `knownInit` for the first), so:
    *   - a foreachBatch RETRY of batch `id` recomputes against the same
    *     base (never the advanced set — the r16-flagged silent-drop
    *     path) and overwrites `graft-known/<id>` with identical content;
    *     the sink sees the same (frame, id) again — the standard
    *     foreachBatch at-least-once contract, dedupable by id;
    *   - a RESTART on the same checkpointLocation resumes where the
    *     offsets log says: committed batches are not replayed, and the
    *     next batch id reads the ledger its predecessor persisted rather
    *     than resetting to `knownInit` (grams landed before the restart
    *     stay known).
    * The per-batch parquet round-trip is O(panel) — the decontam gram
    * set, not the corpus or the stream history.
    */
  def runIncrementalDecontam(deltaDocs: DataFrame, corpus: DataFrame,
      knownInit: DataFrame, checkpointDir: String,
      sink: (DataFrame, Long) => Unit): Unit = {
    val ctoks = corpus.select(col("doc_id"), split(col("text"), " ").as("t"))
    val q = deltaDocs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(decontamBatchStep(ctoks, knownInit, checkpointDir, batch, id), id)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Batch ids with a `_SUCCESS`-marked persisted ledger under
    * `<checkpointDir>/graft-known`. Hadoop FS API, not java.io — the
    * checkpoint lives on HDFS/object storage at scale.
    */
  private[graft] def appliedLedgers(spark: SparkSession,
      checkpointDir: String): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(checkpointDir, "graft-known")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.filter(_.isDirectory)
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      .filter(i => fs.exists(new Path(root, s"$i/_SUCCESS")))
      .sorted
  }

  /** One ledger-maintenance step for micro-batch `id`: reads the base
    * known-gram set (latest persisted ledger with id' < id, else
    * `knownInit`), computes the batch's novel grams and the changed-doc
    * excision-ledger diff, persists base ∪ delta as this batch's ledger,
    * and returns the diff frame. Idempotent in `id`: re-running (a
    * foreachBatch retry, or a crash after the ledger write but before
    * the commit log advanced) derives the SAME base — `graft-known/<id>`
    * itself is excluded by the strict `< id` — and overwrites the same
    * content. Factored out of the stream so StreamingSpec can drive the
    * retry path directly.
    */
  private[graft] def decontamBatchStep(ctoks: DataFrame, knownInit: DataFrame,
      checkpointDir: String, batch: DataFrame, id: Long): DataFrame = {
    import graft.Ckpt.GraftCheckpoint
    import graft.operators.DedupOps
    val spark = ctoks.sparkSession
    val base = appliedLedgers(spark, checkpointDir).filter(_ < id)
      .lastOption match {
      case Some(prev) =>
        spark.read.parquet(s"$checkpointDir/graft-known/$prev")
      case None => knownInit.select(col("g"))
    }
    val gKnown = base.ckpt()
    val dtoks = batch
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val gDelta = DedupOps.windowGrams(dtoks, DedupOps.DecontamN)
      .select(col("g")).distinct()
      .join(gKnown, Seq("g"), "left_anti")
      .ckpt() // consumed by the step twice AND the ledger advance
    val out = DedupOps.decontamStep(ctoks, gKnown, gDelta)
    gKnown.unionAll(gDelta)
      .write.mode("overwrite").parquet(s"$checkpointDir/graft-known/$id")
    pruneLedgers(spark, checkpointDir, id)
    out
  }

  /** Ledger retention (ADVICE r17): each batch persists the FULL
    * accumulated known-gram set, so without pruning the checkpoint
    * grows O(batches × panel) and `appliedLedgers` pays a listStatus +
    * per-id `_SUCCESS` RPC over an ever-growing directory every batch.
    * Only the LARGEST ledger id strictly below the running batch is
    * ever read — including on a retry of batch `id`, whose base is
    * `max(id' < id)` — so after `<id>` commits, everything below that
    * base is dead. Keep {base, id} (at most two snapshots), delete the
    * rest. Deletion failures are ignored: a survivor costs storage, not
    * correctness, and the next batch retries the prune.
    */
  private[graft] def pruneLedgers(spark: SparkSession,
      checkpointDir: String, id: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val applied = appliedLedgers(spark, checkpointDir)
    val keep = applied.filter(_ < id).lastOption
    val root = new Path(checkpointDir, "graft-known")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    applied.filter(i => i < id && !keep.contains(i)).foreach { i =>
      scala.util.Try(fs.delete(new Path(root, s"$i"), true))
    }
  }

  /** Stream-stream interval join: each click joined to same-user signups
    * in the preceding hour. Both sides are watermarked and the join
    * condition bounds event-time distance, so Spark can expire state on
    * both sides — the state-bounded form of q36's as-of shape.
    */
  def clickSignupJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val signups = events.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("signup_user"),
        col("ts").as("signup_ts"))
      .withWatermark("signup_ts", "1 hour")
    clicks.join(signups,
      expr("""click_user = signup_user AND
             |signup_ts >= click_ts - INTERVAL 1 HOUR AND
             |signup_ts <= click_ts""".stripMargin))
      .select(col("click_id"), col("click_user").as("user_id"), col("signup_id"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class BalanceState(lastTs: Long, lastId: Long, s: Long, m: Long,
      peak: Long, lost: Long, stockouts: Long, n: Long)
  final case class UserBalance(user_id: Long, n_events: Long,
      end_balance: Long, peak_balance: Long, lost_demand: Long,
      stockouts: Long)

  /** Streaming twin of q139's Lindley fold: a per-user clamped-at-zero
    * points balance over the event stream — 'purchase' events CREDIT
    * round(value·100) integer cents of points, every other type SPENDS
    * theirs, and spend against an empty balance is LOST (the clamp), not
    * owed. The non-associative clamp that batch q139 evaluates as
    * shared-sort windows becomes O(1) streaming state per user: the
    * unclamped running sum S, its floor m = min(0, min S), and the
    * running summary counters — update is one integer compare-and-add
    * per event, and balance = S − m at any point.
    *
    * Ordering contract: events apply in event-time order within each
    * micro-batch ((ts, event_id) sort); an event at-or-before the last
    * applied (ts, id) cannot be folded into a non-commutative scan after
    * the fact and is DROPPED — standard ledger at-most-once semantics.
    * StreamingSpec pins multi-batch equality against the batch windows
    * on an in-order feed, and the late-event drop explicitly. Update
    * mode: each batch re-emits the refreshed summary row per touched
    * user; the memory/console sink's latest row per user IS the balance
    * table. State is one fixed-size struct per user — bounded by user
    * cardinality, not event volume (a production deployment adds an
    * inactivity TTL exactly like cdcApply's tombstone TTL if the user
    * space itself is unbounded).
    */
  def runningBalance(events: Dataset[Event]): Dataset[UserBalance] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BalanceState, UserBalance](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Event], state: GroupState[BalanceState]) =>
          var st = state.getOption.getOrElse(
            BalanceState(Long.MinValue, Long.MinValue, 0L, 0L, 0L, 0L, 0L, 0L))
          evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val t = e.ts.getTime
            val inOrder = t > st.lastTs || (t == st.lastTs && e.event_id > st.lastId)
            if (inOrder) {
              val cents = math.round(e.value * 100)
              val delta = if (e.event_type == "purchase") cents else -cents
              val s2 = st.s + delta
              val m2 = math.min(st.m, math.min(0L, s2))
              st = BalanceState(t, e.event_id, s2, m2,
                peak = math.max(st.peak, s2 - m2),
                lost = st.lost + (st.m - m2),
                stockouts = st.stockouts + (if (s2 < st.m) 1L else 0L),
                n = st.n + 1)
            }
          }
          state.update(st)
          Iterator.single(UserBalance(uid, st.n, st.s - st.m, st.peak,
            st.lost, st.stockouts))
      }
  }
  final case class CusumState(lastDay: Long, dayCount: Long, k: Long,
      s: Long, bestAbs: Long, bestDay: Long, bestS: Long)
  final case class CusumAlarm(event_type: String, days_seen: Long,
      cusum: Long, best_abs: Long, best_day: String, alarm: Boolean)

  /** Streaming CUSUM drift monitor — the sequential-alarm form of
    * q155's batch changepoint. q155 centers on the series' own final
    * mean (unknowable mid-stream); the monitor centers on a PROVIDED
    * reference rate (counts/day expected from history or SLO), which is
    * how production CUSUM pages: state per event type is the running
    * sum S_k = Σ(n_day − ref) plus the argmax |S| seen, updated once
    * per CLOSED day. Input is the per-(type, day) count stream (the
    * upstream windowed aggregate); days apply in order and a
    * day at-or-before the last applied is dropped (same at-most-once
    * ledger contract as runningBalance). Alarm fires when |S| crosses
    * the threshold; all arithmetic is exact long (day-count scaled by
    * the caller like q155 if the reference is fractional).
    *
    * StreamingSpec pins multi-batch equality against the same fold run
    * in batch, and the alarm threshold crossing.
    */
  final case class DayCount(event_type: String, day: java.sql.Date, n: Long)

  def cusumAlarm(dayCounts: Dataset[DayCount], ref: Long,
      threshold: Long): Dataset[CusumAlarm] = {
    import dayCounts.sparkSession.implicits._
    dayCounts
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumAlarm](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (tpe: String, rows: Iterator[DayCount], state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(
            CusumState(Long.MinValue, 0L, 0L, 0L, -1L, Long.MinValue, 0L))
          rows.toSeq.sortBy(_.day.getTime).foreach { r =>
            val d = r.day.getTime
            if (d > st.lastDay) {
              val s2 = st.s + (r.n - ref)
              val better = math.abs(s2) > st.bestAbs
              st = CusumState(d, st.dayCount + 1, st.k + 1, s2,
                bestAbs = if (better) math.abs(s2) else st.bestAbs,
                bestDay = if (better) d else st.bestDay,
                bestS = if (better) s2 else st.bestS)
            }
          }
          state.update(st)
          Iterator.single(CusumAlarm(tpe, st.dayCount, st.s, st.bestAbs,
            if (st.bestDay == Long.MinValue) null
            else new java.sql.Date(st.bestDay).toString,
            st.bestAbs > threshold))
      }
  }

  final case class SessionState(start: Long, end: Long, n: Long, total: Double)
  final case class UserSession(user_id: Long, start: java.sql.Timestamp,
      end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Custom stateful operator: gap-based sessionization per user via
    * flatMapGroupsWithState (30-minute inactivity gap). State per user is
    * one open session (constant size); closed sessions are emitted and
    * dropped.
    *
    * EventTimeTimeout + the watermark is what makes the state BOUNDED at
    * stream scale: once the watermark passes a session's end + gap, no
    * on-time event can extend it, so the timeout callback emits the
    * session and REMOVES the key's state. With NoTimeout a dormant
    * user's open session would sit in the state store forever — state
    * growing with total user cardinality instead of active users.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Long = 30,
      watermarkDelay: String = "1 hour"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000
    events
      .withWatermark("ts", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Event], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: the session can never extend
            val out = state.getOption.flatMap(_.headOption).map(s =>
              UserSession(userId, new java.sql.Timestamp(s.start),
                new java.sql.Timestamp(s.end), s.n, s.total)).iterator
            state.remove()
            out
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption.flatMap(_.headOption)
            val closed = scala.collection.mutable.ListBuffer.empty[UserSession]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.end <= gapMs =>
                  open = Some(s.copy(end = t, n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed += UserSession(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.end), s.n, s.total)
                  open = Some(SessionState(t, t, 1, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1, e.value))
              }
            }
            state.update(open.toList)
            // the timeout must sit strictly beyond the current watermark
            // or Spark rejects it (a very old open session times out on
            // the next trigger instead)
            open.foreach(s => state.setTimeoutTimestamp(
              math.max(s.end + gapMs, state.getCurrentWatermarkMs + 1)))
            closed.iterator
          }
      }
  }

  final case class Change(o_orderkey: Long, o_custkey: Long,
      o_orderdate: java.sql.Timestamp, op: String, price_cents: Long)
  final case class CdcState(dateMs: Long, key: Long, op: String,
      cents: Long, n: Long)
  final case class CdcRow(o_custkey: Long, current_price_cents: Long,
      as_of: java.sql.Timestamp, n_changes: Long)

  /** Streaming CDC apply — TemporalOps.q118CdcApply's latest-change-wins
    * compaction as running state: the maintained snapshot IS the state
    * (one fixed-size record per live key — the minimum any materialized
    * view must hold), updated by (event-time, key) recency so
    * out-of-order arrivals cannot regress it. Delete markers keep a
    * tombstone record, so a late earlier upsert cannot resurrect a
    * deleted key — same rule as the batch twin's post-window delete
    * filter. Emits the key's refreshed snapshot row each time it
    * changes (Update mode); deleted keys emit nothing.
    *
    * Tombstone lifetime is a stated trade-off: with
    * `tombstoneTtl = None` (default) a deleted key's marker lives
    * forever — the resurrection guard is absolute, but a delete-heavy
    * feed grows state without bound. Passing a TTL arms a
    * processing-time timeout WHEN the key's latest change is a delete;
    * on expiry the tombstone is dropped, bounding state at the cost of
    * a documented resurrection window (an upsert older than the delete
    * arriving > TTL late re-creates the key). Live keys never time out
    * either way — the snapshot row per live key is the floor any
    * materialized view pays.
    */
  def cdcApply(changes: Dataset[Change],
      tombstoneTtl: Option[scala.concurrent.duration.FiniteDuration] = None)
      : Dataset[CdcRow] = {
    import changes.sparkSession.implicits._
    val timeoutConf = tombstoneTtl match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout()
      case None => GroupStateTimeout.NoTimeout()
    }
    changes
      .groupByKey(_.o_custkey)
      .flatMapGroupsWithState[CdcState, CdcRow](OutputMode.Update, timeoutConf)(
        cdcUpdate(tombstoneTtl.map(_.toMillis)))
  }

  /** The CDC state transition, named so specs can drive it directly
    * through `TestGroupState` — a live ProcessingTimeTimeout query
    * busy-loops timeout-check microbatches, which starves
    * `processAllAvailable` in a test harness.
    */
  private[graft] def cdcUpdate(tombstoneTtlMs: Option[Long])(
      key: Long, rows: Iterator[Change], state: GroupState[CdcState])
      : Iterator[CdcRow] = {
    if (state.hasTimedOut) {
      // only armed for tombstones: the delete's retention window has
      // elapsed, drop the marker entirely
      state.remove()
      Iterator.empty
    } else {
      var s = state.getOption
        .getOrElse(CdcState(Long.MinValue, Long.MinValue, "U", 0L, 0L))
      rows.foreach { r =>
        val t = r.o_orderdate.getTime
        val newer = t > s.dateMs || (t == s.dateMs && r.o_orderkey > s.key)
        s =
          if (newer) CdcState(t, r.o_orderkey, r.op, r.price_cents, s.n + 1)
          else s.copy(n = s.n + 1)
      }
      state.update(s)
      if (s.op == "D") {
        tombstoneTtlMs.foreach(state.setTimeoutDuration)
        Iterator.empty
      } else {
        Iterator(CdcRow(key, s.cents, new java.sql.Timestamp(s.dateMs), s.n))
      }
    }
  }
}
