package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.engine.Tables

/** Streaming operators over the `events` table (§2.9 extension — the
  * reference predates streaming SQL; mapped to Structured Streaming
  * per SURVEY.md).
  *
  * Each operator exists in two forms with identical semantics:
  * a batch form (oracle-checkable, used by the driver gate) and a
  * streaming form (`readStream`-compatible: watermark + windowed /
  * session aggregation, plus a `flatMapGroupsWithState` custom
  * sessionizer for state logic the built-ins can't express).
  *
  * Scale: both window and session aggregation shuffle once on the
  * grouping key; state size is bounded by the watermark horizon.
  * Timestamps are truncated to seconds before gap logic so batch,
  * streaming, and the DuckDB oracle agree exactly (the raw parquet
  * carries nanosecond precision that engines truncate differently).
  */
object Sessionize {

  val GapMinutes = 5

  /** Batch gap-based sessionization — a new session starts when the
    * gap since the previous event is >= 5 minutes.
    *
    * Formulated as lag + cumulative-sum (the classic one-shuffle
    * shape: gap marker, running session id, group) rather than
    * `session_window`, because the two disagree on a gap of EXACTLY
    * the threshold: `session_window` merges it (next.start <= window
    * end extends the session), the >=-splits rule here does not —
    * observed as 2 divergent sessions at sf0.1. The lag form makes
    * the boundary rule explicit and is what the DuckDB oracle runs
    * verbatim; `session_window` remains the streaming operator
    * ([[sessionizeStream]]), where its inclusive boundary is fine. */
  def sessionizeBatch(s: SparkSession, dir: String): DataFrame =
    sessionizeEvents(Tables.t(s, dir, "events"))

  /** The batch sessionization core over any (user_id, ts) frame —
    * separated from the table lookup so the exact >=-boundary rule is
    * unit-testable (SessionBoundarySpec). */
  def sessionizeEvents(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tss")
    events
      .select(col("user_id"), date_trunc("second", col("ts")).as("tss"))
      .withColumn("prev", lag(col("tss"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull ||
          unix_timestamp(col("tss")) - unix_timestamp(col("prev"))
            >= GapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(
        date_format(min(col("tss")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("tss")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** Streaming tumbling-window counts: watermark + 1-hour windows per
    * event type (the streaming twin of Relational.q28_time_window). */
  def windowedCountsStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming sessionization with the built-in session_window. */
  def sessionizeStream(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), date_trunc("second", col("ts")).as("tss"))
      .withWatermark("tss", "30 minutes")
      .groupBy(col("user_id"), session_window(col("tss"), s"$GapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  // -- custom stateful sessionizer ----------------------------------

  case class Event(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, startMs: Long, endMs: Long, n: Long)

  /** The per-batch merge fold shared by both stateful sessionizers:
    * absorbs this batch's (seconds-truncated, sorted) event times into
    * the open session, emitting every session a gap-exceeding event
    * closes. Leaves the updated open session in `state`. */
  private def mergeBatch(uid: Long, sorted: Seq[Long],
      state: GroupState[SessionState], gapMs: Long): Iterator[SessionOut] = {
    var cur = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    sorted.foreach { t =>
      cur match {
        case Some(s) if t <= s.start - gapMs =>
          // beyond any merge horizon (<= matches the batch rule: a
          // gap of EXACTLY the threshold splits): batch semantics
          // would put this event in a SEPARATE earlier session, which
          // this state machine can no longer emit in order — drop it,
          // exactly what an event-time watermark of one gap would
          // have done upstream
          ()
        case Some(s) if t - s.last < gapMs =>
          // a LATE event (t < s.last, possible across micro-
          // batches — sorting is per-batch only) must not move
          // the session's frontier backwards: a rolled-back
          // `last` would mis-close the session on the next event;
          // backward extension is allowed only within one gap of
          // the session start (the guard above)
          cur = Some(SessionState(math.min(s.start, t),
            math.max(s.last, t), s.n + 1))
        case Some(s) =>
          closed += SessionOut(uid, s.start, s.last, s.n)
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    cur.foreach(state.update)
    closed.result().iterator
  }

  /** Custom state logic via flatMapGroupsWithState: a session closes
    * when a later event arrives past the inactivity gap (the open
    * session stays in state until then). This is the escape hatch for
    * semantics `session_window` can't express (per-session caps,
    * custom merge rules); [[sessionizeStatefulTimeout]] is the
    * production variant that also flushes idle sessions by watermark. */
  def sessionizeStateful(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = GapMinutes * 60 * 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          // seconds truncation as everywhere else (file doc above):
          // batch, session_window and this state machine must agree
          val sorted = rows.toSeq.map(e => e.ts.getTime / 1000L * 1000L).sorted
          mergeBatch(uid, sorted, state, gapMs)
        })
  }

  /** [[sessionizeStateful]] + idle-session flush: an event-time
    * watermark bounds state lifetime, and a per-key
    * EventTimeTimeout at `last + gap` emits the open session once the
    * watermark passes it — without this, a user who never returns
    * leaks one state row forever (THE failure mode of unbounded
    * streaming state). State is therefore bounded by the number of
    * users active inside one watermark horizon, not all users ever
    * seen. */
  def sessionizeStatefulTimeout(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = GapMinutes * 60 * 1000L
    events
      .withWatermark("ts", s"$GapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.start, s.last, s.n))
          } else {
            val sorted = rows.toSeq.map(e => e.ts.getTime / 1000L * 1000L)
              .sorted
            val out = mergeBatch(uid, sorted, state, gapMs)
            // re-arm the timer at the open session's gap expiry; must
            // stay ahead of the current watermark or Spark rejects it
            state.getOption.foreach { s =>
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs + 1))
            }
            out
          }
        })
  }
}
