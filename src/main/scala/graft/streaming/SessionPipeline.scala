package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** One user event entering sessionization. */
case class SessionInput(user_id: Long, event_id: Long, ts: Timestamp, value: Double)

/** Open-session state carried between micro-batches (epoch millis). */
case class SessionState(start: Long, end: Long, n: Long, total: Double)

/** A CLOSED session. Sessions are identified by (user_id,
  * session_start) — not a sequence number, which would need unbounded
  * idle state to survive event-time timeouts.
  */
case class SessionAgg(user_id: Long, session_start: Timestamp,
                      session_end: Timestamp, n_events: Long, total_value: Double)

/** Incremental gap-based sessionization — the streaming counterpart of
  * [[graft.operators.RelationalOps.sessionize]] (same gap semantics),
  * built on `flatMapGroupsWithState` with EVENT-TIME timeout:
  *
  *  - state per user is ONE open session (4 numbers) — not the event
  *    list; 100 TB of traffic with 10^9 users stays ~GBs of state;
  *  - a session closes either when a same-batch successor arrives
  *    past the gap (emitted immediately) or when the watermark passes
  *    `session_end + gap` (emitted on timeout and state removed, so
  *    idle users cost nothing);
  *  - late events beyond the watermark are dropped by the runtime
  *    before the function sees them — the lateness bound is the
  *    watermark delay, exactly as in the reference's
  *    `withWatermark` declaration (`spark_stream.py:55`);
  *  - a late event OLDER than the open session's start (but inside
  *    the watermark) merges BACKWARD, extending `session_start` down
  *    — with the required `watermarkDelaySec <= gapSec` such an event
  *    is always within the gap of the open session, so the merge is
  *    exactly what the batch formulation computes.
  *
  * CONSISTENCY CONTRACT: outputs equal the batch lag+running-sum
  * rollup for every closed session, except the one irreducible case
  * of an emit-on-close design — a late "bridge" event that would have
  * JOINED two sessions already separated by more than the gap arrives
  * after the earlier one was emitted. Holding O(1) state per user,
  * the earlier emission cannot be retracted; exactly-merged output
  * would need all sessions buffered until the watermark (Spark's
  * built-in `session_window` aggregation makes that trade — see
  * `RelationalOps.sessionize` for the batch path).
  */
/** [[SessionPipeline.sessionize]]'s gap logic as a Spark 4
  * `StatefulProcessor` with EXPLICIT event-time timers — the timer
  * primitive is what transformWithState adds over
  * `GroupStateTimeout.EventTimeTimeout`: one key can hold many named
  * states and many timers, each deleted/re-registered independently
  * (here: delete the open session's stale expiry, register
  * `end + gap`). Semantics are identical to the
  * flatMapGroupsWithState form — same O(1) state per user, same
  * emit-on-close contract — and `SessionPipelineSpec` asserts exact
  * output parity over an identical multi-batch feed.
  */
class SessionProcessor(gapMs: Long, ttlMillis: Long = 0L)
    extends StatefulProcessor[Long, SessionInput, SessionAgg] {
  @transient private var state: ValueState[SessionState] = _

  // TTL mirrors [[TopKProcessor]] (r9 gap said BOTH processors): a
  // non-zero TTL bounds idle-session state declaratively. The API
  // constraint shapes the semantics — TTLConfig requires
  // TimeMode.ProcessingTime, which excludes the event-time timers the
  // default mode uses to EMIT idle sessions. So TTL mode trades the
  // idle-session emission for the state bound: a session abandoned
  // past the TTL is evicted WITHOUT emission (the 100 TB long tail of
  // dead sessions costs nothing), while in-stream gap closes still
  // emit exactly as in the default mode. Pipelines that need every
  // session emitted keep ttlMillis = 0 (event-time timers + watermark
  // eviction — also O(1) state per user, bounded by ACTIVE users).
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[SessionState]("open_session",
      Encoders.product[SessionState],
      if (ttlMillis > 0) new TTLConfig(java.time.Duration.ofMillis(ttlMillis))
      else TTLConfig.NONE)

  override def handleInputRows(uid: Long, rows: Iterator[SessionInput],
                               timers: TimerValues): Iterator[SessionAgg] = {
    val evs = rows.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id))
    val closed = List.newBuilder[SessionAgg]
    var cur = if (state.exists()) Some(state.get()) else None
    evs.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.end > gapMs =>
          closed += SessionPipeline.toAgg(uid, s)
          cur = Some(SessionState(t, t, 1L, e.value))
        case Some(s) =>
          cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t),
            s.n + 1, s.total + e.value))
        case None =>
          cur = Some(SessionState(t, t, 1L, e.value))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // re-arm: drop the previous session-expiry timer for this key,
      // register the new one (strictly beyond the watermark, as the
      // FMGS form's setTimeoutTimestamp contract requires). In TTL
      // mode (TimeMode.ProcessingTime) there is no watermark and no
      // event-time timers — idle sessions close by TTL eviction.
      if (ttlMillis == 0L) {
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(
          math.max(s.end + gapMs, timers.getCurrentWatermarkInMs() + 1))
      }
    }
    closed.result().iterator
  }

  override def handleExpiredTimer(uid: Long, timers: TimerValues,
                                  info: ExpiredTimerInfo): Iterator[SessionAgg] = {
    // delete-on-update keeps at most one live timer per key, so a
    // firing timer always refers to the current open session
    if (state.exists()) {
      val s = state.get()
      state.clear()
      Iterator.single(SessionPipeline.toAgg(uid, s))
    } else Iterator.empty
  }
}

object SessionPipeline {

  /** [[sessionize]] on the transformWithState API (see
    * [[SessionProcessor]]); requires the RocksDB state store provider.
    * `ttlMillis > 0` switches to TimeMode.ProcessingTime and bounds
    * idle-session state by TTL eviction instead of emitting it on
    * watermark timers — see the [[SessionProcessor]] contract note.
    */
  def sessionizeTws(events: Dataset[SessionInput], gapSec: Long,
                    watermarkDelaySec: Long = 10L,
                    ttlMillis: Long = 0L): Dataset[SessionAgg] = {
    require(watermarkDelaySec <= gapSec,
      "lateness bound must not exceed the session gap: a late event could " +
        "otherwise precede the open session by more than the gap")
    import events.sparkSession.implicits._
    val timeMode =
      if (ttlMillis > 0) TimeMode.ProcessingTime() else TimeMode.EventTime()
    events
      .withWatermark("ts", s"$watermarkDelaySec seconds")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSec * 1000L, ttlMillis),
        timeMode, OutputMode.Append())
  }

  def sessionize(events: Dataset[SessionInput], gapSec: Long,
                 watermarkDelaySec: Long = 10L): Dataset[SessionAgg] = {
    require(watermarkDelaySec <= gapSec,
      "lateness bound must not exceed the session gap: a late event could " +
        "otherwise precede the open session by more than the gap")
    import events.sparkSession.implicits._
    val gapMs = gapSec * 1000L
    events
      .withWatermark("ts", s"$watermarkDelaySec seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessionInput], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(toAgg(uid, s))
          } else {
            // Within a batch the iterator is unordered; sort this
            // batch's events (batch-local, bounded by trigger size).
            val evs = it.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = List.newBuilder[SessionAgg]
            var cur = state.getOption
            evs.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end > gapMs =>
                  closed += toAgg(uid, s)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case Some(s) =>
                  // covers late arrivals too: t may precede s.start
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t),
                    s.n + 1, s.total + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // must be strictly beyond the current watermark or the
              // runtime rejects it; the max() only binds when this
              // batch's events trail the global watermark closely
              state.setTimeoutTimestamp(
                math.max(s.end + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  private[streaming] def toAgg(uid: Long, s: SessionState): SessionAgg =
    SessionAgg(uid, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)
}
