package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One keyed arrival entering the frequency sketch. */
case class TopKInput(group: String, item: Long, event_id: Long, ts: Timestamp)

/** Space-Saving counter: observed count plus the maximum possible
  * undercount inherited at adoption time. True frequency f satisfies
  * `count − err ≤ f ≤ count`.
  */
case class SsCounter(item: Long, count: Long, err: Long)

/** Heavy-hitter state per group: at most k counters + a batch seq. */
case class TopKState(counters: List[SsCounter], ver: Long)

/** One ranked heavy hitter emitted after a micro-batch. `ver` is the
  * 1-based micro-batch sequence for the group, so a consumer (or the
  * spec) selects a consistent snapshot with `max(ver)`.
  */
case class HeavyHitter(group: String, item: Long, cnt_hi: Long,
                       cnt_lo: Long, rank: Int, ver: Long)

/** [[TopKPipeline.heavyHitters]]'s Space-Saving fold as a Spark 4
  * `StatefulProcessor` — the arbitrary-state API that supersedes
  * `flatMapGroupsWithState`: named, typed per-key state handles
  * (Value/List/Map) with optional TTL and timers, backed by RocksDB
  * only. Same step function, same deterministic batch-local ordering,
  * same output rows; `TopKPipelineSpec` asserts exact parity against
  * the flatMapGroupsWithState form over an identical feed. At 100 TB
  * this is the surface to prefer: state TTL bounds idle-group state
  * declaratively (no hand-rolled timeout plumbing) and the encoded
  * state schema is introspectable offline via the state-store data
  * source.
  */
class TopKProcessor(k: Int, ttlMillis: Long = 0L)
    extends StatefulProcessor[String, TopKInput, HeavyHitter] {
  @transient private var state: ValueState[TopKState] = _

  // TTL is the declarative idle-group eviction the API advertises: a
  // group whose state goes `ttlMillis` without an update is dropped
  // from the store by the TTL index (no timer plumbing), and a
  // re-arrival rebuilds from empty — `StateTtlSpec` is the receipt.
  // TTL is processing-time-based, so a non-zero TTL requires the
  // query to run in TimeMode.ProcessingTime (see [[TopKPipeline
  // .heavyHittersTws]]). The config is passed as millis, not
  // TTLConfig, so the processor stays serializable-trivial.
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[TopKState]("counters",
      Encoders.product[TopKState],
      if (ttlMillis > 0) new TTLConfig(java.time.Duration.ofMillis(ttlMillis))
      else TTLConfig.NONE)

  override def handleInputRows(group: String, rows: Iterator[TopKInput],
                               timers: TimerValues): Iterator[HeavyHitter] = {
    val evs = rows.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id))
    val prior = if (state.exists()) state.get() else TopKState(Nil, 0L)
    var counters = prior.counters
    evs.foreach(e => counters = TopKPipeline.step(counters, e.item, k))
    val ver = prior.ver + 1
    state.update(TopKState(counters, ver))
    counters.sortBy(c => (-c.count, c.item)).zipWithIndex.iterator
      .map { case (c, i) =>
        HeavyHitter(group, c.item, c.count, c.count - c.err, i + 1, ver)
      }
  }
}

/** Streaming heavy hitters with BOUNDED state — the Space-Saving
  * algorithm (Metwally, Agrawal, El Abbadi, "Efficient Computation of
  * Frequent and Top-k Elements in Data Streams", ICDT 2005): per
  * group, at most `k` counters; an untracked arrival adopts the
  * minimum counter's slot, inheriting its count as potential error.
  * Guarantees (asserted in `TopKPipelineSpec`):
  *
  *  - every item with true frequency > N/k IS tracked (no false
  *    negatives among true heavy hitters);
  *  - `count` never undercounts the true frequency, `count − err`
  *    never overcounts it — per-item certainty bounds ride along.
  *
  * Why this and not exact streaming top-k: exact needs a counter per
  * DISTINCT item — unbounded state on a 100 TB stream. Space-Saving
  * state is O(k) per group, independent of traffic or cardinality
  * (the [[SessionPipeline]] O(1)-state discipline applied to a
  * frequency sketch). Mergeability across partitions comes free from
  * Spark's state layout: the stream is hash-partitioned by group, so
  * each group's counters live on exactly one state store.
  *
  * Within a batch the group iterator is unordered → events sort
  * batch-locally on (ts, event_id) (the [[EwmaPipeline]] parity
  * ordering), and eviction ties break to the LOWEST item id, so
  * results are deterministic for a deterministic feed.
  */
object TopKPipeline {

  /** One Space-Saving step — PURE, so the algorithm's guarantees are
    * property-testable without a stream (`PropertiesSpec` drives it
    * over generated skews); the streaming closure below folds it.
    */
  def step(counters: List[SsCounter], item: Long, k: Int): List[SsCounter] =
    counters.find(_.item == item) match {
      case Some(c) =>
        SsCounter(item, c.count + 1, c.err) :: counters.filterNot(_.item == item)
      case None if counters.length < k =>
        SsCounter(item, 1L, 0L) :: counters
      case None =>
        // evict the minimum counter (ties -> lowest item id); the
        // adopter inherits its count as the error bound
        val m = counters.minBy(c => (c.count, c.item))
        SsCounter(item, m.count + 1, m.count) :: counters.filterNot(_.item == m.item)
    }

  /** Batch twin of [[heavyHitters]]: fold the same pure [[step]] over
    * a secondary-sorted partition iterator — one exchange on the group
    * key, O(k) counters per live group, NO per-group materialization
    * (a `groupByKey.flatMapGroups` would buffer a whole group's events
    * in one task; at 100 TB a group is the stream's entire history).
    * Returns (grp, item, cnt_hi, cnt_lo) for every tracked counter;
    * deterministic for a deterministic input because events fold in
    * (ts, event_id) order and eviction ties break to the lowest item.
    */
  def heavyHittersBatch(events: Dataset[TopKInput], k: Int): Dataset[(String, Long, Long, Long)] = {
    require(k >= 1, "heavyHittersBatch: k must be >= 1")
    import events.sparkSession.implicits._
    events
      .repartition(org.apache.spark.sql.functions.col("group"))
      .sortWithinPartitions("group", "ts", "event_id")
      .mapPartitions { it =>
        // group-boundary fold: O(k) counters per live group
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
        var cur: String = null
        var cs: List[SsCounter] = Nil
        def flush(): Unit = if (cur != null)
          cs.foreach(c => out += ((cur, c.item, c.count, c.count - c.err)))
        it.foreach { e =>
          if (e.group != cur) { flush(); cur = e.group; cs = Nil }
          cs = step(cs, e.item, k)
        }
        flush()
        out.iterator
      }
  }

  /** [[heavyHitters]] on the transformWithState API (see
    * [[TopKProcessor]]); requires the RocksDB state store provider.
    * `ttlMillis > 0` turns on declarative idle-group state eviction
    * (and with it processing-time mode — TTL is wall-clock-based by
    * API contract); 0 keeps state forever in TimeMode.None, the
    * bit-exact-parity configuration `TopKPipelineSpec` checks against
    * flatMapGroupsWithState.
    */
  def heavyHittersTws(events: Dataset[TopKInput], k: Int,
                      ttlMillis: Long = 0L): Dataset[HeavyHitter] = {
    require(k >= 1, "heavyHittersTws: k must be >= 1")
    import events.sparkSession.implicits._
    val timeMode = if (ttlMillis > 0) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .groupByKey(_.group)
      .transformWithState(new TopKProcessor(k, ttlMillis), timeMode, OutputMode.Append())
  }

  def heavyHitters(events: Dataset[TopKInput], k: Int): Dataset[HeavyHitter] = {
    require(k >= 1, "heavyHitters: k must be >= 1")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.group)
      .flatMapGroupsWithState[TopKState, HeavyHitter](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (group: String, it: Iterator[TopKInput], state: GroupState[TopKState]) =>
          val evs = it.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var counters = state.getOption.map(_.counters).getOrElse(Nil)
          evs.foreach(e => counters = step(counters, e.item, k))
          val ver = state.getOption.map(_.ver).getOrElse(0L) + 1
          state.update(TopKState(counters, ver))
          counters.sortBy(c => (-c.count, c.item)).zipWithIndex.iterator
            .map { case (c, i) =>
              HeavyHitter(group, c.item, c.count, c.count - c.err, i + 1, ver)
            }
      }
  }
}
