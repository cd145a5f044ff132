package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One smoothed row per event. `v_milli` is the event's value in
  * exact milli-units; `ewma_milli` the dyadic trailing mean.
  */
case class EwmaOut(user_id: Long, event_id: Long, v_milli: Long,
                   ewma_milli: Long)

/** Incremental dyadic EWMA — the streaming counterpart of the
  * `w4_ewma` batch query (same weights, same integer arithmetic, same
  * results row for row): per user, the trailing-8 window with weights
  * 128, 64, …, 1 (newest heaviest), numerator and denominator exact
  * longs, truncated integer quotient.
  *
  * State per user is the last `depth − 1` milli-values — O(1), ~56
  * bytes/user at depth 8, so 10⁹ users is tens of GB across a
  * cluster's state stores, independent of traffic volume (the
  * event-list-free discipline of [[SessionPipeline]]). Within a batch
  * the group iterator is unordered → sort batch-locally on
  * (ts, event_id), the batch-parity ordering of the window query;
  * across batches the arrival order is the processing order, exact
  * when the feed is in event-time order per user (the spec drives
  * both orderings).
  */
object EwmaPipeline {

  def ewmaPerUser(events: Dataset[SessionInput], depth: Int = 8): Dataset[EwmaOut] = {
    require(depth >= 1 && depth <= 62, "ewmaPerUser: depth must be in [1, 62]")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[Long], EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessionInput], state: GroupState[Seq[Long]]) =>
          val evs = it.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id))
          // newest first, capped at depth - 1 carried values
          var hist: List[Long] = state.getOption.map(_.toList).getOrElse(Nil)
          val out = evs.map { e =>
            // same HALF_UP milli quantization as the batch query's
            // round(value * 1000)
            val v = java.math.BigDecimal.valueOf(e.value * 1000.0)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
            val window = v :: hist.take(depth - 1)
            var num = 0L
            var den = 0L
            window.zipWithIndex.foreach { case (x, d) =>
              val w = 1L << (depth - 1 - d)
              num += x * w
              den += w
            }
            hist = (v :: hist).take(depth - 1)
            // JVM long `/` truncates toward zero — identical to the
            // batch query's Spark `div` and the oracle's DuckDB `//`
            // even on negative values (all three truncate), so the
            // row-for-row parity contract has no sign restriction.
            EwmaOut(uid, e.event_id, v, num / den)
          }
          state.update(hist)
          out.iterator
      }
  }
}
