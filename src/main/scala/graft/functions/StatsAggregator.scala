package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass running statistics buffer. */
case class RunningStats(vmin: Double, vmax: Double, n: Long, sum: Double)

/** Typed `Aggregator` computing min/max/count/sum in ONE pass — the
  * Dataset-typed custom-aggregation surface (SURVEY.md §7.3),
  * registered as a UDAF via `functions.udaf` so it composes with
  * untyped `groupBy(...).agg(...)` too.
  *
  * Execution shape is identical to built-in aggregates: per-partition
  * `reduce` (map-side partial), shuffle of 4-field buffers keyed by
  * the group, then `merge` — constant-size state per group, so it
  * scales like any HashAggregate. Prefer built-ins when they exist
  * (they get codegen); the typed Aggregator is the right tool when a
  * fused multi-statistic pass or domain-specific buffer is needed.
  */
object StatsAggregator extends Aggregator[Double, RunningStats, RunningStats] {

  override def zero: RunningStats =
    RunningStats(Double.PositiveInfinity, Double.NegativeInfinity, 0L, 0.0)

  override def reduce(b: RunningStats, v: Double): RunningStats =
    RunningStats(math.min(b.vmin, v), math.max(b.vmax, v), b.n + 1, b.sum + v)

  override def merge(a: RunningStats, b: RunningStats): RunningStats =
    RunningStats(math.min(a.vmin, b.vmin), math.max(a.vmax, b.vmax),
      a.n + b.n, a.sum + b.sum)

  override def finish(b: RunningStats): RunningStats = b

  override def bufferEncoder: Encoder[RunningStats] = Encoders.product[RunningStats]
  override def outputEncoder: Encoder[RunningStats] = Encoders.product[RunningStats]
}
