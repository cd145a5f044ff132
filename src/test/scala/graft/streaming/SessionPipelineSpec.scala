package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import graft.operators.RelationalOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Incremental sessionization must be prefix-consistent with the batch
  * lag+running-sum formulation ([[RelationalOps.sessionize]]) for every
  * CLOSED session.
  */
class SessionPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val gapSec = 60L
  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // user 1: two sessions (gap at 200s); user 2: one session
  private val eventsB1 = Seq(
    SessionInput(1L, 1L, ts(10), 1.0),
    SessionInput(1L, 2L, ts(40), 2.0),
    SessionInput(2L, 3L, ts(15), 5.0))
  private val eventsB2 = Seq(
    SessionInput(1L, 4L, ts(300), 3.0), // >60s after 40 -> new session
    SessionInput(2L, 5L, ts(50), 1.5))  // continues user 2's session
  // sentinel far in the future: advances the watermark so every open
  // session times out and closes
  private val sentinel = Seq(SessionInput(99L, 999L, ts(100000), 0.0))

  private val runSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def runStream(pipeline: org.apache.spark.sql.Dataset[SessionInput] =>
      org.apache.spark.sql.Dataset[SessionAgg] =
        SessionPipeline.sessionize(_, gapSec)): Map[(Long, Long), (Long, Long, Double)] = {
    implicit val ctx = spark.sqlContext
    val name = s"sessions_${runSeq.incrementAndGet()}"
    val ms = MemoryStream[SessionInput]
    val q = pipeline(ms.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    ms.addData(eventsB1); q.processAllAvailable()
    ms.addData(eventsB2); q.processAllAvailable()
    ms.addData(sentinel); q.processAllAvailable()
    // one more batch so timeouts fired by the sentinel's watermark emit
    ms.addData(Seq(SessionInput(99L, 1000L, ts(100001), 0.0))); q.processAllAvailable()
    q.stop()
    spark.table(name).as[SessionAgg].collect()
      .filter(_.user_id != 99L)
      .map(s => (s.user_id, s.session_start.getTime / 1000) ->
        ((s.session_end.getTime / 1000, s.n_events, s.total_value))).toMap
  }

  test("closed sessions match the batch sessionize rollup") {
    val streamed = runStream()
    val batch = RelationalOps.sessionize(
      (eventsB1 ++ eventsB2).toDF(), "user_id", "ts", Seq(col("event_id").asc), gapSec)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("start"), max(col("ts")).as("end"),
        count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select("user_id", "start", "end", "n", "total")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
      .map { case (u, s, e, n, t) =>
        (u, s.getTime / 1000) -> ((e.getTime / 1000, n, t)) }.toMap

    assert(streamed === batch)
    assert(streamed.size === 3, "expected 2 sessions for user 1 + 1 for user 2")
  }


  test("transformWithState sessionizer (event-time timers) matches flatMapGroupsWithState exactly") {
    // same feed, same batch boundaries; the SessionProcessor's explicit
    // delete/re-register timer discipline must reproduce the
    // EventTimeTimeout form's closed sessions bit-for-bit
    withStateStoreProvider(RocksDbProvider) {
      val tws = runStream(SessionPipeline.sessionizeTws(_, gapSec))
      val fmgs = runStream()
      assert(tws === fmgs)
      assert(tws.size === 3)
    }
  }

  test("closed sessions are identical under the RocksDB state store") {
    // flatMapGroupsWithState's custom state object must round-trip
    // through RocksDB (serialized off-heap) exactly as through the
    // default in-memory store — the config a 100 TB stream ships with
    val rocks = withStateStoreProvider(RocksDbProvider) { runStream() }
    assert(rocks === runStream(), "session output must not depend on the state backend")
    assert(rocks.size === 3)
  }

  test("a late event inside the watermark merges backward, extending session_start") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[SessionInput]
    val q = SessionPipeline.sessionize(ms.toDS(), gapSec)
      .writeStream.format("memory").queryName("late_merge").outputMode("append").start()
    ms.addData(Seq(SessionInput(7L, 1L, ts(200), 1.0)))
    q.processAllAvailable() // watermark now 190s
    ms.addData(Seq(SessionInput(7L, 2L, ts(195), 2.0))) // late but accepted
    q.processAllAvailable()
    ms.addData(Seq(SessionInput(99L, 999L, ts(100000), 0.0))) // close via timeout
    q.processAllAvailable()
    ms.addData(Seq(SessionInput(99L, 1000L, ts(100001), 0.0)))
    q.processAllAvailable(); q.stop()
    val out = spark.table("late_merge").as[SessionAgg].collect()
      .filter(_.user_id == 7L)
    assert(out.length === 1)
    assert(out.head.session_start === ts(195) && out.head.n_events === 2,
      "the late event must fold into the open session and pull session_start back")
  }

  test("TTL mode: an idle session's state evicts and a re-arrival opens a fresh session") {
    // TTLConfig requires TimeMode.ProcessingTime, whose runtime
    // constructs micro-batches continuously — processAllAvailable
    // livelocks and even Trigger.AvailableNow never runs out of
    // batches (see StateTtlSpec). So: explicit 500 ms trigger, await
    // each feed by polling for a CONTENT signal with a timeout, and
    // never wait on query lifecycle. Batch 1 carries a sentinel user
    // whose in-batch gap closes immediately — the only way a
    // processing-time sessionizer with no timers signals batch-1
    // completion (user 7's open session emits nothing by design).
    withStateStoreProvider(RocksDbProvider) {
      def awaitUser(name: String, uid: Long, timeoutMs: Long = 120000L): Seq[SessionAgg] = {
        val deadline = System.currentTimeMillis() + timeoutMs
        def rows() = spark.table(name).as[SessionAgg].collect()
          .filter(_.user_id == uid).toSeq
        while (rows().isEmpty) {
          if (System.currentTimeMillis() > deadline)
            fail(s"$name: no closed session for user $uid in ${timeoutMs} ms")
          Thread.sleep(100L)
        }
        rows()
      }
      def run(name: String, ttlMillis: Long): Seq[SessionAgg] = {
        implicit val ctx = spark.sqlContext
        val ms = MemoryStream[SessionInput]
        val q = SessionPipeline
          .sessionizeTws(ms.toDS(), gapSec, ttlMillis = ttlMillis)
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
          .start()
        try {
          // batch 1: user 7 opens a session (no emission); sentinel
          // user 8's in-batch 65 s gap closes (5,5) immediately,
          // signalling the batch landed. Sentinel times stay LOW so
          // the event-time control's watermark (70−10=60) does not
          // late-drop batch 2's ts(70).
          ms.addData(Seq(
            SessionInput(7L, 1L, ts(10), 1.0), SessionInput(7L, 2L, ts(40), 2.0),
            SessionInput(8L, 3L, ts(5), 0.5), SessionInput(8L, 4L, ts(70), 0.5)))
          awaitUser(name, 8L)
          Thread.sleep(4000L)
          // batch 2: ts(70) is within the 60 s gap of ts(40) — merges
          // iff the open session survived the idle window; ts(300)
          // then forces the close-emission that reveals the boundary
          ms.addData(Seq(
            SessionInput(7L, 5L, ts(70), 4.0), SessionInput(7L, 6L, ts(300), 8.0)))
          awaitUser(name, 7L)
        } finally q.stop()
      }
      // TTL 2 s, idle 4 s: the open session is evicted, the re-arrival
      // starts fresh at ts(70), and batch 1's events are gone
      val evicted = run("sess_ttl_on", ttlMillis = 2000L)
      assert(evicted.map(s => (s.session_start, s.n_events, s.total_value)) ===
        Seq((ts(70), 1L, 4.0)),
        s"evicted state must not merge into the re-arrival: $evicted")
      // control: same feed, same idle, TTL off (event-time mode) — the
      // open session survives and merges across the wall-clock gap
      val kept = run("sess_ttl_off", ttlMillis = 0L)
      assert(kept.map(s =>
        (s.session_start, s.session_end, s.n_events, s.total_value)) ===
        Seq((ts(10), ts(70), 3L, 7.0)),
        s"with TTL off the same idle gap must merge the session: $kept")
    }
  }

  test("mid-batch gap closure emits without waiting for the timeout") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[SessionInput]
    val q = SessionPipeline.sessionize(ms.toDS(), gapSec)
      .writeStream.format("memory").queryName("midbatch").outputMode("append").start()
    // both sessions of user 5 arrive in ONE batch; first must close at
    // once. (Times sit well past epoch 0: a row exactly AT the initial
    // watermark is dropped by the runtime's late-row filter.)
    ms.addData(Seq(
      SessionInput(5L, 1L, ts(100), 1.0),
      SessionInput(5L, 2L, ts(110), 1.0),
      SessionInput(5L, 3L, ts(600), 1.0)))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("midbatch").as[SessionAgg].collect()
    assert(rows.length === 1)
    assert(rows.head.n_events === 2 && rows.head.session_end === ts(110))
  }
}
