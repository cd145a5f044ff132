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
