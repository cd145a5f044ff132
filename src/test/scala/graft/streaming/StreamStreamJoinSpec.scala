package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Registration(voter_id: String, reg_time: Timestamp)
case class VoteEvt(vote_voter_id: String, voting_time: Timestamp, candidate: String)

class StreamStreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("stream-stream interval join matches votes to registrations within the window") {
    implicit val ctx = spark.sqlContext
    val regs = MemoryStream[Registration]
    val votes = MemoryStream[VoteEvt]
    val joined = VotePipeline.registrationVoteJoin(regs.toDF(), votes.toDF())
    val q = joined.select("voter_id", "candidate")
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()

    regs.addData(Seq(
      Registration("v1", ts(1000)),
      Registration("v2", ts(2000))))
    q.processAllAvailable()
    votes.addData(Seq(
      VoteEvt("v1", ts(1500), "c1"),   // inside [1000, 1000+3600]
      VoteEvt("v2", ts(9999), "c2"),   // beyond the 1-hour interval
      VoteEvt("v9", ts(1600), "c3")))  // unregistered voter
    q.processAllAvailable(); q.stop()

    val out = spark.table("ssj").as[(String, String)].collect().toSet
    assert(out === Set(("v1", "c1")),
      "only the in-window registered voter joins; out-of-window and unknown drop")
  }

  test("left-outer interval join emits null-padded rows only after watermark proves no match") {
    implicit val ctx = spark.sqlContext
    val regs = MemoryStream[Registration]
    val votes = MemoryStream[VoteEvt]
    val joined = VotePipeline.registrationVoteJoin(
      regs.toDF(), votes.toDF(), joinType = "left_outer")
    val q = joined.select("voter_id", "candidate")
      .writeStream.format("memory").queryName("ssj_outer").outputMode("append").start()

    regs.addData(Seq(
      Registration("v1", ts(1000)),    // will match
      Registration("v2", ts(2000))))   // will never match
    votes.addData(Seq(VoteEvt("v1", ts(1500), "c1")))
    q.processAllAvailable()

    def rows = spark.table("ssj_outer").as[(String, Option[String])].collect().toSet
    // v2's interval [2000, 5600] is still open: its outer row MUST NOT
    // have been emitted yet (a premature null row would be wrong — a
    // vote could still arrive)
    assert(rows === Set(("v1", Some("c1"))), s"premature outer emit: $rows")

    // advance BOTH watermarks past 2000 + 3600 + 60s slack; the next
    // batches evict v2's state and release the null-padded row
    val far = 2000L + 3600L + 1200L
    regs.addData(Seq(Registration("v_late", ts(far + 100000))))
    votes.addData(Seq(VoteEvt("v_nobody", ts(far + 100000), "cx")))
    q.processAllAvailable()
    votes.addData(Seq(VoteEvt("v_nobody2", ts(far + 200000), "cy")))
    regs.addData(Seq(Registration("v_late2", ts(far + 200000))))
    q.processAllAvailable()
    q.stop()

    assert(rows.contains(("v2", None)),
      s"watermark passed v2's whole interval — the outer row is due: $rows")
  }

  test("stream-STATIC enrichment join broadcasts the dim inside a streaming query") {
    // the reference's voting.py shape: consumed votes enriched with
    // static candidate metadata. The SAME batch operator
    // (RelationalOps.enrichmentJoin) applies unchanged to a streaming
    // frame — the static side broadcasts per micro-batch, no state
    // store involved (unlike the stream-stream joins above).
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val votes = MemoryStream[VoteEvt]
    val dim = Seq(("c1", "PartyA"), ("c2", "PartyB")).toDF("cand_id", "party")
    val joined = graft.operators.RelationalOps.enrichmentJoin(
      votes.toDF(), dim, col("candidate"), col("cand_id"))
    val q = joined.select("vote_voter_id", "party")
      .writeStream.format("memory").queryName("ss_static").outputMode("append").start()
    votes.addData(Seq(VoteEvt("v1", ts(1000), "c1"), VoteEvt("v2", ts(1001), "c2")))
    q.processAllAvailable()
    votes.addData(Seq(VoteEvt("v3", ts(1002), "c1")))
    q.processAllAvailable()
    val out = spark.table("ss_static").as[(String, String)].collect().toSet
    // the executed micro-batch plan must be a broadcast join — a
    // shuffled dim side per micro-batch would be the silent scale
    // regression
    val lastPlan = q match {
      case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
        w.streamingQuery.lastExecution.executedPlan.toString
    }
    q.stop()
    assert(out === Set(("v1", "PartyA"), ("v2", "PartyB"), ("v3", "PartyA")))
    assert(joined.isStreaming, "join of stream × static must stay streaming")
    assert(lastPlan.contains("BroadcastHashJoin"),
      s"static dim must broadcast per micro-batch:\n$lastPlan")
  }

  test("the join plan is a stateful stream-stream join with watermarks on both sides") {
    implicit val ctx = spark.sqlContext
    val regs = MemoryStream[Registration]
    val votes = MemoryStream[VoteEvt]
    val joined = VotePipeline.registrationVoteJoin(regs.toDF(), votes.toDF())
    val q = joined.writeStream.format("memory").queryName("ssj_plan")
      .outputMode("append").start()
    regs.addData(Seq(Registration("v1", ts(1000))))
    q.processAllAvailable()
    val plan = q.lastProgress.sources.length
    assert(plan === 2, "two streaming sources feed one query")
    q.stop()
  }
}
