package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.operators.RelationalOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** A-7/S-8 proof: the dashboard's poll-and-recompute path
  * (`streamlit-app.py:37–43`) — the streaming aggregation publishes
  * update-mode messages to a topic (file stand-in), a BATCH job
  * re-reads the whole topic, reconstructs per-key latest state, and
  * the dashboard queries (G-3/G-4/O-1/O-2) run over the re-read view.
  */
class TopicReplaySpec extends SparkTestBase {
  import spark.implicits._

  test("Trigger.AvailableNow drains all pending input then self-terminates") {
    // the bounded catch-up shape: process everything available as
    // micro-batches, then stop — what a scheduled (cron-style) refresh
    // of the dashboard topic runs instead of a resident stream
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[String]
    ms.addData(VoteGenerator.votes(80, seed = 3))
    val q = VotePipeline.toMemory(
      VotePipeline.votesPerCandidate(VotePipeline.parse(ms.toDF())), "catchup")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(!q.isActive, "AvailableNow must self-terminate after draining")
    val total = spark.table("catchup")
      .groupBy("candidate_id").agg(max("total_votes").as("tv"))
      .agg(sum("tv")).head.getLong(0)
    assert(total === 80)
  }

  test("batch topic re-read reconstructs latest state and feeds the dashboard queries") {
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-topic").toString + "/agg_topic"
    val ms = MemoryStream[String]
    val batch1 = VoteGenerator.votes(120, seed = 1)
    val batch2 = VoteGenerator.votes(80, seed = 2)

    val agg = VotePipeline.votesPerCandidate(VotePipeline.parse(ms.toDF()))
    val q = VotePipeline.toFileTopic(agg, dir).start()
    ms.addData(batch1); q.processAllAvailable()
    ms.addData(batch2); q.processAllAvailable()
    q.stop()

    // the topic is append-only: the updated candidates appear once per
    // micro-batch, so there are MORE messages than keys
    val messages = VotePipeline.readFileTopic(spark, dir)
    val latest = VotePipeline.latestPerKey(messages, agg.schema, Seq("candidate_id"))
    assert(messages.count() > latest.count())

    // latest-per-key state == batch aggregate over the full input
    val want = VotePipeline.votesPerCandidate(
      VotePipeline.parse(spark.createDataset(batch1 ++ batch2).toDF("value")))
      .select("candidate_id", "total_votes").as[(String, Long)].collect().toMap
    val got = latest.select("candidate_id", "total_votes")
      .as[(String, Long)].collect().toMap
    assert(got === want)

    // dashboard queries over the re-read view:
    // G-3 scalar count of candidates tracked
    val n = RelationalOps.scalarCount(latest, "n_candidates").head.getLong(0)
    assert(n === want.size)
    // G-4 leading candidate (argmax with deterministic tiebreak)
    val leader = RelationalOps.argmax(latest, "total_votes", "candidate_id")
      .select("candidate_id").as[String].head()
    val wantLeader = want.toSeq.sortBy { case (id, v) => (-v, id) }.head._1
    assert(leader === wantLeader)
    // O-1 ranked sort + O-2 pagination
    val ranked = RelationalOps.rankedSort(latest,
      Seq(col("total_votes").desc, col("candidate_id").asc), "rnk")
    assert(ranked.select("rnk").as[Int].collect().toSeq === (1 to want.size))
    val page = RelationalOps.paginate(latest,
      Seq(col("total_votes").desc, col("candidate_id").asc), page = 1, size = 2)
    assert(page.count() <= 2)
  }
}
