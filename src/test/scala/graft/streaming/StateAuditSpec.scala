package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Offline state introspection via the `statestore` data source — the
  * ops capability a 100 TB streaming deployment leans on when a
  * stateful query misbehaves: read the checkpoint's state AS A TABLE
  * (no query restart, no debugger on an executor) and audit it against
  * what the query emitted. Here: the Space-Saving heavy-hitter state
  * must equal the last emitted snapshot, counter for counter.
  */
class StateAuditSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("statestore read of the heavy-hitter checkpoint matches the emitted snapshot") {
    implicit val ctx = spark.sqlContext
    val chk = Files.createTempDirectory("graft-state-audit").toString
    val k = 5
    val feed = (1 to 200).map { i =>
      TopKInput(if (i % 2 == 0) "a" else "b", (i % 7).toLong, i.toLong, ts(i.toLong))
    }
    val ms = MemoryStream[TopKInput]
    val q = TopKPipeline.heavyHitters(ms.toDS(), k)
      .writeStream.format("memory").queryName("topk_state_audit")
      .option("checkpointLocation", chk)
      .outputMode("append").start()
    try {
      val (b1, b2) = feed.splitAt(120)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val emitted = spark.table("topk_state_audit").as[HeavyHitter].collect()
    val lastVer = emitted.map(_.ver).max
    val snapshot = emitted.filter(_.ver == lastVer)
      .map(h => (h.group, h.item, h.cnt_hi, h.cnt_lo)).toSet

    // the checkpointed state, read back as a table
    val state = spark.read.format("statestore").load(chk)
    val audited = state.selectExpr("key.value AS group", "value.*")
      .as[(String, TopKState)].collect()
      .flatMap { case (g, s) =>
        s.counters.map(c => (g, c.item, c.count, c.count - c.err))
      }.toSet
    assert(audited === snapshot,
      s"offline state $audited must equal the emitted snapshot $snapshot")
  }
}
