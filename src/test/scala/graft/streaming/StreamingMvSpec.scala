package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.operators.RelationalOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming incremental materialized-view maintenance — the streaming
  * half of [[RelationalOps.mergeAggSnapshot]]'s contract: each
  * micro-batch's aggregates fold into the previous snapshot VERSION
  * (written immutably, committed by a pointer flip — the
  * snapshot-versioning shape parquet-backed table formats use), so
  * view freshness costs |snapshot| + |batch| per trigger instead of a
  * re-scan of everything ever ingested. The final version must equal
  * a from-scratch batch aggregate over the full input — Structured
  * Streaming's prefix-consistency makes that the whole correctness
  * statement.
  */
class StreamingMvSpec extends SparkTestBase {
  import spark.implicits._

  test("foreachBatch folds each micro-batch into the aggregate snapshot; final version equals a batch recompute") {
    implicit val ctx = spark.sqlContext
    val root = Files.createTempDirectory("graft-mv").toString
    @volatile var current: Option[String] = None

    def aggOf(df: DataFrame): DataFrame =
      df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"),
        max("v").as("mx"))

    val ms = MemoryStream[(Long, Long)]
    val q = VotePipeline.toForeachBatch(ms.toDS().toDF("k", "v")) {
        (batch, id) =>
          val snap = current.map(p => spark.read.parquet(p))
            .getOrElse(aggOf(batch.limit(0))) // first batch: empty view
          val next = s"$root/mv_$id"
          RelationalOps.mergeAggSnapshot(snap, aggOf(batch),
              Seq("k"), Seq("n", "s"), maxCols = Seq("mx"))
            .write.mode("overwrite").parquet(next)
          current = Some(next) // pointer flip = the version commit
          ()
      }
      .option("checkpointLocation", s"$root/chk")
      .start()

    val all = Seq.tabulate(60)(i => ((i % 7).toLong, i.toLong))
    val (b1, rest) = all.splitAt(20)
    val (b2, b3) = rest.splitAt(20)
    Seq(b1, b2, b3).foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()

    assert(current.get.endsWith("mv_2"),
      "three micro-batches must produce three snapshot versions")
    val got = spark.read.parquet(current.get)
    val want = aggOf(all.toDF("k", "v"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "incrementally maintained view must equal the from-scratch aggregate")
  }
}
