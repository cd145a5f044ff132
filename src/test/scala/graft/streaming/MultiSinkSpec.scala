package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.sources.JdbcIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once dual-sink fanout: one micro-batch feeds a JDBC table
  * AND a parquet topic through [[VotePipeline.toMultiSink]], with a
  * crash injected BETWEEN the two sink writes. The restarted query
  * replays the batch from the checkpoint; because each writer is
  * idempotent per batch id (delete-before-insert / overwrite-by-path),
  * both sinks converge to the same duplicate-free row set — the honest
  * exactly-once contract when no cross-sink transaction exists.
  */
class MultiSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("dual-sink fanout survives a mid-batch crash: replay converges both sinks") {
    val root = Files.createTempDirectory("graft-multisink").toString
    val (srcDir, chkDir, pqDir) = (s"$root/src", s"$root/chk", s"$root/pq")
    Files.createDirectories(Paths.get(srcDir))
    val url = JdbcIO.derbyUrl(s"$root/db")

    def parquetByBatch(batch: DataFrame, id: Long): Unit =
      batch.write.mode("overwrite").parquet(s"$pqDir/batch_id=$id")

    @volatile var crashArmed = false
    def crashOnce(batch: DataFrame, id: Long): Unit =
      if (crashArmed) { crashArmed = false; sys.error("injected sink crash") }

    def runOnce(): Unit = {
      val parsed = VotePipeline.parse(spark.readStream.text(srcDir))
        .select("voter_id", "candidate_id")
      val q = VotePipeline.toMultiSink(parsed)(
          JdbcIO.idempotentBatchWriter(url, "votes_dual"),
          crashOnce, // fires AFTER jdbc wrote, BEFORE parquet — worst split
          parquetByBatch)
        .option("checkpointLocation", chkDir)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }

    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(srcDir, name), String.join("\n", lines: _*).getBytes)

    writeFile("a.json", VoteGenerator.votes(30))
    runOnce() // clean batch through both sinks

    writeFile("b.json", VoteGenerator.votes(20, seed = 7))
    crashArmed = true
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce() // jdbc writes batch 1, then the injected crash kills the query
    }
    assert(!crashArmed, "the injected crash must actually have fired")
    runOnce() // restart: batch 1 REPLAYS to both sinks and converges

    val fromJdbc = JdbcIO.read(spark, url, "votes_dual")
      .select("voter_id", "candidate_id")
    val fromParquet = spark.read.parquet(pqDir).select("voter_id", "candidate_id")
    assert(fromJdbc.count() === 50,
      "jdbc must hold each vote exactly once despite the replayed batch")
    assert(fromParquet.count() === 50)
    assert(fromJdbc.except(fromParquet).isEmpty && fromParquet.except(fromJdbc).isEmpty,
      "both sinks must converge to the same row set")
  }
}
