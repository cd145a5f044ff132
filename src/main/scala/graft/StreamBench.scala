package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, xxhash64}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{TopKInput, TopKPipeline, VoteGenerator, VotePipeline}

/** Streaming micro-benchmark — the batch Bench's twin for the
  * reference's actual core (`spark_stream.py`): drive N generated vote
  * events through parse → watermark → the two reference aggregations
  * (G-1 votes-per-candidate, G-2 turnout-by-location, update mode) and
  * the windowed hourly aggregation (S-1, append mode) to noop sinks,
  * and report end-to-end rows/s plus per-query micro-batch latency.
  *
  *   sbt 'runMain graft.StreamBench [nEvents] [nFiles] [state]'
  *
  * `state` = `hdfs` (default) or `rocksdb` — the latter swaps in
  * `RocksDBStateStoreProvider`, the backend a 100 TB deployment runs
  * (state spills off-heap to local SST files instead of living as JVM
  * objects), so the state-backend story has a measured number per
  * round, not just the parity specs.
  *
  * Transport is the text file source chunked into `nFiles` files with
  * maxFilesPerTrigger=2, so the run executes nFiles/2 real micro-batches
  * through the full checkpoint/state machinery — not one giant batch
  * (which would measure batch Spark) and not per-event triggers (which
  * would measure scheduler overhead; the reference's own producer is
  * throttled to ~2 events/s, so its published throughput is a floor,
  * not a target). Prints ONE JSON line, mirroring Bench's contract, so
  * round-over-round streaming regressions are visible in BASELINE.md.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toInt).getOrElse(200000)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(20)
    val state = args.lift(2).getOrElse("hdfs")
    val builder = Sessions.configure(SparkSession.builder(), sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    if (state == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietKnownBenignWarnings()

    val root = Files.createTempDirectory("graft-streambench").toString
    val srcDir = s"$root/src"
    Files.createDirectories(Paths.get(srcDir))
    // Generation is setup, not measured: chunk the events across
    // nFiles files; event times advance 1 s/event so the hourly
    // windows close as the watermark advances through the run.
    val events = VoteGenerator.votes(nEvents)
    val per = math.max(1, (nEvents + nFiles - 1) / nFiles)
    events.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      Files.write(Paths.get(srcDir, f"votes-$i%04d.json"),
        String.join("\n", chunk: _*).getBytes)
    }

    def start(name: String, df: org.apache.spark.sql.DataFrame,
              mode: String): StreamingQuery =
      df.writeStream.outputMode(mode).format("noop")
        .option("checkpointLocation", s"$root/chk/$name")
        .queryName(name).start()

    val parsed = VotePipeline.parse(
      spark.readStream.option("maxFilesPerTrigger", 2).text(srcDir))
    // optional 4th query (4th arg): `hh` = Space-Saving heavy hitters
    // per candidate via flatMapGroupsWithState, `tws` = the SAME fold
    // on Spark 4's transformWithState StatefulProcessor (requires the
    // rocksdb state arg — the API is RocksDB-only) — so both
    // arbitrary-state APIs have a measured throughput number per round
    val hhArg = args.lift(3)
    val withHh = hhArg.exists(Set("hh", "tws"))
    import spark.implicits._
    val t0 = System.nanoTime()
    def hhInput = parsed.select(col("candidate_id").as("group"),
      xxhash64(col("voter_id")).as("item"),
      xxhash64(col("voter_id"), col("voting_time")).as("event_id"),
      col("voting_time").as("ts")).as[TopKInput]
    val queries = Seq(
      start("votes_per_candidate", VotePipeline.votesPerCandidate(parsed), "update"),
      start("turnout_by_location", VotePipeline.turnoutByLocation(parsed), "update"),
      start("hourly_votes", VotePipeline.hourlyVotesPerType(parsed), "append")) ++
      (if (withHh) Seq(start("heavy_hitters",
        (if (hhArg.contains("tws")) TopKPipeline.heavyHittersTws(hhInput, 10)
         else TopKPipeline.heavyHitters(hhInput, 10)).toDF(), "append"))
       else Nil)
    queries.foreach(_.processAllAvailable())
    val wallSec = (System.nanoTime() - t0) / 1e9

    val perQuery = queries.map { q =>
      val progress = q.recentProgress.filter(_.numInputRows > 0)
      val durs = progress.map(_.durationMs.get("triggerExecution").toDouble)
      q.stop()
      val batches = durs.length
      val avg = if (batches > 0) durs.sum / batches else 0.0
      val max = if (batches > 0) durs.max else 0.0
      f""""${q.name}":{"batches":$batches,"avg_batch_ms":$avg%.0f,"max_batch_ms":$max%.0f}"""
    }.mkString("{", ",", "}")

    val rowsPerSec = nEvents / wallSec
    println(f"""{"metric":"stream_rows_per_sec","value":$rowsPerSec%.0f,"unit":"rows/sec","events":$nEvents,"files":$nFiles,"state":"$state","wall_sec":$wallSec%.2f,"queries":$perQuery}""")
    spark.stop()
  }
}
