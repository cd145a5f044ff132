package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.JdbcIO

/** A-4/A-3 proof against embedded Derby: the reference's static side
  * is a JDBC database read back for enrichment (`voting.py:41–45`);
  * here a real `spark.read.jdbc` / `df.write.jdbc` round trip runs
  * offline, including the two scale behaviors that matter — filter
  * pushdown into the database and range-partitioned parallel reads.
  */
class JdbcIOSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val url = JdbcIO.derbyUrl(
    Files.createTempDirectory("graft-derby").toString + "/db")

  test("events subset round-trips through JDBC write + read") {
    val events = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "value", "event_type")
      .limit(200)
    JdbcIO.write(events, url, "events_rt")
    val back = JdbcIO.read(spark, url, "events_rt")
    assert(back.schema.fieldNames.toSet === events.schema.fieldNames.toSet)
    val a = events.collect().map(_.toSeq).toSet
    val b = back.select("event_id", "user_id", "ts", "value", "event_type")
      .collect().map(_.toSeq).toSet
    assert(b === a)
  }

  test("filters push down into the JDBC scan") {
    JdbcIO.write(Tables.nation(spark, sfDir), url, "nation_rt")
    val q = JdbcIO.read(spark, url, "nation_rt")
      .filter(col("n_regionkey") === 2)
      .select("n_nationkey", "n_name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"), plan)
    assert(q.count() === Tables.nation(spark, sfDir)
      .filter(col("n_regionkey") === 2).count())
  }

  test("streaming foreachBatch JDBC sink round-trips (A-3 complete)") {
    // the reference's stream -> Postgres path (main.py:184-208):
    // per-micro-batch appends through the JDBC writer, then a batch
    // read sees every ingested row
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[String]
    val votes = streaming.VoteGenerator.votes(60, seed = 7)
    val parsed = streaming.VotePipeline.parse(ms.toDF())
      .select("voter_id", "candidate_id", "vote")
    val q = streaming.VotePipeline.toForeachBatch(parsed) { (batch, _) =>
      batch.write.mode("append").jdbc(url, "votes_stream", JdbcIO.props())
    }.start()
    ms.addData(votes.take(40)); q.processAllAvailable()
    ms.addData(votes.drop(40)); q.processAllAvailable()
    q.stop()
    val back = JdbcIO.read(spark, url, "votes_stream")
    assert(back.count() === 60)
    assert(back.agg(sum("vote")).head.getLong(0) === 60) // vote = lit(1) each
  }

  test("idempotent batch writer converges under batch replay") {
    val rows = Tables.region(spark, sfDir) // 5 rows
    val write = JdbcIO.idempotentBatchWriter(url, "region_idem") _
    write(rows, 0L)
    write(rows, 0L) // streaming replay of the same uncommitted batch
    assert(JdbcIO.read(spark, url, "region_idem").count() === 5,
      "replaying a batch must not duplicate its rows")
    write(rows, 1L) // a NEW batch appends
    val back = JdbcIO.read(spark, url, "region_idem")
    assert(back.count() === 10)
    assert(back.select("batch_id").distinct().count() === 2)
  }

  test("range-partitioned read splits into parallel bounded queries") {
    JdbcIO.write(Tables.customer(spark, sfDir), url, "customer_rt")
    val part = JdbcIO.readPartitioned(spark, url, "customer_rt",
      partitionColumn = "c_custkey", lowerBound = 0L, upperBound = 2000L,
      numPartitions = 4)
    assert(part.rdd.getNumPartitions === 4)
    assert(part.count() === Tables.customer(spark, sfDir).count())
    // no rows lost or duplicated at the range boundaries
    val a = Tables.customer(spark, sfDir).select("c_custkey").as[Long].collect().sorted
    val b = part.select("c_custkey").as[Long].collect().sorted
    assert(b.toSeq === a.toSeq)
  }
}
