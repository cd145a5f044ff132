package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

/** `readStream.table("cat.db.t.changes")` — the CDF subscription
  * point, SQL-only end to end: the STREAMED feed must equal the batch
  * feed over the same version range (same rows, same
  * `_commit_version` stamps), resume from the engine checkpoint
  * across restarts, and refuse the kinds that cannot stream.
  */
class ChangesFeedStreamSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-cfs-wh").toString
    spark.conf.set("spark.sql.catalog.gcfs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcfs.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcfs.db")
    wh
  }

  private def drainTo(view: String, ckpt: String, startingVersion: Option[Long]): Unit = {
    val r = spark.readStream
    startingVersion.foreach(v => r.option("startingVersion", v))
    val q = r.table("gcfs.db.t.changes")
      .writeStream.format("memory").queryName(view)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
  }

  test("streamed t.changes drains to exactly the batch feed, inclusive bounds and stamps aligned") {
    warehouse
    spark.sql("CREATE TABLE gcfs.db.t (k BIGINT, v BIGINT)")        // v1
    spark.sql("INSERT INTO gcfs.db.t SELECT id, id FROM range(0, 10)")   // v2
    spark.sql("INSERT INTO gcfs.db.t SELECT id, id FROM range(10, 25)")  // v3
    spark.sql("DELETE FROM gcfs.db.t WHERE k % 2 = 0")              // v4 (DV, no adds)
    spark.sql("INSERT INTO gcfs.db.t SELECT id, id FROM range(25, 30)")  // v5

    def batchFeed(from: Long) = spark.read
      .option("startingVersion", from).table("gcfs.db.t.changes")
      .select("k", "v", GraftFeedTable.VersionCol)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toList

    // full drain equals the full batch feed — a FILE sink, so the
    // same checkpoint can resume below (memory sinks cannot recover)
    val ck1 = Files.createTempDirectory("graft-cfs-ck1").toString
    val out1 = Files.createTempDirectory("graft-cfs-out1").toString
    def drainToFiles(): Unit = {
      val q = spark.readStream.table("gcfs.db.t.changes")
        .writeStream.format("parquet").option("path", out1)
        .option("checkpointLocation", ck1).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    def filesFeed() = spark.read.parquet(out1)
      .selectExpr("k", "v", GraftFeedTable.VersionCol)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toList
    drainToFiles()
    val gotAll = filesFeed()
    assert(gotAll === batchFeed(1L))
    assert(gotAll.map(_._3).distinct.sorted === List(2L, 3L, 5L))

    // startingVersion keeps the batch feed's INCLUSIVE meaning
    val ck2 = Files.createTempDirectory("graft-cfs-ck2").toString
    drainTo("cfs_from3", ck2, Some(3L))
    val got3 = spark.sql(
        s"SELECT k, v, ${GraftFeedTable.VersionCol} FROM cfs_from3")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toList
    assert(got3 === batchFeed(3L))
    assert(got3.map(_._3).distinct.sorted === List(3L, 5L))

    // RESTART from the same checkpoint: only commits past the offset
    spark.sql("INSERT INTO gcfs.db.t SELECT id, id FROM range(30, 33)")  // v6
    drainToFiles()
    val gotAll2 = filesFeed()
    assert(gotAll2 === (gotAll ++ (30L until 33L).map(i => (i, i, 6L))).sorted,
      "a resumed subscription must append ONLY the new commits")
  }

  test("the deletes feed stays batch-only") {
    warehouse
    val e = intercept[Exception] {
      val q = spark.readStream.table("gcfs.db.t.deletes")
        .writeStream.format("memory").queryName("cfs_del")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-cfs-ckd").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(e != null)
  }
}
