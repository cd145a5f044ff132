package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

/** The UPDATE-mode lakehouse sink
  * (`writeStream.option("mergeKey", c).outputMode("update").toTable`):
  * each epoch's changed rows MERGE into the table by key
  * ([[GraftStreamingUpsertWrite]] → [[TxnLog.mergeInto]]), so the
  * materialized table equals the batch aggregate over everything
  * ingested — the reference's own topology (`spark_stream.py:73,83`,
  * an update-mode streaming aggregate at a sink) finally spelled as a
  * table write. White-box properties the driver hash cannot see:
  * restarts resume the same (queryId, epochId) ledger, a replayed
  * epoch publishes nothing, the guard rails (no mergeKey, bad
  * mergeKey, complete+mergeKey) stay shut.
  */
class GraftUpsertSinkSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-ups-wh").toString
    spark.conf.set("spark.sql.catalog.gups", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gups.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gups.db")
    wh
  }

  private def root(table: String): String = s"$warehouse/db/$table"

  test("update-mode aggregate + mergeKey: the table IS the running batch aggregate, across restarts") {
    warehouse
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{count, lit, sum}
    spark.sql("CREATE TABLE gups.db.upd (g BIGINT, n BIGINT, s BIGINT)")
    val ckpt = Files.createTempDirectory("graft-upd-ckpt").toString
    val in = MemoryStream[Long](spark)
    def start() = in.toDF().selectExpr("value AS v", "value % 5 AS g")
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .select("g", "n", "s")
      .writeStream.outputMode("update")
      .option("mergeKey", "g")
      .option("checkpointLocation", ckpt)
      .toTable("gups.db.upd")

    var fed = List.empty[Long]
    def check(label: String): Unit = {
      val got = spark.sql("SELECT g, n, s FROM gups.db.upd")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val want = fed.groupBy(_ % 5).map { case (g, vs) =>
        g -> ((vs.size.toLong, vs.sum)) }
      assert(got === want, s"$label: table != batch aggregate")
    }

    val q1 = start()
    try {
      in.addData(1L, 2L, 3L, 7L); fed = fed ++ List(1L, 2L, 3L, 7L)
      q1.processAllAvailable(); check("epoch 1")
      // second epoch UPDATES keys 1,2 and INSERTS key 4 — a blind
      // append would now hold stale (g,n) pairs; merge must not
      in.addData(11L, 12L, 4L); fed = fed ++ List(11L, 12L, 4L)
      q1.processAllAvailable(); check("epoch 2")
    } finally q1.stop()

    // RESTART from the same checkpoint: the stable queryId keeps the
    // epoch ledger intact and merging continues where it left off
    val q2 = start()
    try {
      in.addData(21L, 22L, 23L); fed = fed ++ List(21L, 22L, 23L)
      q2.processAllAvailable(); check("after restart")
    } finally q2.stop()

    // every epoch merged exactly once
    val txns = TxnLog.commits(root("upd")).filter(_.txnId.startsWith("stream-"))
      .map(_.txnId)
    assert(txns.distinct.size === txns.size)
  }

  test("append mode + mergeKey: a CDC upsert sink (latest value per key wins)") {
    warehouse
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    spark.sql("CREATE TABLE gups.db.cdc (k BIGINT, v BIGINT)")
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    val in = MemoryStream[(Long, Long)](spark)
    val q = in.toDF().selectExpr("_1 AS k", "_2 AS v")
      .writeStream
      .option("mergeKey", "k")
      .option("checkpointLocation", ckpt)
      .toTable("gups.db.cdc")
    try {
      in.addData((1L, 10L), (2L, 20L))
      q.processAllAvailable()
      in.addData((1L, 11L), (3L, 30L)) // k=1 updated, k=3 inserted
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT k, v FROM gups.db.cdc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 11L, 2L -> 20L, 3L -> 30L))
  }

  test("COMPOSITE mergeKey: an update-mode aggregate over two grouping columns merges by the tuple") {
    warehouse
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{count, lit, sum}
    spark.sql("CREATE TABLE gups.db.cmp (g BIGINT, h BIGINT, n BIGINT, s BIGINT)")
    val ckpt = Files.createTempDirectory("graft-cmp-ckpt").toString
    val in = MemoryStream[Long](spark)
    val q = in.toDF()
      .selectExpr("value AS v", "value % 3 AS g", "value % 4 AS h")
      .groupBy("g", "h")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .select("g", "h", "n", "s")
      .writeStream.outputMode("update")
      .option("mergeKey", "g, h")
      .option("checkpointLocation", ckpt)
      .toTable("gups.db.cmp")
    var fed = List.empty[Long]
    def check(): Unit = {
      val got = spark.sql("SELECT g, h, n, s FROM gups.db.cmp")
        .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
      val want = fed.groupBy(v => (v % 3, v % 4)).map { case (k, vs) =>
        k -> ((vs.size.toLong, vs.sum)) }
      assert(got === want)
    }
    try {
      in.addData(0L to 10L: _*); fed = fed ++ (0L to 10L)
      q.processAllAvailable(); check()
      // second epoch updates SOME (g,h) cells and creates none new —
      // a single-column merge would collide tuples sharing g
      in.addData(12L, 24L, 13L); fed = fed ++ List(12L, 24L, 13L)
      q.processAllAvailable(); check()
    } finally q.stop()
  }

  test("guard rails: bad mergeKey fails fast; complete+mergeKey is rejected; nothing publishes") {
    warehouse
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{count, lit}
    spark.sql("CREATE TABLE gups.db.gr (g BIGINT, n BIGINT)")

    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)

    // mergeKey naming a non-column: the builder refuses before any epoch
    val ckpt1 = Files.createTempDirectory("graft-gr1-ckpt").toString
    val in1 = MemoryStream[Long](spark)
    val e1 = intercept[Exception] {
      val q = in1.toDF().selectExpr("value AS g", "value AS n")
        .writeStream.option("mergeKey", "nope")
        .option("checkpointLocation", ckpt1).toTable("gups.db.gr")
      try { in1.addData(1L); q.processAllAvailable() } finally q.stop()
    }
    assert(causes(e1).exists(c => Option(c.getMessage).exists(
      _.contains("mergeKey"))), s"got: $e1")

    // complete mode + mergeKey: contradictory (replace vs upsert) —
    // the upsert builder has no truncate, so the cast refuses
    val ckpt2 = Files.createTempDirectory("graft-gr2-ckpt").toString
    val in2 = MemoryStream[Long](spark)
    val e2 = intercept[Exception] {
      val q = in2.toDF().selectExpr("value % 3 AS g").groupBy("g")
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete")
        .option("mergeKey", "g")
        .option("checkpointLocation", ckpt2).toTable("gups.db.gr")
      try { in2.addData(1L); q.processAllAvailable() } finally q.stop()
    }
    assert(e2 != null)
    assert(TxnLog.currentVersion(root("gr")) === 1L, "nothing may publish")
  }
}
