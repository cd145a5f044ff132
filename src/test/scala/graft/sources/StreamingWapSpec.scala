package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

/** The COMPOSITION the pieces were built for: audited streaming
  * ingest — `writeStream.toTable("cat.db.t.branch_<name>")` lands
  * exactly-once epochs on a branch (X-A54 × X-A74), commit-time
  * contracts (NOT NULL / CHECK) gate every epoch upstream of the
  * audit (X-A42/X-A72), and `CALL publish_branch` fast-forwards main
  * by exactly the audited rows in ONE strict commit. This is the
  * Iceberg write-audit-publish workflow with a streaming producer:
  * raw epochs never touch main; a human (or job) audits the branch
  * and publishes — or drops it and main never knew.
  */
class StreamingWapSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-swap-wh").toString
    spark.conf.set("spark.sql.catalog.gswap", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gswap.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gswap.db")
    wh
  }

  private def root(table: String): String = s"$warehouse/db/$table"

  private def causes(t: Throwable): Seq[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(12).toSeq

  test("audited streaming ingest: epochs land on the branch invisible to main; publish ffs exactly the audited rows") {
    warehouse
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    spark.sql("CREATE TABLE gswap.db.ing (k BIGINT NOT NULL, v BIGINT)")
    spark.sql("INSERT INTO gswap.db.ing SELECT id, id * 10 FROM range(0, 10)")
    val mainV = TxnLog.currentVersion(root("ing"))
    spark.sql("CALL gswap.system.create_branch(table => 'db.ing', branch => 'audit')")

    val ckpt = Files.createTempDirectory("graft-swap-ckpt").toString
    val in = MemoryStream[(Long, Long)](spark)
    def start() = in.toDF().selectExpr("_1 AS k", "_2 AS v")
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("gswap.db.ing.branch_audit")

    val q1 = start()
    try {
      in.addData((10L, 100L), (11L, -1L)) // k=11 carries a bad value
      q1.processAllAvailable()
      in.addData((12L, 120L))
      q1.processAllAvailable()
    } finally q1.stop()

    // main is UNTOUCHED by the streamed epochs
    assert(TxnLog.currentVersion(root("ing")) === mainV)
    assert(spark.sql("SELECT count(*) FROM gswap.db.ing").head.getLong(0) === 10L)
    // the branch holds seed + both epochs
    assert(spark.sql("SELECT count(*) FROM gswap.db.ing.branch_audit")
      .head.getLong(0) === 13L)

    // RESTART from the same checkpoint: continuity, no duplication —
    // an idle restart re-publishes nothing to the branch
    val bV = TxnLog.currentVersion(TxnLog.branchRoot(root("ing"), "audit"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(TxnLog.currentVersion(TxnLog.branchRoot(root("ing"), "audit")) === bV,
        "an idle restart must not re-commit replayed epochs")
      in.addData((13L, 130L))
      q2.processAllAvailable()
    } finally q2.stop()

    // every streamed epoch committed exactly once on the BRANCH ledger
    val txns = TxnLog.commits(TxnLog.branchRoot(root("ing"), "audit"))
      .map(_.txnId).filter(_.startsWith("stream-"))
    assert(txns.nonEmpty && txns.distinct.size === txns.size)

    // AUDIT: the gate finds the bad row and repairs it on the branch
    // (a DV delete — main still never sees any of this)
    assert(spark.sql(
      "SELECT count(*) FROM gswap.db.ing.branch_audit WHERE v < 0")
      .head.getLong(0) === 1L)
    spark.sql("DELETE FROM gswap.db.ing.branch_audit WHERE v < 0")

    // PUBLISH: one strict-ff commit; main == seed + audited stream rows
    spark.sql("CALL gswap.system.publish_branch(table => 'db.ing', branch => 'audit')")
    assert(TxnLog.currentVersion(root("ing")) === mainV + 1)
    val got = spark.sql("SELECT k, v FROM gswap.db.ing")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0L until 10L).map(k => k -> k * 10).toMap ++
      Map(10L -> 100L, 12L -> 120L, 13L -> 130L)
    assert(got === want)
  }

  test("commit-time contracts gate streamed branch epochs: a violating epoch publishes nothing anywhere") {
    warehouse
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    spark.sql("CREATE TABLE gswap.db.gate (k BIGINT NOT NULL, v BIGINT)")
    spark.sql(
      "ALTER TABLE gswap.db.gate SET TBLPROPERTIES('graft.constraint.v_pos'='v >= 0')")
    spark.sql("INSERT INTO gswap.db.gate VALUES (1, 10)")
    spark.sql("CALL gswap.system.create_branch(table => 'db.gate', branch => 'a')")
    val broot = TxnLog.branchRoot(root("gate"), "a")
    val mainV = TxnLog.currentVersion(root("gate"))
    val bV = TxnLog.currentVersion(broot)

    val ckpt = Files.createTempDirectory("graft-swapg-ckpt").toString
    val in = MemoryStream[(Option[Long], Long)](spark)
    val q = in.toDF().selectExpr("_1 AS k", "_2 AS v")
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("gswap.db.gate.branch_a")
    try {
      // the branch fork CARRIES the CHECK constraint: v < 0 rejects
      in.addData((Some(2L), -5L))
      val e1 = intercept[Exception] { q.processAllAvailable() }
      assert(causes(e1).exists(_.isInstanceOf[TxnLog.ConstraintViolationException]) ||
        causes(e1).exists(c => Option(c.getMessage).exists(_.contains("v_pos"))),
        s"got: $e1")
    } finally q.stop()

    // ... and NOT NULL holds too, on a fresh stream (the failed query
    // is dead; its checkpoint must not poison a new one)
    val ckpt2 = Files.createTempDirectory("graft-swapg-ckpt2").toString
    val in2 = MemoryStream[(Option[Long], Long)](spark)
    val q2 = in2.toDF().selectExpr("_1 AS k", "_2 AS v")
      .writeStream.option("checkpointLocation", ckpt2)
      .toTable("gswap.db.gate.branch_a")
    try {
      in2.addData((None, 7L))
      val e2 = intercept[Exception] { q2.processAllAvailable() }
      assert(causes(e2).exists(c => Option(c.getMessage).exists(
        _.contains("NOT NULL"))) ||
        causes(e2).exists(_.isInstanceOf[TxnLog.ConstraintViolationException]),
        s"got: $e2")
    } finally q2.stop()

    // nothing published: branch AND main both exactly where they were
    assert(TxnLog.currentVersion(broot) === bV)
    assert(TxnLog.currentVersion(root("gate")) === mainV)
    assert(spark.sql("SELECT count(*) FROM gswap.db.gate.branch_a")
      .head.getLong(0) === 1L)
  }

  test("main movement since fork conflicts the publish of a streamed branch; the audited rows survive on the branch") {
    warehouse
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    spark.sql("CREATE TABLE gswap.db.race (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gswap.db.race VALUES (1, 10)")
    spark.sql("CALL gswap.system.create_branch(table => 'db.race', branch => 'b')")

    val ckpt = Files.createTempDirectory("graft-swapr-ckpt").toString
    val in = MemoryStream[(Long, Long)](spark)
    val q = in.toDF().selectExpr("_1 AS k", "_2 AS v")
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("gswap.db.race.branch_b")
    try {
      in.addData((2L, 20L))
      q.processAllAvailable()
    } finally q.stop()

    // main moves after the fork — even a pure append gates the ff
    spark.sql("INSERT INTO gswap.db.race VALUES (99, 990)")
    val vBefore = TxnLog.currentVersion(root("race"))
    val e = intercept[Exception] {
      spark.sql("CALL gswap.system.publish_branch(table => 'db.race', branch => 'b')")
    }
    assert(causes(e).exists(_.isInstanceOf[TxnLog.ConflictException]), s"got: $e")
    assert(TxnLog.currentVersion(root("race")) === vBefore, "nothing stacked")
    // the audited epoch is still intact on the branch for a re-fork
    assert(spark.sql("SELECT count(*) FROM gswap.db.race.branch_b")
      .head.getLong(0) === 2L)
  }
}
