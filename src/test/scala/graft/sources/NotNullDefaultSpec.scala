package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

/** NOT NULL and DEFAULT column contracts on the SQL catalog: NOT NULL
  * is enforced at COMMIT time (one fused pass with the CHECK
  * constraints — a violating write publishes nothing), `SET NOT NULL`
  * proves the live rows first, and `ADD COLUMN ... DEFAULT` serves the
  * frozen default for rows that predate the column — zero rewrites,
  * old files read the promise, not null.
  */
class NotNullDefaultSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-nnd-wh").toString
    spark.conf.set("spark.sql.catalog.gnnd", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gnnd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnnd.db")
    wh
  }

  private def root(table: String): String = s"$warehouse/db/$table"

  private def causes(t: Throwable): Seq[Throwable] =
    if (t == null) Nil else t +: causes(t.getCause)

  test("CREATE TABLE NOT NULL: a null-bearing write is rejected at commit, nothing publishes") {
    warehouse
    spark.sql("CREATE TABLE gnnd.db.nn (k BIGINT NOT NULL, v STRING)")
    spark.sql("INSERT INTO gnnd.db.nn VALUES (1, 'a'), (2, 'b')")
    val vBefore = TxnLog.currentVersion(root("nn"))
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gnnd.db.nn SELECT IF(id = 1, NULL, id), 'x' " +
        "FROM range(0, 3)")
    }
    assert(causes(e).exists(c => Option(c.getMessage).exists(m =>
      m.contains("NOT NULL") || m.toLowerCase.contains("null"))), s"got: $e")
    assert(TxnLog.currentVersion(root("nn")) === vBefore,
      "a rejected write must publish nothing")
    assert(spark.sql("SELECT count(*) FROM gnnd.db.nn").head.getLong(0) === 2L)
  }

  test("the raw merge path honors NOT NULL too (commit-time, not analysis-time)") {
    warehouse
    import spark.implicits._
    spark.sql("CREATE TABLE gnnd.db.nnm (k BIGINT NOT NULL, v BIGINT)")
    spark.sql("INSERT INTO gnnd.db.nnm VALUES (1, 10), (2, 20)")
    val vBefore = TxnLog.currentVersion(root("nnm"))
    val bad = Seq((Option.empty[Long], 99L), (Some(3L), 30L))
      .toDF("k", "v")
    val e = intercept[Exception] {
      TxnLog.mergeInto(spark, root("nnm"), bad, "k", "nnm-merge-1")
    }
    assert(causes(e).exists(c => Option(c.getMessage).exists(
      _.contains("NOT NULL"))), s"got: $e")
    assert(TxnLog.currentVersion(root("nnm")) === vBefore)
  }

  test("streamed epochs honor NOT NULL even with zero CHECK constraints: a null-bearing epoch fails, nothing publishes") {
    warehouse
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    // NOT NULL column, NO CHECK constraints — pre-fix, the sink's
    // gate keyed the commit-time pass on activeConstraints alone and
    // a null-bearing epoch sailed through
    spark.sql("CREATE TABLE gnnd.db.nns (k BIGINT NOT NULL, v BIGINT)")
    val ckpt = Files.createTempDirectory("graft-nns-ckpt").toString
    val in = MemoryStream[(Option[Long], Long)](spark)
    val q = in.toDF().selectExpr("_1 AS k", "_2 AS v")
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("gnnd.db.nns")
    try {
      in.addData((Some(1L), 10L))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM gnnd.db.nns").head.getLong(0) === 1L)
      val vBefore = TxnLog.currentVersion(root("nns"))
      in.addData((None, 99L), (Some(2L), 20L))
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(causes(e).exists(c => Option(c.getMessage).exists(
        _.contains("NOT NULL"))) ||
        causes(e).exists(_.isInstanceOf[TxnLog.ConstraintViolationException]),
        s"got: $e")
      assert(TxnLog.currentVersion(root("nns")) === vBefore,
        "a null-bearing epoch must publish nothing")
      assert(spark.sql("SELECT count(*) FROM gnnd.db.nns").head.getLong(0) === 1L)
    } finally q.stop()
  }

  test("SET NOT NULL proves the live rows; DROP NOT NULL is metadata-only") {
    warehouse
    spark.sql("CREATE TABLE gnnd.db.sn (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gnnd.db.sn SELECT id, IF(id = 7, NULL, id) " +
      "FROM range(0, 10)")
    // v holds a null: SET NOT NULL must refuse (the SQL spelling is a
    // procedure — Spark's analyzer categorically blocks the
    // tightening direction of ALTER COLUMN, the log can prove it)
    val e = intercept[Exception] {
      spark.sql("CALL gnnd.system.set_not_null(table => 'db.sn', column => 'v')")
    }
    assert(causes(e).exists(c => Option(c.getMessage).exists(
      _.contains("SET NOT NULL"))), s"got: $e")
    // delete the offending row -> the DV-filtered probe passes
    spark.sql("DELETE FROM gnnd.db.sn WHERE k = 7")
    spark.sql("CALL gnnd.system.set_not_null(table => 'db.sn', column => 'v')")
    assert(!spark.table("gnnd.db.sn").schema("v").nullable)
    // and the contract now bites on writes
    val vBefore = TxnLog.currentVersion(root("sn"))
    intercept[Exception] {
      spark.sql("INSERT INTO gnnd.db.sn SELECT 100, IF(true, NULL, 1L)")
    }
    assert(TxnLog.currentVersion(root("sn")) === vBefore)
    spark.sql("ALTER TABLE gnnd.db.sn ALTER COLUMN v DROP NOT NULL")
    assert(spark.table("gnnd.db.sn").schema("v").nullable)
    spark.sql("INSERT INTO gnnd.db.sn VALUES (100, NULL)")
    assert(spark.sql("SELECT count(*) FROM gnnd.db.sn WHERE v IS NULL")
      .head.getLong(0) === 1L)
  }

  test("ADD COLUMN DEFAULT: pre-evolution files yield the default, not null; inserts resolve it") {
    warehouse
    spark.sql("CREATE TABLE gnnd.db.dc (k BIGINT)")
    spark.sql("INSERT INTO gnnd.db.dc SELECT id FROM range(0, 5)")     // pre-evolution file
    spark.sql("ALTER TABLE gnnd.db.dc ADD COLUMN tier STRING DEFAULT 'bronze'")
    // old rows read the FROZEN default
    assert(spark.sql("SELECT count(*) FROM gnnd.db.dc WHERE tier = 'bronze'")
      .head.getLong(0) === 5L)
    assert(spark.sql("SELECT count(*) FROM gnnd.db.dc WHERE tier IS NULL")
      .head.getLong(0) === 0L)
    // an insert that omits the column gets the current default
    spark.sql("INSERT INTO gnnd.db.dc (k) VALUES (100)")
    assert(spark.sql("SELECT tier FROM gnnd.db.dc WHERE k = 100")
      .head.getString(0) === "bronze")
    // SET DEFAULT changes FUTURE inserts only; old rows keep the promise
    spark.sql("ALTER TABLE gnnd.db.dc ALTER COLUMN tier SET DEFAULT 'silver'")
    spark.sql("INSERT INTO gnnd.db.dc (k) VALUES (101)")
    assert(spark.sql("SELECT tier FROM gnnd.db.dc WHERE k = 101")
      .head.getString(0) === "silver")
    assert(spark.sql("SELECT count(*) FROM gnnd.db.dc WHERE tier = 'bronze'")
      .head.getLong(0) === 6L, "pre-evolution rows keep the frozen default")
    // explicit DEFAULT keyword resolves too
    spark.sql("INSERT INTO gnnd.db.dc VALUES (102, DEFAULT)")
    assert(spark.sql("SELECT tier FROM gnnd.db.dc WHERE k = 102")
      .head.getString(0) === "silver")
  }

  test("ADD COLUMN NOT NULL requires a non-null DEFAULT; with one, old rows satisfy it") {
    warehouse
    spark.sql("CREATE TABLE gnnd.db.nd (k BIGINT)")
    spark.sql("INSERT INTO gnnd.db.nd SELECT id FROM range(0, 4)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gnnd.db.nd ADD COLUMN w BIGINT NOT NULL")
    }
    assert(causes(e).exists(c => Option(c.getMessage).exists(
      _.contains("DEFAULT"))), s"got: $e")
    spark.sql("ALTER TABLE gnnd.db.nd ADD COLUMN w BIGINT NOT NULL DEFAULT 42")
    assert(spark.sql("SELECT count(*) FROM gnnd.db.nd WHERE w = 42")
      .head.getLong(0) === 4L)
    assert(!spark.table("gnnd.db.nd").schema("w").nullable)
    // the commit-time contract holds for the new column
    val vBefore = TxnLog.currentVersion(root("nd"))
    intercept[Exception] {
      spark.sql("INSERT INTO gnnd.db.nd VALUES (9, IF(true, NULL, 1L))")
    }
    assert(TxnLog.currentVersion(root("nd")) === vBefore)
  }
}
