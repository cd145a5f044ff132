package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.SparkTestBase

/** COPY INTO (X-A83): idempotent bulk file ingest over the txn log.
  * The ingest ledger (one `md5(path):size` marker per source file)
  * rides the commit record and the checkpoint's `I` lines, so a
  * replayed call loads nothing, an incremental call loads exactly the
  * landing directory's delta, and resolution stays O(tail) at any
  * ingest count.
  */
class CopyIntoSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-ci-wh").toString
    spark.conf.set("spark.sql.catalog.gci", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gci.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gci.db")
    wh
  }

  private def root(table: String): String = s"$warehouse/db/$table"

  /** Write `lo until hi` as one parquet part file named `tag.parquet`
    * inside `landing` — each call models one file arriving in a
    * landing directory.
    */
  private def land(landing: Path, tag: String, lo: Long, hi: Long): Unit = {
    val tmp = Files.createTempDirectory("graft-ci-src").toString
    spark.range(lo, hi).selectExpr("id AS k", "id * 2 AS v")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator()
    val found = Iterator.continually(part)
      .takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(found, landing.resolve(s"$tag.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
  }

  test("copy_into loads once, replays to a no-op, and ingests exactly the landing delta") {
    warehouse
    spark.sql("CREATE TABLE gci.db.t (k BIGINT, v BIGINT)")
    val landing = Files.createTempDirectory("graft-ci-land")
    land(landing, "a", 0, 100)
    land(landing, "b", 100, 200)

    val r1 = spark.sql(
      s"CALL gci.system.copy_into(table => 'db.t', source => '$landing')").head
    assert(r1.getLong(1) === 2L, "two fresh files load")
    assert(r1.getLong(2) === 0L)
    assert(r1.getLong(3) === 200L, "receipt counts staged rows")
    assert(spark.sql("SELECT count(*), sum(k) FROM gci.db.t").head.toSeq ===
      Seq(200L, (0L until 200L).sum))

    // full replay: NOTHING loads, NO commit publishes
    val head = TxnLog.currentVersion(root("t"))
    val r2 = spark.sql(
      s"CALL gci.system.copy_into(table => 'db.t', source => '$landing')").head
    assert(r2.getLong(1) === 0L)
    assert(r2.getLong(2) === 2L, "both files skip via the ledger")
    assert(r2.getLong(0) === head, "a pure replay publishes no commit")
    assert(spark.sql("SELECT count(*) FROM gci.db.t").head.getLong(0) === 200L)

    // the landing dir gains one file: exactly it loads
    land(landing, "c", 200, 250)
    val r3 = spark.sql(
      s"CALL gci.system.copy_into(table => 'db.t', source => '$landing')").head
    assert((r3.getLong(1), r3.getLong(2)) === ((1L, 2L)))
    assert(spark.sql("SELECT count(*) FROM gci.db.t").head.getLong(0) === 250L)
  }

  test("the ingest ledger survives a checkpoint (I lines fold)") {
    warehouse
    spark.sql("CREATE TABLE gci.db.ck (k BIGINT, v BIGINT)")
    val landing = Files.createTempDirectory("graft-ci-ck")
    land(landing, "a", 0, 50)
    spark.sql(s"CALL gci.system.copy_into(table => 'db.ck', source => '$landing')")
    assert(TxnLog.ingestedSources(root("ck")).size === 1)

    spark.sql("CALL gci.system.checkpoint(table => 'db.ck')")
    // the ledger now resolves THROUGH the checkpoint: a replay still skips
    assert(TxnLog.ingestedSources(root("ck")).size === 1)
    val r = spark.sql(
      s"CALL gci.system.copy_into(table => 'db.ck', source => '$landing')").head
    assert((r.getLong(1), r.getLong(2)) === ((0L, 1L)))
  }

  test("a seen path whose size changed refuses loudly (ingested sources are immutable)") {
    warehouse
    spark.sql("CREATE TABLE gci.db.im (k BIGINT, v BIGINT)")
    val landing = Files.createTempDirectory("graft-ci-im")
    land(landing, "a", 0, 10)
    spark.sql(s"CALL gci.system.copy_into(table => 'db.im', source => '$landing')")
    land(landing, "a", 0, 500) // same name, different bytes
    val e = intercept[Exception] {
      spark.sql(s"CALL gci.system.copy_into(table => 'db.im', source => '$landing')").head
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("immutable"))))
    // and NOTHING landed: the refusal happened before any commit
    assert(spark.sql("SELECT count(*) FROM gci.db.im").head.getLong(0) === 10L)
  }

  test("copied files carry INSERT-grade stats: a predicate prunes with out-of-range files corrupted on disk") {
    warehouse
    spark.sql("CREATE TABLE gci.db.pr (k BIGINT, v BIGINT)")
    val landing = Files.createTempDirectory("graft-ci-pr")
    land(landing, "low", 0, 100)
    land(landing, "high", 10000, 10100)
    spark.sql(s"CALL gci.system.copy_into(table => 'db.pr', source => '$landing')")

    val lowFiles = TxnLog.snapshotState(root("pr")).filter { case (_, m) =>
      m.stats.get("k").exists(_.hi < 10000L) }.map(_._1)
    assert(lowFiles.nonEmpty, "copy-into recorded per-file k ranges")
    lowFiles.foreach(f => Files.write(Paths.get(f), Array[Byte](1, 2, 3)))
    assert(spark.sql("SELECT sum(v) FROM gci.db.pr WHERE k >= 10000")
      .head.getLong(0) === (10000L until 10100L).map(_ * 2).sum)
  }

  test("copy_into clusters by declared partitioning; csv needs the declared schema and reads under it") {
    warehouse
    // partitioned target: staged files collapse their partition stat
    spark.sql("CREATE TABLE gci.db.pt (k BIGINT, v BIGINT) PARTITIONED BY (k)")
    val landing = Files.createTempDirectory("graft-ci-pt")
    land(landing, "a", 0, 4)
    spark.sql(s"CALL gci.system.copy_into(table => 'db.pt', source => '$landing')")
    val metas = TxnLog.snapshotState(root("pt")).map(_._2)
    assert(metas.nonEmpty && metas.forall(m =>
      m.stats.get("k").exists(s => s.lo == s.hi)),
      "each staged file holds one partition value")

    // csv: refused without a declared schema, loaded under it with one
    val csvDir = Files.createTempDirectory("graft-ci-csv")
    Files.writeString(csvDir.resolve("rows.csv"), "7,70\n8,80\n")
    val e = intercept[Exception] {
      spark.sql("CALL gci.system.copy_into(table => 'db.nocsv', source => " +
        s"'$csvDir', format => 'csv')").head
    }
    assert(e.getMessage != null) // unresolved table OR schema refusal
    spark.sql("CREATE TABLE gci.db.csv (k BIGINT, v BIGINT)")
    val r = spark.sql("CALL gci.system.copy_into(table => 'db.csv', source => " +
      s"'$csvDir', format => 'csv')").head
    assert(r.getLong(1) === 1L)
    assert(spark.sql("SELECT sum(k), sum(v) FROM gci.db.csv").head.toSeq ===
      Seq(15L, 150L))
  }
}
