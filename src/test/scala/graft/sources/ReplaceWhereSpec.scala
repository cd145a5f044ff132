package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** Predicate-scoped atomic overwrite (X-A85): Delta's `replaceWhere`
  * re-expressed over the txn log — `INSERT OVERWRITE t PARTITION
  * (p = v)` and `df.writeTo(t).overwrite(cond)` become ONE commit
  * that deletes the matching live rows and lands the incoming data.
  * File triage: stats-disjoint files are never opened, wholly-covered
  * files are removed as metadata, straddlers carry deletion vectors.
  */
class ReplaceWhereSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-rw-wh").toString
    spark.conf.set("spark.sql.catalog.grw", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grw.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grw.db")
    wh
  }

  private def root(table: String): String = s"$warehouse/db/$table"

  test("INSERT OVERWRITE PARTITION replaces exactly that partition in ONE commit; history travels") {
    warehouse
    spark.sql("CREATE TABLE grw.db.p (k BIGINT, v BIGINT, cls STRING) " +
      "PARTITIONED BY (cls)")
    spark.sql("""INSERT INTO grw.db.p
      SELECT id, id, IF(id % 2 = 0, 'a', 'b') FROM range(0, 100)""")
    val vBefore = TxnLog.currentVersion(root("p"))

    spark.sql("""INSERT OVERWRITE grw.db.p PARTITION (cls = 'a')
      SELECT id, id * 100 FROM range(1000, 1010)""")
    assert(TxnLog.currentVersion(root("p")) === vBefore + 1, "ONE commit")

    // partition b untouched, partition a fully replaced
    val got = spark.sql("SELECT cls, count(*), sum(v) FROM grw.db.p GROUP BY cls")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("b") === ((50L, (1L until 100L by 2).sum)))
    assert(got("a") === ((10L, (1000L until 1010L).map(_ * 100).sum)))

    // the pre-overwrite snapshot still answers
    assert(spark.sql(
      s"SELECT count(*) FROM grw.db.p VERSION AS OF $vBefore").head.getLong(0) === 100L)
  }

  test("file triage: wholly-covered files REMOVE, straddlers carry DVs, disjoint files are never opened") {
    warehouse
    spark.sql("CREATE TABLE grw.db.t (k BIGINT, v BIGINT)")
    // three single-file inserts with disjoint k ranges
    spark.sql("INSERT INTO grw.db.t SELECT id, id FROM range(0, 100, 1, 1)")
    spark.sql("INSERT INTO grw.db.t SELECT id, id FROM range(100, 200, 1, 1)")
    spark.sql("INSERT INTO grw.db.t SELECT id, id FROM range(1000, 1100, 1, 1)")
    val state = TxnLog.snapshotState(root("t"))
    assert(state.size === 3)
    val fileOf = (lo: Long) => state.find(_._2.stats.get("k").exists(_.lo == lo)).get._1

    // the disjoint file (1000..1099) must never be opened: corrupt it
    val hiFile = fileOf(1000)
    val saved = Files.readAllBytes(Paths.get(hiFile))
    Files.write(Paths.get(hiFile), Array[Byte](7, 7, 7))

    // replace k < 150: file(0..99) wholly covered, file(100..199) straddles
    spark.range(0, 10).selectExpr("id AS k", "id * 9 AS v")
      .writeTo("grw.db.t").overwrite(org.apache.spark.sql.functions.col("k") < 150)

    val rec = TxnLog.commitAt(root("t"),
      TxnLog.currentVersion(root("t"))).get
    assert(rec.action === "replace-where")
    assert(rec.removed === Seq(fileOf(0)), "fully-covered file removed as metadata")
    assert(rec.dvFiles === Seq(fileOf(100)), "straddler carries a deletion vector")
    assert(rec.added.nonEmpty)

    // restore the corrupted file and check final content:
    // new rows 0..9 (*9) + surviving 150..199
    Files.write(Paths.get(hiFile), saved)
    val got = spark.sql("SELECT count(*), sum(v) FROM grw.db.t WHERE k < 1000").head
    assert(got.getLong(0) === 10L + 50L)
    assert(got.getLong(1) === (0L until 10L).map(_ * 9).sum + (150L until 200L).sum)
  }

  test("incoming rows outside the predicate refuse; nothing publishes") {
    warehouse
    spark.sql("CREATE TABLE grw.db.r (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO grw.db.r SELECT id, id FROM range(0, 50)")
    val head = TxnLog.currentVersion(root("r"))
    val e = intercept[Exception] {
      spark.range(40, 60).selectExpr("id AS k", "id AS v")
        .writeTo("grw.db.r").overwrite(org.apache.spark.sql.functions.col("k") < 50)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("NOT matching the overwrite condition"))))
    assert(TxnLog.currentVersion(root("r")) === head, "nothing published")
    assert(spark.sql("SELECT count(*) FROM grw.db.r").head.getLong(0) === 50L)
  }

  test("delete-only replace (empty incoming) works; full-table overwrite still truncates") {
    warehouse
    spark.sql("CREATE TABLE grw.db.d (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO grw.db.d SELECT id, id FROM range(0, 100)")
    spark.range(0, 0).selectExpr("id AS k", "id AS v")
      .writeTo("grw.db.d").overwrite(org.apache.spark.sql.functions.col("k") >= 90)
    assert(spark.sql("SELECT count(*), max(k) FROM grw.db.d").head.toSeq ===
      Seq(90L, 89L))

    spark.sql("INSERT OVERWRITE grw.db.d SELECT id, id FROM range(0, 7)")
    assert(spark.sql("SELECT count(*) FROM grw.db.d").head.getLong(0) === 7L)
  }
}
