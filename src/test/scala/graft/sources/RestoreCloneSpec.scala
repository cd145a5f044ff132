package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** RESTORE (one strict commit resets the live set to a prior
  * version's — files, DVs, schema, constraints — with history intact)
  * and SHALLOW CLONE (an independent table sharing the source's bytes,
  * fork version pinned on the source against vacuum until the clone
  * drops), plus the `partitions` metadata table (the live partition
  * inventory folded from per-file point stats — metadata-only).
  */
class RestoreCloneSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-rc-wh").toString
    spark.conf.set("spark.sql.catalog.grc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grc.db")
    wh
  }

  private def root(table: String): String = s"$warehouse/db/$table"

  private def causes(t: Throwable): Seq[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(12).toSeq

  // ---- RESTORE ----

  test("restore resets files, DVs and schema in ONE commit; history and time travel stay intact") {
    warehouse
    spark.sql("CREATE TABLE grc.db.r (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO grc.db.r SELECT id, id * 2 FROM range(0, 20)")   // v2
    val vGood = TxnLog.currentVersion(root("r"))
    // subsequent damage: a delete (DV), an append, a schema evolve
    spark.sql("DELETE FROM grc.db.r WHERE k % 3 = 0")
    spark.sql("INSERT INTO grc.db.r (k, v) VALUES (777, 7770)")
    spark.sql("ALTER TABLE grc.db.r ADD COLUMN w BIGINT")
    spark.sql("INSERT INTO grc.db.r VALUES (888, 8880, 8)")
    val vDamaged = TxnLog.currentVersion(root("r"))
    assert(spark.sql("SELECT count(*) FROM grc.db.r").head.getLong(0) !== 20L)

    val rec = spark.sql(
      s"CALL grc.system.restore(table => 'db.r', version => $vGood)").head
    assert(rec.getLong(0) === vGood)
    val newHead = rec.getLong(1)
    assert(newHead === vDamaged + 1, "restore is ONE commit")

    // data equals vGood exactly — the DV'd rows are BACK (a grown DV
    // shrank to its as-of state), the post-vGood appends are gone
    val got = spark.sql("SELECT k, v FROM grc.db.r")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L until 20L).map(k => k -> k * 2).toMap)
    // schema restored too: the added column is gone
    assert(spark.table("grc.db.r").schema.fieldNames.toSeq === Seq("k", "v"))

    // history intact: the damaged snapshot still time-travels
    assert(spark.sql(s"SELECT count(*) FROM grc.db.r VERSION AS OF $vDamaged")
      .head.getLong(0) === 15L) // 20 - 7 deleted (k%3=0) + 2 appends
    // and the restore itself is a visible history row
    assert(spark.sql("SELECT action FROM grc.db.r.history ORDER BY version DESC")
      .head.getString(0) === "restore")

    // restore to the CURRENT head is a no-op: no commit
    spark.sql(s"CALL grc.system.restore(table => 'db.r', version => $newHead)")
    assert(TxnLog.currentVersion(root("r")) === newHead)
  }

  test("restored files keep their stats: a predicate prunes with out-of-range files corrupted on disk") {
    warehouse
    spark.sql("CREATE TABLE grc.db.rp (k BIGINT, v BIGINT)")
    // two range-disjoint files via two inserts
    spark.sql("INSERT INTO grc.db.rp SELECT id, id FROM range(0, 100)")
    spark.sql("INSERT INTO grc.db.rp SELECT id, id FROM range(1000, 1100)")
    val vGood = TxnLog.currentVersion(root("rp"))
    spark.sql("INSERT INTO grc.db.rp VALUES (5000, 5000)")
    spark.sql(s"CALL grc.system.restore(table => 'db.rp', version => $vGood)")

    // corrupt every file whose k-range is BELOW 1000: if the restored
    // stats prune, the high-range query never opens them
    val lowFiles = TxnLog.snapshotState(root("rp")).filter { case (_, m) =>
      m.stats.get("k").exists(_.hi < 1000L) }.map(_._1)
    assert(lowFiles.nonEmpty)
    lowFiles.foreach(f => Files.write(Paths.get(f), Array[Byte](1, 2, 3)))
    assert(spark.sql("SELECT sum(k) FROM grc.db.rp WHERE k >= 1000")
      .head.getLong(0) === (1000L until 1100L).sum)
  }

  test("restore refuses honestly: vacuumed target, renames since, constraints added since") {
    warehouse
    // (a) vacuumed target snapshot
    spark.sql("CREATE TABLE grc.db.rv (k BIGINT)")
    spark.sql("INSERT INTO grc.db.rv VALUES (1)")
    val v1 = TxnLog.currentVersion(root("rv"))
    spark.sql("INSERT OVERWRITE grc.db.rv VALUES (2)")
    TxnLog.vacuum(root("rv"), TxnLog.currentVersion(root("rv")))
    val ea = intercept[Exception] {
      spark.sql(s"CALL grc.system.restore(table => 'db.rv', version => $v1)") }
    assert(causes(ea).exists(c => Option(c.getMessage).exists(
      _.contains("vacuumed"))), s"got: $ea")

    // (b) a rename since the target version
    spark.sql("CREATE TABLE grc.db.rr (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO grc.db.rr VALUES (1, 10)")
    val rv1 = TxnLog.currentVersion(root("rr"))
    spark.sql("ALTER TABLE grc.db.rr RENAME COLUMN v TO vv")
    val eb = intercept[Exception] {
      spark.sql(s"CALL grc.system.restore(table => 'db.rr', version => $rv1)") }
    assert(causes(eb).exists(c => Option(c.getMessage).exists(
      _.contains("rename"))), s"got: $eb")

    // (c) a CHECK constraint added since the target version
    spark.sql("CREATE TABLE grc.db.rc (k BIGINT)")
    spark.sql("INSERT INTO grc.db.rc VALUES (1)")
    val cv1 = TxnLog.currentVersion(root("rc"))
    spark.sql("INSERT INTO grc.db.rc VALUES (2)")
    spark.sql(
      "ALTER TABLE grc.db.rc SET TBLPROPERTIES('graft.constraint.pos'='k >= 0')")
    val ec = intercept[Exception] {
      spark.sql(s"CALL grc.system.restore(table => 'db.rc', version => $cv1)") }
    assert(causes(ec).exists(c => Option(c.getMessage).exists(
      _.contains("pos"))), s"got: $ec")
    // drop it, then the restore lands and re-adds v1's (empty) set
    spark.sql("ALTER TABLE grc.db.rc UNSET TBLPROPERTIES('graft.constraint.pos')")
    spark.sql(s"CALL grc.system.restore(table => 'db.rc', version => $cv1)")
    assert(spark.sql("SELECT count(*) FROM grc.db.rc").head.getLong(0) === 1L)
  }

  // ---- SHALLOW CLONE ----

  test("shallow clone: zero bytes copied, equal rows, independent evolution both ways") {
    warehouse
    spark.sql("CREATE TABLE grc.db.src (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO grc.db.src SELECT id, id * 3 FROM range(0, 50)")
    spark.sql("DELETE FROM grc.db.src WHERE k = 7") // a DV must carry
    spark.sql("ALTER TABLE grc.db.src SET TBLPROPERTIES " +
      "('graft.autoCompact.minFiles' = '9')") // policy must carry too
    spark.sql("CALL grc.system.clone(source => 'db.src', target => 'db.dst')")

    // table properties travel with the clone (r20, Delta CLONE
    // semantics), in the clone commit itself — then diverge freely
    assert(TxnLog.tableProperties(root("dst")) ===
      Map("graft.autoCompact.minFiles" -> "9"))
    spark.sql("ALTER TABLE grc.db.dst SET TBLPROPERTIES ('owner.team' = 'b')")
    assert(!TxnLog.tableProperties(root("src")).contains("owner.team"),
      "clone-side property changes must not leak back to the source")

    // the clone READS the source's bytes: every live file of the clone
    // lives under the SOURCE root, none under the clone's
    val cloneFiles = TxnLog.snapshotFiles(root("dst"))
    assert(cloneFiles.nonEmpty)
    assert(cloneFiles.forall(_.startsWith(root("src"))), "zero data bytes copied")
    val wantSrc = (0L until 50L).filterNot(_ == 7L).map(k => k -> k * 3).toMap
    assert(spark.sql("SELECT k, v FROM grc.db.dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === wantSrc)

    // clone-side writes land under the CLONE root; source unchanged
    spark.sql("INSERT INTO grc.db.dst VALUES (500, 5000)")
    spark.sql("UPDATE grc.db.dst SET v = 0 WHERE k = 1")
    assert(spark.sql("SELECT k, v FROM grc.db.src")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === wantSrc)
    // source-side writes invisible to the clone
    spark.sql("DELETE FROM grc.db.src WHERE k >= 40")
    assert(spark.sql("SELECT count(*) FROM grc.db.dst").head.getLong(0) === 50L)
  }

  test("source vacuum cannot reclaim shared bytes while the clone lives; DROP releases the pin") {
    warehouse
    spark.sql("CREATE TABLE grc.db.vs (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO grc.db.vs SELECT id, id FROM range(0, 30)")
    spark.sql("CALL grc.system.clone(source => 'db.vs', target => 'db.vd')")
    // source rewrites everything away, then vacuums aggressively
    spark.sql("INSERT OVERWRITE grc.db.vs VALUES (1, 1)")
    TxnLog.vacuum(root("vs"), TxnLog.currentVersion(root("vs")))
    // the clone still answers: its fork pin held the horizon
    assert(spark.sql("SELECT count(*) FROM grc.db.vd").head.getLong(0) === 30L)
    assert(spark.sql("SELECT count(*) FROM grc.db.vs.refs WHERE kind = 'tag'")
      .head.getLong(0) === 1L)

    // DROP TABLE releases the pin; the same vacuum now reclaims
    spark.sql("DROP TABLE grc.db.vd")
    assert(spark.sql("SELECT count(*) FROM grc.db.vs.refs").head.getLong(0) === 0L)
    assert(TxnLog.vacuum(root("vs"),
      TxnLog.currentVersion(root("vs"))).nonEmpty, "pin released: bytes reclaim")
    assert(spark.sql("SELECT count(*) FROM grc.db.vs").head.getLong(0) === 1L)
  }

  // ---- `partitions` metadata table ----

  test("partitions metadata table: the live inventory folded from point stats, metadata-only") {
    warehouse
    spark.sql("CREATE TABLE grc.db.pt (k BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO grc.db.pt SELECT id, concat('c', CAST(id % 3 AS STRING)) " +
      "FROM range(0, 90)")
    spark.sql("DELETE FROM grc.db.pt WHERE k < 6") // 2 DV'd rows per partition
    val rows = spark.sql(
        "SELECT partition, files, rows, deleted_rows FROM grc.db.pt.partitions " +
        "ORDER BY partition")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq("cat=c0", "cat=c1", "cat=c2"))
    assert(rows.forall(_._2 >= 1L), "file counts present")
    assert(rows.map(_._3).sum === 90L, "rows are PHYSICAL (pre-DV) counts")
    assert(rows.map(_._4).sum === 6L, "deleted_rows fold the DVs")
    // metadata-only: corrupt every data file; the inventory still answers
    TxnLog.snapshotFiles(root("pt")).foreach(f =>
      Files.write(Paths.get(f), Array[Byte](9)))
    assert(spark.sql("SELECT count(*) FROM grc.db.pt.partitions")
      .head.getLong(0) === 3L)
  }
}
