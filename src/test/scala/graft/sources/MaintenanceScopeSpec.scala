package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** Scoped maintenance (r17): VACUUM DRY RUN (X-A87 — audit the
  * reclaim set without deleting a byte) and OPTIMIZE ... WHERE
  * (X-A88 — compaction priced at O(files-in-the-predicate), the
  * nightly "optimize yesterday's partition" shape).
  */
class MaintenanceScopeSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-ms-wh").toString
    spark.conf.set("spark.sql.catalog.gms", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gms.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gms.db")
    wh
  }

  private def root(table: String): String = s"$warehouse/db/$table"

  test("vacuum dry_run reports the exact reclaim set and deletes nothing") {
    warehouse
    spark.sql("CREATE TABLE gms.db.dr (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gms.db.dr SELECT id, id FROM range(0, 100)")
    val gen1 = TxnLog.snapshotFiles(root("dr")).toSet
    spark.sql("INSERT OVERWRITE gms.db.dr SELECT id, id * 2 FROM range(0, 50)")
    val head = TxnLog.currentVersion(root("dr"))

    val dry = spark.sql("CALL gms.system.vacuum(table => 'db.dr', " +
      s"retain_from_version => $head, dry_run => true)").head.getLong(0)
    assert(dry === gen1.size.toLong, "dry run must size the stranded generation")
    assert(gen1.forall(f => Files.exists(Paths.get(f))),
      "dry run must not delete a byte")
    // time travel still works after the dry run
    assert(spark.sql(s"SELECT count(*) FROM gms.db.dr VERSION AS OF ${head - 1}")
      .head.getLong(0) === 100L)

    // the wet run deletes exactly what the dry run promised
    val wet = spark.sql("CALL gms.system.vacuum(table => 'db.dr', " +
      s"retain_from_version => $head)").head.getLong(0)
    assert(wet === dry)
    assert(gen1.forall(f => !Files.exists(Paths.get(f))))
    // and a second dry run reports nothing left
    val again = spark.sql("CALL gms.system.vacuum(table => 'db.dr', " +
      s"retain_from_version => $head, dry_run => true)").head.getLong(0)
    assert(again === 0L)
  }

  test("compact_files WHERE rewrites only the predicate's files; empty match is a no-op") {
    warehouse
    spark.sql("CREATE TABLE gms.db.cw (k BIGINT, cat STRING) " +
      "PARTITIONED BY (cat)")
    // several small files per category (one commit each)
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO gms.db.cw SELECT id + ${i * 100}, 'a' FROM range(0, 100)")
      spark.sql(s"INSERT INTO gms.db.cw SELECT id + ${i * 100}, 'b' FROM range(0, 100)")
    }
    val before = TxnLog.snapshotState(root("cw"))
    def catOf(m: TxnLog.FileMeta): String = m.stats.get("cat").map(st =>
      new String(java.util.Base64.getDecoder.decode(st.loS),
        java.nio.charset.StandardCharsets.UTF_8)).getOrElse("?")
    val aFiles = before.filter(f => catOf(f._2) == "a").map(_._1).toSet
    val bFiles = before.filter(f => catOf(f._2) == "b").map(_._1).toSet
    assert(aFiles.size === 3 && bFiles.size === 3)

    val receipt = spark.sql("CALL gms.system.compact_files(table => 'db.cw', " +
      "small_mb => 32, target_mb => 128, where => \"cat = 'b'\")").head
    assert(receipt.getLong(1) === 3L, "exactly the three b-files compact")
    val after = TxnLog.snapshotState(root("cw"))
    assert(after.map(_._1).toSet.intersect(aFiles) === aFiles,
      "a-partition files must survive untouched")
    assert(after.map(_._1).toSet.intersect(bFiles).isEmpty,
      "b-partition files must be folded away")
    // rows preserved, per category
    val counts = spark.sql("SELECT cat, count(*) FROM gms.db.cw GROUP BY cat")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a" -> 300L, "b" -> 300L))

    // a predicate admitting no files publishes nothing
    val noop = spark.sql("CALL gms.system.compact_files(table => 'db.cw', " +
      "where => \"cat = 'zzz'\")").head
    assert(noop.getLong(0) === -1L && noop.getLong(1) === 0L)
  }

  test("CALL optimize_zorder(curve => 'hilbert'): one rewrite, both dims prune, refusals") {
    warehouse
    spark.sql("CREATE TABLE gms.db.hc (x BIGINT, y BIGINT, v BIGINT)")
    spark.sql("""INSERT INTO gms.db.hc
      SELECT (id * 2654435761) % 1024, (id * 40503) % 1024, id
      FROM range(0, 4000)""")
    val v = spark.sql("CALL gms.system.optimize_zorder(table => 'db.hc', " +
      "x_col => 'x', y_col => 'y', n_files => 8, curve => 'hilbert')")
      .head.getLong(0)
    assert(v === TxnLog.currentVersion(root("hc")))
    // the hilbert layout's per-file stats prune BOTH dimensions:
    // corrupt every file disjoint from the probe rectangle
    val meta = TxnLog.snapshotState(root("hc"))
    assert(meta.size === 8)
    val keepLo = 0L; val keepHi = 127L
    val victims = meta.filter { case (_, m) =>
      !(m.stats.get("x").exists(s => s.lo <= keepHi && s.hi >= keepLo) &&
        m.stats.get("y").exists(s => s.lo <= keepHi && s.hi >= keepLo))
    }.map(_._1)
    assert(victims.nonEmpty, "hilbert clustering must localize the corner")
    victims.foreach(f => Files.write(Paths.get(f), Array[Byte](9)))
    val want = (0 until 4000).count { id =>
      val x = (id.toLong * 2654435761L) % 1024
      val y = (id.toLong * 40503L) % 1024
      x <= keepHi && y <= keepHi
    }
    assert(spark.sql("SELECT count(*) FROM gms.db.hc " +
      s"WHERE x BETWEEN $keepLo AND $keepHi AND y BETWEEN $keepLo AND $keepHi")
      .head.getLong(0) === want.toLong)
    // refusal: unknown curve (3-dim hilbert is no longer a refusal —
    // r18's Skilling transpose handles any d; see GraftCatalogSpec)
    val e2 = intercept[Exception](spark.sql(
      "CALL gms.system.optimize_zorder(table => 'db.hc', " +
        "x_col => 'x', y_col => 'y', curve => 'peano')"))
    assert(e2.getMessage.contains("morton or hilbert"), e2.getMessage)
  }

  test("the unified feed excludes row-preserving layout commits; `changes` keeps them") {
    warehouse
    spark.sql("CREATE TABLE gms.db.fd (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gms.db.fd SELECT id, id FROM range(0, 10)")
    spark.sql("INSERT INTO gms.db.fd SELECT id, id FROM range(10, 20)")
    spark.sql("CALL gms.system.compact_files(table => 'db.fd', " +
      "small_mb => 32, target_mb => 128)")
    assert(TxnLog.currentVersion(root("fd")) === 4L)
    // the feed: 20 inserts, zero rows from the compaction — its files
    // changed, its rows did not (the Delta CDF contract)
    val feed = spark.sql(
      "SELECT _change_type, count(*) FROM gms.db.fd.feed GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(feed === Map("insert" -> 20L))
    // `changes` keeps its documented raw-adds contract: the rewrite's
    // post-image files DO appear there
    assert(spark.sql("SELECT count(*) FROM gms.db.fd.changes")
      .head.getLong(0) === 40L)
  }
}
