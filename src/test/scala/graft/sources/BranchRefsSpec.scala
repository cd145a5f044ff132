package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** Named refs on the transaction log — tags and branches, the
  * write-audit-publish workflow (Iceberg refs over a linear log):
  * a branch forks the table as O(files) metadata, takes every DML
  * invisibly to main, and publishes back as ONE strictly-fast-forward
  * commit (any main movement since the fork conflicts — racing
  * publishes included). Tags pin versions under names for
  * `VERSION AS OF 'name'`, and both kinds of ref hold the vacuum
  * horizon so a pinned snapshot's files never reclaim.
  */
class BranchRefsSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-br-wh").toString
    spark.conf.set("spark.sql.catalog.gbr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbr.db")
    wh
  }

  private def root(table: String): String = s"$warehouse/db/$table"

  test("write-audit-publish: branch writes invisible on main; one atomic ff commit publishes") {
    warehouse
    spark.sql("CREATE TABLE gbr.db.wap (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gbr.db.wap SELECT id, id * 2 FROM range(0, 50)")
    val mainV = TxnLog.currentVersion(root("wap"))
    spark.sql("CALL gbr.system.create_branch(table => 'db.wap', branch => 'audit')")

    // WRITE on the branch: an append, an update, a DV delete
    spark.sql("INSERT INTO gbr.db.wap.branch_audit SELECT id, id * 2 FROM range(50, 80)")
    spark.sql("UPDATE gbr.db.wap.branch_audit SET v = v + 1000 WHERE k < 5")
    spark.sql("DELETE FROM gbr.db.wap.branch_audit WHERE k % 10 = 9")

    // main is UNTOUCHED — same version, same rows
    assert(TxnLog.currentVersion(root("wap")) === mainV)
    assert(spark.sql("SELECT count(*) FROM gbr.db.wap").head.getLong(0) === 50L)
    assert(spark.sql("SELECT sum(v) FROM gbr.db.wap").head.getLong(0) ===
      (0L until 50L).map(_ * 2).sum)

    // AUDIT reads the branch (both spellings)
    val audited = (0L until 80L).filterNot(_ % 10 == 9)
      .map(k => k -> (k * 2 + (if (k < 5) 1000L else 0L))).toMap
    val viaBranchIdent = spark.sql(
        "SELECT k, v FROM gbr.db.wap.branch_audit")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaBranchIdent === audited)
    val viaVersionAsOf = spark.sql(
        "SELECT k, v FROM gbr.db.wap VERSION AS OF 'audit'")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaVersionAsOf === audited)

    // PUBLISH: one commit, exactly the audited state, strictly ff
    val rec = spark.sql(
      "CALL gbr.system.publish_branch(table => 'db.wap', branch => 'audit')").head
    assert(rec.getLong(0) === mainV + 1, "publish is ONE commit on main")
    val published = spark.sql("SELECT k, v FROM gbr.db.wap")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(published === audited)
    // the pre-publish snapshot still time-travels
    assert(spark.sql(s"SELECT count(*) FROM gbr.db.wap VERSION AS OF $mainV")
      .head.getLong(0) === 50L)
  }

  test("racing publishes / main movement since fork: the ff gate conflicts, nothing stacks") {
    warehouse
    spark.sql("CREATE TABLE gbr.db.race (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gbr.db.race SELECT id, id FROM range(0, 20)")
    spark.sql("CALL gbr.system.create_branch(table => 'db.race', branch => 'b1')")
    spark.sql("INSERT INTO gbr.db.race.branch_b1 VALUES (100, 100)")
    // main moves AFTER the fork — even a pure append must conflict
    spark.sql("INSERT INTO gbr.db.race VALUES (999, 999)")
    val vBefore = TxnLog.currentVersion(root("race"))
    val e = intercept[Exception] {
      spark.sql("CALL gbr.system.publish_branch(table => 'db.race', branch => 'b1')")
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[TxnLog.ConflictException]), s"got: $e")
    assert(TxnLog.currentVersion(root("race")) === vBefore,
      "a conflicted publish must publish nothing")
    assert(spark.sql("SELECT count(*) FROM gbr.db.race WHERE k = 100")
      .head.getLong(0) === 0L)
  }

  test("branch carries stats, DVs, constraints and partitioning; schema changes refuse to publish") {
    warehouse
    spark.sql("CREATE TABLE gbr.db.full (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k)) " +
      "TBLPROPERTIES ('graft.constraint.pos' = 'v >= 0')")
    spark.sql("INSERT INTO gbr.db.full SELECT id, id FROM range(0, 100)")
    spark.sql("DELETE FROM gbr.db.full WHERE k % 7 = 3") // DVs on main pre-fork
    spark.sql("ALTER TABLE gbr.db.full SET TBLPROPERTIES " +
      "('graft.autoCompact.minFiles' = '6')")
    spark.sql("CALL gbr.system.create_branch(table => 'db.full', branch => 'bx')")
    val broot = TxnLog.branchRoot(root("full"), "bx")
    // ...the table properties fork with the data (r20), then evolve
    // independently per side
    assert(TxnLog.tableProperties(broot) ===
      Map("graft.autoCompact.minFiles" -> "6"))
    TxnLog.setTableProperty(broot, "owner.team", "audit", "t-brprop")
    assert(!TxnLog.tableProperties(root("full")).contains("owner.team"),
      "branch property changes stay on the branch")
    // the fork carried the DV'd live rows exactly
    assert(spark.sql("SELECT count(*) FROM gbr.db.full.branch_bx").head.getLong(0)
      === (0L until 100L).count(_ % 7 != 3).toLong)
    // ...the constraint (a violating branch write publishes nothing)
    val bv = TxnLog.currentVersion(broot)
    intercept[Exception] {
      spark.sql("INSERT INTO gbr.db.full.branch_bx VALUES (1000, -5)")
    }
    assert(TxnLog.currentVersion(broot) === bv)
    // ...the bucket partitioning (branch writes cluster + point-stat)
    spark.sql("INSERT INTO gbr.db.full.branch_bx SELECT id, id FROM range(100, 140)")
    val key = TxnLog.bucketStatKey(4, "k")
    val newFiles = TxnLog.snapshotState(broot)
      .filter { case (f, _) => f.startsWith(broot) }
    assert(newFiles.nonEmpty && newFiles.forall { case (_, m) =>
      m.stats.get(key).exists(st => st.lo == st.hi) })
    // schema evolution on the branch: publish refuses, data-only
    spark.sql("ALTER TABLE gbr.db.full.branch_bx ADD COLUMN extra STRING")
    val e = intercept[Exception] {
      spark.sql("CALL gbr.system.publish_branch(table => 'db.full', branch => 'bx')")
    }
    assert((e +: Option(e.getCause).toSeq).exists(c =>
      Option(c.getMessage).exists(_.contains("data-only"))), s"got: $e")
  }

  test("the refs metadata table lists tags and branches with fork points and heads") {
    warehouse
    spark.sql("CREATE TABLE gbr.db.rt (k BIGINT)")
    spark.sql("INSERT INTO gbr.db.rt SELECT id FROM range(0, 5)")        // v2
    spark.sql("CALL gbr.system.create_tag(table => 'db.rt', tag => 't1')")
    spark.sql("CALL gbr.system.create_branch(table => 'db.rt', branch => 'b1')")
    spark.sql("INSERT INTO gbr.db.rt.branch_b1 VALUES (99)")             // branch v2
    val got = spark.sql(
        "SELECT name, kind, pinned_version, branch_head FROM gbr.db.rt.refs")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toList
    assert(got === List(("b1", "branch", 2L, 2L), ("t1", "tag", 2L, -1L)))
    spark.sql("CALL gbr.system.drop_ref(table => 'db.rt', name => 't1')")
    assert(spark.sql("SELECT count(*) FROM gbr.db.rt.refs").head.getLong(0) === 1L)
  }

  test("tags: VERSION AS OF 'name' pins; refs hold the vacuum horizon") {
    warehouse
    spark.sql("CREATE TABLE gbr.db.tg (k BIGINT)")
    spark.sql("INSERT INTO gbr.db.tg SELECT id FROM range(0, 10)")   // v2
    val taggedV = TxnLog.currentVersion(root("tg"))
    spark.sql(s"CALL gbr.system.create_tag(table => 'db.tg', tag => 'golden', " +
      s"version => $taggedV)")
    spark.sql("INSERT OVERWRITE gbr.db.tg SELECT id FROM range(100, 105)") // v3 swaps files
    assert(spark.sql("SELECT count(*) FROM gbr.db.tg VERSION AS OF 'golden'")
      .head.getLong(0) === 10L)
    // vacuum with an aggressive horizon: the tag PINS v2's files
    spark.sql("CALL gbr.system.vacuum(table => 'db.tg', " +
      s"retain_from_version => ${TxnLog.currentVersion(root("tg"))})")
    assert(spark.sql("SELECT count(*) FROM gbr.db.tg VERSION AS OF 'golden'")
      .head.getLong(0) === 10L, "a tagged snapshot must survive vacuum")
    // drop the tag -> the same vacuum now reclaims
    spark.sql("CALL gbr.system.drop_ref(table => 'db.tg', name => 'golden')")
    spark.sql("CALL gbr.system.vacuum(table => 'db.tg', " +
      s"retain_from_version => ${TxnLog.currentVersion(root("tg"))})")
    val e = intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM gbr.db.tg VERSION AS OF $taggedV").head
    }
    assert(e != null)
  }

  test("a dropped branch name can be re-forked; published bytes in the husk survive the new branch's staging sweep") {
    warehouse
    spark.sql("CREATE TABLE gbr.db.rf (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gbr.db.rf SELECT id, id FROM range(0, 20)")
    val r = root("rf")

    // round 1: fork, write, publish, drop — the published bytes live
    // under the husk (main's log addresses them absolutely)
    spark.sql("CALL gbr.system.create_branch(table => 'db.rf', branch => 'wap')")
    spark.sql("INSERT INTO gbr.db.rf.branch_wap VALUES (100, 100)")
    spark.sql("CALL gbr.system.publish_branch(table => 'db.rf', branch => 'wap')")
    spark.sql("CALL gbr.system.drop_ref(table => 'db.rf', name => 'wap')")
    assert(!TxnLog.isBranch(r, "wap"))
    assert(spark.sql("SELECT count(*) FROM gbr.db.rf WHERE k = 100")
      .head.getLong(0) === 1L, "published rows stay readable after the drop")

    // main OVERWRITES: the husk file leaves main's LIVE set but stays
    // time-travel-reachable (retention) — the hard case for the sweep
    val publishedV = TxnLog.currentVersion(r)
    spark.sql("INSERT OVERWRITE gbr.db.rf SELECT id, id FROM range(0, 5)")

    // round 2: the SAME name re-forks into the husk (the publish
    // conflict message says 're-fork and retry' — it must be possible)
    spark.sql("CALL gbr.system.create_branch(table => 'db.rf', branch => 'wap')")
    assert(TxnLog.isBranch(r, "wap"))
    spark.sql("INSERT INTO gbr.db.rf.branch_wap VALUES (200, 200)")

    // the new branch's staging sweep must NOT reclaim husk dirs a
    // PRIOR incarnation published to main: the new fork no longer
    // references them (main overwrote), but main's LOG still does —
    // time travel to the published version must survive the sweep
    val broot = TxnLog.branchRoot(r, "wap")
    TxnLog.vacuumStaging(broot)
    assert(spark.sql(
        s"SELECT count(*) FROM gbr.db.rf VERSION AS OF $publishedV WHERE k = 100")
      .head.getLong(0) === 1L,
      "a re-forked branch's vacuumStaging must keep main-published bytes")
    spark.sql("CALL gbr.system.publish_branch(table => 'db.rf', branch => 'wap')")
    // main is now the overwritten base (0..4) plus the re-fork's row
    assert(spark.sql("SELECT count(*) FROM gbr.db.rf WHERE k >= 100")
      .head.getLong(0) === 1L)
    assert(spark.sql("SELECT count(*) FROM gbr.db.rf").head.getLong(0) === 6L)

    // a LIVE branch still refuses a duplicate create
    val e = intercept[Exception] {
      spark.sql("CALL gbr.system.create_branch(table => 'db.rf', branch => 'wap')")
    }
    assert(e != null)
  }

  test("createTag re-verifies the snapshot after the tag lands: a tag racing vacuum fails loudly and leaves no ref") {
    warehouse
    spark.sql("CREATE TABLE gbr.db.tr (k BIGINT)")
    spark.sql("INSERT INTO gbr.db.tr SELECT id FROM range(0, 10)") // v2
    val r = root("tr")
    val taggedV = TxnLog.currentVersion(r)
    spark.sql("INSERT OVERWRITE gbr.db.tr SELECT id FROM range(100, 105)") // v3
    // simulate vacuum winning the race: v2's files are already gone
    // when createTag's post-write verification runs
    TxnLog.snapshotFiles(r, taggedV).foreach(f =>
      Files.deleteIfExists(Paths.get(f)))
    val e = intercept[Exception] { TxnLog.createTag(r, "gone", taggedV) }
    assert(Option(e.getMessage).exists(_.contains("vacuum")), s"got: $e")
    assert(TxnLog.tagVersion(r, "gone").isEmpty,
      "a failed tag must not leave a ref pinning an unreadable snapshot")
    // tagging the LIVE head still works
    TxnLog.createTag(r, "head")
    assert(TxnLog.tagVersion(r, "head").contains(TxnLog.currentVersion(r)))
  }

  test("branch byte hygiene: vacuum_refs reclaims dropped-unpublished bytes; live branch heads pin through main vacuum") {
    warehouse
    spark.sql("CREATE TABLE gbr.db.hy (k BIGINT)")
    spark.sql("INSERT INTO gbr.db.hy SELECT id FROM range(0, 20)")
    val r = root("hy")

    // (a) a dropped branch with UNPUBLISHED writes leaks bytes under
    // its husk — vacuum_refs reclaims them and removes the husk
    spark.sql("CALL gbr.system.create_branch(table => 'db.hy', branch => 'dead')")
    spark.sql("INSERT INTO gbr.db.hy.branch_dead SELECT id FROM range(100, 200)")
    spark.sql("CALL gbr.system.drop_ref(table => 'db.hy', name => 'dead')")
    val husk = Paths.get(TxnLog.branchRoot(r, "dead"))
    assert(Files.isDirectory(husk), "dropRef leaves the husk by design")
    val reclaimed = spark.sql(
      "CALL gbr.system.vacuum_refs(table => 'db.hy')").head.getLong(0)
    assert(reclaimed > 0L, "abandoned branch bytes must reclaim")
    assert(!Files.exists(husk), "a fully-orphaned husk disappears")

    // (b) PUBLISHED bytes under a dropped branch stay (main's log
    // addresses them): vacuum_refs must not touch them, time travel
    // keeps reading them, and main's own vacuum reclaims them later
    spark.sql("CALL gbr.system.create_branch(table => 'db.hy', branch => 'pub')")
    spark.sql("INSERT INTO gbr.db.hy.branch_pub VALUES (999)")
    spark.sql("CALL gbr.system.publish_branch(table => 'db.hy', branch => 'pub')")
    val publishedV = TxnLog.currentVersion(r)
    spark.sql("INSERT OVERWRITE gbr.db.hy SELECT id FROM range(0, 5)")
    spark.sql("CALL gbr.system.drop_ref(table => 'db.hy', name => 'pub')")
    spark.sql("CALL gbr.system.vacuum_refs(table => 'db.hy')")
    assert(spark.sql(
        s"SELECT count(*) FROM gbr.db.hy VERSION AS OF $publishedV WHERE k = 999")
      .head.getLong(0) === 1L,
      "vacuum_refs must never touch bytes main's log references")
    // ...main's normal vacuum owns them: aggressive horizon reclaims
    TxnLog.vacuum(r, TxnLog.currentVersion(r))
    intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM gbr.db.hy VERSION AS OF $publishedV")
        .head.getLong(0)
    }

    // (c) LIVE branch heads pin: a branch file published then
    // rewritten away on main survives an aggressive main vacuum as
    // long as the branch lives — and reclaims once dropped
    spark.sql("CREATE TABLE gbr.db.hy2 (k BIGINT)")
    val r2 = root("hy2")
    spark.sql("INSERT INTO gbr.db.hy2 SELECT id FROM range(0, 10)")
    spark.sql("CALL gbr.system.create_branch(table => 'db.hy2', branch => 'live')")
    spark.sql("INSERT INTO gbr.db.hy2.branch_live VALUES (777)")
    spark.sql("CALL gbr.system.publish_branch(table => 'db.hy2', branch => 'live')")
    spark.sql("INSERT OVERWRITE gbr.db.hy2 SELECT id FROM range(0, 3)")
    TxnLog.vacuum(r2, TxnLog.currentVersion(r2))
    assert(spark.sql("SELECT count(*) FROM gbr.db.hy2.branch_live WHERE k = 777")
      .head.getLong(0) === 1L,
      "a live branch must keep reading its published-then-rewritten file")
    spark.sql("CALL gbr.system.drop_ref(table => 'db.hy2', name => 'live')")
    val swept = TxnLog.vacuum(r2, TxnLog.currentVersion(r2))
    assert(swept.nonEmpty, "dropping the branch releases the pin")
  }

  test("streaming write-audit-publish: epochs land on the branch invisibly, constraints gate them, publish lands exactly the audited rows") {
    warehouse
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    spark.sql("CREATE TABLE gbr.db.swap (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.constraint.pos' = 'v >= 0')")
    spark.sql("INSERT INTO gbr.db.swap SELECT id, id FROM range(0, 10)")
    val r = root("swap")
    val mainV = TxnLog.currentVersion(r)
    spark.sql("CALL gbr.system.create_branch(table => 'db.swap', branch => 'audit')")
    val broot = TxnLog.branchRoot(r, "audit")

    // streamed epochs land ON THE BRANCH through the exactly-once sink
    val ckpt = Files.createTempDirectory("graft-swap-ckpt").toString
    val in = MemoryStream[(Long, Long)](spark)
    val q = in.toDF().selectExpr("_1 AS k", "_2 AS v")
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("gbr.db.swap.branch_audit")
    try {
      in.addData((100L, 100L)); q.processAllAvailable()
      in.addData((101L, 101L)); q.processAllAvailable()
      // invisible to main; visible on the branch
      assert(TxnLog.currentVersion(r) === mainV)
      assert(spark.sql("SELECT count(*) FROM gbr.db.swap.branch_audit " +
        "WHERE k >= 100").head.getLong(0) === 2L)
      // the table's CHECK constraint gates branch epochs too (the
      // fork carried it): a violating epoch publishes nothing
      val bv = TxnLog.currentVersion(broot)
      in.addData((102L, -1L))
      intercept[Exception] { q.processAllAvailable() }
      assert(TxnLog.currentVersion(broot) === bv,
        "a violating audit epoch must publish nothing")
    } finally q.stop()

    // PUBLISH: exactly the audited rows fast-forward to main
    spark.sql("CALL gbr.system.publish_branch(table => 'db.swap', branch => 'audit')")
    assert(spark.sql("SELECT count(*) FROM gbr.db.swap WHERE k >= 100")
      .head.getLong(0) === 2L)
    assert(spark.sql("SELECT count(*) FROM gbr.db.swap").head.getLong(0) === 12L)
    // the streamed epochs' txnIds are unique in the branch ledger
    // (exactly-once held through the branch write path)
    val streamTxns = TxnLog.commits(broot)
      .map(_.txnId).filter(_.startsWith("stream-"))
    assert(streamTxns.nonEmpty && streamTxns.distinct.size === streamTxns.size)
  }

  test("publish replays exactly once; fork is metadata-only (no data bytes copied)") {
    warehouse
    spark.sql("CREATE TABLE gbr.db.ro (k BIGINT)")
    spark.sql("INSERT INTO gbr.db.ro SELECT id FROM range(0, 1000)")
    val dataBytes = {
      val d = Paths.get(root("ro"), "data")
      val s = Files.walk(d)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum
      finally s.close()
    }
    spark.sql("CALL gbr.system.create_branch(table => 'db.ro', branch => 'meta')")
    val broot = TxnLog.branchRoot(root("ro"), "meta")
    // no data bytes under the branch: the fork references main's files
    val branchData = Paths.get(broot, "data")
    val branchBytes =
      if (!Files.isDirectory(branchData)) 0L
      else {
        val s = Files.walk(branchData)
        try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum
        finally s.close()
      }
    assert(branchBytes === 0L, "fork must copy zero data bytes")
    assert(dataBytes > 0L)
    // publish once with a KNOWN txnId, then replay it: the ledger
    // returns the same commit and applies nothing (exactly-once)
    spark.sql("INSERT INTO gbr.db.ro.branch_meta VALUES (5000)")
    val first = TxnLog.publishBranch(spark, root("ro"), "meta",
      txnId = "publish-meta-t1")
    val replay = TxnLog.publishBranch(spark, root("ro"), "meta",
      txnId = "publish-meta-t1")
    assert(replay.version === first.version)
    assert(TxnLog.currentVersion(root("ro")) === first.version,
      "a replayed publish must not stack a second commit")
    // a FRESH publish attempt now conflicts: main's head moved past
    // the fork the moment the first publish landed
    val e = intercept[Exception] {
      TxnLog.publishBranch(spark, root("ro"), "meta", txnId = "publish-meta-t2")
    }
    assert(e.isInstanceOf[TxnLog.ConflictException], s"got: $e")
  }
}
