package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

/** r18 (X-A96): STABLE ROW IDS — the Delta row-tracking recipe over
  * the log's own stats. Every commit whose added files carry row
  * counts allocates each file a base row id from a transactional
  * high-water mark; a row's id is `base + row_index` until a rewrite
  * MATERIALIZES it into the output file (`__graft_rid`, written by
  * every readForRewrite path: compaction, clustering, COW survivors),
  * after which the materialized value wins forever. The scan serves
  * ids through the `_row_id` metadata column.
  *
  * The receipts: identity survives layout maintenance and COW DML
  * survivors; fresh rows mint above the high-water mark (never
  * reused); files without recorded counts serve null, never a wrong
  * id; the hwm folds through checkpoints.
  */
class RowIdSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-rid-wh").toString
    spark.conf.set("spark.sql.catalog.grid", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grid.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grid.db")
    wh
  }

  private def root(table: String): String = s"$warehouse/db/$table"

  private def idsOf(table: String): Map[Long, Long] =
    spark.sql(s"SELECT k, _row_id FROM grid.db.$table")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("append allocates dense ids; a second batch mints above the high-water mark") {
    warehouse
    spark.sql("CREATE TABLE grid.db.r1 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO grid.db.r1 SELECT id, id * 2 FROM range(0, 100)")
    val ids1 = idsOf("r1")
    assert(ids1.size === 100 && ids1.values.toSet === (0L until 100L).toSet,
      "first batch must occupy ids 0..99 (dense, file-contiguous)")
    spark.sql("INSERT INTO grid.db.r1 SELECT id, id * 2 FROM range(100, 150)")
    val ids2 = idsOf("r1")
    assert(ids2.size === 150 && ids2.values.toSet === (0L until 150L).toSet)
    assert((0L until 100L).forall(k => ids2(k) == ids1(k)),
      "existing rows keep their ids across appends")
  }

  test("ids survive compaction and clustering (materialized through the rewrite)") {
    warehouse
    spark.sql("CREATE TABLE grid.db.r2 (k BIGINT, v BIGINT)")
    (0 until 4).foreach(i => spark.sql(
      s"INSERT INTO grid.db.r2 SELECT /*+ REPARTITION(1) */ id, id " +
        s"FROM range(${i * 50}, ${i * 50 + 50})"))
    val before = idsOf("r2")
    spark.sql("CALL grid.system.compact_files(table => 'db.r2', " +
      "small_mb => 1, target_mb => 1)")
    assert(TxnLog.snapshotFiles(root("r2")).size === 1)
    assert(idsOf("r2") === before, "compaction must not re-identify a row")
    spark.sql("CALL grid.system.optimize_zorder(table => 'db.r2', " +
      "x_col => 'k', y_col => 'v', n_files => 4)")
    assert(idsOf("r2") === before, "clustering must not re-identify a row")
    // and the row set itself is untouched
    assert(spark.sql("SELECT count(*), sum(v) FROM grid.db.r2").head.toSeq ===
      Seq(200L, (0L until 200L).sum))
  }

  test("COW DML: survivors keep ids, changed rows mint fresh ones, dead ids retire") {
    warehouse
    spark.sql("CREATE TABLE grid.db.r3 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO grid.db.r3 SELECT id, id FROM range(0, 100)")
    val before = idsOf("r3")
    spark.sql("UPDATE grid.db.r3 SET v = -1 WHERE k % 10 = 0")        // COW
    val after = idsOf("r3")
    val untouched = (0L until 100L).filter(_ % 10 != 0)
    assert(untouched.forall(k => after(k) == before(k)),
      "rows the update did not touch keep their ids through the survivor rewrite")
    val changed = (0L until 100L).filter(_ % 10 == 0)
    assert(changed.forall(k => after(k) >= 100L),
      "updated rows (delete+insert pairs) mint fresh ids above the hwm")
    assert(changed.map(after).toSet.intersect(before.values.toSet).isEmpty,
      "a retired id is never reused")
    // DV delete: survivors untouched
    spark.sql("DELETE FROM grid.db.r3 WHERE k % 25 = 1")
    val after2 = idsOf("r3")
    assert(after2.forall { case (k, id) => after(k) == id })
    assert(!after2.contains(1L))
  }

  test("restore re-declares the ORIGINAL bases: no re-identification, no id reuse (r19)") {
    warehouse
    spark.sql("CREATE TABLE grid.db.r5 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO grid.db.r5 SELECT id, id FROM range(0, 60)")    // v2
    val vGood = TxnLog.currentVersion(root("r5"))
    val idsGood = idsOf("r5")
    spark.sql("INSERT INTO grid.db.r5 SELECT id, id FROM range(60, 90)")   // v3: ids 60..89
    TxnLog.restore(root("r5"), vGood, "rid-restore-1")
    assert(idsOf("r5") === idsGood,
      "restore must pass each re-added file's existing base through, never re-mint")
    // the hwm survives the restore: post-restore inserts mint ABOVE
    // the retired v3 range, so a restored-away id is never reissued
    spark.sql("INSERT INTO grid.db.r5 SELECT id, id FROM range(100, 110)")
    val after = idsOf("r5")
    assert((100L until 110L).forall(k => after(k) >= 90L),
      "post-restore allocation must clear the pre-restore high-water mark")
  }

  test("clone and branch fork/publish carry row identity; carried ranges are never re-minted (r19)") {
    warehouse
    spark.sql("CREATE TABLE grid.db.r6 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO grid.db.r6 SELECT id, id FROM range(0, 50)")
    val srcIds = idsOf("r6")
    // ---- shallow clone: same ids, insert mints above the source hwm
    TxnLog.cloneTable(root("r6"), root("r6c"), "rid-clone-1")
    val cloneIds = spark.sql(s"SELECT k, _row_id FROM grid.db.r6c")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cloneIds === srcIds, "a shallow clone shares row identity byte-for-byte")
    spark.sql("INSERT INTO grid.db.r6c SELECT id, id FROM range(50, 70)")
    val cloneIds2 = idsOf("r6c")
    assert((50L until 70L).forall(k => cloneIds2(k) >= 50L),
      "clone-side inserts must mint above the carried source hwm")
    assert(cloneIds2.values.toSeq.distinct.size === cloneIds2.size)
    // ---- branch: fork carries ids + hwm, branch writes mint above,
    //      publish carries branch ids back to main collision-free
    TxnLog.createBranch(root("r6"), "wap", "rid-fork-1")
    spark.sql("INSERT INTO grid.db.r6.branch_wap SELECT id, id FROM range(200, 220)")
    val branchIds = spark.sql("SELECT k, _row_id FROM grid.db.r6.branch_wap")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 50L).forall(k => branchIds(k) == srcIds(k)),
      "fork must carry main's row identity onto the branch")
    assert((200L until 220L).forall(k => branchIds(k) >= 50L),
      "branch inserts must mint above main's fork hwm")
    TxnLog.publishBranch(spark, root("r6"), "wap", "rid-pub-1")
    val mainIds = idsOf("r6")
    assert(mainIds === branchIds,
      "publish must carry branch-minted ids verbatim (strict ff gate makes them collision-free)")
    // main's next insert clears everything the publish carried
    spark.sql("INSERT INTO grid.db.r6 SELECT id, id FROM range(300, 310)")
    val mainIds2 = idsOf("r6")
    assert(mainIds2.values.toSeq.distinct.size === mainIds2.size,
      "no duplicate ids after a post-publish insert")
    assert((300L until 310L).forall(k => mainIds2(k) >= 70L))
  }

  test("raw mergeInto: carried rows keep ids through the rewrite, matched rows mint fresh (r19)") {
    warehouse
    spark.sql("CREATE TABLE grid.db.r7 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO grid.db.r7 SELECT id, id FROM range(0, 100)")
    val before = idsOf("r7")
    import spark.implicits._
    val src = (0L until 100L by 10).map(k => (k, k * 100)).toDF("k", "v")
    TxnLog.mergeInto(spark, root("r7"), src, "k", "rid-merge-1")
    val after = idsOf("r7")
    val untouched = (0L until 100L).filterNot(_ % 10 == 0)
    assert(untouched.forall(k => after(k) == before(k)),
      "the merge rewrite must not re-identify carried (unmatched) rows")
    val changed = (0L until 100L).filter(_ % 10 == 0)
    assert(changed.forall(k => after(k) >= 100L),
      "matched rows are delete+insert pairs: fresh ids above the hwm")
    assert(changed.map(after).toSet.intersect(before.values.toSet).isEmpty,
      "a replaced id is never reused")
    // pure-insert merge (no affected files) allocates like an append
    TxnLog.mergeInto(spark, root("r7"), Seq((500L, 1L)).toDF("k", "v"),
      "k", "rid-merge-2")
    val after2 = idsOf("r7")
    assert(after2.size === 101 && after2.values.toSeq.distinct.size === 101)
    assert(after2(500L) > after.values.max,
      "post-merge appends mint above everything the rewrite allocated")
  }

  test("hwm folds through a checkpoint; stat-less raw files serve null") {
    warehouse
    spark.sql("CREATE TABLE grid.db.r4 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO grid.db.r4 SELECT id, id FROM range(0, 40)")
    TxnLog.checkpoint(root("r4"))
    spark.sql("INSERT INTO grid.db.r4 SELECT id, id FROM range(40, 60)")
    val ids = idsOf("r4")
    assert(ids.values.toSet === (0L until 60L).toSet,
      "post-checkpoint allocation must continue from the W-line hwm")

    // a raw-API commit without stats: no allocation, ids read null
    val raw = Files.createTempDirectory("graft-rid-raw").toString
    TxnLog.init(raw)
    import spark.implicits._
    val files = TxnLog.stage(Seq((1L, 1L), (2L, 2L)).toDF("k", "v"), raw, "t1")
    TxnLog.commit(raw, "append", files, Nil, readVersion = 0L, txnId = "t1")
    val st = TxnLog.snapshotState(raw)
    assert(st.forall(_._2.rowBase.isEmpty),
      "no recorded row counts => no base allocation")
  }
}
