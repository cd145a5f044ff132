package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, sum}

import graft.SparkTestBase

/** The txn-log change feed and the exactly-once incremental-MV
  * consumer built on it ([[TxnStream]]): per-commit change batches,
  * offsets recovered from the target table's OWN ledger (no offset
  * store), convergence to the batch answer across commits, restarts,
  * crash-replays and duplicate consumers.
  */
class TxnStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String = {
    val root = Files.createTempDirectory("graft-txnstream").toString
    TxnLog.init(root)
    root
  }

  private def append(root: String, txnId: String, data: Seq[(Long, Long)]): TxnLog.Commit = {
    val files = TxnLog.stage(data.toDF("k", "v"), root, txnId)
    TxnLog.commit(root, "append", files, Nil,
      readVersion = TxnLog.currentVersion(root), txnId = txnId)
  }

  private def feed(root: String, from: Long, to: Long = Long.MaxValue): Set[(Long, Long, Long)] =
    TxnStream.readChanges(spark, root, from, to)
      .select(col("k"), col("v"), col(TxnStream.CommitVersionCol))
      .as[(Long, Long, Long)].collect().toSet

  test("readChanges stamps each added row with its commit version; upserts surface post-images") {
    val root = freshRoot()
    val c1 = append(root, "t1", Seq((1L, 10L), (2L, 20L)))
    append(root, "t2", Seq((3L, 30L)))
    // copy-on-write upsert at v3 rewrites v1's files doubling k=1
    val rewritten = TxnLog.stage(Seq((1L, 20L), (2L, 20L)).toDF("k", "v"), root, "t3")
    TxnLog.commit(root, "upsert", rewritten, removed = c1.added,
      readVersion = 2L, txnId = "t3")

    assert(feed(root, from = 0L) === Set(
      (1L, 10L, 1L), (2L, 20L, 1L), (3L, 30L, 2L),
      (1L, 20L, 3L), (2L, 20L, 3L)),
      "the full feed is every commit's added rows, stamped")
    assert(feed(root, from = 1L, to = 2L) === Set((3L, 30L, 2L)),
      "a bounded range reads only its commits' files")
    assert(feed(root, from = 3L) === Set.empty,
      "an empty range is an empty (schema-stable) frame")
    assert(TxnStream.readChanges(spark, root, 3L).columns.toSet ===
      Set("k", "v", TxnStream.CommitVersionCol))
  }

  test("incremental MV converges to the batch answer across commits and restarts, exactly once") {
    val src = freshRoot()
    val mv = freshRoot()
    def maintain(): Seq[Long] =
      TxnStream.maintainInto(spark, src, mv, "mv-sum")(
        _.groupBy(col("k") % 2 as "parity").agg(sum(col("v")) as "s"))
    def mvState(): Map[Long, Long] =
      TxnLog.read(spark, mv).groupBy("parity").agg(sum("s") as "total")
        .as[(Long, Long)].collect().toMap
    def batchState(): Map[Long, Long] =
      TxnLog.read(spark, src).groupBy(col("k") % 2 as "parity")
        .agg(sum(col("v")) as "total").as[(Long, Long)].collect().toMap

    append(src, "t1", Seq((1L, 10L), (2L, 20L)))
    append(src, "t2", Seq((3L, 30L)))
    append(src, "t3", Seq((4L, 40L), (5L, 50L)))
    assert(maintain() === Seq(1L, 2L, 3L), "three unapplied commits, three deltas")
    assert(mvState() === batchState())

    // no new commits -> nothing to do (offset came from the MV ledger)
    assert(maintain() === Seq.empty)
    assert(TxnLog.currentVersion(mv) === 3L, "a no-op poll must not commit")

    // "restart": a brand-new consumer instance (no in-memory state at
    // all) resumes where the ledger says and applies only the new tail
    append(src, "t4", Seq((6L, 60L)))
    assert(maintain() === Seq(4L))
    assert(mvState() === batchState())

    // total-replay attack: a confused duplicate consumer re-polls from
    // scratch; every version dedupes through the target ledger
    assert(TxnStream.maintainInto(spark, src, mv, "mv-sum")(
      _.groupBy(col("k") % 2 as "parity").agg(sum(col("v")) as "s")) === Seq.empty)
    assert(mvState() === batchState())
    assert(TxnLog.currentVersion(mv) === 4L)
  }

  test("crash between stage and commit: the orphan is wiped and the version still applies exactly once") {
    val src = freshRoot()
    val mv = freshRoot()
    append(src, "t1", Seq((1L, 10L)))
    append(src, "t2", Seq((2L, 20L)))
    // rate-limited catch-up applies only v1...
    assert(TxnStream.maintainInto(spark, src, mv, "c", upTo = 1L)(identity) === Seq(1L))
    // ...then a crashed attempt at v2 leaves a staged-but-uncommitted
    // orphan dir (simulated by staging under the consumer's txnId)
    TxnLog.stage(Seq((999L, 999L)).toDF("k", "v"), mv, "c-v2")
    // the retry wipes the orphan, re-stages and commits v2 normally
    assert(TxnStream.maintainInto(spark, src, mv, "c")(identity) === Seq(2L))
    val rows = TxnLog.read(spark, mv).select("k", "v").as[(Long, Long)].collect().toSet
    assert(rows === Set((1L, 10L, 1L), (2L, 20L, 2L)).map(t => (t._1, t._2)),
      "the orphan's rows must not leak into the MV")
    assert(TxnLog.read(spark, mv).filter(col("k") === 999L).count() === 0L)
  }

  test("an empty delta still durably marks the version applied") {
    val src = freshRoot()
    val mv = freshRoot()
    append(src, "t1", Seq((1L, 10L), (2L, 20L)))
    append(src, "t2", Seq((3L, 30L)))
    // a selective MV: only even keys survive; v2's delta is EMPTY
    def maintain(): Seq[Long] =
      TxnStream.maintainInto(spark, src, mv, "even")(
        _.filter(col("k") % 2 === 0).select("k", "v"))
    assert(maintain() === Seq(1L, 2L))
    assert(TxnLog.read(spark, mv).as[(Long, Long)].collect().toSet === Set((2L, 20L)))
    // v2 is marked applied in the ledger even though it shipped no
    // rows — the next poll must NOT reprocess it
    assert(TxnStream.appliedVersion(mv, "even") === 2L)
    assert(maintain() === Seq.empty)
  }

  test("the feed crosses a schema evolution: old rows carry nulls for the new column") {
    val root = freshRoot()
    append(root, "t1", Seq((1L, 10L)))
    val gen2 = Seq((2L, 20L, "b")).toDF("k", "v", "tag")
    val f2 = TxnLog.stage(gen2, root, "t2")
    TxnLog.commit(root, "schema-evolve", f2, Nil, readVersion = 1L,
      txnId = "t2", schemaId = TxnLog.schemaFingerprint(gen2.schema))
    val got = TxnStream.readChanges(spark, root, 0L)
      .select(col("k"), col("tag"), col(TxnStream.CommitVersionCol))
      .as[(Long, Option[String], Long)].collect().toSet
    assert(got === Set((1L, None, 1L), (2L, Some("b"), 2L)))
  }

  test("readDeletes surfaces DV pre-images per deleting commit; adds+retractions mirror the snapshot") {
    val root = freshRoot()
    append(root, "t1", (1L to 10L).map(k => (k, k * 10L)))
    TxnLog.deleteWhere(spark, root, col("k") % 3 === 0, "d1") // v2: 3,6,9
    append(root, "t2", Seq((11L, 110L)))
    TxnLog.deleteWhere(spark, root, col("k") === 1L, "d2")    // v4: 1

    val dels = TxnStream.readDeletes(spark, root, 0L)
      .select(col("k"), col("v"), col(TxnStream.CommitVersionCol))
      .as[(Long, Long, Long)].collect().toSet
    assert(dels === Set((3L, 30L, 2L), (6L, 60L, 2L), (9L, 90L, 2L), (1L, 10L, 4L)),
      "each killed row must surface once, stamped with its deleting commit")
    // range scoping: only v4's delete
    assert(TxnStream.readDeletes(spark, root, 3L).select(col("k"))
      .as[Long].collect().toSeq === Seq(1L))
    // an empty range keeps the schema (plus the stamp column)
    assert(TxnStream.readDeletes(spark, root, 4L).columns.toSeq ===
      Seq("k", "v", TxnStream.CommitVersionCol))

    // mirror convergence: head snapshot == all adds minus all retractions
    val adds = feed(root, 0L).map(t => (t._1, t._2))
    val retract = dels.map(t => (t._1, t._2))
    assert(adds -- retract ===
      TxnLog.read(spark, root).as[(Long, Long)].collect().toSet,
      "adds minus retractions must equal the live snapshot")
  }

  test("maintainMirror: a keyed mirror tracks appends, upserts and DV deletes exactly once") {
    val src = freshRoot()
    val mirror = freshRoot()
    def srcRows() = TxnLog.read(spark, src).as[(Long, Long)].collect().toSet
    def mirrorRows() = TxnLog.read(spark, mirror).as[(Long, Long)].collect().toSet
    def sync() = TxnStream.maintainMirror(spark, src, mirror, "m", "k")

    val c1 = append(src, "t1", (1L to 8L).map(k => (k, k * 10L)))
    append(src, "t2", Seq((9L, 90L)))
    assert(sync() === Seq(1L, 2L))
    assert(mirrorRows() === srcRows())

    // copy-on-write upsert: post-images must UPDATE the mirror, not
    // duplicate it (the merge-on-key contract)
    val rewritten = TxnLog.stage(
      spark.read.parquet(c1.added: _*).as[(Long, Long)]
        .map { case (k, v) => (k, if (k == 2L) 999L else v) }.toDF("k", "v"),
      src, "t3")
    TxnLog.commit(src, "upsert", rewritten, removed = c1.added,
      readVersion = 2L, txnId = "t3")
    // DV delete retracts
    TxnLog.deleteWhere(spark, src, col("k") % 3 === 0, "t4")
    assert(sync() === Seq(3L, 4L))
    assert(mirrorRows() === srcRows(),
      "mirror must equal the source after upsert + delete")
    assert(mirrorRows().contains((2L, 999L)) && !mirrorRows().exists(_._1 == 3L))

    // idempotence: re-sync applies nothing; a duplicate consumer
    // instance converges without corrupting the mirror
    assert(sync() === Seq.empty)
    assert(TxnStream.maintainMirror(spark, src, mirror, "m", "k") === Seq.empty)
    assert(mirrorRows() === srcRows())

    // a delete-only version (no adds) still durably marks applied
    TxnLog.deleteWhere(spark, src, col("k") === 1L, "t5")
    assert(sync() === Seq(5L))
    assert(TxnStream.appliedVersion(mirror, "m") === 5L)
    assert(mirrorRows() === srcRows())

    // r13: the delete-step markers ("m-v<N>-del") live outside every
    // other consumer's offset namespace — a consumer literally named
    // "m-del" must recover offset 0, not skip unapplied versions
    // (the pre-r13 "m-del-v<N>" shape collided with its "\d+" rule)
    assert(TxnStream.appliedVersion(mirror, "m-del") === 0L)
  }

  test("r14: a copy-on-write rewrite that DROPS rows retracts them from the mirror") {
    val src = freshRoot()
    val mirror = freshRoot()
    def mirrorRows() = TxnLog.read(spark, mirror).as[(Long, Long)].collect().toSet
    val c1 = append(src, "t1", (1L to 20L).map(k => (k, k * 10L)))
    assert(TxnStream.maintainMirror(spark, src, mirror, "m", "k") === Seq(1L))
    // a COW DELETE: rewrite the live set WITHOUT the victims, remove
    // the old files, no deletion vector anywhere (the SQL rewrite-path
    // DELETE shape) — pre-r14 this diverged the mirror silently
    val kept = TxnLog.stage(
      spark.read.parquet(c1.added: _*).as[(Long, Long)]
        .filter(_._1 > 15L).toDF("k", "v"), src, "t2")
    TxnLog.commit(src, "delete", kept, removed = c1.added,
      readVersion = 1L, txnId = "t2")
    assert(TxnStream.maintainMirror(spark, src, mirror, "m", "k") === Seq(2L))
    assert(mirrorRows() === (16L to 20L).map(k => (k, k * 10L)).toSet,
      "rows dropped by the rewrite must retract from the mirror")
    // idempotent on replay
    assert(TxnStream.maintainMirror(spark, src, mirror, "m", "k") === Seq.empty)
    assert(mirrorRows() === (16L to 20L).map(k => (k, k * 10L)).toSet)
    // a row-preserving compaction commit retracts nothing
    val all = TxnLog.snapshotFiles(src)
    val compacted = TxnLog.stage(
      spark.read.parquet(all: _*).toDF("k", "v").coalesce(1), src, "t3")
    TxnLog.commit(src, "compact", compacted, removed = all,
      readVersion = 2L, txnId = "t3")
    assert(TxnStream.maintainMirror(spark, src, mirror, "m", "k") === Seq(3L))
    assert(mirrorRows() === (16L to 20L).map(k => (k, k * 10L)).toSet)
  }

  test("r13: a retraction wider than the broadcast threshold applies join-driven, mirror converges") {
    val src = freshRoot()
    val mirror = freshRoot()
    append(src, "t1", (1L to 512L).map(k => (k, k)))
    assert(TxnStream.maintainMirror(spark, src, mirror, "m", "k") === Seq(1L))
    // one source version retracts 300 keys; with broadcasts disabled
    // the key frame cannot be inlined — the semi-join must still
    // retract every key (the pre-r13 isInCollection literal would
    // have collected all 300 to the driver)
    TxnLog.deleteWhere(spark, src, col("k") <= 300L, "t2")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      assert(TxnStream.maintainMirror(spark, src, mirror, "m", "k") === Seq(2L))
    }
    assert(TxnLog.read(spark, mirror).as[(Long, Long)].collect().toSet ===
      (301L to 512L).map(k => (k, k)).toSet)
  }
}
