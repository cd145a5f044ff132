package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.{DedupOps, VectorOps}

/** r18 (X-D17/X-S22): CDF-maintained derived indexes — ingest keeps
  * the MinHash band index / LSH postings fresh by applying each
  * source version's feed delta ([[TxnStream.maintainIndexInto]] →
  * [[TxnLog.retractAndAppend]]), never re-scanning the corpus.
  *
  * Receipts: (1) the maintained index equals a fresh full-corpus
  * build after every kind of source change (insert, COW update,
  * delete); (2) per-version target work is O(that version's changed
  * rows) — measured from the target's own change feed; (3) replay
  * applies nothing (the exactly-once ledger); (4) dedup answers
  * through the maintained index are identical to a fresh build's.
  */
class IndexMaintenanceSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-ixm-wh").toString
    spark.conf.set("spark.sql.catalog.gix", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gix.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gix.db")
    wh
  }

  private def root(table: String): String = s"$warehouse/db/$table"

  private def freshTarget(): String = {
    val r = Files.createTempDirectory("graft-ixm-target").toString
    TxnLog.init(r)
    r
  }

  private def bandIndexOf(df: DataFrame): DataFrame =
    DedupOps.bandIndex(df, "doc_id", "text")

  private def indexRows(r: String): Set[(Long, String, String)] =
    TxnLog.read(spark, r).collect()
      .map(x => (x.getLong(0), x.get(1).toString, x.get(2).toString)).toSet

  private def freshRows(srcTable: String): Set[(Long, String, String)] =
    bandIndexOf(spark.table(s"gix.db.$srcTable")).collect()
      .map(x => (x.getLong(0), x.get(1).toString, x.get(2).toString)).toSet

  test("band index converges through insert, COW update and delete; replay is a no-op") {
    warehouse
    spark.sql("CREATE TABLE gix.db.docs (doc_id BIGINT, text STRING)")
    val target = freshTarget()
    val consumer = "bandix"
    def refresh(): Seq[Long] = TxnStream.maintainIndexInto(
      spark, root("docs"), target, consumer, "doc_id")(bandIndexOf)

    // batch 1: 40 docs
    spark.sql("INSERT INTO gix.db.docs SELECT id, " +
      "concat('alpha beta gamma delta ', id, ' epsilon zeta') FROM range(0, 40)")
    assert(refresh() === Seq(1L, 2L))
    assert(indexRows(target) === freshRows("docs"))

    // batch 2: 20 more — the refresh's target work is THIS batch's
    // index rows only (4 bands x 20 docs), not the corpus's
    spark.sql("INSERT INTO gix.db.docs SELECT id, " +
      "concat('alpha beta gamma delta ', id, ' epsilon zeta') FROM range(40, 60)")
    assert(refresh() === Seq(3L))
    assert(indexRows(target) === freshRows("docs"))
    val v3Work = TxnStream.readChanges(spark, target, 2L, 3L).count()
    assert(v3Work === 80L,
      s"per-refresh work must be the delta's index rows (4 bands x 20 docs), got $v3Work")

    // COW UPDATE rewrites 6 docs' text: their old band keys retract,
    // new ones land, everything else untouched
    spark.sql("UPDATE gix.db.docs SET text = concat('omega psi chi phi ', doc_id) " +
      "WHERE doc_id % 10 = 0")
    assert(refresh() === Seq(4L))
    assert(indexRows(target) === freshRows("docs"))
    val v4Work = TxnStream.readChanges(spark, target, 3L, 4L).count()
    assert(v4Work === 24L,
      s"an update's refresh indexes only the changed docs (4 x 6), got $v4Work")

    // DELETE drops 4 docs (DV path): pure retraction, zero new rows
    spark.sql("DELETE FROM gix.db.docs WHERE doc_id % 15 = 0")
    assert(refresh() === Seq(5L))
    assert(indexRows(target) === freshRows("docs"))
    assert(TxnStream.readChanges(spark, target, 4L, 5L).count() === 0L)

    // replay: a second maintainer applies nothing and changes nothing
    val before = TxnLog.currentVersion(target)
    assert(refresh() === Seq.empty)
    assert(TxnLog.currentVersion(target) === before)

    // the dedup ANSWER through the maintained index equals a fresh
    // build's — the property a 100 TB pipeline actually relies on
    val incoming = spark.range(0, 10)
      .selectExpr("id + 1000 AS doc_id",
        "concat('alpha beta gamma delta ', id * 6, ' epsilon zeta') AS text")
    val viaMaintained = DedupOps.incrementalDedup(
        TxnLog.read(spark, target), incoming, "doc_id", "text")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    val viaFresh = DedupOps.incrementalDedup(
        bandIndexOf(spark.table("gix.db.docs")), incoming, "doc_id", "text")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(viaMaintained === viaFresh)
  }

  test("LSH postings index (ANN) maintains through the same machinery") {
    warehouse
    spark.sql("CREATE TABLE gix.db.vecs (vec_id BIGINT, embedding ARRAY<DOUBLE>)")
    val target = freshTarget()
    def vecIndexOf(df: DataFrame): DataFrame =
      VectorOps.lshIndex(df, "vec_id", "embedding", dim = 8)
        .withColumnRenamed("__id", "vec_id")
    def refresh(): Seq[Long] = TxnStream.maintainIndexInto(
      spark, root("vecs"), target, "annix", "vec_id")(vecIndexOf)

    def mk(lo: Int, hi: Int) = spark.range(lo, hi).selectExpr("id AS vec_id",
      "transform(sequence(1, 8), j -> cast(hash(id, j) % 100 AS DOUBLE) / 100.0) AS embedding")
    mk(0, 30).createOrReplaceTempView("vx1")
    spark.sql("INSERT INTO gix.db.vecs SELECT * FROM vx1")
    refresh()
    mk(30, 50).createOrReplaceTempView("vx2")
    spark.sql("INSERT INTO gix.db.vecs SELECT * FROM vx2")
    refresh()
    spark.sql("DELETE FROM gix.db.vecs WHERE vec_id % 7 = 0")
    refresh()
    val maintained = TxnLog.read(spark, target).collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString)).toSet
    val fresh = vecIndexOf(spark.table("gix.db.vecs")).collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString)).toSet
    assert(maintained === fresh,
      "the maintained postings index must equal a fresh full-corpus build")
  }

  test("INDEX-table hygiene (r20): refresh cycles interleaved with compaction " +
       "and vacuum keep answers identical, files and DV bytes bounded, " +
       "exactly-once intact") {
    warehouse
    spark.sql("CREATE TABLE gix.db.hdocs (doc_id BIGINT, text STRING)")
    val target = freshTarget()
    def refresh(): Seq[Long] = TxnStream.maintainIndexInto(
      spark, root("hdocs"), target, "hygix", "doc_id")(bandIndexOf)
    def hygiene(tag: String): Unit = {
      // the full maintenance battery ON THE INDEX: deletion-dense
      // files rewritten, small refresh files compacted, history
      // checkpointed, unreferenced bytes reclaimed
      TxnLog.optimizeCompactDeletes(spark, target, 0.05, s"hyg-dv-$tag")
      TxnLog.compactSmallFiles(spark, target,
        smallBytes = 1L << 20, targetBytes = 8L << 20, txnId = s"hyg-cf-$tag")
      TxnLog.checkpoint(target)
      TxnLog.vacuum(target, TxnLog.currentVersion(target))
    }
    var maxFeedRows = 0L
    (1 to 9).foreach { cycle =>
      val lo = cycle * 100
      spark.sql(s"INSERT INTO gix.db.hdocs SELECT id, " +
        s"concat('alpha beta gamma delta ', id, ' epsilon zeta') " +
        s"FROM range($lo, ${lo + 12})")
      if (cycle % 2 == 0)
        spark.sql(s"UPDATE gix.db.hdocs SET text = concat('omega psi chi ', doc_id) " +
          s"WHERE doc_id % 17 = ${cycle % 17}")
      if (cycle % 3 == 0)
        spark.sql(s"DELETE FROM gix.db.hdocs WHERE doc_id % 23 = ${cycle % 23}")
      val before = TxnLog.currentVersion(target)
      refresh()
      // per-refresh target work stays O(this cycle's changed rows) —
      // hygiene commits are row-preserving and must NOT re-enter the
      // feed (a compaction echoing the whole index into every refresh
      // would be the O(index) regression the mirror rule closed)
      maxFeedRows = math.max(maxFeedRows, TxnStream.readChanges(
        spark, target, before, TxnLog.currentVersion(target)).count())
      // answers stay EXACTLY a fresh build's after every cycle
      assert(indexRows(target) === freshRows("hdocs"), s"cycle $cycle diverged")
      if (cycle % 3 == 0) {
        hygiene(cycle.toString)
        assert(indexRows(target) === freshRows("hdocs"),
          s"hygiene at cycle $cycle changed the index contents")
        // exactly-once survives hygiene: a replay right after the
        // compaction/vacuum applies nothing (the txn ledger rides the
        // checkpoint, not the vacuumed history)
        val v = TxnLog.currentVersion(target)
        assert(refresh() === Seq.empty, "replay after hygiene must be a no-op")
        assert(TxnLog.currentVersion(target) === v)
      }
    }
    assert(maxFeedRows <= 200L,
      s"per-refresh feed work must stay batch-sized, got $maxFeedRows")
    // (b) the artifact stays BOUNDED: 9 refresh cycles landed ~14
    // commits of small files + retraction DVs; hygiene holds the live
    // inventory at a handful of files and near-zero DV bytes
    val st = TxnLog.snapshotState(target)
    assert(st.size <= 6,
      s"live index files must stay bounded by compaction, got ${st.size}")
    val dvBytes = st.flatMap { case (_, m) => m.dv }.map(_.length / 2).sum
    assert(dvBytes <= 256,
      s"post-hygiene DV payload must be near-zero, got $dvBytes bytes")
    // and the index still answers identically through the dedup path
    val incoming = spark.range(0, 8).selectExpr("id + 9000 AS doc_id",
      "concat('alpha beta gamma delta ', id * 100, ' epsilon zeta') AS text")
    val viaMaintained = DedupOps.incrementalDedup(
        TxnLog.read(spark, target), incoming, "doc_id", "text")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    val viaFresh = DedupOps.incrementalDedup(
        bandIndexOf(spark.table("gix.db.hdocs")), incoming, "doc_id", "text")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(viaMaintained === viaFresh)
  }
}
