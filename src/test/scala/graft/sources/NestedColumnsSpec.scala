package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Nested/struct columns as first-class catalog citizens (r17): writes
  * collect per-file typed stats on struct LEAVES (dotted paths), a
  * dotted predicate prunes files through both the SQL catalog scan and
  * `TxnLog.table`, and one level of struct nesting evolves with
  * metadata-only ADD/DROP. Nested RENAME refuses loudly (the flat
  * column mapping does not address struct leaves — parquet binds them
  * by name, so a silent rename would null out every pre-rename file).
  */
class NestedColumnsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-nest-wh").toString
    spark.conf.set("spark.sql.catalog.gnest", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gnest.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnest.db")
    wh
  }

  private def root(table: String): String = s"$warehouse/db/$table"

  private def corrupt(files: Seq[String]): Unit =
    files.foreach(f => Files.write(Paths.get(f), Array[Byte](0, 1, 2, 3)))

  private def causes(t: Throwable): Seq[Throwable] =
    if (t == null) Nil else t +: causes(t.getCause)

  test("struct leaves get per-file typed stats; a dotted predicate prunes (corruption-proof) on both read paths") {
    warehouse
    spark.sql("CREATE TABLE gnest.db.ev (k BIGINT, payload STRUCT<ts: BIGINT, tag: STRING>)")
    // 8 range-clustered inserts: each file's payload.ts range is tight
    (0 until 8).foreach { i =>
      spark.sql(s"INSERT INTO gnest.db.ev SELECT id, " +
        s"named_struct('ts', id * 10, 'tag', concat('t', CAST(id AS STRING))) " +
        s"FROM range(${i * 100}, ${i * 100 + 100})")
    }
    val st = TxnLog.snapshotState(root("ev"))
    assert(st.nonEmpty)
    // every file carries typed stats under the DOTTED leaf paths
    st.foreach { case (f, m) =>
      assert(m.stats.contains("payload.ts"), s"$f missing payload.ts stat: ${m.stats.keySet}")
      assert(m.stats("payload.ts").typ === "l")
      assert(m.stats.contains("payload.tag") && m.stats("payload.tag").typ === "s")
    }
    // corrupt every file whose payload.ts range is outside the probe:
    // a correct answer PROVES the dotted predicate pruned at file level
    corrupt(st.collect {
      case (f, m) if m.stats("payload.ts").hi < 3000L ||
        m.stats("payload.ts").lo > 3990L => f
    })
    // SQL catalog scan path
    val viaSql = spark.sql(
      "SELECT k FROM gnest.db.ev WHERE payload.ts >= 3000 AND payload.ts <= 3990")
      .as[Long].collect().toSet
    assert(viaSql === (300L to 399L).toSet,
      "dotted predicate must prune through the catalog scan")
    // raw table() path (TxnLogFileIndex with catalyst GetStructField)
    val viaTable = TxnLog.table(spark, root("ev"))
      .filter(col("payload.ts") >= 3000L && col("payload.ts") <= 3990L)
      .select("k").as[Long].collect().toSet
    assert(viaTable === (300L to 399L).toSet,
      "dotted predicate must prune through TxnLog.table")
    // string leaf prefix probe on a live file still answers
    assert(spark.sql(
      "SELECT count(*) FROM gnest.db.ev WHERE payload.ts BETWEEN 3000 AND 3990 " +
        "AND payload.tag = 't333'").head.getLong(0) === 1L)
  }

  test("nested ADD/DROP are metadata-only; re-adding a dropped leaf refuses; nested RENAME refuses loudly") {
    warehouse
    spark.sql("CREATE TABLE gnest.db.evo (k BIGINT, s STRUCT<a: BIGINT>)")
    spark.sql("INSERT INTO gnest.db.evo SELECT id, named_struct('a', id) FROM range(0, 50)")
    val dataFiles = TxnLog.snapshotFiles(root("evo"))
    val mtimes = dataFiles.map(f =>
      (f, Files.getLastModifiedTime(Paths.get(f))))

    // ADD a nested leaf: one metadata commit, zero files touched
    spark.sql("ALTER TABLE gnest.db.evo ADD COLUMN s.b STRING")
    mtimes.foreach { case (f, mt) =>
      assert(Files.getLastModifiedTime(Paths.get(f)) === mt,
        s"nested ADD must touch no data file, touched $f")
    }
    // old rows serve NULL for the new leaf
    assert(spark.sql("SELECT count(*) FROM gnest.db.evo WHERE s.b IS NULL")
      .head.getLong(0) === 50L)
    // new writes carry it (and its stats)
    spark.sql("INSERT INTO gnest.db.evo SELECT id, named_struct('a', id, 'b', " +
      "concat('x', CAST(id AS STRING))) FROM range(50, 60)")
    assert(spark.sql("SELECT count(*) FROM gnest.db.evo WHERE s.b IS NOT NULL")
      .head.getLong(0) === 10L)
    val newFile = TxnLog.snapshotState(root("evo"))
      .filterNot { case (f, _) => dataFiles.contains(f) }
    assert(newFile.nonEmpty && newFile.forall(_._2.stats.contains("s.b")),
      "post-evolution writes must stat the new leaf")

    // DROP the leaf: metadata-only, leaves the projection
    spark.sql("ALTER TABLE gnest.db.evo DROP COLUMN s.b")
    assert(!spark.table("gnest.db.evo").schema("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.contains("b"))
    // re-ADD under the same name: refused (parquet binds nested fields
    // by name — old files still hold bytes under s.b)
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE gnest.db.evo ADD COLUMN s.b STRING")
    }
    assert(causes(e1).exists(c => Option(c.getMessage).exists(
      _.contains("existed before"))), s"got: $e1")
    // ...a FRESH name adds fine
    spark.sql("ALTER TABLE gnest.db.evo ADD COLUMN s.c BIGINT")
    assert(spark.sql("SELECT count(*) FROM gnest.db.evo WHERE s.c IS NULL")
      .head.getLong(0) === 60L)

    // nested RENAME: loud refusal, not silent nulls
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gnest.db.evo RENAME COLUMN s.a TO z")
    }
    assert(causes(e2).exists(c => Option(c.getMessage).exists(
      _.contains("nested fields do not rename"))), s"got: $e2")
    // dropping the struct's LAST field refuses (drop the column instead)
    spark.sql("ALTER TABLE gnest.db.evo DROP COLUMN s.c")
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE gnest.db.evo DROP COLUMN s.a")
    }
    assert(causes(e3).exists(c => Option(c.getMessage).exists(
      _.contains("last field"))), s"got: $e3")
  }

  test("dotted stats survive a TOP-level rename of the struct column; merge rewrites keep leaf stats") {
    warehouse
    spark.sql("CREATE TABLE gnest.db.rn (k BIGINT, s STRUCT<v: BIGINT>)")
    spark.sql("INSERT INTO gnest.db.rn SELECT id, named_struct('v', id * 10) " +
      "FROM range(0, 100)")
    spark.sql("ALTER TABLE gnest.db.rn RENAME COLUMN s TO payload")
    // the dotted predicate resolves through the rename (logical
    // payload.v -> physical s.v stat key)
    assert(spark.sql("SELECT count(*) FROM gnest.db.rn WHERE payload.v >= 500")
      .head.getLong(0) === 50L)
    // merge rewrite keeps INSERT-grade leaf stats (r17 merge contract)
    val src = Seq((5L, 99999L)).toDF("k", "v")
      .selectExpr("k", "named_struct('v', v) AS s")
    TxnLog.mergeInto(spark, root("rn"),
      src.withColumnRenamed("s", "payload"), "k", "nested-merge-1")
    val merged = TxnLog.commits(root("rn")).last
    assert(merged.action === "merge")
    val st = TxnLog.snapshotState(root("rn")).toMap
    merged.added.foreach { f =>
      assert(st(f).stats.contains("s.v"),
        s"merged file must keep the leaf stat under the PHYSICAL path, got ${st(f).stats.keySet}")
    }
  }
}
