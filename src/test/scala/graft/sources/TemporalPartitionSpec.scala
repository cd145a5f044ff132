package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** Iceberg-style temporal partition transforms (X-A84):
  * `PARTITIONED BY (days(ts) | hours(ts) | months(d) | years(d))`.
  * Write-side the insert RANGE-clusters rows by the UTC-epoch period
  * index, so each staged file spans (at most) one period; read-side a
  * plain timestamp predicate prunes through the SOURCE column's typed
  * micros/days stats — strictly tighter than the folded period, which
  * is why the transform introduces no new pruning domain. The
  * `partitions` metadata table renders period tuples in calendar
  * spelling.
  */
class TemporalPartitionSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-tp-wh").toString
    spark.conf.set("spark.sql.catalog.gtp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtp.db")
    wh
  }

  private def root(table: String): String = s"$warehouse/db/$table"

  test("days(ts) clusters inserts by UTC day; a ts predicate prunes with out-of-range files corrupted on disk") {
    warehouse
    spark.sql("CREATE TABLE gtp.db.ev (k BIGINT, ts TIMESTAMP, v BIGINT) " +
      "PARTITIONED BY (days(ts))")
    // three distinct days, 200 rows each, interleaved in insert order
    spark.sql("""INSERT INTO gtp.db.ev
      SELECT id, timestamp_micros(CAST(1704067200000000 + (id % 3) * 86400000000 + id * 1000 AS BIGINT)), id * 10
      FROM range(0, 600)""")

    // every staged file spans ONE day (the range clustering collapsed
    // the micros stat within a day)
    val metas = TxnLog.snapshotState(root("ev")).map(_._2)
    assert(metas.nonEmpty)
    val dayOf = (micros: Long) => Math.floorDiv(micros, 86400000000L)
    assert(metas.forall(m => m.stats.get("ts").exists(st =>
      st.typ == "t" && dayOf(st.lo) == dayOf(st.hi))),
      "each file spans at most one UTC day")

    // prune proof: corrupt every file outside the last day; the
    // filtered aggregate still answers from the surviving files
    val lastDayLo = 1704067200000000L + 2 * 86400000000L
    val victims = TxnLog.snapshotState(root("ev")).filter { case (_, m) =>
      m.stats.get("ts").exists(_.hi < lastDayLo) }.map(_._1)
    assert(victims.nonEmpty)
    victims.foreach(f => Files.write(Paths.get(f), Array[Byte](9, 9)))
    assert(spark.sql(
      "SELECT count(*) FROM gtp.db.ev WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'")
      .head.getLong(0) === 200L)
  }

  test("the partitions metadata table renders day tuples in ISO spelling") {
    warehouse
    spark.sql("CREATE TABLE gtp.db.pt (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("""INSERT INTO gtp.db.pt
      SELECT id, timestamp_micros(CAST(1704067200000000 + (id % 2) * 86400000000 AS BIGINT))
      FROM range(0, 100)""")
    val parts = spark.sql("SELECT partition, rows FROM gtp.db.pt.partitions")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(parts === Map(
      "days(ts)=2024-01-01" -> 50L, "days(ts)=2024-01-02" -> 50L))
  }

  test("months over DATE and hours over TIMESTAMP; negative epochs floor correctly") {
    warehouse
    spark.sql("CREATE TABLE gtp.db.md (k BIGINT, d DATE) " +
      "PARTITIONED BY (months(d))")
    spark.sql("""INSERT INTO gtp.db.md
      SELECT id, IF(id < 50, DATE '1969-12-15', DATE '2024-02-10')
      FROM range(0, 100)""")
    val mparts = spark.sql("SELECT partition, rows FROM gtp.db.md.partitions")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mparts === Map(
      "months(d)=1969-12" -> 50L, "months(d)=2024-02" -> 50L),
      "pre-epoch months floor to the right calendar month")

    spark.sql("CREATE TABLE gtp.db.hr (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (hours(ts))")
    spark.sql("""INSERT INTO gtp.db.hr
      SELECT id, timestamp_micros(CAST(1704067200000000 + (id % 2) * 3600000000 AS BIGINT))
      FROM range(0, 60)""")
    val hparts = spark.sql("SELECT partition FROM gtp.db.hr.partitions")
      .collect().map(_.getString(0)).toSet
    assert(hparts === Set(
      "hours(ts)=2024-01-01-00", "hours(ts)=2024-01-01-01"))
  }

  test("DESCRIBE round-trips the transform; hours over DATE refuses; non-temporal column refuses") {
    warehouse
    spark.sql("CREATE TABLE gtp.db.rt (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    val shown = spark.sql("DESCRIBE TABLE EXTENDED gtp.db.rt")
      .collect().map(_.mkString(" ")).mkString("\n")
    assert(shown.contains("days(ts)"))

    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE gtp.db.bad1 (k BIGINT, d DATE) " +
        "PARTITIONED BY (hours(d))")
    }
    assert(e1.getMessage.contains("timestamp"))
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gtp.db.bad2 (k BIGINT, s STRING) " +
        "PARTITIONED BY (days(s))")
    }
    assert(e2.getMessage.contains("timestamp"))
  }
}
