package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** Partition-spec EVOLUTION (X-A86): `CALL graft.system
  * .set_partitioning(table, spec)` re-declares the table's
  * partitioning as ONE metadata commit. Because partitioning here is
  * write-side clustering + per-file stats (never a directory layout),
  * evolution moves ZERO data bytes: files written under the old spec
  * keep their old — still sound — stats, and every later write
  * clusters by the new spec. The Iceberg headline feature priced at
  * one history row.
  */
class PartitionEvolutionSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-pe-wh").toString
    spark.conf.set("spark.sql.catalog.gpe", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gpe.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gpe.db")
    wh
  }

  private def root(table: String): String = s"$warehouse/db/$table"

  test("evolving identity -> days touches zero files; both generations prune through their own stats") {
    warehouse
    spark.sql("CREATE TABLE gpe.db.ev (k BIGINT, ts TIMESTAMP, cat STRING) " +
      "PARTITIONED BY (cat)")
    // gen-1 under identity(cat): two categories x two days, interleaved
    spark.sql("""INSERT INTO gpe.db.ev
      SELECT id, timestamp_micros(1704067200000000 + (id % 2) * 86400000000 + id),
             IF(id % 2 = 0, 'a', 'b')
      FROM range(0, 400)""")
    val gen1 = TxnLog.snapshotState(root("ev")).map(_._1).toSet
    assert(gen1.nonEmpty)

    // the evolution commit: metadata only — the live file set is
    // byte-identical before and after
    spark.sql("CALL gpe.system.set_partitioning(table => 'db.ev', " +
      "spec => 'days(ts)')")
    assert(TxnLog.snapshotState(root("ev")).map(_._1).toSet === gen1,
      "set_partitioning must move zero data files")
    assert(TxnLog.partitionFields(root("ev")) ===
      Seq(TxnLog.TemporalField("days", "ts")))

    // gen-2 writes cluster by the NEW spec: every new file spans <= 1 day
    spark.sql("""INSERT INTO gpe.db.ev
      SELECT id, timestamp_micros(1704067200000000 + (2 + id % 2) * 86400000000 + id),
             IF(id % 3 = 0, 'a', 'b')
      FROM range(400, 800)""")
    val gen2 = TxnLog.snapshotState(root("ev")).filterNot(f => gen1(f._1))
    assert(gen2.nonEmpty)
    val dayOf = (micros: Long) => Math.floorDiv(micros, 86400000000L)
    assert(gen2.forall { case (_, m) => m.stats.get("ts").exists(st =>
      st.typ == "t" && dayOf(st.lo) == dayOf(st.hi)) },
      "post-evolution files must each span at most one UTC day")

    // prune proof across generations: day-4 rows live only in gen-2;
    // corrupt every file whose ts range ends before day 4 (ALL of
    // gen-1 plus gen-2's day-3 files) — the filtered count still
    // answers from the surviving files
    val day4lo = 1704067200000000L + 3 * 86400000000L
    val victims = TxnLog.snapshotState(root("ev")).filter { case (_, m) =>
      m.stats.get("ts").exists(_.hi < day4lo) }.map(_._1)
    assert(victims.exists(gen1.contains) && victims.exists(!gen1.contains(_)),
      "the corruption set must span both generations")
    victims.foreach(f => Files.write(Paths.get(f), Array[Byte](9, 9)))
    assert(spark.sql("SELECT count(*) FROM gpe.db.ev " +
      "WHERE ts >= TIMESTAMP '2024-01-04 00:00:00'").head.getLong(0) === 200L)
  }

  test("partitions metadata after evolution: old-generation files render <multi>, new ones their day") {
    warehouse
    spark.sql("CREATE TABLE gpe.db.pm (k BIGINT, ts TIMESTAMP, cat STRING) " +
      "PARTITIONED BY (cat)")
    // one gen-1 file spanning two days (identity(cat) clustering
    // ignores ts, so its ts stat spans)
    spark.sql("""INSERT INTO gpe.db.pm
      SELECT id, timestamp_micros(1704067200000000 + (id % 2) * 86400000000), 'a'
      FROM range(0, 100)""")
    spark.sql("CALL gpe.system.set_partitioning(table => 'db.pm', " +
      "spec => 'days(ts)')")
    spark.sql("""INSERT INTO gpe.db.pm
      SELECT id, timestamp_micros(1704067200000000 + 2 * 86400000000), 'b'
      FROM range(100, 150)""")
    val parts = spark.sql("SELECT partition, rows FROM gpe.db.pm.partitions")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(parts.getOrElse("days(ts)=2024-01-03", 0L) === 50L,
      s"new-generation day tuple missing: $parts")
    assert(parts.keySet.exists(_.contains("<multi>")),
      s"pre-evolution files spanning days must render <multi>, got $parts")
    assert(parts.values.sum === 150L, "every row accounted for")
  }

  test("clearing the partitioning and evolving to bucket both take; DESCRIBE round-trips") {
    warehouse
    spark.sql("CREATE TABLE gpe.db.cb (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (k)")
    spark.sql("INSERT INTO gpe.db.cb SELECT id, id * 2 FROM range(0, 100)")
    // clear: the sentinel round-trips through commits AND checkpoints
    spark.sql("CALL gpe.system.set_partitioning(table => 'db.cb', spec => '')")
    assert(TxnLog.partitionFields(root("cb")).isEmpty)
    TxnLog.checkpoint(root("cb"))
    assert(TxnLog.partitionFields(root("cb")).isEmpty,
      "cleared partitioning must survive a log checkpoint")
    // evolve to bucket(4, k): later writes collapse the derived
    // bucket stat to a point per file
    spark.sql("CALL gpe.system.set_partitioning(table => 'db.cb', " +
      "spec => 'bucket(4, k)')")
    spark.sql("INSERT INTO gpe.db.cb SELECT id, id * 2 FROM range(100, 300)")
    val bucketed = TxnLog.snapshotState(root("cb"))
      .flatMap(_._2.stats.get("bucket(4;k)"))
    assert(bucketed.nonEmpty && bucketed.forall(st => st.lo == st.hi),
      "post-evolution files must carry collapsed bucket point stats")
    // DESCRIBE reflects the head spec
    val desc = spark.sql("DESCRIBE TABLE EXTENDED gpe.db.cb")
      .collect().map(_.mkString(" ")).mkString("\n")
    assert(desc.contains("bucket(4, k)"), desc)
  }

  test("refusals: unknown column, hours over DATE, bucket over DOUBLE; restore across the boundary") {
    warehouse
    spark.sql("CREATE TABLE gpe.db.rf (k BIGINT, d DATE, x DOUBLE)")
    spark.sql("INSERT INTO gpe.db.rf VALUES (1, DATE '2024-01-01', 1.5)")
    def refuses(spec: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(
        s"CALL gpe.system.set_partitioning(table => 'db.rf', spec => '$spec')"))
      assert(e.getMessage.contains(frag), s"$spec -> ${e.getMessage}")
    }
    refuses("nope", "no column nope")
    refuses("hours(d)", "hours transform needs a timestamp")
    refuses("bucket(4, x)", "bucket transform needs an integral")
    refuses("bucket(0, k)", "bucket count must be positive")
    // restore across a set-partitioning boundary refuses with the
    // explicit evolve-back instruction...
    val v1 = TxnLog.currentVersion(root("rf"))
    spark.sql("CALL gpe.system.set_partitioning(table => 'db.rf', spec => 'k')")
    spark.sql("INSERT INTO gpe.db.rf VALUES (2, DATE '2024-01-02', 2.5)")
    val e = intercept[Exception](spark.sql(
      s"CALL gpe.system.restore(table => 'db.rf', version => $v1)"))
    assert(e.getMessage.contains("partitioning changed"), e.getMessage)
    // ...and succeeds after evolving back (cleared == never-partitioned)
    spark.sql("CALL gpe.system.set_partitioning(table => 'db.rf', spec => '')")
    spark.sql(s"CALL gpe.system.restore(table => 'db.rf', version => $v1)")
    assert(spark.sql("SELECT count(*) FROM gpe.db.rf").head.getLong(0) === 1L)
  }
}
