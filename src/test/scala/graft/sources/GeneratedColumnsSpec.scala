package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** GENERATED ALWAYS AS columns (X-A89) and the DML half of X-A42's
  * contract: CHECK + NOT NULL constraints now bind SQL UPDATE/MERGE
  * post-images too (copy-on-write AND merge-on-read), via one extra
  * scan of the staged bytes — O(changed data), nothing publishes on
  * violation.
  */
class GeneratedColumnsSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-gc-wh").toString
    spark.conf.set("spark.sql.catalog.ggc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ggc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ggc.db")
    wh
  }

  private def root(table: String): String = s"$warehouse/db/$table"

  private def withDmlMode[T](mode: String)(body: => T): T =
    withSQLConf("spark.graft.dml.mode" -> mode)(body)

  test("generated column computes on insert, verifies supplied values, prunes, and partitions") {
    warehouse
    spark.sql("CREATE TABLE ggc.db.gen (k BIGINT, ts TIMESTAMP, " +
      "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) " +
      "PARTITIONED BY (day)")
    // omitted by name -> computed
    spark.sql("""INSERT INTO ggc.db.gen (k, ts)
      SELECT id, timestamp_micros(1704067200000000 + (id % 3) * 86400000000)
      FROM range(0, 300)""")
    val got = spark.sql(
      "SELECT day, count(*) FROM ggc.db.gen GROUP BY day ORDER BY day")
      .collect().map(r => r.getDate(0).toString -> r.getLong(1))
    assert(got.toSeq === Seq("2024-01-01" -> 100L, "2024-01-02" -> 100L,
      "2024-01-03" -> 100L))
    // the generated column is an ordinary stat column AND the
    // partition column: prune proof with corrupted out-of-range files
    val victims = TxnLog.snapshotState(root("gen")).filter { case (_, m) =>
      m.stats.get("day").exists(st => st.typ == "d" && st.hi < 19725) // < 2024-01-03
    }.map(_._1)
    assert(victims.nonEmpty)
    victims.foreach(f => Files.write(Paths.get(f), Array[Byte](9)))
    assert(spark.sql(
      "SELECT count(*) FROM ggc.db.gen WHERE day = DATE '2024-01-03'")
      .head.getLong(0) === 100L)

    // a SUPPLIED value must agree: a wrong day refuses, nothing lands
    val before = TxnLog.currentVersion(root("gen"))
    val e = intercept[Exception](spark.sql(
      "INSERT INTO ggc.db.gen VALUES (999, TIMESTAMP '2024-02-01 10:00:00', " +
        "DATE '1999-01-01')"))
    assert(e.getMessage.contains("gen_day"), e.getMessage)
    assert(TxnLog.currentVersion(root("gen")) === before)
    // a correct supplied value and an explicit NULL both land computed
    spark.sql("INSERT INTO ggc.db.gen VALUES " +
      "(1000, TIMESTAMP '2024-02-01 10:00:00', DATE '2024-02-01'), " +
      "(1001, TIMESTAMP '2024-02-02 10:00:00', NULL)")
    val feb = spark.sql("SELECT k, day FROM ggc.db.gen WHERE k >= 1000")
      .collect().map(r => r.getLong(0) -> r.getDate(1).toString).toMap
    assert(feb === Map(1000L -> "2024-02-01", 1001L -> "2024-02-02"))
  }

  test("UPDATE that would desync a generated column refuses in both DML modes") {
    warehouse
    Seq("cow", "mor").foreach { mode =>
      val t = s"gup_$mode"
      spark.sql(s"CREATE TABLE ggc.db.$t (k BIGINT, ts TIMESTAMP, " +
        "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))")
      spark.sql(s"INSERT INTO ggc.db.$t (k, ts) VALUES " +
        "(1, TIMESTAMP '2024-01-01 08:00:00')")
      withDmlMode(mode) {
        val before = TxnLog.currentVersion(root(t))
        // shifting ts without fixing day would break the invariant
        val e = intercept[Exception](spark.sql(
          s"UPDATE ggc.db.$t SET ts = TIMESTAMP '2024-03-03 08:00:00' WHERE k = 1"))
        assert(e.getMessage.contains("gen_day"), s"$mode: ${e.getMessage}")
        assert(TxnLog.currentVersion(root(t)) === before,
          s"$mode: nothing may publish")
        // updating BOTH in one SET keeps the invariant and lands
        spark.sql(s"UPDATE ggc.db.$t SET ts = TIMESTAMP '2024-03-03 08:00:00', " +
          "day = DATE '2024-03-03' WHERE k = 1")
        assert(spark.sql(s"SELECT CAST(day AS STRING) FROM ggc.db.$t WHERE k = 1")
          .head.getString(0) === "2024-03-03")
      }
    }
  }

  test("identity columns: unique across batches, hwm from stats, explicit refused/allowed, overwrite restarts") {
    warehouse
    spark.sql("CREATE TABLE ggc.db.idt (id BIGINT GENERATED ALWAYS AS IDENTITY, " +
      "v BIGINT) ")
    spark.sql("INSERT INTO ggc.db.idt (v) SELECT id * 10 FROM range(0, 50)")
    spark.sql("INSERT INTO ggc.db.idt (v) SELECT id * 10 FROM range(50, 80)")
    val ids = spark.sql("SELECT id FROM ggc.db.idt").collect().map(_.getLong(0))
    assert(ids.length === 80 && ids.distinct.length === 80,
      "identity values must be unique across batches")
    assert(ids.min === 1L, "allocation starts at the declared start (default 1)")
    // the second batch continued past the first's high-water mark
    assert(ids.max === 80L)
    // GENERATED ALWAYS: explicit values refuse, nothing publishes
    val before = TxnLog.currentVersion(root("idt"))
    val e = intercept[Exception](
      spark.sql("INSERT INTO ggc.db.idt VALUES (999, 1)"))
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
    assert(TxnLog.currentVersion(root("idt")) === before)

    // BY DEFAULT + custom start/step: explicit values coexist; nulls
    // mint ABOVE the live extreme (explicit included)
    spark.sql("CREATE TABLE ggc.db.idd (id BIGINT GENERATED BY DEFAULT AS " +
      "IDENTITY (START WITH 100 INCREMENT BY 5), v BIGINT)")
    spark.sql("INSERT INTO ggc.db.idd VALUES (1000, 1), (NULL, 2), (NULL, 3)")
    val got = spark.sql("SELECT id, v FROM ggc.db.idd ORDER BY v")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got(0) === ((1000L, 1L)))
    assert(got.drop(1).forall(_._1 > 1000L),
      s"minted ids must clear the explicit high-water mark: ${got.toSeq}")
    assert(got.map(_._1).distinct.length === 3)

    // INSERT OVERWRITE truncates: allocation restarts at START WITH
    spark.sql("INSERT OVERWRITE ggc.db.idd (v) SELECT id FROM range(0, 3)")
    val re = spark.sql("SELECT min(id), max(id) FROM ggc.db.idd").head()
    assert(re.getLong(0) === 100L && re.getLong(1) === 110L,
      "overwrite restarts the sequence at START WITH, stepping by 5")
  }

  test("identity allocator under a forced two-writer race: no duplicate ids ever mint (r19)") {
    warehouse
    spark.sql("CREATE TABLE ggc.db.idr (id BIGINT GENERATED ALWAYS AS IDENTITY, " +
      "v BIGINT)")
    // two writers, barrier-synced per round so both statements span the
    // same read-allocate-commit window — the r18 hwmReadV fix's
    // conflict machinery must serialize them (losers re-read and
    // re-mint above the winner's extreme)
    val writers = 2
    val rounds = 6
    val barrier = new java.util.concurrent.CyclicBarrier(writers)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val fs = (0 until writers).map { w =>
      scala.concurrent.Future {
        (0 until rounds).foreach { r =>
          barrier.await(60, java.util.concurrent.TimeUnit.SECONDS)
          spark.sql("INSERT INTO ggc.db.idr (v) " +
            s"SELECT id + ${w * 10000 + r * 100} FROM range(0, 10)")
        }
      }
    }
    try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(fs),
      scala.concurrent.duration.Duration(300, "s"))
    finally pool.shutdown()
    val ids = spark.sql("SELECT id FROM ggc.db.idr").collect().map(_.getLong(0))
    assert(ids.length === writers * rounds * 10)
    assert(ids.distinct.length === ids.length,
      "two racing identity writers must never mint the same id")
    assert(ids.max === (writers * rounds * 10).toLong && ids.min === 1L,
      "losers re-read the extreme: allocation stays dense under contention")

    // deterministic LOSS: both writers pin the SAME readVersion with
    // the append guard up — the CAS winner lands, the other MUST see
    // ConflictException (the window insertWithIdentity closes by
    // threading hwmReadV into the guarded commit)
    import spark.implicits._
    val r = root("idr")
    val readV = TxnLog.currentVersion(r)
    val fA = TxnLog.stage(Seq((900001L, 1L)).toDF("id", "v"), r, "rc-a")
    val fB = TxnLog.stage(Seq((900001L, 2L)).toDF("id", "v"), r, "rc-b")
    TxnLog.commit(r, "append", fA, Nil, readVersion = readV, txnId = "rc-a",
      failOnConcurrentAppend = true)
    val e = intercept[TxnLog.ConflictException](
      TxnLog.commit(r, "append", fB, Nil, readVersion = readV, txnId = "rc-b",
        failOnConcurrentAppend = true))
    assert(e.getMessage.contains("appended"),
      s"the guarded commit must lose to the interleaved append: ${e.getMessage}")
  }

  test("identity tables refuse the mint-less ingest paths: streaming writes and COPY INTO") {
    warehouse
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    spark.sql("CREATE TABLE ggc.db.idg (id BIGINT GENERATED ALWAYS AS IDENTITY, " +
      "v BIGINT)")
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    // streaming append: refused at query start — an epoch has no
    // minting step and would land NULL ids silently
    val ckpt = Files.createTempDirectory("graft-idg-ckpt").toString
    val in = MemoryStream[Long](spark)
    val e = intercept[Exception] {
      val q = in.toDF().selectExpr("CAST(NULL AS BIGINT) AS id", "value AS v")
        .writeStream.option("checkpointLocation", ckpt).toTable("ggc.db.idg")
      try { in.addData(1L); q.processAllAvailable() } finally q.stop()
    }
    assert(causes(e).exists(c => Option(c.getMessage).exists(
      _.contains("IDENTITY"))), s"got: $e")
    // COPY INTO: same refusal
    val landing = Files.createTempDirectory("graft-idg-landing").toString
    spark.range(3).selectExpr("CAST(NULL AS BIGINT) AS id", "id AS v")
      .write.mode("overwrite").parquet(landing)
    val e2 = intercept[Exception](spark.sql(
      s"CALL ggc.system.copy_into(table => 'db.idg', source => '$landing')"))
    assert(e2.getMessage.contains("IDENTITY"), e2.getMessage)
    assert(TxnLog.currentVersion(root("idg")) === 1L, "nothing may publish")
  }

  test("CHECK and NOT NULL bind UPDATE/MERGE post-images (the DML gap), cow and mor") {
    warehouse
    Seq("cow", "mor").foreach { mode =>
      val t = s"chk_$mode"
      spark.sql(s"CREATE TABLE ggc.db.$t (k BIGINT, v BIGINT NOT NULL) " +
        s"TBLPROPERTIES ('graft.constraint.v_pos' = 'v > 0')")
      spark.sql(s"INSERT INTO ggc.db.$t VALUES (1, 10), (2, 20)")
      withDmlMode(mode) {
        val before = TxnLog.currentVersion(root(t))
        val e1 = intercept[Exception](
          spark.sql(s"UPDATE ggc.db.$t SET v = -5 WHERE k = 1"))
        assert(e1.getMessage.contains("v_pos"), s"$mode: ${e1.getMessage}")
        val e2 = intercept[Exception](spark.sql(
          s"""MERGE INTO ggc.db.$t t USING (SELECT 2 AS k, CAST(-1 AS BIGINT) AS v) s
              ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v"""))
        assert(e2.getMessage.contains("v_pos"), s"$mode: ${e2.getMessage}")
        assert(TxnLog.currentVersion(root(t)) === before,
          s"$mode: violating DML must publish nothing")
        // no stranded staged bytes: the violation cleaned up after itself
        import scala.jdk.CollectionConverters._
        val live = TxnLog.snapshotFiles(root(t)).toSet
        val stray = Files.walk(Paths.get(root(t), "data")).iterator().asScala
          .map(_.toString).filter(_.endsWith(".parquet")).filterNot(live).toSeq
        assert(stray.isEmpty, s"$mode: staged parquet must be deleted on refusal: $stray")
        // a DELETE still works (survivor rows are already proven)
        spark.sql(s"DELETE FROM ggc.db.$t WHERE k = 2")
        assert(spark.sql(s"SELECT count(*) FROM ggc.db.$t").head.getLong(0) === 1L)
      }
    }
  }
}
