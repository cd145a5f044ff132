package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** MODEL-BASED check of the exactly-once streaming write
  * ([[GraftStreamingWrite]]): random sequences of micro-batch feeds
  * interleaved with CRASH-REPLAY injections — after each drained
  * round the harness may stop the query, delete the sink's newest
  * commit marker (the exact window where Structured Streaming cannot
  * prove the epoch's side effects landed), and restart from the same
  * checkpoint, forcing the engine to re-run the epoch. The table must
  * equal the fed multiset after EVERY round: a dropped row means the
  * replay dedup swallowed real data, a duplicate means the
  * (queryId, epochId) ledger failed. Fixed seeds keep CI
  * deterministic; restarts share one checkpoint, so the stable query
  * id is exercised across JVM-internal query restarts exactly as a
  * production crash would.
  */
class StreamWriteModelSpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("random feed/crash-replay interleavings land every row exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val seeds = sys.env.get("GRAFT_SW_MODEL_SEEDS").map(_.toLong).getOrElse(3L)
    val rounds = sys.env.get("GRAFT_SW_MODEL_ROUNDS").map(_.toInt).getOrElse(8)
    for (seed <- 1L to seeds) {
      val wh = Files.createTempDirectory(s"graft-swmodel-$seed").toString
      val cat = s"gswm$seed"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")
      val ckpt = Files.createTempDirectory(s"graft-swmodel-ck-$seed").toString
      val in = MemoryStream[Long](spark)
      def start() = in.toDF().selectExpr("value AS k")
        .writeStream.option("checkpointLocation", ckpt).toTable(s"$cat.t")

      var fed = List.empty[Long]
      var next = seed * 100000L
      var q = start()
      try {
        val plan = sample(Gen.listOfN(rounds,
          for (n <- Gen.choose(0, 30); crash <- Gen.prob(0.4)) yield (n, crash)),
          seed)
        plan.zipWithIndex.foreach { case ((n, crash), i) =>
          val batch = (next until next + n).toList
          next += n
          if (batch.nonEmpty) { in.addData(batch: _*); fed = fed ++ batch }
          q.processAllAvailable()
          if (crash) {
            // crash INSIDE the exactly-once window: the table commit
            // stood, the engine's own marker did not
            q.stop()
            val commits = Files.list(Paths.get(ckpt, "commits"))
            val latest = try commits.iterator().asScala.toSeq
              .filter(_.getFileName.toString.matches("\\d+"))
              .sortBy(_.getFileName.toString.toLong).lastOption
            finally commits.close()
            latest.foreach { p =>
              Files.delete(p)
              Files.deleteIfExists(p.getParent.resolve(
                "." + p.getFileName.toString + ".crc"))
            }
            q = start()
            q.processAllAvailable()
          }
          val got = spark.sql(s"SELECT k FROM $cat.t")
            .collect().map(_.getLong(0)).sorted.toList
          assert(got === fed.sorted,
            s"seed $seed diverged after round $i (crash=$crash): " +
              s"${got.size} rows vs ${fed.size} fed")
        }
      } finally q.stop()
      // every epoch commit appears exactly once in the ledger
      val txns = TxnLog.commits(s"$wh/t").filter(_.action == "stream-append")
        .map(_.txnId)
      assert(txns.distinct.size === txns.size)
      TxnLog.deleteRecursively(java.nio.file.Paths.get(wh))
    }
  }

  test("COMPLETE-mode crash-replay: the materialized aggregate equals the " +
       "batch answer after every round; replayed epochs publish nothing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{count, lit}
    val seeds = sys.env.get("GRAFT_SW_MODEL_SEEDS").map(_.toLong).getOrElse(2L)
    val rounds = sys.env.get("GRAFT_SW_MODEL_ROUNDS").map(_.toInt).getOrElse(6)
    for (seed <- 1L to seeds) {
      val wh = Files.createTempDirectory(s"graft-cwmodel-$seed").toString
      val cat = s"gcwm$seed"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      spark.sql(s"CREATE TABLE $cat.t (g BIGINT, n BIGINT)")
      val ckpt = Files.createTempDirectory(s"graft-cwmodel-ck-$seed").toString
      val in = MemoryStream[Long](spark)
      def start() = in.toDF().selectExpr("value % 5 AS g").groupBy("g")
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt).toTable(s"$cat.t")

      var fed = List.empty[Long]
      var next = seed * 100000L
      var q = start()
      try {
        val plan = sample(Gen.listOfN(rounds,
          for (n <- Gen.choose(0, 30); crash <- Gen.prob(0.4)) yield (n, crash)),
          seed + 77)
        plan.zipWithIndex.foreach { case ((n, crash), i) =>
          val batch = (next until next + n).toList
          next += n
          if (batch.nonEmpty) { in.addData(batch: _*); fed = fed ++ batch }
          q.processAllAvailable()
          if (crash) {
            q.stop()
            val commits = Files.list(Paths.get(ckpt, "commits"))
            val latest = try commits.iterator().asScala.toSeq
              .filter(_.getFileName.toString.matches("\\d+"))
              .sortBy(_.getFileName.toString.toLong).lastOption
            finally commits.close()
            latest.foreach { p =>
              Files.delete(p)
              Files.deleteIfExists(p.getParent.resolve(
                "." + p.getFileName.toString + ".crc"))
            }
            q = start()
            q.processAllAvailable()
          }
          val got = spark.sql(s"SELECT g, n FROM $cat.t")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
          val want = fed.groupBy(_ % 5).map { case (g, vs) => g -> vs.size.toLong }
          assert(got === want,
            s"seed $seed: complete-mode aggregate diverged after round $i (crash=$crash)")
        }
      } finally q.stop()
      val txns = TxnLog.commits(s"$wh/t").filter(_.action == "stream-replace")
        .map(_.txnId)
      assert(txns.distinct.size === txns.size,
        "a replayed epoch must never publish a second replace")
      TxnLog.deleteRecursively(java.nio.file.Paths.get(wh))
    }
  }

  test("UPDATE-mode (mergeKey) crash-replay: the merged table equals the " +
       "batch aggregate after every round; replayed epochs merge nothing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{count, lit}
    val seeds = sys.env.get("GRAFT_SW_MODEL_SEEDS").map(_.toLong).getOrElse(2L)
    val rounds = sys.env.get("GRAFT_SW_MODEL_ROUNDS").map(_.toInt).getOrElse(6)
    for (seed <- 1L to seeds) {
      val wh = Files.createTempDirectory(s"graft-uwmodel-$seed").toString
      val cat = s"guwm$seed"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      spark.sql(s"CREATE TABLE $cat.t (g BIGINT, n BIGINT)")
      val ckpt = Files.createTempDirectory(s"graft-uwmodel-ck-$seed").toString
      val in = MemoryStream[Long](spark)
      def start() = in.toDF().selectExpr("value % 5 AS g").groupBy("g")
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("update")
        .option("mergeKey", "g")
        .option("checkpointLocation", ckpt).toTable(s"$cat.t")

      var fed = List.empty[Long]
      var next = seed * 100000L
      var q = start()
      try {
        val plan = sample(Gen.listOfN(rounds,
          for (n <- Gen.choose(0, 30); crash <- Gen.prob(0.4)) yield (n, crash)),
          seed + 191)
        plan.zipWithIndex.foreach { case ((n, crash), i) =>
          val batch = (next until next + n).toList
          next += n
          if (batch.nonEmpty) { in.addData(batch: _*); fed = fed ++ batch }
          q.processAllAvailable()
          if (crash) {
            // crash INSIDE the exactly-once window: the merge commit
            // stood, the engine's own marker did not — the replayed
            // epoch must find its txnId and merge NOTHING (a double
            // merge would stand stale counts for re-updated keys)
            q.stop()
            val commits = Files.list(Paths.get(ckpt, "commits"))
            val latest = try commits.iterator().asScala.toSeq
              .filter(_.getFileName.toString.matches("\\d+"))
              .sortBy(_.getFileName.toString.toLong).lastOption
            finally commits.close()
            latest.foreach { p =>
              Files.delete(p)
              Files.deleteIfExists(p.getParent.resolve(
                "." + p.getFileName.toString + ".crc"))
            }
            q = start()
            q.processAllAvailable()
          }
          val got = spark.sql(s"SELECT g, n FROM $cat.t")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
          val want = fed.groupBy(_ % 5).map { case (g, vs) => g -> vs.size.toLong }
          assert(got === want,
            s"seed $seed: update-mode merge diverged after round $i (crash=$crash)")
        }
      } finally q.stop()
      // one ledger entry per merged epoch, never a duplicate
      val txns = TxnLog.commits(s"$wh/t")
        .filter(_.txnId.startsWith("stream-")).map(_.txnId)
      assert(txns.distinct.size === txns.size,
        "a replayed epoch must never publish a second merge")
      TxnLog.deleteRecursively(java.nio.file.Paths.get(wh))
    }
  }
}
