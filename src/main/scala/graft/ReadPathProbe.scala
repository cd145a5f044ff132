package graft

import org.apache.spark.sql.SparkSession

/** Read-path probe: measure DYNAMIC FILE PRUNING's payoff on the
  * star-join shape it exists for — a range-clustered fact joined to a
  * selectively-filtered dim with NO static fact predicate.
  *
  *   sbt 'runMain graft.ReadPathProbe [sfDir]'
  *
  * Builds a graft fact table from `lineitem` range-clustered on
  * `l_orderkey` (32 files with disjoint key ranges — the layout any
  * maintained 100 TB fact table has), takes a ~1% dim slice of
  * `orders`, and times the broadcast join with the runtime-filter
  * kill-switch on vs off. Prints one JSON line per (mode, rep).
  */
object ReadPathProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Sessions.quietKnownBenignWarnings()

    val wh = java.nio.file.Files.createTempDirectory("graft-dfp-probe").toString
    spark.conf.set("spark.sql.catalog.gdfpp",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdfpp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdfpp.db")

    // fact: range-clustered on the join key -> 32 files with disjoint
    // [min,max] l_orderkey stats in the log
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
      .repartitionByRange(32, org.apache.spark.sql.functions.col("l_orderkey"))
      .createOrReplaceTempView("dfp_fact_src")
    spark.sql("CREATE TABLE gdfpp.db.fact AS SELECT * FROM dfp_fact_src")
    // dim: a KEY-CLUSTERED ~3% slice (one key range — the
    // hot-partition / recent-time shape DFP exists for: a dim whose
    // surviving keys land in a few fact files). The fact query
    // carries no static key predicate; only the runtime filter can
    // tell the scan.
    val maxKey = Tables.orders(spark, sfDir)
      .agg(org.apache.spark.sql.functions.max("o_orderkey")).head.getLong(0)
    Tables.orders(spark, sfDir)
      .filter(s"o_orderkey <= ${maxKey / 32}")
      .select("o_orderkey", "o_totalprice")
      .createOrReplaceTempView("dfp_dim_src")
    spark.sql("CREATE TABLE gdfpp.db.dim AS SELECT * FROM dfp_dim_src")

    val q =
      """SELECT /*+ BROADCAST(d) */ sum(f.l_extendedprice) AS s, count(*) AS n
         FROM gdfpp.db.fact f JOIN gdfpp.db.dim d ON f.l_orderkey = d.o_orderkey
         WHERE d.o_totalprice > 0"""

    // bytes actually read off disk per run — THE pruning receipt
    // (wall time at this scale is overhead-dominated; bytes are not)
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
    })

    var expected: Option[(Any, Any)] = None
    for (rep <- 1 to 3; on <- Seq(true, false)) {
      spark.conf.set("spark.graft.runtimeFilePruning.enabled", on.toString)
      bytesRead.set(0L)
      val t0 = System.nanoTime()
      val row = spark.sql(q).head
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let straggler task-end events drain
      val ans = (row.get(0), row.get(1))
      expected match {
        case Some(e) => require(e == ans, s"answers diverged: $e vs $ans")
        case None    => expected = Some(ans)
      }
      println(f"""{"probe":"dfp_star_join","dfp":$on,"rep":$rep,"sec":$sec%.3f,""" +
        f""""mb_read":${bytesRead.get / 1e6}%.1f,"rows":${row.getLong(1)}}""")
    }
    spark.conf.unset("spark.graft.runtimeFilePruning.enabled")
    graft.sources.TxnLog.deleteRecursively(java.nio.file.Paths.get(wh))
    spark.stop()
  }
}
