package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** DYNAMIC FILE PRUNING on plain [[GraftScan]] reads (the Delta DFP
  * recipe): a fact ⋈ filtered-dim join carries NO static predicate on
  * the fact side, yet only the fact files whose log stats/blooms admit
  * the dim's surviving join keys are opened — Spark's PartitionPruning
  * rule plants a DynamicPruningSubquery against the scan's advertised
  * [[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]]
  * attributes, and [[GraftScan.filter]] re-prunes the file set through
  * [[TxnLogFileIndex.keep]] at RUNTIME. At 100 TB this is the
  * difference between scanning the whole fact table and the handful
  * of files the dimension actually selects (the reference's dashboard
  * shape — read aggregates, correlate with a tiny dimension —
  * `streamlit-app.py:91-96` scaled up).
  *
  * The receipt is adversarial: every fact file OUTSIDE the dim-selected
  * range is corrupted ON DISK before the join runs. If the scan opened
  * any of them the query would throw; a correct answer proves the
  * runtime filter reached the log's file admission.
  */
class DynamicFilePruningSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-dfp-wh").toString
    spark.conf.set("spark.sql.catalog.gdfp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdfp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdfp.db")
    wh
  }

  private def root(table: String): String = s"$warehouse/db/$table"

  private def mkFact(name: String): Unit = {
    spark.sql(s"CREATE TABLE gdfp.db.$name (k BIGINT, v BIGINT)")
    // four appends with disjoint key ranges -> four files whose k
    // stats are disjoint [0,50) [100,150) [200,250) [300,350)
    (0 until 4).foreach(i => spark.sql(
      s"INSERT INTO gdfp.db.$name SELECT /*+ REPARTITION(1) */ id, id * 7 " +
        s"FROM range(${i * 100}, ${i * 100 + 50})"))
    assert(TxnLog.snapshotState(root(name)).size === 4)
  }

  private def mkDim(name: String): Unit = {
    spark.sql(s"CREATE TABLE gdfp.db.$name (k BIGINT, flag STRING)")
    // 'hot' keys live ONLY in the fact's [100,150) file; 'cold' keys
    // cover the other three files, so without the runtime filter the
    // static plan must keep all four
    spark.sql(s"INSERT INTO gdfp.db.$name VALUES " +
      "(120, 'hot'), (121, 'hot'), (122, 'hot'), " +
      "(10, 'cold'), (210, 'cold'), (310, 'cold')")
  }

  /** Corrupt every live file of `table` whose k-range excludes all of
    * `keep` — reading one afterwards throws. Returns how many.
    */
  private def corruptOutside(table: String, keep: Seq[Long]): Int = {
    val victims = TxnLog.snapshotState(root(table)).filterNot { case (_, m) =>
      val st = m.stats("k"); keep.exists(k => st.lo <= k && k <= st.hi)
    }
    victims.foreach { case (f, _) => Files.write(Paths.get(f), Array[Byte](9, 9)) }
    victims.size
  }

  test("fact-dim join: runtime filter opens only the dim-admitted fact files") {
    warehouse
    mkFact("fact1"); mkDim("dim1")
    assert(corruptOutside("fact1", Seq(120L, 121L, 122L)) === 3)
    val q =
      """SELECT /*+ BROADCAST(d) */ sum(f.v) AS s, count(*) AS n
        |FROM gdfp.db.fact1 f JOIN gdfp.db.dim1 d ON f.k = d.k
        |WHERE d.flag = 'hot'""".stripMargin
    val plan = spark.sql(q).queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a DynamicPruningSubquery on the fact scan in:\n$plan")
    val row = spark.sql(q).head
    assert(row.getLong(1) === 3L)
    assert(row.getLong(0) === (120L + 121L + 122L) * 7L)
  }

  test("conf kill-switch: spark.graft.runtimeFilePruning.enabled=false advertises nothing") {
    warehouse
    mkFact("fact2"); mkDim("dim2")
    withSQLConf("spark.graft.runtimeFilePruning.enabled" -> "false") {
      val q =
        """SELECT /*+ BROADCAST(d) */ sum(f.v) AS s
          |FROM gdfp.db.fact2 f JOIN gdfp.db.dim2 d ON f.k = d.k
          |WHERE d.flag = 'hot'""".stripMargin
      val plan = spark.sql(q).queryExecution.executedPlan.toString
      assert(!plan.contains("dynamicpruning"),
        s"kill-switch must suppress the runtime filter:\n$plan")
      // all files intact here: the answer is still correct, just unpruned
      assert(spark.sql(q).head.getLong(0) === (120L + 121L + 122L) * 7L)
    }
  }

  test("runtime filter composes with static pushdown (strictest set wins)") {
    warehouse
    mkFact("fact3"); mkDim("dim3")
    // static predicate admits files [100,150) and [200,250); the
    // runtime filter narrows to [100,150) alone — corrupt the rest
    assert(corruptOutside("fact3", Seq(120L, 121L, 122L)) === 3)
    val q =
      """SELECT /*+ BROADCAST(d) */ count(*) AS n
        |FROM gdfp.db.fact3 f JOIN gdfp.db.dim3 d ON f.k = d.k
        |WHERE d.flag = 'hot' AND f.k >= 100 AND f.k < 250""".stripMargin
    assert(spark.sql(q).head.getLong(0) === 3L)
  }

  test("bucketed fact: runtime filter prunes through the bucket stat too") {
    warehouse
    spark.sql("CREATE TABLE gdfp.db.factb (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO gdfp.db.factb SELECT id, id * 3 FROM range(0, 400)")
    mkDim("dimb")
    // every file whose BUCKET differs from the hot keys' buckets is
    // corrupted; range stats alone cannot separate hash-routed files,
    // so a correct answer proves the bucket(4;k) point stat pruned
    val hotBuckets = Seq(120L, 121L, 122L)
      .flatMap(k => TxnLog.bucketOf(k, org.apache.spark.sql.types.LongType, 4)).toSet
    val victims = TxnLog.snapshotState(root("factb")).filterNot { case (_, m) =>
      m.stats.exists {
        case (TxnLog.BucketKeyRe(_, "k"), st) =>
          hotBuckets.exists(b => st.lo <= b && b <= st.hi)
        case _ => false
      }
    }
    assert(victims.nonEmpty, "expected at least one out-of-bucket file")
    victims.foreach { case (f, _) => Files.write(Paths.get(f), Array[Byte](9)) }
    val q =
      """SELECT /*+ BROADCAST(d) */ sum(f.v) AS s, count(*) AS n
        |FROM gdfp.db.factb f JOIN gdfp.db.dimb d ON f.k = d.k
        |WHERE d.flag = 'hot'""".stripMargin
    val row = spark.sql(q).head
    assert(row.getLong(1) === 3L)
    assert(row.getLong(0) === (120L + 121L + 122L) * 3L)
  }

  test("sparse 100-key runtime IN prunes past the min/max envelope (sorted-window probe)") {
    warehouse
    mkFact("fact4")
    // 100 hot keys (> the 64-literal exact-IN bound): 3 inside the
    // fact's [100,150) file, 97 far above every file. The r16
    // envelope [120, ~100672] admits the [200,250) and [300,350)
    // files too; the r17 sorted-window probe binary-searches each
    // file's range into the key set and finds those windows EMPTY
    spark.sql("CREATE TABLE gdfp.db.dim4 (k BIGINT, flag STRING)")
    spark.sql("INSERT INTO gdfp.db.dim4 SELECT 120 + id, 'hot' FROM range(0, 3)")
    spark.sql("INSERT INTO gdfp.db.dim4 SELECT 100000 + id * 7, 'hot' FROM range(0, 97)")
    assert(corruptOutside("fact4", Seq(120L, 121L, 122L)) === 3,
      "all three no-key files must be corruptible")
    val q =
      """SELECT /*+ BROADCAST(d) */ sum(f.v) AS s, count(*) AS n
        |FROM gdfp.db.fact4 f JOIN gdfp.db.dim4 d ON f.k = d.k
        |WHERE d.flag = 'hot'""".stripMargin
    val plan = spark.sql(q).queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"expected DFP in:\n$plan")
    val row = spark.sql(q).head
    assert(row.getLong(1) === 3L, "only the 3 in-file keys join")
    assert(row.getLong(0) === (120L + 121L + 122L) * 7L,
      "a correct answer proves the sparse IN pruned the envelope-admitted files")
  }

  test("v2ToCatalyst translates the runtime shapes over physical names, rejects the rest") {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.{Predicate => P}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("s", StringType)))
    val renames = Map("k" -> "k_phys")
    def ref(n: String) = Expressions.column(n)
    // LiteralValue's companion is private[sql]; the interface is the
    // public contract and is all v2ToCatalyst matches on
    def LiteralValue[T](v: T, dt: DataType)
        : org.apache.spark.sql.connector.expressions.Literal[T] =
      new org.apache.spark.sql.connector.expressions.Literal[T] {
        override def value(): T = v
        override def dataType(): DataType = dt
      }
    val in = new P("IN", Array(ref("k"),
      LiteralValue(1L, LongType), LiteralValue(2L, LongType)))
    GraftFilters.v2ToCatalyst(in, schema, renames) match {
      case Some(ce.In(a: ce.AttributeReference, ls)) =>
        assert(a.name === "k_phys" && ls.size === 2)
      case other => fail(s"unexpected: $other")
    }
    val eq = new P("=", Array(LiteralValue(3L, LongType), ref("k")))
    GraftFilters.v2ToCatalyst(eq, schema, renames) match {
      case Some(ce.EqualTo(a: ce.AttributeReference, ce.Literal(3L, LongType))) =>
        assert(a.name === "k_phys")
      case other => fail(s"unexpected: $other")
    }
    // type mismatch between literal and attribute: refused (sound)
    val mis = new P("IN", Array(ref("k"), LiteralValue(1, IntegerType)))
    assert(GraftFilters.v2ToCatalyst(mis, schema, renames).isEmpty)
    // unknown predicate name: refused
    val unk = new P("STARTS_WITH", Array(ref("s"), LiteralValue(
      org.apache.spark.unsafe.types.UTF8String.fromString("x"), StringType)))
    assert(GraftFilters.v2ToCatalyst(unk, schema, renames).isEmpty)
  }
}
