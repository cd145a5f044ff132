package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Storage-layout techniques the 100 TB design leans on, proven
  * against the actual plans:
  *
  *  - BUCKETING: two tables bucketed on the join key join with NO
  *    exchange — at cluster scale that deletes the dominant cost of
  *    every recurring fact-fact join;
  *  - PARTITION PRUNING: a filter on the partition column reaches the
  *    scan as a PartitionFilter and prunes directories, so a query on
  *    one partition reads one partition's files, not the table.
  */
class StorageLayoutSpec extends SparkTestBase {

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    Tables.customer(spark, sfDir).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
    Tables.orders(spark, sfDir).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")

    val joined = spark.table("b_customer")
      .join(spark.table("b_orders").hint("merge"),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(c_custkey"),
      s"customer side must be pre-bucketed, no shuffle:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
      s"orders side must be pre-bucketed, no shuffle:\n$plan")
    // sanity: result matches the unbucketed join
    val expect = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("c_custkey") === col("o_custkey"))
      .count()
    assert(joined.agg(sum("n")).head.getLong(0) === expect)
    spark.sql("DROP TABLE IF EXISTS b_customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
  }

  test("j9_bucketed_join driver query joins with no exchange on either side") {
    val df = SparkEntry.queries("j9_bucketed_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(c_custkey"),
      s"customer side must come pre-bucketed:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
      s"orders side must come pre-bucketed:\n$plan")
    // and it returns the same answer as the raw-parquet join
    val expect = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect)
  }

  test("schema evolution: mergeSchema reads old and new file generations as one table") {
    val dir = Files.createTempDirectory("graft-evolve").toString
    // generation 1: (doc_id, lang); generation 2 adds quality
    Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"))
      .write.mode("append").parquet(dir)
    Tables.documents(spark, sfDir)
      .select(col("doc_id") + 1000000L as "doc_id", col("lang"),
        lit(0.5).as("quality"))
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("doc_id", "lang", "quality"))
    val n = Tables.documents(spark, sfDir).count()
    // old-generation rows surface the new column as null — no rewrite
    // of 100 TB of history to add a column
    assert(merged.filter(col("quality").isNull).count() === n)
    assert(merged.filter(col("quality") === 0.5).count() === n)
  }

  test("runtime bloom filter prunes the fact side of a selective SMJ") {
    // big-to-big join where broadcast is off: the optimizer should
    // inject a bloom filter built from the selective orders slice and
    // semi-prune lineitem rows BEFORE the join shuffle — at 100 TB
    // that is the difference between shuffling the table and shuffling
    // the matching fraction
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val sel = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = Tables.lineitem(spark, sfDir)
        .join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") || optimized.contains("BloomFilter"),
        s"expected a runtime bloom filter on the fact side:\n$optimized")
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    }
  }

  test("partition-column filters prune at the scan (PartitionFilters, not post-filter)") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sfDir).write
      .partitionBy("event_type").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("event_type"),
      s"expected partition pruning in:\n$scan")
    // pruned read touches exactly the one directory's rows
    val expect = Tables.events(spark, sfDir)
      .filter(col("event_type") === "click").count()
    assert(q.count() === expect)
  }

  test("mergeUpsert + dynamic partition overwrite rewrites ONLY touched partitions") {
    // The 100 TB MERGE recipe end-to-end: updates land in one
    // partition, the existing side is read PRUNED to that partition,
    // and the write-back (dynamic partitionOverwriteMode) replaces
    // only that directory — merge cost tracks the touched partitions,
    // never the table.
    val snap = Files.createTempDirectory("graft-merge-prune").toString + "/orders"
    Tables.orders(spark, sfDir)
      .withColumn("p_month", substring(col("o_orderdate"), 1, 7))
      .write.partitionBy("p_month").parquet(snap)
    val before = spark.read.parquet(snap)
    val wholeBefore = before.collect().length

    val month = "1996-03"
    val updates = before.filter(col("p_month") === month)
      .filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderpriority", lit("RUSHED"))
    val nUpdates = updates.count() // before the rewrite deletes old files
    assert(nUpdates > 0, "fixture month must exist")

    // existing side pruned to the touched partition — PartitionFilters
    // at the scan, so the merge never reads untouched months
    val pruned = spark.read.parquet(snap).filter(col("p_month") === month)
    val scanStr = pruned.queryExecution.executedPlan.toString
    assert(scanStr.contains("PartitionFilters") && scanStr.contains("p_month"),
      s"expected partition pruning in:\n$scanStr")

    def fileInventory(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(snap))
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
      finally s.close()
    }
    val beforeFiles = fileInventory()

    // stage-then-swap: localCheckpoint materializes the merged rows and
    // cuts the lineage back to the snapshot path, so the overwrite is
    // not reading the path it replaces (the staging step every
    // snapshot-rewriting table format performs)
    val merged = graft.operators.RelationalOps
      .mergeUpsert(pruned, updates, Seq("o_orderkey"))
      .localCheckpoint(true)
    withSQLConf("spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
      merged.write.mode("overwrite").partitionBy("p_month").parquet(snap)
    }

    val afterFiles = fileInventory()
    val (touchedBefore, untouchedBefore) =
      beforeFiles.partition(_._1.contains(s"p_month=$month"))
    val (touchedAfter, untouchedAfter) =
      afterFiles.partition(_._1.contains(s"p_month=$month"))
    assert(untouchedAfter === untouchedBefore,
      "untouched partitions' files must survive byte-identically (same paths, same mtimes)")
    assert(touchedAfter.keySet.intersect(touchedBefore.keySet).isEmpty,
      "the touched partition must be fully rewritten")

    // contents: identical to a whole-table merge
    spark.catalog.refreshByPath(snap)
    val after = spark.read.parquet(snap)
    assert(after.count() === wholeBefore, "updates replace rows 1:1, no inserts here")
    assert(after.filter(col("o_orderpriority") === "RUSHED").count() === nUpdates)
    assert(after.filter(col("p_month") =!= month)
      .filter(col("o_orderpriority") === "RUSHED").isEmpty)
  }
}
