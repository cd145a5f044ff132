package graft

import org.apache.spark.sql.functions._

import graft.sources.CatalogDDL

/** A-8 proof: the reference declares its schema with
  * `CREATE TABLE IF NOT EXISTS` before any data flows
  * (`main.py:28–82`); here the same lifecycle runs on Spark's catalog —
  * idempotent external DDL over existing parquet, repointing, and the
  * managed saveAsTable / insertInto round trip (warehouse dir is a
  * temp dir, see SparkTestBase).
  */
class CatalogDDLSpec extends SparkTestBase {

  test("external table: CREATE IF NOT EXISTS is idempotent and reads the parquet in place") {
    CatalogDDL.recreateExternalTable(spark, "ext_nation", s"$sfDir/nation.parquet")
    val n = spark.sql("SELECT count(*) AS c FROM ext_nation").head.getLong(0)
    assert(n === Tables.nation(spark, sfDir).count())
    // second create-if-not-exists: no error, table still serves
    CatalogDDL.createExternalTable(spark, "ext_nation", s"$sfDir/nation.parquet")
    assert(spark.sql("SELECT count(*) FROM ext_nation").head.getLong(0) === n)
    assert(spark.catalog.tableExists("ext_nation"))
  }

  test("recreate repoints an external table at a new location") {
    CatalogDDL.recreateExternalTable(spark, "ext_repoint", s"$sfDir/nation.parquet")
    val before = spark.table("ext_repoint").count()
    CatalogDDL.recreateExternalTable(spark, "ext_repoint", s"$sfDir/region.parquet")
    val after = spark.table("ext_repoint").count()
    assert(before === 25L && after === 5L)
    // IF NOT EXISTS alone would have kept serving nation — that is why
    // recreate exists
  }

  test("dropping an external table leaves the source parquet intact") {
    CatalogDDL.recreateExternalTable(spark, "ext_drop_me", s"$sfDir/region.parquet")
    spark.sql("DROP TABLE ext_drop_me")
    assert(!spark.catalog.tableExists("ext_drop_me"))
    assert(Tables.region(spark, sfDir).count() === 5L)
  }

  test("managed table: saveAsTable + insertInto append round trip") {
    val region = Tables.region(spark, sfDir)
    CatalogDDL.saveAsManagedTable(region, "mgd_region")
    assert(spark.table("mgd_region").count() === 5L)
    CatalogDDL.insertInto(region.filter(col("r_regionkey") < 2), "mgd_region")
    assert(spark.table("mgd_region").count() === 7L)
    // overwrite resets, not appends
    CatalogDDL.saveAsManagedTable(region, "mgd_region")
    assert(spark.table("mgd_region").count() === 5L)
    spark.sql("DROP TABLE mgd_region")
  }
}
