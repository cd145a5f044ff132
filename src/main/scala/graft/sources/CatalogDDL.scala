package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog / DDL surface (SURVEY.md §2 A-8). The reference manages its
  * schema with `CREATE TABLE IF NOT EXISTS` DDL before any data flows
  * (`main.py:28–82`: candidates/voters/votes); a user porting it needs
  * the same "declare once, query by name" lifecycle on Spark's
  * catalog.
  *
  * Two table kinds, matching Spark's catalog model:
  *  - EXTERNAL: metadata points at existing parquet (`USING parquet
  *    LOCATION ...`) — no data copy, dropping the table never touches
  *    the files. This is the right binding for lakehouse data that
  *    other engines also read.
  *  - MANAGED: `saveAsTable`/`insertInto` own their files under the
  *    warehouse dir; dropping deletes data.
  *
  * At cluster scale the catalog entry is also where table-level layout
  * contracts live (partition columns, bucketing); see
  * StorageLayoutSpec for the partitioned-scan pruning proof.
  */
object CatalogDDL {

  /** Caller-supplied strings are interpolated into DDL text, so they
    * must not be able to break out of their syntactic slot: names are
    * restricted to plain (optionally dotted) identifiers, and location
    * paths have single quotes doubled per SQL string-literal rules.
    */
  private def checkedName(name: String): String = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)?"),
      s"illegal table name: $name")
    name
  }

  private def quotedPath(path: String): String =
    "'" + path.replace("'", "''") + "'"

  /** `CREATE TABLE IF NOT EXISTS name USING parquet LOCATION path` —
    * idempotent, mirroring the reference's create-if-absent DDL.
    */
  def createExternalTable(spark: SparkSession, name: String, path: String): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS ${checkedName(name)} USING parquet " +
      s"LOCATION ${quotedPath(path)}")

  /** Drop-and-recreate: the non-idempotent variant for when the
    * location may have CHANGED (e.g. repointing a table at a new
    * snapshot directory). `IF NOT EXISTS` alone would silently keep
    * serving the old location.
    */
  def recreateExternalTable(spark: SparkSession, name: String, path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${checkedName(name)}")
    spark.sql(s"CREATE TABLE ${checkedName(name)} USING parquet " +
      s"LOCATION ${quotedPath(path)}")
  }

  /** Managed-table write (parquet under the warehouse dir). */
  def saveAsManagedTable(df: DataFrame, name: String): Unit =
    df.write.mode("overwrite").format("parquet").saveAsTable(name)

  /** Append into an existing table by POSITION (Spark's insertInto
    * contract — column order must match the table schema).
    */
  def insertInto(df: DataFrame, name: String): Unit =
    df.write.mode("append").insertInto(name)
}
