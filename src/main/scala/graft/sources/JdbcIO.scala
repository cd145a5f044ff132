package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink (SURVEY.md §2 A-3/A-4). The reference's static
  * side IS a JDBC database: candidates/voters live in Postgres and are
  * read back for enrichment (`voting.py:41–45`, `main.py:256–257`);
  * the streaming job's output also lands in Postgres via per-batch
  * inserts (`main.py:119–130`).
  *
  * The engine expresses both directions through Spark's JDBC data
  * source, which is the scale-correct shape:
  *  - READS push projections and filters into the database
  *    (`PushedFilters` visible in the scan plan) and can split into
  *    `numPartitions` range-parallel queries on a numeric column —
  *    the difference between one executor dragging the whole table
  *    through a single cursor and a cluster-wide parallel load;
  *  - WRITES batch inserts per partition (no driver-side row loop).
  *
  * Tests run against embedded Derby (`jdbc:derby:` — in Spark's
  * classpath for the Hive metastore) since the sandbox has no network
  * database; the API surface is identical for Postgres et al. — only
  * the URL/driver differ. Embedded Derby is single-JVM file-local, so
  * it is a TEST transport, not a deployment recommendation.
  */
object JdbcIO {

  /** Embedded-Derby URL for a database directory (created on demand).
    * Derby drops a `derby.log` in `derby.system.home` (default: the
    * process CWD, i.e. the repo under sbt) — point it at the system
    * temp dir before the driver first boots.
    */
  def derbyUrl(dbDir: String): String = {
    if (System.getProperty("derby.system.home") == null) {
      System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir"))
    }
    s"jdbc:derby:$dbDir;create=true"
  }

  def props(extra: (String, String)*): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Batch-insert `df` into `table` (created/replaced). */
  def write(df: DataFrame, url: String, table: String): Unit =
    df.write.mode("overwrite").jdbc(url, table, props())

  /** Single-cursor read — fine for small dimension tables (the
    * reference's candidates table has 3 rows).
    */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, props())

  /** Range-partitioned parallel read on a numeric column: Spark issues
    * `numPartitions` WHERE-bounded queries so executors load disjoint
    * slices concurrently — the 100 TB-side shape for big JDBC scans.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long, upperBound: Long,
                      numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props())

  /** Idempotent per-micro-batch writer for `foreachBatch` streaming
    * sinks (A-3 with replay safety): after a failure Structured
    * Streaming RE-RUNS the last uncommitted batch, so a plain append
    * duplicates its rows. Stamp every row with the batch id and delete
    * that batch's previous attempt before inserting — replays then
    * converge instead of duplicating (the standard JDBC exactly-once
    * recipe; full atomicity would need delete+insert in one
    * transaction, which Spark's jdbc writer doesn't expose — a crash
    * between the two steps is healed by the next replay of the same
    * batch).
    */
  def idempotentBatchWriter(url: String, table: String)
                           (batch: DataFrame, batchId: Long): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // metadata probe instead of a swallowed SQLException: a real
      // DELETE failure must surface, or replays silently duplicate.
      // Case-INSENSITIVE name match: unquoted identifiers fold UPPER on
      // Derby but lower on Postgres — probing one folding would miss
      // the table on the other dialect, skip the DELETE, and let a
      // replayed batch silently duplicate rows.
      val t = conn.getMetaData.getTables(null, null, "%", null)
      var exists = false
      while (!exists && t.next()) {
        exists = table.equalsIgnoreCase(t.getString("TABLE_NAME"))
      }
      t.close()
      if (exists) {
        val st = conn.createStatement()
        // Spark's jdbc writer QUOTES column identifiers at CREATE, so
        // the column is case-sensitive lowercase — quote it here too
        st.executeUpdate(s"""DELETE FROM $table WHERE "batch_id" = $batchId""")
        st.close()
      }
    } finally conn.close()
    batch.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
      .write.mode("append").jdbc(url, table, props())
  }
}
