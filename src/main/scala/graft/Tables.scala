package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All parity queries run over these parquet tables; the mapping from the
  * reference's voting domain to the testdata star schema follows
  * FIXTURES.md §B: `events` plays the `votes_topic` stream
  * (reference `spark_stream.py:41–47`), `customer ⋈ nation` plays the
  * voter–location turnout rollup, and small dims (`region`, `nation`)
  * play the broadcast static side of the enrichment join
  * (reference `voting.py:41–45`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events.ts` has shipped in two encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]), so it is read as raw
    * nano longs (`spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * [[Sessions.configure]]) and floor-converted to micros, the same
    * truncation DuckDB applies — and plain TIMESTAMP(MICROS), which
    * Spark reads as TIMESTAMP_NTZ. Dispatch on the observed schema and
    * normalize both to session-TZ TimestampType (sessions pin UTC, so
    * the NTZ→TZ cast is value-preserving and oracle comparisons
    * agree); downstream watermark/window code sees one stable type
    * regardless of which generation of testdata is on disk.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
