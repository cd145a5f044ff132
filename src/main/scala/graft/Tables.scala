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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as raw longs
    * and floor-convert to a micros timestamp — the same truncation
    * DuckDB's reader applies, so oracle comparisons agree.
    *
    * REQUIRES `spark.sql.legacy.parquet.nanosAsLong=true` on the
    * session (set by [[Sessions.configure]] in Bench/Verify/tests);
    * deliberately NOT set here — a loader must not mutate global
    * session config as a side effect (ADVICE r1).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
