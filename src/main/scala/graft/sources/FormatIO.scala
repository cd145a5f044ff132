package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source/sink surface beyond parquet (SURVEY.md §2.A): CSV,
  * JSON-lines, and ORC with schema-explicit reads. The reference's
  * sources are JDBC/Kafka/HTTP; a complete engine additionally needs
  * the file formats every lakehouse ingest touches.
  *
  * Conventions for lossless round-trips:
  *  - reads take an EXPLICIT schema — inference is a convenience for
  *    exploration, a bug farm in pipelines (CSV would widen ints,
  *    drop timezones, re-type empty partitions);
  *  - timestamps serialize as microsecond-precision ISO strings in
  *    UTC (session TZ), the only CSV/JSON encoding that survives a
  *    round trip bit-for-bit;
  *  - CSV writes a header and quotes minimally; JSON keeps null
  *    fields explicit so schemas stay row-stable.
  */
object FormatIO {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", TsFmt)
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", TsFmt)
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", TsFmt)
      .option("ignoreNullFields", "false")
      .json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", TsFmt)
      .json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
