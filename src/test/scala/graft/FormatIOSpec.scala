package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.sources.FormatIO

/** Lossless round-trips through every supported file format, checked
  * as multisets against the parquet original (timestamps, doubles,
  * nulls, and JSON-in-string columns included).
  */
class FormatIOSpec extends SparkTestBase {

  private def events = Tables.events(spark, sfDir)

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.schema === b.schema, "schema must survive the round trip")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "row multiset must survive the round trip")
  }

  test("CSV round-trips events losslessly with an explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString
    FormatIO.writeCsv(events, dir)
    assertSameRows(events, FormatIO.readCsv(spark, dir, events.schema))
  }

  test("JSON-lines round-trips events losslessly with an explicit schema") {
    val dir = Files.createTempDirectory("graft-json").toString
    FormatIO.writeJson(events, dir)
    assertSameRows(events, FormatIO.readJson(spark, dir, events.schema))
  }

  test("ORC round-trips events losslessly (self-describing schema)") {
    val dir = Files.createTempDirectory("graft-orc").toString
    FormatIO.writeOrc(events, dir)
    assertSameRows(events, FormatIO.readOrc(spark, dir))
  }
}
