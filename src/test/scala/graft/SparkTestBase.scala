package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
  val sfDir = "/root/testdata/sf0.001"
}

object SparkTestBase {
  lazy val session: SparkSession = {
    // warehouse dir is a STATIC conf; point it at a temp dir at build
    // time so saveAsTable tests never write inside the repo
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    val s = Sessions.configure(SparkSession.builder().appName("graft-test"), "4")
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
