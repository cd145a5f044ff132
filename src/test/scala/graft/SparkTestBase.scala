package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
  val sfDir = "/root/testdata/sf0.001"

  /** The state store config a 100 TB stream actually ships with:
    * RocksDB spills keyed state to local disk instead of holding it on
    * the executor heap. */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the given streaming state store provider, then
    * restore the previous setting (the conf is read at query START, so
    * scoping it around the whole scenario is sufficient). */
  def withStateStoreProvider[T](providerClass: String)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, providerClass)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
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
