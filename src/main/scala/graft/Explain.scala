package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: print the formatted physical plan of one (or
  * every) SparkEntry query and time its noop-sink execution.
  *
  *   sbt 'runMain graft.Explain <queryName|all> [sfDir]'
  *
  * Iterating on `.explain("formatted")` output until the plan is the
  * one you'd want at 100 TB (pushed filters, broadcast where intended,
  * reused exchanges, no stray single-partition windows) is part of the
  * build loop, not an afterthought.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected =
      if (name == "all") SparkEntry.queries.toSeq.sortBy(_._1)
      else SparkEntry.queries.filter(_._1 == name).toSeq
    require(selected.nonEmpty, s"unknown query '$name'")
    selected.foreach { case (n, fn) =>
      val df = fn(spark, sfDir)
      println(s"========== $n ==========")
      df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[$n] executed in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
