package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.configure(SparkSession.builder(), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val q = SparkEntry.queries("sim_ann_lsh")
    val df = q(spark, dir)
    // executed plan AFTER run shows codegen ids
    df.write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"second run: ${(System.nanoTime()-t0)/1e9}%.2f s")
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
