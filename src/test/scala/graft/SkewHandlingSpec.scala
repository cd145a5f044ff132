package graft

import org.apache.spark.sql.functions._

/** Skew readiness: AQE must detect and split a skewed join partition
  * at runtime (thresholds lowered to make a toy dataset register as
  * skewed). This plus the deterministic salting in
  * [[graft.operators.RelationalOps.groupedSumSalted]] are the two
  * tools the 100 TB design uses against hot keys.
  */
class SkewHandlingSpec extends SparkTestBase {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // one hot key carrying 100k rows vs 1 row for everyone else
      val fact = spark.range(100000).select(lit(0L).as("k"), col("id").as("payload"))
        .union(spark.range(1, 200).select(col("id").as("k"), col("id").as("payload")))
      val dim = spark.range(200).select(col("id").as("k"), (col("id") * 10).as("v"))
      val joined = fact.join(dim, "k")
      // materialize through THIS DataFrame's QueryExecution (count()
      // would plan a separate aggregate query and leave this one
      // unexecuted with isFinalPlan=false)
      assert(joined.collect().length === 100199)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE should mark the skewed join side:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
