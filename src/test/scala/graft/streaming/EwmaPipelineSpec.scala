package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The incremental EWMA must equal the batch window formulation (the
  * w4_ewma query shape) row for row — including across a micro-batch
  * boundary, which is what proves the carried state is right.
  */
class EwmaPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // user 1 has 12 events (deeper than the window depth of 8); user 2
  // has 3, exercising the partial-window normalizer
  private val all = (1 to 12).map(i =>
      SessionInput(1L, i.toLong, ts(i * 10L), 0.5 * i)) ++
    (1 to 3).map(i => SessionInput(2L, 100L + i, ts(i * 7L), 2.5 - i))

  private def batchExpected: Set[(Long, Long, Long, Long)] = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val base = all.toDF().withColumn("__v", round(col("value") * 1000).cast("long"))
    val lags = (0 to 7).map { d =>
      val lv = if (d == 0) col("__v") else lag(col("__v"), d).over(w)
      (coalesce(lv, lit(0L)) * lit(1L << (7 - d)),
        when(lv.isNotNull, lit(1L << (7 - d))).otherwise(lit(0L)))
    }
    base.select(col("user_id"), col("event_id"), col("__v").as("v_milli"),
        (lags.map(_._1).reduce(_ + _)).as("__num"),
        (lags.map(_._2).reduce(_ + _)).as("__den"))
      .withColumn("ewma_milli", expr("__num div __den"))
      .select("user_id", "event_id", "v_milli", "ewma_milli")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("streaming EWMA equals the batch window query across a batch boundary") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[SessionInput]
    val q = EwmaPipeline.ewmaPerUser(ms.toDS())
      .writeStream.format("memory").queryName("ewma_par")
      .outputMode("append").start()
    try {
      // split mid-history: user 1's window must carry 6 values of
      // state into the second batch
      val (b1, b2) = all.sortBy(e => (e.ts.getTime, e.event_id)).splitAt(6)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      val streamed = spark.table("ewma_par")
        .as[EwmaOut].collect()
        .map(e => (e.user_id, e.event_id, e.v_milli, e.ewma_milli)).toSet
      assert(streamed === batchExpected,
        "incremental EWMA must match the batch window formulation exactly")
      assert(streamed.size === all.size, "one smoothed row per event")
    } finally q.stop()
  }
}
