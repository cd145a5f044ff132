package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Space-Saving heavy hitters: the paper's guarantees asserted against
  * exact counts on a skewed stream, across a micro-batch boundary —
  * which is what proves the carried counters are right.
  */
class TopKPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // Zipf-flavored skew in group "g": item i appears ~N/i times for
  // i = 1..12 over k = 5 counters, plus a uniform tail of singletons
  // (the adversarial load: tail churn must not evict true heavies).
  private val skewed: Seq[TopKInput] = {
    var eid = 0L
    val heavies = (1 to 12).flatMap { i =>
      (0 until (60 / i)).map { _ =>
        eid += 1; TopKInput("g", i.toLong, eid, ts(eid))
      }
    }
    val tail = (1000 to 1040).map { i =>
      eid += 1; TopKInput("g", i.toLong, eid, ts(eid))
    }
    // deterministic interleave (hash-order shuffle, no RNG)
    (heavies ++ tail).sortBy(e => (e.event_id * 2654435761L) % 1000003L)
      .zipWithIndex.map { case (e, i) =>
        e.copy(event_id = i.toLong + 1, ts = ts(i.toLong + 1))
      }
  }

  test("space-saving top-k: guarantees hold across a batch boundary; state is O(k)") {
    implicit val ctx = spark.sqlContext
    val k = 5
    val ms = MemoryStream[TopKInput]
    val q = TopKPipeline.heavyHitters(ms.toDS(), k)
      .writeStream.format("memory").queryName("topk_hh")
      .outputMode("append").start()
    try {
      val (b1, b2) = skewed.splitAt(skewed.length / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      val out = spark.table("topk_hh").as[HeavyHitter].collect()
      val last = out.map(_.ver).max
      val snap = out.filter(_.ver == last)

      // bounded state: at most k counters survive, ranked 1..|snap|
      assert(snap.length <= k)
      assert(snap.map(_.rank).sorted.toSeq === (1 to snap.length))

      val exact = skewed.groupBy(_.item).view.mapValues(_.size.toLong).toMap
      val n = skewed.length.toLong

      // every TRUE heavy hitter (f > N/k) is tracked — no false negatives
      val mustTrack = exact.filter(_._2 > n / k).keySet
      assert(mustTrack.subsetOf(snap.map(_.item).toSet),
        s"true heavies $mustTrack must appear in ${snap.map(_.item).toSeq}")

      // per-item certainty bounds: cnt_lo <= f <= cnt_hi
      snap.foreach { h =>
        val f = exact(h.item)
        assert(h.cnt_lo <= f && f <= h.cnt_hi,
          s"item ${h.item}: true $f outside [${h.cnt_lo}, ${h.cnt_hi}]")
      }
      // overshoot is bounded by the evicted-minimum mechanism: err < N/k
      snap.foreach(h => assert(h.cnt_hi - h.cnt_lo <= n / k))
    } finally q.stop()
  }

  test("transformWithState processor emits EXACTLY what flatMapGroupsWithState emits") {
    // Same skewed feed, same batch split, both state APIs; the
    // StatefulProcessor (RocksDB-only by design) must reproduce the
    // flatMapGroupsWithState rows bit-for-bit — counters, error
    // bounds, ranks, and batch versions.
    implicit val ctx = spark.sqlContext
    val k = 5
    val (b1, b2) = skewed.splitAt(skewed.length / 2)
    def run(name: String, f: org.apache.spark.sql.Dataset[TopKInput] =>
        org.apache.spark.sql.Dataset[HeavyHitter]): Set[HeavyHitter] = {
      val ms = MemoryStream[TopKInput]
      val q = f(ms.toDS()).writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        ms.addData(b1); q.processAllAvailable()
        ms.addData(b2); q.processAllAvailable()
        spark.table(name).as[HeavyHitter].collect().toSet
      } finally q.stop()
    }
    withStateStoreProvider(RocksDbProvider) {
      val tws = run("topk_tws", ds => TopKPipeline.heavyHittersTws(ds, k))
      val fmgs = run("topk_fmgs", ds => TopKPipeline.heavyHitters(ds, k))
      assert(tws === fmgs)
      assert(tws.nonEmpty)
    }
  }

  test("single-batch degenerate loads: fewer distinct items than k; ties") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[TopKInput]
    val q = TopKPipeline.heavyHitters(ms.toDS(), 10)
      .writeStream.format("memory").queryName("topk_small")
      .outputMode("append").start()
    try {
      ms.addData(Seq(
        TopKInput("a", 7L, 1L, ts(1)), TopKInput("a", 7L, 2L, ts(2)),
        TopKInput("a", 3L, 3L, ts(3)), TopKInput("b", 1L, 4L, ts(4))))
      q.processAllAvailable()
      val out = spark.table("topk_small").as[HeavyHitter].collect()
      val a = out.filter(_.group == "a").sortBy(_.rank)
      assert(a.map(h => (h.item, h.cnt_hi, h.cnt_lo)).toSeq ===
        Seq((7L, 2L, 2L), (3L, 1L, 1L)))
      // under-k tracking is exact: zero error on every counter
      assert(out.forall(h => h.cnt_hi === h.cnt_lo))
      assert(out.filter(_.group == "b").map(_.item).toSeq === Seq(1L))
    } finally q.stop()
  }
}
