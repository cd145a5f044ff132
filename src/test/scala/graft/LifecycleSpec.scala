package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.operators.{CorpusOps, GraphOps, RelationalOps}

/** r9 verdict items 4+5: persist-and-return operators must not leak
  * cache entries past their call, and pageRank must survive deep
  * iteration without plan blowup.
  */
class LifecycleSpec extends SparkTestBase {
  import spark.implicits._

  /** CacheManager emptiness via reflection: `sharedState` is
    * private[sql] in Scala source but public in bytecode, and tests
    * live outside org.apache.spark.sql.
    */
  private def cacheManagerEmpty(s: SparkSession): Boolean = {
    val ss = s.getClass.getMethod("sharedState").invoke(s)
    val cm = ss.getClass.getMethod("cacheManager").invoke(ss)
    cm.getClass.getMethod("isEmpty").invoke(cm).asInstanceOf[Boolean]
  }

  test("rakeKeywords / basketRules / pageRank leave no cache entry after the call") {
    spark.catalog.clearCache()
    assert(cacheManagerEmpty(spark), "precondition: cache starts empty")

    val docs = Seq(
      (1L, "deep learning of the deep networks and deep data"),
      (2L, "spark engines shuffle data in the cluster"),
      (3L, "deep networks shuffle the cluster data")).toDF("doc_id", "text")
    val rake = CorpusOps.rakeKeywords(docs, "doc_id", "text")
    assert(rake.count() > 0)
    assert(cacheManagerEmpty(spark), "rakeKeywords left a pinned cache entry")

    val memberships = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 12L)).toDF("oid", "item")
    val rules = RelationalOps.basketRules(memberships, "oid", "item", minSupport = 1L)
    assert(rules.count() > 0)
    assert(cacheManagerEmpty(spark), "basketRules left a pinned cache entry")

    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("s", "d")
    val pr = GraphOps.pageRank(edges, "s", "d")
    assert(pr.count() === 4)
    assert(cacheManagerEmpty(spark), "pageRank left a pinned cache entry")
  }

  /** Pure integer-micro PageRank reference — the same arithmetic the
    * operator documents (truncating div, damping as integer percent,
    * dangling mass leaks), evaluated with driver-side maps.
    */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          dampingPct: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = (100L - dampingPct) * 10000L
    var rank = nodes.map(_ -> 1000000L).toMap
    (1 to iters).foreach { _ =>
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / deg(s) }.sum
      }
      rank = nodes.map(n =>
        n -> (base + dampingPct * in.getOrElse(n, 0L) / 100L)).toMap
    }
    rank
  }

  test("pageRank at iters=12 matches the reference exactly (lineage guard holds)") {
    // star into 1, a cycle, a dangling sink, and a multi-edge: covers
    // in-degree skew, mass leak, and duplicate (src,dst) contributions
    val edgeSeq = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (5L, 1L),
      (1L, 6L), (4L, 1L))
    val edges = edgeSeq.toDF("s", "d")
    for (iters <- Seq(3, 12)) {
      val got = GraphOps.pageRank(edges, "s", "d", iters = iters)
        .as[(Long, Long)].collect().toMap
      assert(got === refPageRank(edgeSeq, iters, 85),
        s"pageRank(iters=$iters) diverged from the integer reference")
    }
  }

  /** Pure greedy reference for dedupWithinDelay: per key in (ts, tie)
    * order, keep iff first or > delay after the last kept.
    */
  private def refGreedy(rows: Seq[(Long, String, Long, Timestamp)],
                        delayMicros: Long): Set[Long] = {
    def micros(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000
    rows.groupBy(r => (r._1, r._2)).values.flatMap { es =>
      var last = Long.MinValue
      var first = true
      es.sortBy(e => (micros(e._4), e._3)).filter { e =>
        val m = micros(e._4)
        if (first || m > last + delayMicros) { first = false; last = m; true }
        else false
      }
    }.map(_._3).toSet
  }

  test("dedupWithinDelay matches the greedy reference on multi-epoch data") {
    // seeded pseudo-random timestamps over 3 keys, µs granularity
    val rnd = new scala.util.Random(42)
    val rows = (1 to 120).map { i =>
      val key = (i % 3).toLong
      val ts = new Timestamp(1700000000000L + rnd.nextInt(1000000))
      ts.setNanos((rnd.nextInt(1000000)) * 1000) // sub-ms µs
      (key, if (i % 2 == 0) "a" else "b", i.toLong, ts)
    }
    val df = rows.toDF("user_id", "event_type", "event_id", "ts")
    val delayMicros = 200L * 1000000L // 200 s
    val kept = RelationalOps.dedupWithinDelay(
        df, Seq("user_id", "event_type"), "ts", Seq("event_id"), delayMicros)
      .select($"event_id").as[Long].collect().toSet
    assert(kept === refGreedy(rows, delayMicros))
    assert(kept.size < rows.size, "delay chosen so real drops occur")
  }

  test("dedupWithinDelay boundary: exactly-delay is dropped, delay+1µs re-admits") {
    val t0 = new Timestamp(1700000000000L)
    val atDelay = new Timestamp(1700000001000L) // +1000 ms = delay exactly
    val past = new Timestamp(1700000001000L)
    past.setNanos(1000) // +1 µs beyond the delay
    val df = Seq(
      (1L, "k", 1L, t0), (1L, "k", 2L, atDelay), (1L, "k", 3L, past)
    ).toDF("user_id", "event_type", "event_id", "ts")
    val kept = RelationalOps.dedupWithinDelay(
        df, Seq("user_id", "event_type"), "ts", Seq("event_id"),
        1000L * 1000L) // 1 s in µs
      .select($"event_id").as[Long].collect().toSet
    // event 2 sits exactly at delay → inside the horizon → dropped;
    // event 3 is 1 µs past it → state expired → re-admitted
    assert(kept === Set(1L, 3L))
  }
}
