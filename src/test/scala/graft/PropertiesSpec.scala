package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{CorpusOps, RelationalOps}

/** Property-based checks (SURVEY.md §5.3) over ScalaCheck-generated
  * relations with FIXED seeds — deterministic in CI, still exercising
  * arbitrary shapes (dup-heavy keys, empty groups, ties).
  */
class PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val eventGen: Gen[List[(Long, String, Long, Long)]] =
    Gen.listOfN(300, for {
      user <- Gen.choose(0L, 20L)
      typ <- Gen.oneOf("a", "b", "c")
      value <- Gen.choose(-1000L, 1000L)
      ts <- Gen.choose(1000L, 100000L)
    } yield (user, typ, value, ts))

  private def events(seed: Long) = {
    val rows = sample(eventGen, seed).zipWithIndex
      .map { case ((u, t, v, ts), i) => (i.toLong, u, t, v, ts) }
    rows.toDF("event_id", "user_id", "event_type", "value", "ts_sec")
  }

  test("sum of per-group sums equals the global sum (exact, integer values)") {
    for (seed <- 1L to 3L) {
      val df = events(seed)
      val grouped = RelationalOps.groupedSum(df, Seq("event_type"), "value", "s")
        .agg(sum("s")).as[Long].head()
      val global = df.agg(sum("value")).as[Long].head()
      assert(grouped === global, s"seed=$seed")
    }
  }

  test("dedupFirst is idempotent, keyed-unique, and a subset of its input") {
    for (seed <- 4L to 6L) {
      val df = events(seed)
      val once = RelationalOps.dedupFirst(df, Seq("user_id", "event_type"),
        Seq(col("ts_sec").asc, col("event_id").asc))
      val twice = RelationalOps.dedupFirst(once, Seq("user_id", "event_type"),
        Seq(col("ts_sec").asc, col("event_id").asc))
      assert(once.count() === twice.count(), s"seed=$seed idempotence")
      assert(once.select("user_id", "event_type").distinct().count() === once.count())
      assert(once.join(df, Seq("event_id"), "left_anti").isEmpty)
    }
  }

  test("pagination partitions the top of the sorted relation") {
    for (seed <- 7L to 9L) {
      val df = events(seed)
      val order = Seq(col("value").desc, col("event_id").asc)
      val pages = (1 to 3).map(p =>
        RelationalOps.paginate(df, order, page = p, size = 20)
          .select("event_id").as[Long].collect().toSeq)
      assert(pages.flatten.distinct.size === pages.map(_.size).sum, s"seed=$seed disjoint")
      val top = RelationalOps.topK(df, order, 60).select("event_id").as[Long].collect().toSeq
      assert(pages.flatten === top, s"seed=$seed pages concat == top-60 in order")
    }
  }

  test("sessionize preserves rows and numbers sessions contiguously per user") {
    for (seed <- 10L to 12L) {
      val df = events(seed).withColumn("ts", timestamp_seconds(col("ts_sec")))
      val sess = RelationalOps.sessionize(df, "user_id", "ts",
        Seq(col("event_id").asc), gapSec = 5000L)
      assert(sess.count() === df.count(), s"seed=$seed row preservation")
      val bad = sess.groupBy("user_id")
        .agg(max("session_seq").as("mx"), count_distinct(col("session_seq")).as("d"))
        .filter(col("mx") =!= col("d"))
      assert(bad.isEmpty, s"seed=$seed session_seq must be 1..k with no holes")
    }
  }

  /** Skewed id stream: heavy hitters + a long tail — the distribution
    * approximate sketches earn their keep on (and the one that breaks
    * naive samplers). Cardinality varies with the seed.
    */
  private val skewGen: Gen[List[Long]] =
    Gen.listOfN(4000, Gen.frequency(
      8 -> Gen.choose(0L, 50L),
      2 -> Gen.choose(0L, 1000000L)))

  test("g8 HLL estimate stays within 3x its configured rsd across generated skews") {
    for (seed <- 20L to 27L) {
      val xs = sample(skewGen, seed)
      val approx = xs.toDF("user_id")
        .agg(approx_count_distinct(col("user_id"), 0.02)).as[Long].head()
      val exact = xs.distinct.size
      val err = math.abs(approx.toDouble - exact) / exact
      // 0.02 rsd is a standard deviation, not a hard cap — 3 sigma
      // holds across seeds without flaking (same bound RelationalOpsSpec
      // pins on the fixture)
      assert(err < 0.06, s"seed=$seed approx=$approx exact=$exact err=$err")
    }
  }

  test("g12 approx_percentile honors its rank-error bound across generated skews") {
    for (seed <- 30L to 37L) {
      val xs = sample(skewGen, seed).map(_.toDouble)
      val sorted = xs.sorted
      val n = sorted.size
      val df = xs.toDF("value")
      for (q <- Seq(0.5, 0.9)) {
        // GK returns an ELEMENT of the dataset whose rank is within
        // n/accuracy of the target rank — check the rank, not the value
        val est = df.agg(expr(s"approx_percentile(value, $q, 1000)")).as[Double].head()
        val lo = sorted.count(_ < est)
        val hi = sorted.count(_ <= est)
        val target = q * n
        val tol = n / 1000.0 + 1
        assert(lo - tol <= target && target <= hi + tol,
          s"seed=$seed q=$q est=$est rankRange=[$lo,$hi] target=$target tol=$tol")
      }
    }
  }

  test("hashModSample is monotone in pct and exact at the extremes") {
    val df = events(13L)
    def ids(pct: Int) = CorpusOps.hashModSample(df, col("event_id"), pct)
      .select("event_id").as[Long].collect().toSet
    assert(ids(0).isEmpty)
    assert(ids(100).size === df.count())
    val (s20, s50) = (ids(20), ids(50))
    assert(s20.subsetOf(s50), "raising pct only adds rows — stable sample membership")
  }

  test("count-min sketch never underestimates and stays within eps·N (heavy hitters)") {
    // the mergeable fixed-size structure for streaming heavy-hitter
    // counts at 100 TB (g8's HLL answers "how many distinct", CMS
    // answers "how often does THIS key occur"). One-sided error by
    // construction: estimate >= truth, overshoot bounded by eps·N.
    val ev = Tables.events(spark, sfDir)
    val eps = 0.01
    val sketch = ev.stat.countMinSketch(col("event_type"), eps, 0.99, seed = 42)
    val exact = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (k, c) =>
      val est = sketch.estimateCount(k)
      assert(est >= c, s"CMS must never undercount: $k est=$est exact=$c")
      assert(est <= c + math.ceil(eps * n).toLong,
        s"CMS overshoot for $k beyond eps*N: est=$est exact=$c n=$n")
    }
  }

  test("space-saving guarantees hold over generated skews (pure fold)") {
    // X-G48's algorithm, property-tested WITHOUT a stream via the pure
    // TopKPipeline.step: for every generated stream and every k —
    //  (1) at most k counters; (2) count never undercounts the true
    //  frequency and count − err never overcounts it; (3) every item
    //  with true frequency > N/k is tracked; (4) Σcount = N exactly
    //  (Space-Saving conserves total mass — each arrival increments
    //  exactly one counter).
    val streamGen: Gen[List[Long]] = Gen.listOfN(500, Gen.frequency(
      4 -> Gen.choose(0L, 4L),      // heavy head
      2 -> Gen.choose(10L, 30L),    // mid tail
      1 -> Gen.choose(1000L, 2000L) // churn singletons
    ))
    for (seed <- 30L to 35L; k <- Seq(1, 5, 20)) {
      val stream = sample(streamGen, seed)
      val counters = stream.foldLeft(List.empty[graft.streaming.SsCounter])(
        (cs, item) => graft.streaming.TopKPipeline.step(cs, item, k))
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = stream.size.toLong
      assert(counters.length <= k, s"seed=$seed k=$k")
      counters.foreach { c =>
        val f = exact.getOrElse(c.item, 0L)
        assert(c.count >= f, s"seed=$seed k=$k item=${c.item}: undercount")
        assert(c.count - c.err <= f, s"seed=$seed k=$k item=${c.item}: lower bound broke")
      }
      val tracked = counters.map(_.item).toSet
      exact.filter(_._2 > n / k).keys.foreach(h =>
        assert(tracked(h), s"seed=$seed k=$k: true heavy $h evicted"))
      // each arrival increments exactly one counter (eviction transfers
      // the evicted count to the adopter), so Σcount = N always
      assert(counters.map(_.count).sum === n,
        s"seed=$seed k=$k: mass not conserved")
    }
  }
}
