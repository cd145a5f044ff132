package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [queryName...] — trailing names restrict the
    // dump to those queries (local iteration; the driver passes two).
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietKnownBenignWarnings()
    new java.io.File(outDir).mkdirs()
    val plans = scala.collection.mutable.TreeMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        plans(name) = fingerprint(df.queryExecution.executedPlan)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // same inter-query hygiene as Bench: drop per-query pinned
      // cache so a 130-query dump can't accumulate heap
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // X-Q13 (r20): normalized physical-plan fingerprint per query —
    // the plan-regression ledger. The ~30 curated PlanShapeSpec pins
    // guard the queries whose shape IS the operator's contract; this
    // ledger makes the other 200+ regression-proof at zero per-round
    // effort: `tools/plancheck.py <outDir> [PLANS.json]` diffs a run
    // against the committed canonical and fails on unacknowledged
    // changes (the intentional-diff workflow: regenerate, read the
    // diff, commit the new PLANS.json naming the change).
    Files.writeString(Paths.get(s"$outDir/plans.json"),
      plans.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",\n", "}"))
    spark.stop()
  }

  /** Normalized plan fingerprint: the operator tree's shape with join
    * strategies/types and exchange partitioning kinds — no expression
    * ids, no paths, no stats, no codegen framing — so the string is
    * stable across runs/machines and diffs point at REAL plan changes
    * (a join strategy flip, a lost pushdown, a new exchange), not at
    * fixture temp dirs or id counters.
    */
  def fingerprint(plan: org.apache.spark.sql.execution.SparkPlan): String = {
    import org.apache.spark.sql.execution._
    // catalog BatchScan nodeNames embed the per-JVM warehouse root
    // (graft:/tmp/graft-jvm-<pid>/graft_cat_.../db/t) — normalize the
    // root away so the 38 catalog-table fingerprints are stable
    // across JVMs (r20: a fresh pid used to flag every tx_cat row)
    def norm(s: String): String =
      s.replaceAll("graft:\\S*/db/", "graft:~wh~/db/")
    def walk(p: SparkPlan): String = {
      val kids = p.children.map(walk).filter(_.nonEmpty)
      p match {
        // transparent framing: codegen boundaries shift with codegen
        // thresholds/flags, never with the plan's real shape
        case _: WholeStageCodegenExec | _: InputAdapter =>
          kids.mkString(",")
        case j: joins.BaseJoinExec =>
          s"${p.nodeName}[${j.joinType}](${kids.mkString(",")})"
        case e: exchange.ShuffleExchangeExec =>
          val kind = e.outputPartitioning.getClass.getSimpleName
            .stripSuffix("$").stripSuffix("Partitioning")
          s"Exchange[$kind](${kids.mkString(",")})"
        case _: adaptive.AdaptiveSparkPlanExec =>
          // fingerprint the INITIAL plan: deterministic pre-execution
          val a = p.asInstanceOf[adaptive.AdaptiveSparkPlanExec]
          walk(a.initialPlan)
        case _ =>
          if (kids.isEmpty) norm(p.nodeName)
          else s"${norm(p.nodeName)}(${kids.mkString(",")})"
      }
    }
    walk(plan)
  }
}
