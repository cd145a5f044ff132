package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, GraphOps, VectorOps}

/** Empirical scaling probe: replicate the corpus k× and measure the
  * heavy operators, because "would this hold at 1000×?" deserves a
  * measurement, not a hope.
  *
  *   sbt 'runMain graft.ScaleProbe [sfDir] [maxK]'
  *
  * Documents are SALTED per copy (every token suffixed with the copy
  * index) so copies don't near-dup each other — the pair structure
  * stays constant per copy and signature/join cost is what scales.
  * Embeddings replicate verbatim: a dup-heavy corpus is exactly the
  * adversarial load for LSH ANN (buckets grow k-fold, candidate pairs
  * k²-fold within identical groups), which is worth seeing honestly.
  *
  * Prints one JSON line per (op, k): {"op":…,"k":…,"rows":…,"sec":…}.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxK = args.lift(1).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicateDocs(k: Int): DataFrame =
      (0 until k).map { i =>
        Tables.documents(spark, sfDir).select(
          (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          array_join(transform(split(col("text"), " "), t => concat(t, lit("_" + i))), " ")
            .as("text"))
      }.reduce(_ union _)

    def replicateVecs(k: Int): DataFrame =
      (0 until k).map { i =>
        Tables.embeddings(spark, sfDir).select(
          (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"), col("embedding"))
      }.reduce(_ union _)

    def time(op: String, k: Int)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"$op","k":$k,"rows":$rows,"sec":$sec%.2f}""")
    }

    // Adversarial corpus for the DF cap: every doc gets the SAME
    // (unsalted) leading phrase, so its shingles sit in all n·k docs —
    // the textbook formulation would fan out (n·k)² pairs from them;
    // the capped variant must stay ~linear in k.
    def stopSalted(k: Int): DataFrame =
      replicateDocs(k).withColumn("text",
        concat(lit("common header boilerplate text follows here "), col("text")))

    // optional 3rd arg: comma-separated op filter (default: all)
    val only = args.lift(2).map(_.split(",").toSet)
    def enabled(op: String): Boolean = only.forall(_.contains(op))

    val ks = Iterator.iterate(1)(_ * 4).takeWhile(_ <= maxK).toSeq
    ks.foreach { k =>
      if (enabled("dd_minhash_lsh")) time("dd_minhash_lsh", k)(
        DedupOps.lshCandidatePairs(replicateDocs(k), "doc_id", "text"))
      if (enabled("dd_ngram_jaccard")) time("dd_ngram_jaccard", k)(
        DedupOps.ngramJaccardPairs(replicateDocs(k), "doc_id", "text", 0.5))
      if (enabled("dd_ngram_capped_stop")) time("dd_ngram_capped_stop", k)(
        DedupOps.ngramJaccardPairsCapped(stopSalted(k), "doc_id", "text", 0.5, dfCap = 25))
      if (enabled("sim_ann_lsh")) time("sim_ann_lsh", k)(
        VectorOps.annCosinePairs(replicateVecs(k), "vec_id", "embedding", 0.4))
      if (enabled("sim_ann_capped")) time("sim_ann_capped", k)(
        VectorOps.annCosinePairsCapped(replicateVecs(k), "vec_id", "embedding", 0.4,
          bucketCap = 32))
      // Distributed CC forced (localThreshold=0): every driver query's
      // candidate graph takes the union-find shortcut, so this probe is
      // where the label-propagation path is actually exercised at
      // scale. Rounds must track component DIAMETER (~constant for
      // dedup cliques), NOT corpus size k — that O(diameter) bound is
      // the whole scale argument for min-label propagation.
      if (enabled("cc_distributed")) {
        val pairs = DedupOps.lshCandidatePairs(replicateDocs(k), "doc_id", "text")
        val t0 = System.nanoTime()
        val rows = GraphOps.connectedComponents(pairs, "d1", "d2",
          localThreshold = 0L).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"op":"cc_distributed","k":$k,"rows":$rows,"sec":$sec%.2f,"rounds":${GraphOps.lastRunRounds}}""")
      }
    }
    spark.stop()
  }
}
