package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators for the dedup pipeline's last mile: LSH/Jaccard
  * candidate PAIRS are only half of fuzzy dedup — a production corpus
  * needs pairs clustered into duplicate GROUPS and one canonical
  * survivor chosen per group. That is connected components + min-id
  * election, the same composition CCNet/MassiveText-style pipelines
  * run after MinHash banding.
  *
  * The reference has no graph surface (its PK dedup is exact,
  * `main.py:77`); this extends [[DedupOps]]'s candidate generators to
  * a full keep-one decision.
  *
  * Scale design: iterative label propagation — each round every node
  * adopts the minimum label in its closed neighborhood; converges in
  * O(component diameter) rounds. Near-dup graphs are overwhelmingly
  * tiny cliques (a duplicate group is mutually similar), so diameters
  * are small and a bounded iteration count is safe. Each round is one
  * shuffle on the node key (map-side-combined min); the driver only
  * checks the convergence counter — no row data ever reaches it.
  * Labels are min-ids, so the fixpoint is deterministic regardless of
  * execution order.
  */
object GraphOps {

  /** Connected components over an undirected edge list.
    *
    * @param edges   two-column DataFrame of (src, dst) pairs; direction
    *                ignored, self-loops and duplicates tolerated
    * @param maxIter safety bound on propagation rounds (components with
    *                diameter > maxIter would stop early — callers pick
    *                a bound ≥ the plausible diameter; dedup cliques
    *                have diameter ≤ 2)
    * @return (node, component) — component = min node id reachable
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 10): DataFrame = {
    val spark = edges.sparkSession
    // undirected: keep both orientations so each node sees every neighbor
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .cache()
    var labels = sym.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .cache()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // min label over the closed neighborhood (self + neighbors)
      val neighborLabels = sym
        .join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .select(col("a").as("node"), col("label"))
      val next = labels.union(neighborLabels)
        .groupBy("node").agg(min("label").as("label"))
        .cache()
      next.count() // materialize before comparing / unpersisting
      val changed = next.alias("n")
        .join(labels.alias("o"), Seq("node"))
        .filter(col("n.label") =!= col("o.label"))
        .limit(1).count() // existence check, not a full count
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels.select(col("node"), col("label").as("component"))
  }

  /** Fuzzy-dedup keep-one decision: cluster near-duplicate candidate
    * pairs into components and elect the minimum doc id of each
    * component as its canonical survivor. Returns one row per doc that
    * appears in ANY candidate pair: (doc_id, kept_id, is_kept) —
    * docs with no near-duplicates are implicitly kept and not listed.
    */
  def dedupClusters(pairs: DataFrame, d1Col: String = "d1",
                    d2Col: String = "d2", maxIter: Int = 10): DataFrame =
    connectedComponents(pairs, d1Col, d2Col, maxIter)
      .select(col("node").as("doc_id"), col("component").as("kept_id"),
        (col("node") === col("component")).as("is_kept"))
}
