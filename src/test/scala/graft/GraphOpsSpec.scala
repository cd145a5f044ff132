package graft

import graft.operators.{DedupOps, GraphOps}

class GraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("connectedComponents labels a path, a clique, and keeps components separate") {
    // path 1-2-3-4-5 (diameter 4), triangle 20-21-22, duplicate+reversed
    // edges 10-11
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 10L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("d1", "d2")
    val cc = GraphOps.connectedComponents(edges, "d1", "d2")
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(cc(_) === 1L))
    assert(Seq(10L, 11L).forall(cc(_) === 10L))
    assert(Seq(20L, 21L, 22L).forall(cc(_) === 20L))
    assert(cc.size === 10)
  }

  test("maxIter exhaustion raises instead of returning a non-fixpoint labeling") {
    // localThreshold = 0 forces the iterative distributed path
    val path = (1L until 6L).map(i => (i, i + 1)).toDF("d1", "d2")
    // diameter 5 > maxIter 1: a silent return here would hand back
    // WRONG (split) components — the operator must refuse
    val ex = intercept[IllegalStateException] {
      GraphOps.connectedComponents(path, "d1", "d2", maxIter = 1,
        localThreshold = 0L).collect()
    }
    assert(ex.getMessage.contains("maxIter"))
    val full = GraphOps.connectedComponents(path, "d1", "d2", localThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(full.values.toSet === Set(1L))
    assert(GraphOps.lastRunRounds > 0) // distributed path actually ran
  }

  test("empty edge list converges on the distributed path (null-safe changed count)") {
    val empty = Seq.empty[(String, String)].toDF("d1", "d2")
    // non-integral ids skip the union-find shortcut; sum over zero rows
    // is NULL — must not NPE
    assert(GraphOps.connectedComponents(empty, "d1", "d2").collect().isEmpty)
  }

  test("output id type is LongType on both paths for integral inputs") {
    val edges = Seq((1, 2), (2, 3)).toDF("d1", "d2") // IntegerType input
    val local = GraphOps.connectedComponents(edges, "d1", "d2")
    val dist = GraphOps.connectedComponents(edges, "d1", "d2", localThreshold = 0L)
    assert(local.schema.map(_.dataType) === dist.schema.map(_.dataType))
    assert(local.as[(Long, Long)].collect().toSet === dist.as[(Long, Long)].collect().toSet)
  }

  test("local union-find and distributed propagation agree exactly") {
    val edges = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (20L, 21L),
      (21L, 22L), (20L, 22L), (30L, 30L)) ++
      (100L to 140L by 2).map(i => (i, i + 2))).toDF("d1", "d2")
    val local = GraphOps.connectedComponents(edges, "d1", "d2")
      .as[(Long, Long)].collect().toSet
    // the long path needs > 10 rounds; give the distributed run room
    val dist = GraphOps.connectedComponents(edges, "d1", "d2", maxIter = 30,
      localThreshold = 0L).as[(Long, Long)].collect().toSet
    assert(local === dist)
  }

  test("dedupClusters elects the min doc id per near-dup group") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content about spark engines and scale"),
      (4L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")
    val pairs = DedupOps.lshCandidatePairs(corpus, "doc_id", "text")
    val clusters = GraphOps.dedupClusters(pairs)
      .as[(Long, Long, Boolean)].collect()
      .map { case (d, k, kept) => d -> (k, kept) }.toMap
    // 1,2,4 are mutually near-dup candidates; 3 has no pair -> absent
    assert(!clusters.contains(3L))
    assert(clusters.keySet === Set(1L, 2L, 4L))
    assert(clusters.values.map(_._1).toSet === Set(1L))
    assert(clusters.collect { case (d, (_, true)) => d }.toSet === Set(1L))
  }

  test("pageRank: sinks of a star collect damped mass; exact integer fixpoint") {
    // star: 0 -> 1..5. Leaves split node 0's rank; node 0 receives
    // nothing and sits at the base. Hand-computed micro fixpoint after
    // the first round: leaves = 150000 + 85 * (r0 div 5) div 100.
    val star = (1L to 5L).map(i => (0L, i)).toDF("src", "dst")
    val r1 = GraphOps.pageRank(star, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1(0L) === 150000L)
    val leaf1 = 150000L + 85L * (1000000L / 5) / 100
    (1L to 5L).foreach(i => assert(r1(i) === leaf1))
    // second round: node 0's rank fell to base, leaves re-derive from it
    val r2 = GraphOps.pageRank(star, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    val leaf2 = 150000L + 85L * (150000L / 5) / 100
    assert(r2(0L) === 150000L)
    (1L to 5L).foreach(i => assert(r2(i) === leaf2))
  }

  test("pageRank ranks a cycle uniformly and more-linked nodes higher") {
    // 3-cycle: every node passes its whole rank on — uniform fixpoint
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val rc = GraphOps.pageRank(cycle, "src", "dst").as[(Long, Long)]
      .collect().toMap
    assert(rc.values.toSet.size === 1)
    // two sources pointing at node 9 vs one at node 8: 9 outranks 8
    val g = Seq((1L, 9L), (2L, 9L), (3L, 8L)).toDF("src", "dst")
    val rg = GraphOps.pageRank(g, "src", "dst").as[(Long, Long)]
      .collect().toMap
    assert(rg(9L) > rg(8L))
  }

  test("triangleCounts: K4 corners carry 3 each, paths none; dups/self-loops/direction ignored") {
    // K4 on 1..4 (four triangles, each node on three of them), a
    // 3-path 5-6-7 (none), plus a self-loop, a duplicate edge and a
    // REVERSED duplicate that must all collapse
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L),
      (8L, 8L), (2L, 1L), (1L, 2L)).toDF("src", "dst")
    val out = GraphOps.triangleCounts(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // total triangles = sum of corner credits / 3
    assert(out.values.sum === 12L)
  }
}
