package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorOps._

class VectorOpsSpec extends SparkTestBase {
  import spark.implicits._

  // 4-dim toy corpus: 1≈2 (near-dup), 3 orthogonal-ish, 4 antipodal to 1
  private def corpus = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
    (2L, Array(0.9f, 0.1f, 0.0f, 0.1f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f, -0.1f))
  ).toDF("vec_id", "embedding")

  test("kmeansAssign: every vector gets one in-range cell; training evens clusters") {
    val vecs = Tables.embeddings(spark, sfDir)
    val out = kmeansAssign(vecs, "vec_id", "embedding", k = 8, lloydIters = 2)
    val rows = out.collect()
    assert(rows.length === vecs.count(), "exactly one assignment per vector")
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 8), "cells in [0, k)")
    assert(rows.forall(r => r.getDouble(2) <= 1.000001), "cosine bounded")
    // trained codebook should populate most cells (hash-sample init
    // plus 2 Lloyd rounds; a degenerate single-cell clustering would
    // mean training collapsed)
    val used = rows.map(_.getInt(1)).distinct.length
    assert(used >= 4, s"expected >= 4 of 8 cells used, got $used")
    // deterministic end to end
    val again = kmeansAssign(vecs, "vec_id", "embedding", k = 8, lloydIters = 2)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("powerIteration recovers a planted dominant direction") {
    import spark.implicits._
    // 200 vectors along e_2 (plus small deterministic off-axis terms):
    // the top principal direction is e_2 up to sign
    val planted = (1 to 200).map { i =>
      val v = Array.fill(8)(0.0f)
      v(2) = if (i % 2 == 0) 2.0f else -2.0f
      v((i % 7) + 1) = 0.01f * (i % 5)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val out = powerIteration(planted, "embedding", dim = 8, iters = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(math.abs(out(2)) === 1000000L,
      "the planted axis must carry the max-norm component")
    ((0 until 8).toSet - 2).foreach { j =>
      assert(math.abs(out(j)) < 100000L,
        s"off-axis dim $j should be small, got ${out(j)}")
    }
    // deterministic: same input -> bit-identical iterate
    val again = powerIteration(planted, "embedding", dim = 8, iters = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(again === out)
  }

  test("graft_cell_topn / graft_pq_encode match the struct-sort executable spec") {
    val p = Tables.embeddings(spark, sfDir).limit(200)
      .select(col("vec_id"), col("embedding").as("__v"),
        norm(col("embedding")).as("__nrm"))
    val cents = p.orderBy(col("vec_id")).limit(4).collect()
    val centsFlat = typedlit(cents.flatMap(_.getSeq[Float](1).map(_.toDouble)).toSeq)
    val centNrms = typedlit(cents.map(_.getDouble(2)).toSeq)
    // the (negsim, cell) struct-sort formulation the native expression
    // replaced — kept here as its executable spec
    val structs = array(cents.zipWithIndex.map { case (r, i) =>
      struct((-(dot(col("__v"), typedlit(r.getSeq[Float](1))) /
        (col("__nrm") * lit(r.getDouble(2))))).as("negsim"), lit(i).as("cell"))
    }: _*)
    val cells = p.select(col("vec_id"),
      call_function("graft_cell_topn", col("__v"), col("__nrm"),
        centsFlat, centNrms, lit(2)).as("native"),
      transform(slice(array_sort(structs), 1, 2),
        _.getField("cell")).as("spec"))
    assert(cells.filter(col("native") =!= col("spec")).isEmpty,
      "native top-n cell assignment must equal the struct-sort spec")

    // PQ: m=2 segments of a 64-dim vector, ksub=4 codes from the same rows
    val m = 2; val ksub = 4; val ds = 32
    val cb = Array.tabulate(m, ksub) { (s, j) =>
      cents(j).getSeq[Float](1).slice(s * ds, (s + 1) * ds).map(_.toDouble).toArray
    }
    val c2 = cb.map(_.map(v => v.foldLeft(0.0)((a, x) => a + x * x)))
    val cbFlat = typedlit(cb.flatten.flatten.toSeq)
    val specCodes = array((0 until m).map { s =>
      element_at(array_sort(array((0 until ksub).map { j =>
        struct((lit(c2(s)(j)) - lit(2.0) *
          dot(slice(col("__v"), s * ds + 1, ds), typedlit(cb(s)(j).toSeq))).as("d"),
          lit(j).as("j"))
      }: _*)), 1).getField("j")
    }: _*)
    val codes = p.select(col("vec_id"),
      call_function("graft_pq_encode", col("__v"), cbFlat, lit(m), lit(ksub)).as("native"),
      specCodes.as("spec"))
    assert(codes.filter(col("native") =!= col("spec")).isEmpty,
      "native PQ codes must equal the struct-sort argmin spec")
    // ADC table entries equal the round(dot·1e6) formulation
    val specAdc = array((0 until m).map { s =>
      array((0 until ksub).map { j =>
        round(dot(slice(col("__v"), s * ds + 1, ds), typedlit(cb(s)(j).toSeq)) * 1e6)
          .cast("long")
      }: _*)
    }: _*)
    val adc = p.select(
      call_function("graft_adc", col("__v"), cbFlat, lit(m), lit(ksub)).as("native"),
      specAdc.as("spec"))
    assert(adc.filter(col("native") =!= col("spec")).isEmpty,
      "native ADC table must equal the round(dot*1e6) spec")
  }

  test("graft_dot computes the double-precision dot product over float arrays") {
    val d = corpus.filter($"vec_id" === 1L)
      .select(dot(col("embedding"), col("embedding"))).as[Double].head()
    assert(math.abs(d - (1.0 + 0.1f.toDouble * 0.1f.toDouble)) < 1e-12)
    // also resolvable from SQL text via the extension-registered name
    val viaSql = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .as[Double].head()
    assert(viaSql === 11.0)
  }

  test("graft_dot stays inside whole-stage codegen") {
    // parquet-backed input: a local relation would constant-fold away
    val plan = Tables.embeddings(spark, sfDir)
      .select(dot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages in the tree dump
    assert(plan.contains("*(1) Project [graft_dot"), plan)
  }

  test("cosinePairsBruteForce finds the near-dup pair and respects the threshold") {
    val pairs = cosinePairsBruteForce(corpus, "vec_id", "embedding", 0.9)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("topKNeighbors ranks by cosine with deterministic tiebreak and excludes self") {
    val out = topKNeighbors(corpus, "vec_id", "embedding", col("vec_id") === 1L, k = 3)
      .orderBy("rnk").select("vec_id", "rnk").as[(Long, Int)].collect()
    assert(out.map(_._1).toSeq === Seq(2L, 3L, 4L)) // by descending cosine
    assert(out.map(_._2).toSeq === Seq(1, 2, 3))
  }

  test("topKNeighborsAnn: candidates carry exact cosines, ranks are dense, recall pinned") {
    val vecs = Tables.embeddings(spark, sfDir)
    val pred = col("vec_id") % 100 === 0
    val k = 10
    val exact = topKNeighbors(vecs, "vec_id", "embedding", pred, k)
      .select("qid", "vec_id", "cosine").as[(Long, Long, Double)].collect()
    val ann = topKNeighborsAnn(vecs, "vec_id", "embedding", pred, k)
      .select("qid", "vec_id", "cosine", "rnk").as[(Long, Long, Double, Int)].collect()
    assert(ann.nonEmpty)
    // every ANN hit's cosine is the exact cosine (verify-on-candidates)
    val exactCos = topKNeighbors(vecs, "vec_id", "embedding", pred, Int.MaxValue)
      .select("qid", "vec_id", "cosine").as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    ann.foreach { case (q, v, c, _) => assert(c === exactCos((q, v))) }
    // ranks are dense and start at 1 per qid
    ann.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length).toSeq)
    }
    // recall@10 vs the exact top-k: pin the floor so bucket-routing
    // regressions surface (measured ~0.5+ at sf0.001 with 4x4 tables)
    val exactSet = exact.map(r => (r._1, r._2)).toSet
    val annSet = ann.map(r => (r._1, r._2)).toSet
    val recall = (exactSet & annSet).size.toDouble / exactSet.size
    assert(recall >= 0.3, f"ANN top-k recall $recall%.3f fell below the pinned floor")
  }

  test("topKNeighborsIvf: exact cosines, dense ranks, recall pinned") {
    val vecs = Tables.embeddings(spark, sfDir)
    val pred = col("vec_id") % 100 === 0
    val k = 10
    val exact = topKNeighbors(vecs, "vec_id", "embedding", pred, k)
      .select("qid", "vec_id", "cosine").as[(Long, Long, Double)].collect()
    val ivf = topKNeighborsIvf(vecs, "vec_id", "embedding", pred, k)
      .select("qid", "vec_id", "cosine", "rnk").as[(Long, Long, Double, Int)].collect()
    assert(ivf.nonEmpty)
    val exactCos = topKNeighbors(vecs, "vec_id", "embedding", pred, Int.MaxValue)
      .select("qid", "vec_id", "cosine").as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    ivf.foreach { case (q, v, c, _) => assert(c === exactCos((q, v))) }
    // one cell per corpus row + nprobe probe fan-out => a pair can form
    // at most once
    assert(ivf.map(r => (r._1, r._2)).distinct.length === ivf.length)
    ivf.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length).toSeq)
    }
    val exactSet = exact.map(r => (r._1, r._2)).toSet
    val recall = (exactSet & ivf.map(r => (r._1, r._2)).toSet).size.toDouble / exactSet.size
    assert(recall >= 0.3, f"IVF top-k recall $recall%.3f fell below the pinned floor")
  }

  test("topKNeighborsPq: exact reranked cosines, dense ranks, recall pinned") {
    val vecs = Tables.embeddings(spark, sfDir)
    val pred = col("vec_id") % 100 === 0
    val k = 10
    val exact = topKNeighbors(vecs, "vec_id", "embedding", pred, k)
      .select("qid", "vec_id", "cosine").as[(Long, Long, Double)].collect()
    val pq = topKNeighborsPq(vecs, "vec_id", "embedding", pred, k)
      .select("qid", "vec_id", "cosine", "rnk").as[(Long, Long, Double, Int)].collect()
    assert(pq.nonEmpty)
    // the reported cosine is the EXACT one (ADC only ranks the shortlist)
    val exactCos = topKNeighbors(vecs, "vec_id", "embedding", pred, Int.MaxValue)
      .select("qid", "vec_id", "cosine").as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    pq.foreach { case (q, v, c, _) => assert(c === exactCos((q, v))) }
    // corpus rows live in exactly one coarse cell => no duplicate pairs
    assert(pq.map(r => (r._1, r._2)).distinct.length === pq.length)
    pq.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length).toSeq)
    }
    val exactSet = exact.map(r => (r._1, r._2)).toSet
    val recall = (exactSet & pq.map(r => (r._1, r._2)).toSet).size.toDouble / exactSet.size
    assert(recall >= 0.3, f"PQ top-k recall $recall%.3f fell below the pinned floor")
  }

  test("topKNeighborsRerank: shortlist rerank returns exact cosines; tracks ANN route") {
    val vecs = Tables.embeddings(spark, sfDir)
    val pred = col("vec_id") % 100 === 0
    val k = 10
    val rr = topKNeighborsRerank(vecs, "vec_id", "embedding", pred, k)
      .select("qid", "vec_id", "cosine", "rnk").as[(Long, Long, Double, Int)].collect()
    assert(rr.nonEmpty)
    val exactCos = topKNeighbors(vecs, "vec_id", "embedding", pred, Int.MaxValue)
      .select("qid", "vec_id", "cosine").as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    // the reported cosine is the EXACT float cosine, not the coarse score
    rr.foreach { case (q, v, c, _) => assert(c === exactCos((q, v))) }
    rr.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length).toSeq)
    }
    // rerank draws from the same LSH candidate pool as the ANN route —
    // with a 40-row shortlist over ~int8-faithful scores, the top-k
    // should largely agree with ranking the full candidate set exactly
    val ann = topKNeighborsAnn(vecs, "vec_id", "embedding", pred, k)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val agree = (ann & rr.map(r => (r._1, r._2)).toSet).size.toDouble / ann.size
    assert(agree >= 0.6, f"rerank agreement with ANN route $agree%.3f below floor")
  }

  test("planeSign is deterministic ±1") {
    val s = (0 until 8).map(i => planeSign(0, 0, i))
    assert(s === (0 until 8).map(i => planeSign(0, 0, i))) // stable
    assert(s.forall(v => v == 1.0 || v == -1.0))
    assert((0 until 4).flatMap(t => (0 until 4).map(b => planeSign(t, b, 0))).distinct.size == 2)
  }

  test("annCosinePairs returns a subset of brute-force pairs with exact cosines") {
    val vecs = Tables.embeddings(spark, sfDir)
    val brute = cosinePairsBruteForce(vecs, "vec_id", "embedding", 0.4)
      .as[(Long, Long, Double)].collect().toMap2
    val ann = annCosinePairs(vecs, "vec_id", "embedding", minCosine = 0.4)
      .as[(Long, Long, Double)].collect().toMap2
    assert(ann.nonEmpty, "LSH should recover at least one true pair at sf0.001")
    assert(ann.keySet.subsetOf(brute.keySet), "ANN candidates must be true pairs")
    ann.foreach { case (k, c) => assert(c === brute(k)) }
  }

  test("knownCount serves the adaptive ladder from metadata: identical output, no count job") {
    val vecs = Tables.embeddings(spark, sfDir)
    val n = vecs.count()
    val counted = annCosinePairs(vecs, "vec_id", "embedding",
        minCosine = 0.4, targetOccupancy = 16)
      .as[(Long, Long, Double)].collect().toSet
    val served = annCosinePairs(vecs, "vec_id", "embedding",
        minCosine = 0.4, targetOccupancy = 16, knownCount = n)
      .as[(Long, Long, Double)].collect().toSet
    assert(served === counted,
      "a metadata-served corpus count must pick the same band geometry")
    // a WRONG count changes geometry, not correctness: still a subset
    // of true pairs with exact cosines (adaptivity is a perf lever)
    val coarse = annCosinePairs(vecs, "vec_id", "embedding",
        minCosine = 0.4, targetOccupancy = 16, knownCount = n * 1000)
      .as[(Long, Long, Double)].collect().toSet
    val brute = cosinePairsBruteForce(vecs, "vec_id", "embedding", 0.4)
      .as[(Long, Long, Double)].collect().toMap2
    coarse.foreach { case (a, b, c) => assert(brute((a, b)) === c) }
  }

  test("quantizeInt8 clamps to [-127,127], maps max|v| to ±127, zero vector to zeros") {
    val df = Seq((1L, Array(0f, 0f)), (2L, Array(1f, -2f))).toDF("vec_id", "embedding")
    val (scale, q) = quantizeInt8(col("embedding"))
    val out = df.select(col("vec_id"), scale.as("s"), q.as("q"))
      .as[(Long, Double, Seq[Int])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === ((1.0, Seq(0, 0))))
    assert(out(2L)._1 === 63.5)
    assert(out(2L)._2 === Seq(64, -127)) // 63.5 rounds half-away-from-zero
  }

  test("ivfCosinePairs: candidates are true pairs; multi-probe beats single-probe recall") {
    val vecs = Tables.embeddings(spark, sfDir)
    val brute = cosinePairsBruteForce(vecs, "vec_id", "embedding", 0.4)
      .as[(Long, Long, Double)].collect().toMap2
    val ivf2 = ivfCosinePairs(vecs, "vec_id", "embedding", minCosine = 0.4, nprobe = 2)
      .as[(Long, Long, Double)].collect().toMap2
    val ivf1 = ivfCosinePairs(vecs, "vec_id", "embedding", minCosine = 0.4, nprobe = 1)
      .as[(Long, Long, Double)].collect().toMap2
    assert(ivf2.nonEmpty, "IVF should recover pairs at sf0.001")
    assert(ivf2.keySet.subsetOf(brute.keySet), "IVF candidates must be true pairs")
    ivf2.foreach { case (k, c) => assert(c === brute(k)) }
    assert(ivf1.keySet.subsetOf(ivf2.keySet), "probing more cells only adds candidates")
  }

  test("ivfCosinePairsTrained: true pairs only, deterministic, recall >= untrained") {
    val vecs = Tables.embeddings(spark, sfDir)
    val brute = cosinePairsBruteForce(vecs, "vec_id", "embedding", 0.4)
      .as[(Long, Long, Double)].collect().toMap2
    val untrained = ivfCosinePairs(vecs, "vec_id", "embedding", minCosine = 0.4)
      .as[(Long, Long, Double)].collect().toMap2
    val trained = ivfCosinePairsTrained(vecs, "vec_id", "embedding", minCosine = 0.4)
      .as[(Long, Long, Double)].collect().toMap2
    assert(trained.nonEmpty)
    assert(trained.keySet.subsetOf(brute.keySet), "trained-IVF candidates must be true pairs")
    trained.foreach { case (k, c) => assert(c === brute(k)) }
    // Lloyd refinement must not lose recall vs the hash-sampled codebook
    val rTrained = trained.size.toDouble / brute.size
    val rUntrained = untrained.size.toDouble / brute.size
    assert(rTrained >= rUntrained,
      f"trained recall $rTrained%.3f < untrained $rUntrained%.3f")
    // deterministic across invocations (fresh Lloyd run, same codebook)
    val again = ivfCosinePairsTrained(vecs, "vec_id", "embedding", minCosine = 0.4)
      .as[(Long, Long, Double)].collect().toMap2
    assert(again === trained)
    // the 100 TB shape: train (init + Lloyd) on the 25% hash-mod
    // sample, assign the full corpus — results stay true pairs and
    // recall stays in the trained ballpark
    val sampled = ivfCosinePairsTrained(vecs, "vec_id", "embedding",
        minCosine = 0.4, trainPct = 25)
      .as[(Long, Long, Double)].collect().toMap2
    assert(sampled.nonEmpty)
    assert(sampled.keySet.subsetOf(brute.keySet),
      "sample-trained candidates must be true pairs")
    sampled.foreach { case (k, c) => assert(c === brute(k)) }
    assert(sampled.size.toDouble / brute.size >= 0.5 * rUntrained,
      "sample training must not collapse recall")
  }

  test("annCosinePairsCapped bounds bucket fan-out and is a subset of uncapped") {
    // duplicate-heavy corpus: 20 copies of the same vector land in the
    // same bucket in every table — uncapped generates 190 pairs from
    // that group, cap=4 at most C(4,2)=6 per table
    val dups = (1L to 20L).map(i => (i, Array.fill(64)(0.5f))) ++
      Seq((100L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)))
    val df = dups.toDF("vec_id", "embedding")
    val uncapped = annCosinePairs(df, "vec_id", "embedding", minCosine = 0.9, dim = 64)
      .as[(Long, Long, Double)].collect().toMap2
    val capped = annCosinePairsCapped(df, "vec_id", "embedding", minCosine = 0.9,
      bucketCap = 4, dim = 64)
      .as[(Long, Long, Double)].collect().toMap2
    assert(uncapped.size === 190) // all C(20,2) identical-vector pairs
    assert(capped.keySet.subsetOf(uncapped.keySet))
    assert(capped.size <= 6 && capped.nonEmpty)
    // deterministic: same survivors on re-run
    val again = annCosinePairsCapped(df, "vec_id", "embedding", minCosine = 0.9,
      bucketCap = 4, dim = 64).as[(Long, Long, Double)].collect().toMap2
    assert(again === capped)
    // a generous cap reproduces the uncapped result exactly
    val loose = annCosinePairsCapped(df, "vec_id", "embedding", minCosine = 0.9,
      bucketCap = 1000, dim = 64).as[(Long, Long, Double)].collect().toMap2
    assert(loose === uncapped)
  }

  test("annCosinePairsProjected: exact cosines (subset of brute force), recall reported") {
    val e = Tables.embeddings(spark, sfDir)
    import spark.implicits._
    val exact = cosinePairsBruteForce(e, "vec_id", "embedding", minCosine = 0.4)
      .as[(Long, Long, Double)].collect().toMap2
    val proj = annCosinePairsProjected(e, "vec_id", "embedding", minCosine = 0.4)
      .as[(Long, Long, Double)].collect().toMap2
    // precision is EXACT: projection can only lose candidates, never
    // admit a below-threshold pair or distort a cosine
    assert(proj.keySet.subsetOf(exact.keySet), "projected ANN admitted a false pair")
    proj.foreach { case (k, c) => assert(c === exact(k), s"cosine drifted for $k") }
    assert(proj.nonEmpty, "projected ANN found nothing at sf0.001")
    // determinism: the md5 sign matrices are pure functions
    val again = annCosinePairsProjected(e, "vec_id", "embedding", minCosine = 0.4)
      .as[(Long, Long, Double)].collect().toMap2
    assert(again === proj)
    info(s"recall vs brute force at 0.4: ${proj.size}/${exact.size}")
    // the dup-heavy guard: capped ⊆ uncapped, generous cap ≡ uncapped
    val capped = annCosinePairsProjected(e, "vec_id", "embedding", minCosine = 0.4,
      bucketCap = 4).as[(Long, Long, Double)].collect().toMap2
    assert(capped.keySet.subsetOf(proj.keySet))
    val loose = annCosinePairsProjected(e, "vec_id", "embedding", minCosine = 0.4,
      bucketCap = 1000000).as[(Long, Long, Double)].collect().toMap2
    assert(loose === proj)
  }

  test("occupancy-adaptive projected ANN: the bits ladder is exact, results stay an exact subset, near-dup recall holds") {
    // the integer ladder (no floating log): smallest b in [4,24] with
    // (n >> b) <= 16 (ceiling raised 16 -> 24 after the r17 sf10
    // receipt measured the 16-bit cap binding at 5M vectors —
    // occupancy crept to 76 and the wall ratio to 8.9x)
    assert(adaptiveBits(0L) === 4)
    assert(adaptiveBits(272L) === 5)   // 272 >> 4 = 17 > 16
    assert(adaptiveBits(256L) === 4)   // 256 >> 4 = 16 <= 16
    assert(adaptiveBits(500L) === 5)
    assert(adaptiveBits(2000L) === 7)
    assert(adaptiveBits(20000L) === 11)
    assert(adaptiveBits(5_000_000L) === 19) // past the old 16 cap
    assert(adaptiveBits(Long.MaxValue) === 24)
    val e = Tables.embeddings(spark, sfDir)
    import spark.implicits._
    val exact = cosinePairsBruteForce(e, "vec_id", "embedding", minCosine = 0.4)
      .as[(Long, Long, Double)].collect().toMap2
    val adaptive = annCosinePairsProjected(e, "vec_id", "embedding",
      minCosine = 0.4, targetOccupancy = 16)
      .as[(Long, Long, Double)].collect().toMap2
    assert(adaptive.keySet.subsetOf(exact.keySet),
      "adaptive banding admitted a false pair")
    adaptive.foreach { case (k, c) => assert(c === exact(k)) }
    // genuinely-near duplicates survive the finer banding: pin the
    // floor on the >= 0.9 pairs (per-bit collision prob ~0.86 there,
    // so even 16 bits x 4 tables keeps most of them)
    val nearDups = exact.filter(_._2 >= 0.9).keySet
    if (nearDups.nonEmpty) {
      val recall = (nearDups & adaptive.keySet).size.toDouble / nearDups.size
      assert(recall >= 0.5,
        f"near-dup recall $recall%.3f fell below the pinned floor")
    }
    // determinism
    val again = annCosinePairsProjected(e, "vec_id", "embedding",
      minCosine = 0.4, targetOccupancy = 16)
      .as[(Long, Long, Double)].collect().toMap2
    assert(again === adaptive)
  }

  test("randomProject: deterministic, linear, and JL error shrinks as 1/sqrt(rdim)") {
    val e = Tables.embeddings(spark, sfDir)
    def cosStats(rdim: Int): Double = {
      val pr = randomProject(e, "vec_id", "embedding", rdim = rdim)
      val withProj = e.join(pr, "vec_id")
      val a = withProj.select(col("vec_id").as("id1"),
        col("embedding").as("e1"), col("proj").as("p1"))
      val b = withProj.select(col("vec_id").as("id2"),
        col("embedding").as("e2"), col("proj").as("p2"))
      def cos(x: String, y: String) =
        dot(col(x), col(y)) / (sqrt(dot(col(x), col(x))) * sqrt(dot(col(y), col(y))))
      a.join(b, col("id1") < col("id2"))
        .select(avg(abs(cos("e1", "e2") - cos("p1", "p2"))).as("mae"))
        .head.getDouble(0)
    }
    val maes = Seq(8, 16, 32).map(r => r -> cosStats(r))
    // distortion decreases monotonically with rdim…
    assert(maes.sliding(2).forall { case Seq((_, hi), (_, lo)) => lo < hi },
      s"cosine MAE must shrink as rdim grows: $maes")
    // …at the JL rate: mae·√rdim is a bounded constant (≈0.8 here)
    maes.foreach { case (r, mae) =>
      assert(mae * math.sqrt(r.toDouble) < 1.2,
        s"rdim=$r mae=$mae violates the JL error-rate bound") }
    // deterministic: re-running the projection is bit-identical
    val p1 = randomProject(e, "vec_id", "embedding", rdim = 8).collect().toSeq
    val p2 = randomProject(e, "vec_id", "embedding", rdim = 8).collect().toSeq
    assert(p1 === p2)
  }

  test("incrementalAnnDedup agrees with batch ANN pairs restricted to new×existing") {
    val vecs = Tables.embeddings(spark, sfDir)
    val isNew = col("vec_id") % 10 === 0
    val ex = vecs.filter(!isNew)
    val out = incrementalAnnDedup(lshIndex(ex, "vec_id", "embedding"),
      ex, vecs.filter(isNew), "vec_id", "embedding", minCosine = 0.45).cache()
    try {
      // one verdict per new vector
      assert(out.count() === vecs.filter(isNew).count())
      // the dup set and its min-id election must equal the full batch
      // ANN pair computation, reoriented to (new, existing)
      val pairs = annCosinePairs(vecs, "vec_id", "embedding", minCosine = 0.45)
      val ne = pairs.select(col("v1").as("a"), col("v2").as("b"))
        .union(pairs.select(col("v2").as("a"), col("v1").as("b")))
        .filter(col("a") % 10 === 0 && col("b") % 10 =!= 0)
      val want = ne.groupBy(col("a")).agg(min(col("b")).as("dup_of"))
      val got = out.filter(col("dup_of").isNotNull)
        .select(col("vec_id").as("a"), col("dup_of"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "incremental verdicts must match the batch pair computation")
    } finally out.unpersist()
  }

  test("signWord packs exactly the positive components' bits") {
    import spark.implicits._
    // component i > 0 ⇔ bit (i − lo) set: plant signs at 0, 2, 31 in
    // the low word and 32, 63 in the high word
    val v = Array.fill(64)(-1.0f)
    Seq(0, 2, 31, 32, 63).foreach(i => v(i) = 0.5f)
    val row = Seq(Tuple1(v)).toDF("e")
      .select(signWord(col("e"), 0).as("lo"),
        signWord(col("e"), 32).as("hi"))
      .head()
    assert(row.getLong(0) === ((1L << 0) | (1L << 2) | (1L << 31)))
    assert(row.getLong(1) === ((1L << 0) | (1L << 31)))
  }

  test("topKNeighborsBinary: exact reranked cosines, dense ranks, recall pinned") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sfDir)
    val pred = col("vec_id") % 100 === 0
    val k = 10
    val bin = topKNeighborsBinary(vecs, "vec_id", "embedding", pred, k)
      .select("qid", "vec_id", "cosine", "rnk").as[(Long, Long, Double, Int)].collect()
    assert(bin.nonEmpty)
    // every hit's cosine is the exact cosine (rerank-on-candidates)
    val exactCos = topKNeighbors(vecs, "vec_id", "embedding", pred, Int.MaxValue)
      .select("qid", "vec_id", "cosine").as[(Long, Long, Double)].collect().toMap2
    bin.foreach { case (q, v, c, _) => assert(c === exactCos((q, v))) }
    // ranks dense per qid
    bin.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length).toSeq)
    }
    // recall@10 vs exact: 64 sign bits + shortlist 40 of 500 — pin the
    // floor so a packing/shortlist regression surfaces
    val exactSet = topKNeighbors(vecs, "vec_id", "embedding", pred, k)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exactSet & bin.map(r => (r._1, r._2)).toSet).size.toDouble / exactSet.size
    info(f"binary-quantized recall@10: $recall%.3f")
    assert(recall >= 0.3, f"binary recall $recall%.3f fell below the pinned floor")
  }

  test("maxSimTopK equals the hand-computed MaxSim on a planted bag") {
    import spark.implicits._
    val rows = Seq(
      (0L, 0L, Array(1f, 0f, 0f, 0f)), // query token 0
      (1L, 0L, Array(0f, 1f, 0f, 0f)), // query token 1
      (2L, 1L, Array(1f, 0f, 0f, 0f)), // doc 1: perfect match for qt0
      (3L, 1L, Array(0f, 0f, 1f, 0f)),
      (4L, 2L, Array(0.6f, 0.8f, 0f, 0f)), // doc 2: cos .6 / .8 vs qt0/qt1
      (5L, 2L, Array(0f, 0f, 0f, 1f)))
    val df = rows.toDF("vec_id", "doc", "embedding")
    val out = maxSimTopK(df, "doc", "vec_id", "embedding", col("doc") === 0, k = 2)
      .select("qdoc", "doc", "score_micro", "rnk")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    // doc2: max(.6,0)+max(.8,0) = 1.4; doc1: max(1,0)+max(0,0) = 1.0;
    // the query doc itself never appears
    assert(out.toSeq === Seq((0L, 2L, 1400000L, 1), (0L, 1L, 1000000L, 2)))
  }

  private implicit class PairMap(rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[(Long, Long), Double] =
      rows.map { case (a, b, c) => (a, b) -> c }.toMap
  }
}
