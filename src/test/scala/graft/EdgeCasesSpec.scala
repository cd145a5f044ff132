package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.operators.{CorpusOps, DedupOps, RelationalOps, VectorOps}

/** Degenerate-input behavior: empty relations, empty strings, and null
  * text must flow through every operator without exceptions and with
  * defensible semantics — at 100 TB some partition somewhere WILL be
  * empty and some document WILL be null.
  */
class EdgeCasesSpec extends SparkTestBase {
  import spark.implicits._

  private val emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("dedup and corpus operators return empty on empty input (no crash)") {
    assert(DedupOps.lshCandidatePairs(emptyDocs, "doc_id", "text").isEmpty)
    assert(DedupOps.ngramJaccardPairs(emptyDocs, "doc_id", "text", 0.5).isEmpty)
    assert(DedupOps.exactDedupSummary(emptyDocs, "doc_id", "text").isEmpty)
    assert(CorpusOps.vocabTopK(emptyDocs, "text", 5).isEmpty)
    assert(CorpusOps.tfIdf(emptyDocs, "doc_id", "text").isEmpty)
  }

  test("relational operators return empty on empty input") {
    val e = emptyDocs.withColumnRenamed("doc_id", "user_id")
      .withColumn("ts", col("user_id").cast("timestamp"))
      .withColumn("event_id", col("user_id"))
    assert(RelationalOps.sessionize(e, "user_id", "ts", Seq(col("event_id")), 60L).isEmpty)
    assert(RelationalOps.dedupFirst(e, Seq("user_id"), Seq(col("event_id"))).isEmpty)
    assert(RelationalOps.topKPerGroup(e, Seq("user_id"), Seq(col("event_id")), 3, "r").isEmpty)
  }

  test("null and empty text produce defined signatures, not exceptions") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "), (4L, "one"))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        DedupOps.simhash(col("text")).as("sh"),
        DedupOps.minhashSignature(col("text")).as("sig"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).isNullAt(1), "null text -> null simhash (null in, null out)")
    assert(out(2L).getLong(1) === 0L, "empty text -> simhash 0")
    assert(out(3L).getLong(1) === 0L, "whitespace-only -> simhash 0")
    assert(out(4L).getLong(1) > 0L)
    assert(out(2L).getLong(3) === 0L, "empty text -> fingerprint 0")
    // empty text: len score 0, stopword score 0, punct score 1 (no
    // punctuation) * 0.3 weight — defined, not NaN/div-by-zero
    assert(out(2L).getDouble(4) === 0.3)
  }

  test("asofJoin with an empty right side yields all-null attachments") {
    val left = Seq((1L, 100L, 10L)).toDF("k", "ts", "lid")
    val right = Seq.empty[(Long, Long, Long)].toDF("k", "ts", "rid")
    val out = RelationalOps.asofJoin(left, right, "k", "ts", "rid", "last_rid", Seq("rid"))
    assert(out.count() === 1 && out.filter(col("last_rid").isNull).count() === 1)
  }

  test("vector ops tolerate an empty corpus") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    assert(VectorOps.cosinePairsBruteForce(empty, "vec_id", "embedding", 0.5).isEmpty)
    assert(VectorOps.annCosinePairs(empty, "vec_id", "embedding", 0.5).isEmpty)
    assert(VectorOps.annCosinePairsCapped(empty, "vec_id", "embedding", 0.5,
      bucketCap = 8).isEmpty)
    assert(VectorOps.ivfCosinePairs(empty, "vec_id", "embedding", 0.5).isEmpty)
    assert(VectorOps.ivfCosinePairsTrained(empty, "vec_id", "embedding", 0.5).isEmpty)
    assert(VectorOps.topKNeighborsIvf(empty, "vec_id", "embedding",
      col("vec_id") >= 0, 5).isEmpty)
    assert(VectorOps.topKNeighborsRerank(empty, "vec_id", "embedding",
      col("vec_id") >= 0, 5).isEmpty)
  }

  test("r6 retrieval/curation operators tolerate degenerate inputs") {
    val vecs = Tables.embeddings(spark, sfDir)
    // probe predicate matching nothing: empty result, contract schema
    val noProbe = VectorOps.topKNeighborsIvf(vecs, "vec_id", "embedding",
      col("vec_id") < 0, 5)
    assert(noProbe.isEmpty)
    assert(noProbe.columns.toSeq === Seq("qid", "vec_id", "cosine", "rnk"))
    assert(VectorOps.topKNeighborsRerank(vecs, "vec_id", "embedding",
      col("vec_id") < 0, 5).isEmpty)
    // domainMix: empty target map drops everything; a class at target 1.0
    // keeps all of its rows
    val docs = Tables.documents(spark, sfDir)
    assert(CorpusOps.domainMix(docs, "lang", col("doc_id"), Map.empty).isEmpty)
    val only = CorpusOps.domainMix(docs, "lang", col("doc_id"), Map("en" -> 1.0))
    assert(only.select("lang").distinct().as[String].collect().toSeq === Seq("en"))
    assert(only.count() === docs.filter(col("lang") === "en").count())
  }

  test("round-3 operators tolerate degenerate inputs") {
    // capped ngram on empty corpus
    assert(DedupOps.ngramJaccardPairsCapped(emptyDocs, "doc_id", "text",
      0.5, dfCap = 10).isEmpty)
    // connected components on an empty edge list (both solve paths)
    val noEdges = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(graft.operators.GraphOps.connectedComponents(noEdges, "d1", "d2").isEmpty)
    assert(graft.operators.GraphOps.connectedComponents(noEdges, "d1", "d2",
      localThreshold = 0L).isEmpty)
    // decontamination against an empty contamination set keeps all docs
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "wholly different text here"))
      .toDF("doc_id", "text")
    assert(CorpusOps.decontaminate(docs, emptyDocs, "doc_id", "text").count() === 2)
    // quantization of null/empty embeddings: null in, null out; empty in, empty out
    val vecs = Seq((1L, null.asInstanceOf[Array[Float]]), (2L, Array.empty[Float]))
      .toDF("vec_id", "embedding")
    val (sc, q) = VectorOps.quantizeInt8(col("embedding"))
    val out = vecs.select(col("vec_id"), sc.as("s"), q.as("q")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).isNullAt(1) && out(1L).isNullAt(2))
    assert(out(2L).getSeq[Int](2).isEmpty)
    // repetition ratio: null propagates, empty/short docs score 0
    val rr = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "one two"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.repetitionRatio(col("text"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rr(1L).isNullAt(1))
    assert(rr(2L).getDouble(1) === 0.0 && rr(3L).getDouble(1) === 0.0)
  }

  test("round-6 operators tolerate degenerate inputs") {
    import graft.operators.RelationalOps
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val emptyKV = Seq.empty[(Long, String)].toDF("k", "v")

    // mergeUpsert: no updates -> identity snapshot; empty existing -> inserts only
    assert(RelationalOps.mergeUpsert(base, emptyKV, Seq("k")).collect().toSet
      === base.collect().toSet)
    assert(RelationalOps.mergeUpsert(emptyKV, base, Seq("k")).collect().toSet
      === base.collect().toSet)

    // profileColumns: empty input yields an empty profile (not a crash
    // or a zero-row-per-column fabrication)
    assert(RelationalOps.profileColumns(emptyKV, Seq("v" -> col("v"))).isEmpty)

    // scd2Apply with no changes is the identity on history
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("1995-01-01 00:00:00")
    val hist = Seq((1L, "A", t0, None: Option[Timestamp]))
      .toDF("k", "attr", "valid_from", "valid_to")
    val noChg = hist.limit(0)
    assert(RelationalOps.scd2Apply(hist, noChg, "k", "valid_from", "valid_to")
      .collect().toSet === hist.collect().toSet)

    // randomProject of null/empty embeddings: null in -> null components
    import graft.operators.VectorOps
    val vecs = Seq((1L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val proj = VectorOps.randomProject(vecs, "vec_id", "embedding", rdim = 4)
      .collect()(0)
    assert(proj.isNullAt(1) || proj.getSeq[Any](1).forall(_ == null))

    // bigramNll on an empty corpus: empty out
    assert(graft.operators.CorpusOps.bigramNll(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text").isEmpty)
  }

  test("round-7 operators tolerate degenerate inputs") {
    val kv = Seq((1L, "a", 10L)).toDF("k", "s", "v")
    val emptyKv = kv.limit(0)

    // snapshotDiff: empty old -> all inserts; empty new -> all deletes;
    // both empty -> empty
    assert(RelationalOps.snapshotDiff(emptyKv, kv, Seq("k"), Seq("s", "v"))
      .collect().map(_.getString(1)).toSeq == Seq("I"))
    assert(RelationalOps.snapshotDiff(kv, emptyKv, Seq("k"), Seq("s", "v"))
      .collect().map(_.getString(1)).toSeq == Seq("D"))
    assert(RelationalOps.snapshotDiff(emptyKv, emptyKv, Seq("k"), Seq("s")).isEmpty)

    // mergeAggSnapshot: empty delta -> snapshot unchanged; empty
    // snapshot -> delta passes through
    val snap = Seq(("a", 2L, 30L)).toDF("k", "n", "s")
    val got = RelationalOps.mergeAggSnapshot(snap, snap.limit(0), Seq("k"), Seq("n", "s"))
      .collect()
    assert(got.length == 1 && got.head.getLong(1) == 2L && got.head.getLong(2) == 30L)
    assert(RelationalOps.mergeAggSnapshot(snap.limit(0), snap, Seq("k"), Seq("n", "s"))
      .count() == 1)

    // resampleGapFill: empty input -> empty grid; single event -> one
    // bucket, fill equals the observation
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("user_id", "ts", "c")
    assert(RelationalOps.resampleGapFill(emptyEv, "user_id", "ts", col("c")).isEmpty)
    val oneEv = Seq((7L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 5L))
      .toDF("user_id", "ts", "c")
    val one = RelationalOps.resampleGapFill(oneEv, "user_id", "ts", col("c")).collect()
    assert(one.length == 1 && one.head.getLong(4) == 5L)

    // containmentScores: empty contamination -> every doc scores 0;
    // empty docs -> empty
    val docs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val zero = CorpusOps.containmentScores(docs, docs.limit(0), "doc_id", "text")
      .collect()
    assert(zero.length == 1 && zero.head.getLong(2) == 0L
      && zero.head.getDouble(3) == 0.0)
    assert(CorpusOps.containmentScores(docs.limit(0), docs, "doc_id", "text").isEmpty)

    // standardize: empty corpus -> empty; constant dimension -> z = 0
    // (sigma -> 1 substitution), never NaN/Inf
    val emptyVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(VectorOps.standardize(emptyVecs, "vec_id", "embedding").isEmpty)
    val constVecs = Seq((1L, Seq(3.0f, 1.0f)), (2L, Seq(3.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val z = VectorOps.standardize(constVecs, "vec_id", "embedding")
      .orderBy("vec_id").collect().map(_.getString(1))
    assert(z(0).split(",")(0) == "0" && z(1).split(",")(0) == "0",
      s"constant dim must standardize to 0, got ${z.toSeq}")
  }

  test("round-8 operators tolerate degenerate inputs") {
    import graft.operators.{GraphOps, LayoutOps}
    // pageRank: empty edge list -> empty rank table; a single self-loop
    // converges to the geometric fixpoint of its own mass, no NPE/skew
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(GraphOps.pageRank(emptyEdges, "src", "dst").isEmpty)
    val selfLoop = Seq((7L, 7L)).toDF("src", "dst")
    val r = GraphOps.pageRank(selfLoop, "src", "dst", iters = 1).collect()
    assert(r.length == 1 && r.head.getLong(1) == 150000L + 85L * 1000000L / 100)

    // compactionPlan: empty manifest -> empty plan; one giant file ->
    // one singleton non-merging group
    val emptyStats = Seq.empty[(Long, Long)].toDF("file_id", "n")
    assert(LayoutOps.compactionPlan(emptyStats, "file_id", "n", 100).isEmpty)
    val one = LayoutOps.compactionPlan(
      Seq((0L, 1000L)).toDF("file_id", "n"), "file_id", "n", 100).collect()
    assert(one.length == 1 && !one.head.getAs[Boolean]("merges"))

    // basketRules: empty memberships -> empty rules; a single
    // one-item basket yields no pairs
    val emptyMem = Seq.empty[(Long, Long)].toDF("oid", "item")
    assert(RelationalOps.basketRules(emptyMem, "oid", "item").isEmpty)
    assert(RelationalOps.basketRules(
      Seq((1L, 7L)).toDF("oid", "item"), "oid", "item").isEmpty)

    // constraintAudit over an empty table: zero violations, pass=true
    // on every rule (an empty partition is a valid partition)
    val emptyV = Seq.empty[(Long, Double)].toDF("id", "v")
    val audit = RelationalOps.constraintAudit(emptyV,
      Seq("v_positive" -> (col("v") > 0))).collect()
    assert(audit.length == 1 && audit.head.getLong(1) == 0L
      && audit.head.getBoolean(3))
  }

  test("r12 txn-log APIs tolerate empty and degenerate tables") {
    import graft.sources.TxnLog
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-edge-txn").toString
    TxnLog.init(root)
    // empty table: every read path returns empty, no metadata lies
    assert(TxnLog.read(spark, root).isEmpty)
    val agg = TxnLog.statsAggregate(spark, root, "k").head()
    assert(agg.getLong(0) === 0L && agg.isNullAt(1) && agg.isNullAt(2),
      "empty-table aggregate: count 0, undefined extremes as nulls")
    assert(TxnLog.deleteWhere(spark, root, col("k") > 0, "d0") === None)
    assert(TxnLog.activeConstraints(root) === Map.empty)
    // merge into an EMPTY table is a pure insert
    import spark.implicits._
    val c = TxnLog.mergeInto(spark, root, Seq((1L, 10L)).toDF("k", "v"), "k", "m0")
    assert(c.removed.isEmpty)
    assert(TxnLog.read(spark, root).as[(Long, Long)].collect().toSet === Set((1L, 10L)))
    // single-row table z-orders without degenerate-range crashes
    // (both dims constant -> normalization hits the hi == lo guard)
    TxnLog.optimizeZorder(spark, root, "k", "v", nFiles = 2, txnId = "z0")
    assert(TxnLog.read(spark, root).as[(Long, Long)].collect().toSet === Set((1L, 10L)))
    // point lookup for an absent key on a bloom-less table: empty, no crash
    assert(TxnLog.readPoint(spark, root, "k", 999L).count() === 0L)
  }

  test("integer division truncates toward zero on all parity legs (negatives included)") {
    // The w4_ewma / EwmaPipeline contract: Spark `div`, JVM long `/`,
    // and DuckDB integer `//` all truncate toward zero, so EWMA over
    // NEGATIVE-valued metrics still hashes identically. DuckDB's leg
    // was spot-checked out-of-band (-7 // 2 = -3, not floor's -4);
    // this pins the Spark ↔ JVM leg across signs and divisors.
    val rows = spark.range(-9, 10).selectExpr("id AS n",
      "n div 4 AS q4", "n div -3 AS qm3").collect()
    rows.foreach { r =>
      val n = r.getLong(0)
      assert(r.getLong(1) == n / 4, s"n=$n: Spark div 4 != JVM /")
      assert(r.getLong(2) == n / -3, s"n=$n: Spark div -3 != JVM /")
    }
  }
}
