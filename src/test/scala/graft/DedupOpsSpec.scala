package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupOps._

class DedupOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content about spark engines and scale"),
    (4L, "The quick, brown fox jumps over the lazy dog!"), // 1 up to case/punct
    (5L, "hi")                                             // shorter than shingle width
  ).toDF("doc_id", "text")

  test("shingles are word 3-grams with whole-doc fallback for short texts") {
    val out = corpus.select(col("doc_id"), shingles(col("text")).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L).head === "the quick brown")
    assert(out(1L).length === 7) // 9 tokens -> 7 shingles
    assert(out(5L) === Seq("hi"))
  }

  test("minhash signatures: equal docs agree fully, near-dups mostly, distinct docs differ") {
    val sig = corpus.select(col("doc_id"), minhashSignature(col("text")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sig(1L).length === 16)
    assert(sig.values.forall(_.forall(v => v >= 0 && v < MinhashPrime)))
    def agree(a: Seq[Long], b: Seq[Long]): Int = a.zip(b).count { case (x, y) => x == y }
    assert(agree(sig(1L), sig(1L)) === 16)
    // docs 1 and 2 share 6 of 8 distinct shingles; expect most components equal
    assert(agree(sig(1L), sig(2L)) >= 8)
    assert(agree(sig(1L), sig(3L)) <= 4)
  }

  test("lshCandidatePairs surfaces the near-dup pair and skips unrelated docs") {
    val pairs = lshCandidatePairs(corpus, "doc_id", "text")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("lshCandidatePairsCapped: subset of uncapped, identical under-cap, " +
       "bounded on a dup-heavy group, downstream prune still complete (r19)") {
    // cap < 1 rejects loudly (r20): it would filter every banded row
    // and silently emit zero candidates — the prune would keep all dups
    intercept[IllegalArgumentException] {
      lshCandidatePairsCapped(corpus, "doc_id", "text", bucketCap = 0)
    }
    // under the cap, the capped spelling IS the uncapped one
    val capped = lshCandidatePairsCapped(corpus, "doc_id", "text", bucketCap = 32)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val uncapped = lshCandidatePairs(corpus, "doc_id", "text")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(capped === uncapped, "no over-full bucket => no behavior change")
    // dup-heavy group: 40 identical docs + 3 unique. Uncapped fans out
    // 40·39/2 = 780 pairs for the group; cap 8 bounds candidates by
    // bands·cap²/2 while the keep-one election still prunes EVERY
    // duplicate (survivors of over-full buckets merge the component).
    val heavy = ((1L to 40L).map(i => (i, "the same boilerplate header repeated " +
        "across every crawled page of this site")) ++ Seq(
        (100L, "completely different content about spark engines and scale"),
        (101L, "another unique document with its own words entirely"),
        (102L, "a third singleton nothing shares any shingle with"))).toDF("doc_id", "text")
    val cappedHeavy = lshCandidatePairsCapped(heavy, "doc_id", "text", bucketCap = 8)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(cappedHeavy === cappedHeavy.filter(p => p._1 <= 40L && p._2 <= 40L),
      "singletons must stay out of the dup group's buckets")
    assert(cappedHeavy.size === 8 * 7 / 2,
      s"identical docs rank identically in every band: cap 8 keeps the same 8 " +
        s"members, 28 pairs, got ${cappedHeavy.size}")
    assert(lshCandidatePairs(heavy, "doc_id", "text").count() === 780L)
    // RECALL NOTE (the documented cap trade, same as cur_embed_prune):
    // pairs only form among in-cap members, so the keep-one election
    // collapses those 8 to ONE survivor, while over-cap members carry
    // no edge and escape the prune — recall loss is confined to
    // over-full buckets, whose members are near-dups of each other;
    // in-cap survivors still merge the component.
    val clustered = graft.operators.GraphOps.dedupClusters(
        lshCandidatePairsCapped(heavy, "doc_id", "text", bucketCap = 8))
      .select(col("doc_id"), col("is_kept")).as[(Long, Boolean)].collect().toMap
    assert(clustered.size === 8 && clustered.values.count(identity) === 1,
      "the in-cap members elect exactly one survivor")
  }

  test("lshCandidatePairsCappedStar: bounded like the cap, but the keep-one " +
       "election collapses the WHOLE dup group (r19)") {
    // under the cap, star == capped == uncapped
    val star32 = lshCandidatePairsCappedStar(corpus, "doc_id", "text", bucketCap = 32)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(star32 === lshCandidatePairs(corpus, "doc_id", "text")
      .select("d1", "d2").as[(Long, Long)].collect().toSet)
    // dup-heavy: 40 identical docs + 3 singletons, cap 8
    val heavy = ((1L to 40L).map(i => (i, "the same boilerplate header repeated " +
        "across every crawled page of this site")) ++ Seq(
        (100L, "completely different content about spark engines and scale"),
        (101L, "another unique document with its own words entirely"),
        (102L, "a third singleton nothing shares any shingle with"))).toDF("doc_id", "text")
    val starHeavy = lshCandidatePairsCappedStar(heavy, "doc_id", "text", bucketCap = 8)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val uncapped = lshCandidatePairs(heavy, "doc_id", "text")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(starHeavy.subsetOf(uncapped),
      "star never invents a candidate — every pair is a real banded collision")
    assert(starHeavy.size === 8 * 7 / 2 + 32,
      s"in-cap all-pairs (28) + one star edge per over-cap member (32), got ${starHeavy.size}")
    // the property the cap alone cannot give: ALL 40 dups collapse
    val clustered = graft.operators.GraphOps.dedupClusters(
        lshCandidatePairsCappedStar(heavy, "doc_id", "text", bucketCap = 8))
      .select(col("doc_id"), col("is_kept")).as[(Long, Boolean)].collect().toMap
    assert(clustered.size === 40 && clustered.values.count(identity) === 1,
      "every dup-group member carries an edge: the election keeps exactly one of 40")
  }

  test("incrementalDedup flags batch docs colliding with the corpus band index") {
    val existing = corpus // docs 1..5
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
      (11L, "the quick brown fox jumps over the lazy cat"),   // = 2 (and near 1)
      (12L, "novel text with entirely fresh vocabulary here") // no collision
    ).toDF("doc_id", "text")
    val out = incrementalDedup(bandIndex(existing, "doc_id", "text"),
      batch, "doc_id", "text")
      .as[(Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet === Set(10L, 11L, 12L)) // one verdict per batch doc
    assert(out(10L) === ((Some(1L), false)))  // min colliding existing id
    assert(out(11L)._2 === false)
    assert(out(12L) === ((None, true)))
    // agreement with the full-corpus candidate rule: a batch doc is
    // dropped iff lshCandidatePairs over existing+batch pairs it with
    // an existing doc
    val pairs = lshCandidatePairs(existing.union(batch), "doc_id", "text")
      .select("d1", "d2").as[(Long, Long)].collect()
    val batchIds = Set(10L, 11L, 12L)
    val collided = pairs.collect {
      case (a, b) if batchIds(b) && !batchIds(a) => b
      case (a, b) if batchIds(a) && !batchIds(b) => a
    }.toSet
    assert(out.filter(!_._2._2).keySet === collided)
  }

  test("simhash: near-dups are close in hamming distance, unrelated docs are not") {
    val sh = corpus.select(col("doc_id"), simhash(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(sh.values.forall(v => v >= 0 && v < (1L << 28)))
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)))
    // empty text hashes to 0 deterministically
    val empty = Seq((9L, "")).toDF("doc_id", "text")
      .select(simhash(col("text"))).as[Long].head()
    assert(empty === 0L)
  }

  test("ngramJaccardPairs computes the textbook set Jaccard") {
    val pairs = ngramJaccardPairs(corpus, "doc_id", "text", minJaccard = 0.1)
      .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    // docs 1,2: 7 shingles each, 6 common -> 6 / (7+7-6) = 0.75
    assert(pairs((1L, 2L)) === 0.75)
    assert(!pairs.contains((1L, 3L)))
  }

  test("ngramJaccardPairsCapped drops stop-shingle fan-out, matches textbook under a loose cap") {
    // salt every doc with the same leading stop-phrase: its shingles
    // appear in all 30 docs and would alone connect every pair
    val salted = (1L to 30L).map(i =>
      (i, s"common header boilerplate text distinct body $i about topic $i"))
      .toDF("doc_id", "text")
    val uncapped = ngramJaccardPairs(salted, "doc_id", "text", minJaccard = 0.2)
      .count()
    val capped = ngramJaccardPairsCapped(salted, "doc_id", "text",
      minJaccard = 0.2, dfCap = 10).count()
    assert(uncapped === 30L * 29 / 2, "stop-shingles connect every pair uncapped")
    assert(capped === 0, "capped variant drops the df=30 stop-shingles")
    // loose cap ⇒ bit-identical to the textbook definition
    val textbook = ngramJaccardPairs(corpus, "doc_id", "text", minJaccard = 0.1)
      .as[(Long, Long, Double)].collect().toSet
    val loose = ngramJaccardPairsCapped(corpus, "doc_id", "text",
      minJaccard = 0.1, dfCap = 1000).as[(Long, Long, Double)].collect().toSet
    assert(loose === textbook)
  }

  test("exactDedupSummary collapses case/punctuation variants, keeps min id") {
    val out = exactDedupSummary(corpus, "doc_id", "text")
      .select("kept_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L))) // docs 1 and 4 normalize identically
    assert(out.count(_ => true) === 4)
  }

  test("native minhash/shingles match the HOF executable spec bit-for-bit") {
    // Edge cases the byte-level tokenizer must get right: multi-space
    // runs, leading/trailing spaces, empty doc, sub-shingle doc,
    // multibyte UTF-8, and exactly-n tokens.
    val edge = (corpus.as[(Long, String)].collect().toSeq ++ Seq(
      (10L, ""),
      (11L, "   "),
      (12L, "a  b   cد and déjà vu ünïcode"),
      (13L, " leading and trailing  "),
      (14L, "one two three"),
      (15L, "αβγ δεζ ηθι κλμ")
    )).toDF("doc_id", "text")
    val rows = edge.select(
      shingles(col("text")).as("sh_native"),
      shinglesHof(col("text")).as("sh_hof"),
      minhashSignature(col("text")).as("mh_native"),
      minhashSignatureHof(col("text")).as("mh_hof"),
      minhashSignature(col("text"), numHashes = 5, n = 2).as("mh5_native"),
      minhashSignatureHof(col("text"), numHashes = 5, n = 2).as("mh5_hof")
    ).as[(Seq[String], Seq[String], Seq[Long], Seq[Long], Seq[Long], Seq[Long])]
      .collect()
    rows.foreach { case (sn, sh, mn, mh, m5n, m5h) =>
      assert(sn === sh)
      assert(mn === mh)
      assert(m5n === m5h)
    }
    val simRows = edge.select(
      simhash(col("text")).as("s_native"),
      simhashHof(col("text")).as("s_hof"),
      simhash(col("text"), bits = 12).as("s12_native"),
      simhashHof(col("text"), bits = 12).as("s12_hof")
    ).as[(Long, Long, Long, Long)].collect()
    simRows.foreach { case (sn, sh, s12n, s12h) =>
      assert(sn === sh)
      assert(s12n === s12h)
    }
  }

  test("signature computation stays shuffle-free (scan-side expressions only)") {
    val plan = corpus.select(minhashSignature(col("text")), simhash(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("simhashPairs is COMPLETE: banding finds every pair within the Hamming budget") {
    // pigeonhole guarantee, checked against the O(n²) ground truth
    val docs = Tables.documents(spark, sfDir)
    val f = docs.select(col("doc_id"), simhash(col("text")).as("sh"))
    val brute = f.alias("a")
      .join(f.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .filter(col("hamming") <= 3)
    val banded = simhashPairs(docs, "doc_id", "text")
    assert(banded.exceptAll(brute).isEmpty && brute.exceptAll(banded).isEmpty,
      "banded pairs must equal the brute-force Hamming pairs exactly")
  }

  test("dupSpans counts cross-doc duplicated token windows, not intra-doc repeats") {
    // docs 1 and 2 are 9 tokens each -> two 8-token windows; they share
    // exactly the first window ("the ... lazy"), so each has 1 of 2
    // spans duplicated. doc 5 is shorter than the window -> one
    // whole-doc span, unique. doc 3 is unique throughout.
    val out = dupSpans(corpus, "doc_id", "text", window = 8, minDocs = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L), "every doc gets a profile")
    assert(out(1L) === ((2L, 1L, 500000L)))
    assert(out(2L) === ((2L, 1L, 500000L)))
    assert(out(3L)._2 === 0L && out(5L) === ((1L, 0L, 0L)))
    // a doc REPEATING its own span corpus-uniquely is NOT duplication
    // (spans are distinct per doc before the df count)
    val rep = Seq((7L, "a b c d e f g h a b c d e f g h")).toDF("doc_id", "text")
    val repOut = dupSpans(corpus.unionByName(rep), "doc_id", "text")
      .filter(col("doc_id") === 7L)
      .as[(Long, Long, Long, Long)].head()
    assert(repOut._3 === 0L, "self-repeated spans with no other doc stay non-dup")
  }

  test("dropDupSpans rewrites docs dropping maximal duplicated spans; " +
       "re-profiling the rewritten corpus finds zero above-threshold spans (r19)") {
    val docs = Seq(
      (1L, "alpha beta x1 x2 x3 x4 gamma delta epsilon"),
      (2L, "p q r x1 x2 x3 x4 s t u v"),       // shares the 4-token block with 1
      (3L, "totally unique content with no duplication at all whatsoever"),
      (4L, "same tiny"),                        // whole-doc dup of 5 (< window)
      (5L, "same tiny")
    ).toDF("doc_id", "text")
    val out = dropDupSpans(docs, "doc_id", "text", window = 3, minDocs = 2)
      .select("doc_id", "text_clean", "n_tokens", "n_dropped")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // adjacent duplicated windows (p and p+1) merged into ONE maximal
    // span covering all 4 shared tokens — the Lee et al. removal
    assert(out(1L) === (("alpha beta gamma delta epsilon", 9L, 4L)))
    assert(out(2L) === (("p q r s t u v", 11L, 4L)))
    // untouched doc passes through verbatim
    assert(out(3L)._1 === "totally unique content with no duplication at all whatsoever"
      && out(3L)._3 === 0L)
    // whole-doc fallback: a short doc duplicated verbatim empties
    assert(out(4L) === (("", 2L, 2L)) && out(5L) === (("", 2L, 2L)))
    // the done-criterion pin: re-profiling the rewritten (non-empty)
    // corpus finds ZERO above-threshold duplicated spans
    val rewritten = dropDupSpans(docs, "doc_id", "text", window = 3, minDocs = 2)
      .filter(length(col("text_clean")) > 0)
      .select(col("doc_id"), col("text_clean").as("text"))
    val reprofile = dupSpans(rewritten, "doc_id", "text", window = 3, minDocs = 2)
      .agg(max(col("n_dup_spans"))).head.getLong(0)
    assert(reprofile === 0L,
      "the rewritten corpus must profile clean at the same threshold")
  }

  test("decontaminateFuzzy drops estimated-similar docs, keeps disjoint ones; threshold bites") {
    import spark.implicits._
    val bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, bench), // IS the benchmark doc: agree 16/16, dropped
      (2L, bench), // verbatim copy: dropped
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // 1-word paraphrase
      (4L, "totally different words about other things entirely here now"))
      .toDF("doc_id", "text")
    val contam = docs.filter(col("doc_id") === 1L)
    val kept = graft.operators.DedupOps.decontaminateFuzzy(docs, contam, "doc_id", "text",
      minAgreeMicro = 500000L).select("doc_id").as[Long].collect().toSet
    assert(!kept(1L) && !kept(2L), "exact matches must drop")
    assert(!kept(3L), "the one-word paraphrase shares most shingles — fuzzy catches it")
    assert(kept(4L), "disjoint vocabulary survives")
    // a near-exact threshold keeps the paraphrase and still drops copies
    val strict = graft.operators.DedupOps.decontaminateFuzzy(docs, contam, "doc_id", "text",
      minAgreeMicro = 999999L).select("doc_id").as[Long].collect().toSet
    assert(strict === Set(3L, 4L), s"strict threshold: got $strict")
  }
}
