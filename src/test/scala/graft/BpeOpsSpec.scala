package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.BpePortable
import graft.operators.BpeOps

/** Merge-table BPE (X-T14): Sennrich training on the weighted vocab
  * aggregate, the `{sym}` representation contract, and the native
  * `graft_bpe` encode — hand-checked against the textbook example and
  * the scan-merge edge cases the SQL replay depends on.
  */
class BpeOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "hug hug hug"),
    (2L, "pug pug"),
    (3L, "hugs")
  ).toDF("doc_id", "text")

  test("trainMerges reproduces the textbook Sennrich rounds, deterministically") {
    val merges = BpeOps.trainMerges(corpus, col("text"), numMerges = 4)
    // weighted pair counts: (u,g)=6 > (h,u)=4 > (p,u)=2 > (g,s)=1,
    // then each merge re-counts — the classic hug/pug/hugs trace
    assert(merges === Seq("u g", "h ug", "p ug", "hug s"))
    assert(BpeOps.trainMerges(corpus, col("text"), numMerges = 4) === merges,
      "training must be deterministic")
    // training dries up when no pairs remain (every word one symbol)
    assert(BpeOps.trainMerges(corpus, col("text"), numMerges = 100).size <= 8)
  }

  test("encodeWord: apply_bpe rank-restart order and the scan-merge edge cases") {
    def enc(w: String, merges: Seq[String]): Seq[String] = {
      val ns = merges.map { m => val Array(a, b) = m.split(" "); "{" + a + "}{" + b + "}" }
      val rs = merges.map { m => val Array(a, b) = m.split(" "); "{" + a + b + "}" }
      BpePortable.encodeWord(w, ns.toArray, rs.toArray).toSeq
    }
    val merges = Seq("u g", "h ug", "p ug", "hug s")
    assert(enc("hugs", merges) === Seq("hugs"))
    // unseen word; rule 3 fires only after the restart re-reaches it
    assert(enc("pugs", merges) === Seq("pug", "s"))
    assert(enc("zz", merges) === Seq("z", "z"), "no applicable rule: chars stay")
    // left-to-right non-overlapping scan under a self-pair rule — the
    // exact String.replace/DuckDB-replace() semantics the SQL replay
    // shares: aaaa -> aa aa, aaa -> aa a
    assert(enc("aaaa", Seq("a a")) === Seq("aa", "aa"))
    assert(enc("aaa", Seq("a a")) === Seq("aa", "a"))
    // a later merge exposing an EARLIER-rank pair re-fires it
    assert(enc("xyz", Seq("x yz", "y z")) === Seq("xyz"))
  }

  test("graft_bpe column: encodes per word in order, reconstructs exactly, " +
       "counts feed packing") {
    val merges = BpeOps.trainMerges(corpus, col("text"), numMerges = 4)
    val out = corpus.select(col("doc_id"),
        BpeOps.bpeTokens(col("text"), merges).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) === Seq("hug", "hug", "hug"))
    assert(out(2L) === Seq("pug", "pug"))
    assert(out(3L) === Seq("hugs"))
    // lossless: concatenating a word's subwords reproduces the word
    val round = corpus.select(
        array_join(BpeOps.bpeTokens(col("text"), merges), "").as("r"),
        regexp_replace(col("text"), " ", "").as("w"))
      .as[(String, String)].collect()
    assert(round.forall { case (r, w) => r == w })
    // empty text encodes to zero tokens (the packing rows rely on it)
    val empty = Seq((9L, "")).toDF("doc_id", "text")
      .select(size(BpeOps.bpeTokens(col("text"), merges))).head.getInt(0)
    assert(empty === 0)
  }

  test("PRODUCTION merge count (r20): training sustains 1,024 merges on a " +
       "salted vocab; the native encode matches a pure Spark-SQL HOF twin " +
       "bit for bit at 1,024 rules") {
    // salted fixture corpus + a hex-diversity frame: per-copy token
    // suffixes alone leave the top-2048 vocab too SHAREABLE (every
    // merge creates one new symbol, so training dries when the shared
    // merge forest is spanned — measured 216 rounds); md5-derived
    // 16-char words have near-disjoint merge trees, so the combined
    // vocab sustains well past 1,024 distinct merges, at real-corpus
    // word statistics for the parity sample
    val salted = (0 until 4).map { i =>
      Tables.documents(spark, sfDir).select(
        graft.operators.DedupOps.normalizeText(
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("x" + i))), " ")).as("text"))
    }.reduce(_ union _)
    val hexFrame = spark.range(0, 400).selectExpr(
      "trim(repeat(concat(substr(md5(string(id)), 1, 16), ' '), 8)) AS text")
    val corpus1k = salted.unionByName(hexFrame)
    val merges = BpeOps.trainMerges(corpus1k, col("text"),
      numMerges = 1024, vocabSize = 2048)
    assert(merges.size === 1024,
      s"the salted vocab must sustain 1,024 merges (got ${merges.size})")
    assert(merges.distinct.size === 1024, "merge rules must be distinct")

    // HOF twin — the minhashSignatureHof pattern: the SAME algorithm
    // (rank-restart, replace-all-occurrences) spelled entirely in
    // Spark SQL string/array functions, sharing no code with the
    // native kernel. Restart rounds are bounded by the word's length
    // (each effective round merges >= 1 occurrence, so a word of n
    // chars applies at most n-1 merges; surplus rounds are no-ops).
    val rules = typedlit(merges.map { m =>
      val Array(a, b) = m.split(" ")
      ("{" + a + "}{" + b + "}", "{" + a + b + "}")
    })
    def encodeHof(w: Column): Column = {
      val repr0 = concat(lit("{"), array_join(split(w, ""), "}{"), lit("}"))
      val enc = aggregate(
        split(w, ""), // one restart round per char
        repr0,
        (acc, _) => {
          val hit = try_element_at(
            filter(rules, s => contains(acc, s.getField("_1"))), lit(1))
          when(hit.isNull, acc)
            .otherwise(replace(acc, hit.getField("_1"), hit.getField("_2")))
        })
      split(regexp_replace(enc, "^\\{|\\}$", ""), "\\}\\{")
    }
    // distinct-word sample: the HOF pays O(rules × len²) interpreted
    // work per word, so parity runs on words, not whole documents
    val words = corpus1k
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
      .orderBy(abs(hash(col("w")))).limit(300)
    val both = words.select(col("w"),
        BpeOps.bpeTokens(col("w"), merges).as("native"),
        encodeHof(col("w")).as("hof"))
      .as[(String, Seq[String], Seq[String])].collect()
    val bad = both.filter { case (_, n, h) => n != h }
    assert(bad.isEmpty,
      s"native/HOF encode diverge at 1,024 merges: ${bad.take(3).toSeq}")
    // the sample genuinely exercises the deep table: only multi-level
    // merges build long subwords, so the parity above is not a parity
    // of no-ops
    assert(both.exists { case (_, n, _) => n.exists(_.length > 4) },
      "sample must exercise multi-level merges")
    // losslessness still holds at production scale, on full documents
    val round = salted.limit(200).select(
        array_join(BpeOps.bpeTokens(col("text"), merges), "").as("r"),
        regexp_replace(col("text"), " ", "").as("t"))
      .as[(String, String)].collect()
    assert(round.forall { case (r, t) => r == t })
  }
}
