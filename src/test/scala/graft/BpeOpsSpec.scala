package graft

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
}
