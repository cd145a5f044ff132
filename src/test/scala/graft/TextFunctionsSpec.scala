package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "der schnelle braune fuchs und nicht mehr"),
    (3L, ""),
    (4L, "a  b   c"),                      // multi-space
    (5L, "hello, world! 42 tokens?? #tag") // punctuation + digits
  ).toDF("doc_id", "text")

  test("tokens drops empties and nTokens counts them") {
    val got = docs.select(col("doc_id"), nTokens(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) == 9); assert(got(3L) == 0); assert(got(4L) == 3)
  }

  test("langId applies the marker-word ladder deterministically") {
    val got = docs.select(col("doc_id"), langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en"); assert(got(2L) == "de"); assert(got(3L) == "unknown")
  }

  test("quality score is bounded [0,1] and zero-safe on empty docs") {
    val stats = docs.select(qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).head
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) <= 1.0)
  }

  test("fingerprint is order-sensitive and stable") {
    val fp = Seq(("a b c"), ("c b a"), ("a b c")).toDF("text")
      .select(fingerprint(col("text")).as("f")).collect().map(_.getLong(0))
    assert(fp(0) != fp(1), "position weighting must distinguish permutations")
    assert(fp(0) == fp(2), "deterministic")
  }

  test("h7 is non-negative and below 2^28 (portable md5 prefix)") {
    val vals = Tables.documents(spark, sfDir)
      .select(h7(col("text")).as("h")).agg(min("h"), max("h")).head
    assert(vals.getLong(0) >= 0L && vals.getLong(1) < (1L << 28))
  }

  test("redactPii strips emails then phones; piiCount audits pre-redaction hits") {
    val rows = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org or +44-7700-900123 thanks"),
      (2L, "digits 123-456-7890 and an email a@b.io trailing"),
      (3L, "no pii here at all"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = rows.select(col("doc_id"), piiCount(col("text")).as("n"),
        redactPii(col("text")).as("clean"))
      .as[(Long, Int, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((2, "reach me at <EMAIL> or <PHONE> thanks")))
    assert(out(2L) === ((2, "digits <PHONE> and an email <EMAIL> trailing")))
    assert(out(3L) === ((0, "no pii here at all")))
    assert(out(4L) === ((0, "")))
  }

  test("text feature queries stay in whole-stage codegen (no shuffle)") {
    val plan = SparkEntry.queries("txt_quality")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // r20: the one allowed exchange is the scale-adaptive round-robin
    // fan-out (spread — identity on multi-split inputs); per-row
    // features must never HASH-shuffle data
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"per-row features must not shuffle:\n$plan")
  }

  test("txt_reading_level: milli-integer Coleman-Liau matches an " +
       "independent scala replay on every document (r20, X-T15)") {
    import spark.implicits._
    val got = SparkEntry.queries("txt_reading_level")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    assert(docs.nonEmpty && got.size === docs.length)
    docs.foreach { case (id, text) =>
      val letters = text.count(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')).toLong
      val words = text.split(" ").count(_.nonEmpty).toLong
      val sentences = math.max(
        text.count(c => c == '.' || c == '!' || c == '?').toLong, 1L)
      val w = math.max(words, 1L)
      val cli = 588L * (letters * 100000L / w) / 10000L -
        2960L * (sentences * 100000L / w) / 10000L - 15800L
      assert(got(id) === ((id, letters, words, sentences, cli)), s"doc $id")
    }
    // no data shuffle: the row is a per-document projection (the
    // scale-adaptive round-robin fan-out is the one allowed exchange)
    val plan = SparkEntry.queries("txt_reading_level")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"reading level must not shuffle:\n$plan")
  }

  test("charEntropy matches hand-computed Shannon entropy; degenerate inputs score 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world"),       // known: 2.845351 bits/char
      (2L, "aaaa"),              // single symbol -> 0
      (3L, ""),                  // empty -> 0
      (4L, null.asInstanceOf[String]), // null -> 0
      (5L, "ab")                 // two equiprobable symbols -> exactly 1
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        round(graft.functions.TextFunctions.charEntropy(col("text")), 6).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) === 2.845351)
    assert(out(2L) === 0.0 && out(3L) === 0.0 && out(4L) === 0.0)
    assert(out(5L) === 1.0)
    // shuffle-free, like every per-row signal
    val plan = docs.select(graft.functions.TextFunctions.charEntropy(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("native graft_entropy equals the HOF executable spec bit-for-bit") {
    val both = Tables.documents(spark, sfDir).select(
      graft.functions.TextFunctions.charEntropy(col("text")).as("native"),
      graft.functions.TextFunctions.charEntropyHof(col("text")).as("spec"))
    // UNROUNDED comparison: the native kernel must reproduce the HOF
    // float trace exactly (sorted code-point fold, (-p)·ln(p), /ln 2)
    assert(both.filter(col("native") =!= col("spec")).isEmpty,
      "graft_entropy must match charEntropyHof exactly")
    // multibyte coverage: the corpus langs are Latin-heavy, so pin zh
    // text and an astral (surrogate-pair) char explicitly
    import spark.implicits._
    val hard = Seq("中文文本测试", "mixed 中 text", "emoji 😀😀 twice")
      .toDF("text")
    assert(hard.select(
      graft.functions.TextFunctions.charEntropy(col("text")).as("native"),
      graft.functions.TextFunctions.charEntropyHof(col("text")).as("spec"))
      .filter(col("native") =!= col("spec")).isEmpty)
  }

  test("graft_drop_spans validates the WHOLE starts array up front (r20)") {
    import spark.implicits._
    // an unsorted array whose early element exceeds the token count
    // used to slip past the in-sweep check (the sweep never reached
    // it), mis-keeping tokens the later smaller start should cover
    val bad = Seq(("a b c d", Seq(5L, 3L))).toDF("text", "starts")
      .selectExpr("graft_drop_spans(split(text, ' '), starts, 2) AS kept")
    val e = intercept[Exception] { bad.collect() }
    assert((e +: Option(e.getCause).toSeq).exists(c =>
      Option(c.getMessage).exists(_.contains("ascending"))), s"got: $e")
    // negative starts reject too
    val neg = Seq(("a b c d", Seq(-1L))).toDF("text", "starts")
      .selectExpr("graft_drop_spans(split(text, ' '), starts, 2) AS kept")
    val e2 = intercept[Exception] { neg.collect() }
    assert((e2 +: Option(e2.getCause).toSeq).exists(c =>
      Option(c.getMessage).exists(_.contains("non-negative"))), s"got: $e2")
    // a sorted out-of-range start is legal (covers nothing past n)
    assert(Seq(("a b c d", Seq(3L, 9L))).toDF("text", "starts")
      .selectExpr("graft_drop_spans(split(text, ' '), starts, 2) AS kept")
      .as[Seq[String]].head === Seq("a", "b", "c"))
  }
}
