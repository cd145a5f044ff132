package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps._

class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  test("hashModSample is deterministic, shuffle-free, and near the target rate") {
    val s1 = hashModSample(docs, col("doc_id"), 10).select("doc_id").as[Long].collect().toSet
    val s2 = hashModSample(docs, col("doc_id"), 10).select("doc_id").as[Long].collect().toSet
    assert(s1 === s2, "same sample on every run — no RNG state")
    val rate = s1.size.toDouble / docs.count()
    assert(rate > 0.03 && rate < 0.2, s"rate $rate should be near 10%")
    val plan = hashModSample(docs, col("doc_id"), 10).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "sampling must be a scan-side filter")
  }

  test("perClassCap bounds every class and ranks in hash order") {
    val out = perClassCap(docs, "lang", col("doc_id"), cap = 5)
    val sizes = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ <= 5))
    assert(out.filter(col("rnk") > 5).isEmpty)
  }

  test("vocabTopK counts tokens exactly on a toy corpus") {
    val toy = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val out = vocabTopK(toy, "text", 10).as[(String, Long)].collect().toSeq
    assert(out === Seq(("a", 3L), ("b", 1L), ("c", 1L)))
  }

  test("tfIdf computes tf * ln(N/df) exactly") {
    val toy = Seq((1L, "x x y"), (2L, "x z")).toDF("doc_id", "text")
    val out = tfIdf(toy, "doc_id", "text")
      .as[(Long, String, Long, Double)].collect()
      .map { case (d, term, tf, w) => (d, term) -> ((tf, w)) }.toMap
    assert(out((1L, "x"))._1 === 2L)
    assert(out((1L, "x"))._2 === 0.0)                        // df=2, ln(1)=0
    assert(out((1L, "y")) === ((1L, math.rint(math.log(2.0) * 1e6) / 1e6)))
    assert(out((2L, "z"))._2 === math.rint(math.log(2.0) * 1e6) / 1e6)
  }
}
