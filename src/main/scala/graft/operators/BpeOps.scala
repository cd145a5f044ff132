package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BpePortable

/** Driver-side BPE merge-table training (Sennrich et al. 2016) over a
  * DISTRIBUTED vocabulary aggregate — the 100 TB shape: the cluster
  * reduces the corpus to (word, count) with a map-side-combined
  * groupBy and ships only the top `vocabSize` rows to the driver
  * (orderBy+limit = distributed top-k, like the IVF codebooks), so
  * driver state is a bounded artifact regardless of corpus size.
  * Training then runs `numMerges` exact Sennrich rounds on that
  * weighted vocabulary: count adjacent symbol pairs (every occurrence,
  * weighted by word frequency), merge the argmax pair everywhere,
  * repeat. Ties break (count DESC, a ASC, b ASC) so the table is
  * DETERMINISTIC — the DuckDB oracle replays the same rounds in SQL
  * and lands the identical table.
  *
  * Input text must be pre-normalized ([[DedupOps.normalizeText]]):
  * the `{sym}` representation contract ([[BpePortable]]) requires
  * brace-free symbols.
  */
object BpeOps {

  /** Train: rank-ordered merge rules as "a b" strings (the format
    * [[graft.functions.BpeTokens]] consumes). Stops early if the
    * vocabulary runs out of pairs.
    */
  def trainMerges(docs: DataFrame, textCol: Column, numMerges: Int = 16,
                  vocabSize: Int = 2048): Seq[String] = {
    require(numMerges >= 1 && vocabSize >= 1)
    val vocab: Array[(String, Long)] = RelationalOps.spread(docs)
      .select(explode(split(textCol, " ")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w").asc)
      .limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    var words: Array[(String, Long)] =
      vocab.map { case (w, c) => (BpePortable.repr(w), c) }
    val merges = Seq.newBuilder[String]
    var round = 0
    var dry = false
    while (round < numMerges && !dry) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (r, c) =>
        if (r.length > 2) {
          val syms = r.substring(1, r.length - 1).split("\\}\\{", -1)
          var i = 0
          while (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            counts.update(k, counts.getOrElse(k, 0L) + c)
            i += 1
          }
        }
      }
      if (counts.isEmpty) dry = true
      else {
        val ((a, b), _) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        merges += s"$a $b"
        words = words.map { case (r, c) => (BpePortable.applyMerge(r, a, b), c) }
        round += 1
      }
    }
    merges.result()
  }

  /** The document's BPE subword tokens under `merges` — thin column
    * wrapper over the native `graft_bpe` expression.
    */
  def bpeTokens(text: Column, merges: Seq[String]): Column =
    call_function("graft_bpe", text, typedlit(merges))
}
