package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.operators.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Streaming ingest dedup — the streaming twin of `dd_incremental`
  * (reference S-6 is the PK version, `main.py:77`): every micro-batch
  * of incoming documents is checked against the PERSISTED band index
  * (original corpus + previously KEPT ingests) via
  * [[DedupOps.incrementalDedup]] inside `foreachBatch`; kept docs
  * append their band keys back to the index, so batch N+1 dedups
  * against batch N without ever re-scanning the corpus. That loop —
  * per-batch signature work, append-only index, corpus untouched — is
  * the only near-dup ingest shape that survives 100 TB.
  */
class StreamingIngestDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("micro-batches dedup against the persisted index and against earlier batches") {
    val root = Files.createTempDirectory("graft-ingest-dedup").toString
    val (srcDir, chkDir, idxDir, verdictDir) =
      (s"$root/src", s"$root/chk", s"$root/idx", s"$root/verdict")
    Files.createDirectories(Paths.get(srcDir))

    val corpusText1 = "alpha beta gamma delta epsilon zeta eta theta"
    val corpusText2 = "one two three four five six seven eight"
    val novelText1 = "completely different words appear in this sentence here"
    val novelText2 = "yet another disjoint vocabulary forms this final document"
    val corpus = Seq((1L, corpusText1), (2L, corpusText2)).toDF("doc_id", "text")
    DedupOps.bandIndex(corpus, "doc_id", "text").write.mode("overwrite").parquet(idxDir)

    val schema = new StructType().add("doc_id", LongType).add("text", StringType)
    def writeBatch(name: String, docs: Seq[(Long, String)]): Unit = {
      val lines = docs.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
      Files.write(Paths.get(srcDir, name), String.join("\n", lines: _*).getBytes)
    }

    val q = spark.readStream.schema(schema).json(srcDir)
      .writeStream.option("checkpointLocation", chkDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val index = batch.sparkSession.read.parquet(idxDir)
          val verdict = DedupOps.incrementalDedup(index, batch, "doc_id", "text")
            .withColumn("batch_id", lit(batchId))
          verdict.write.mode("append").parquet(verdictDir)
          val kept = batch.join(
            verdict.filter(col("is_kept")).select("doc_id"), Seq("doc_id"))
          // kept docs join the index so later batches dedup against them
          DedupOps.bandIndex(kept, "doc_id", "text")
            .write.mode("append").parquet(idxDir)
        }
      }
      .start()

    // batch 1: doc 10 duplicates corpus doc 1; doc 11 is novel
    writeBatch("a.json", Seq((10L, corpusText1), (11L, novelText1)))
    q.processAllAvailable()
    // batch 2: doc 20 duplicates doc 11 (kept only one batch ago);
    // doc 21 is novel
    writeBatch("b.json", Seq((20L, novelText1), (21L, novelText2)))
    q.processAllAvailable()
    q.stop()

    val verdicts = spark.read.parquet(verdictDir)
      .select("doc_id", "dup_of", "is_kept").collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getBoolean(2)))).toMap
    assert(verdicts(10L) === ((Some(1L), false)), "dup of the original corpus")
    assert(verdicts(11L) === ((None, true)), "novel doc is kept")
    assert(verdicts(20L) === ((Some(11L), false)),
      "dup of a doc kept in the PREVIOUS micro-batch — the index append closed the loop")
    assert(verdicts(21L) === ((None, true)))

    // the index now carries corpus + both kept ingests, nothing else
    val indexed = spark.read.parquet(idxDir)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(indexed === Set(1L, 2L, 11L, 21L))
  }

  /** The "batch twin" claim made bit-exact (r9 verdict gap #3):
    * [[graft.operators.RelationalOps.dedupWithinDelay]] must keep the
    * SAME rows the real streaming `dropDuplicatesWithinWatermark`
    * keeps on one keyed multi-epoch feed — the FMGS↔TWS treatment
    * applied to the batch/stream dedup pair.
    *
    * Feed design (delay = 10 s): duplicates INSIDE the horizon in the
    * same and in a LATER micro-batch (both dropped), re-arrivals
    * after the watermark evicted the key's state (kept, state rebuilt
    * — the bounded-state contract), and a key whose state expiry is
    * still ahead of the watermark at re-arrival (dropped). Each batch
    * carries at most one row per key and every key's event times are
    * strictly increasing across batches, so the stream's kept set is
    * fully determined by batch sequence — no reliance on intra-batch
    * arrival order, which `dropDuplicatesWithinWatermark` does not
    * contract. No event ever falls below the current watermark (a
    * late row would be discarded by the watermark operator before the
    * dedup ever saw it — a divergence by construction, not a dedup
    * disagreement).
    */
  test("dedupWithinDelay is bit-exact with streaming dropDuplicatesWithinWatermark") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    case class Ev(key: String, ts: java.sql.Timestamp, id: Long)
    // Per-micro-batch epochs; the watermark DURING batch N is
    // max(event time through batch N−1) − 10 s. Re-arrivals are
    // placed one full batch after the watermark passes the key's
    // state expiry: whether the exec evicts expired entries before or
    // after processing a batch's own rows is an implementation
    // detail, and only the batch-later arrival is unambiguous under
    // both orders (the API contracts "within delay: dropped for
    // sure"; beyond it, "may or may not" — the twin must sit in the
    // region where the answer is determined).
    val epochs = Seq(
      // b1: first arrivals — kept
      Seq(Ev("A", ts(1), 1L), Ev("B", ts(2), 2L)),
      // b2 (wm −8 s): A/B dups inside the horizon — dropped; C
      // advances the post-batch watermark to 30 s, past A's (11 s)
      // and B's (12 s) state expiry
      Seq(Ev("A", ts(5), 3L), Ev("B", ts(4), 4L), Ev("C", ts(40), 5L)),
      // b3 (wm 30 s): fresh key D keeps data flowing while the 30 s
      // watermark evicts A's and B's expired state this batch
      Seq(Ev("D", ts(41), 6L)),
      // b4 (wm 31 s): A and B re-arrive past their evicted state —
      // kept, state rebuilt (the bounded-state contract)
      Seq(Ev("A", ts(42), 7L), Ev("B", ts(43), 8L)),
      // b5 (wm 33 s): A dup back inside the NEW horizon
      // (42+10 = 52 s > 45 s, watermark 33 s < 52 s) — dropped
      Seq(Ev("A", ts(45), 9L)))

    val ms = MemoryStream[(String, java.sql.Timestamp, Long)]
    val q = ms.toDS().toDF("key", "ts", "id")
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("key")
      .writeStream.format("memory").queryName("dedup_wm_parity")
      .outputMode("append").start()
    try {
      epochs.foreach { b =>
        ms.addData(b.map(e => (e.key, e.ts, e.id))); q.processAllAvailable()
      }
    } finally q.stop()
    val streamKept = spark.table("dedup_wm_parity")
      .select("key", "ts", "id").as[(String, java.sql.Timestamp, Long)]
      .collect().toSet

    val batch = epochs.flatten.map(e => (e.key, e.ts, e.id)).toDF("key", "ts", "id")
    val batchKept = graft.operators.RelationalOps
      .dedupWithinDelay(batch, Seq("key"), "ts", Seq("id"), delayMicros = 10000000L)
      .select("key", "ts", "id").as[(String, java.sql.Timestamp, Long)]
      .collect().toSet

    assert(streamKept === batchKept,
      s"stream kept $streamKept but the batch twin kept $batchKept")
    // and the set is the one the feed design predicts
    assert(batchKept.map(_._3) === Set(1L, 2L, 5L, 6L, 7L, 8L))
  }
}
