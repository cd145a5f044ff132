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
}
