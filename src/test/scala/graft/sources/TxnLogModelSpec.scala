package graft.sources

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** MODEL-BASED check of the transaction layer: random sequences of
  * table operations (append, keyed merge, row delete, compaction,
  * z-order rewrite, checkpoint) run against BOTH the [[TxnLog]] table
  * and a trivial in-memory `Map[key, value]` model; after every
  * operation the table must equal the model, and at the end every
  * intermediate version must time-travel back to its recorded model
  * state. Fixed seeds keep CI deterministic while the sequences
  * exercise interleavings no hand-written scenario covers (delete of
  * a just-merged key, compaction over a DV'd file, merge after
  * z-order, empty-result deletes between checkpoints).
  */
class TxnLogModelSpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private sealed trait Op
  private case class Append(rows: Map[Long, Long]) extends Op
  private case class Merge(rows: Map[Long, Long]) extends Op
  private case class Delete(mod: Long, rem: Long) extends Op
  private case object Compact extends Op
  private case object Zorder extends Op
  private case object Checkpoint extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> (for {
      n <- Gen.choose(1, 12)
      ks <- Gen.listOfN(n, Gen.choose(0L, 400L))
      v <- Gen.choose(1L, 1000L)
    } yield Merge(ks.map(k => k -> (v + k)).toMap)),
    2 -> (for {
      n <- Gen.choose(1, 8)
      base <- Gen.choose(1000L, 5000L)
      v <- Gen.choose(1L, 1000L)
    } yield Append((0 until n).map(i => (base * 10 + i) -> v).toMap)),
    2 -> (for {
      mod <- Gen.choose(2L, 7L)
      rem <- Gen.choose(0L, 6L)
    } yield Delete(mod, rem % mod)),
    1 -> Gen.const(Compact),
    1 -> Gen.const(Zorder),
    1 -> Gen.const(Checkpoint))

  private def tableRows(root: String, v: Long = Long.MaxValue): Map[Long, Long] = {
    val df = TxnLog.read(spark, root, v)
    // a version whose snapshot holds no files is the schemaless empty
    // frame — the model equivalent of the empty map
    if (df.columns.isEmpty) Map.empty
    else df.as[(Long, Long)].collect().toMap
  }

  test("random op sequences: the table tracks the model at every step, and every version travels back") {
    for (seed <- 1L to 3L) {
      val root = java.nio.file.Files.createTempDirectory(s"graft-model-$seed").toString
      TxnLog.init(root)
      var model = Map.empty[Long, Long]
      // version -> expected state, for the time-travel sweep at the end
      val history = scala.collection.mutable.Map.empty[Long, Map[Long, Long]]
      val ops = sample(Gen.listOfN(8, opGen), seed)
      ops.zipWithIndex.foreach { case (op, i) =>
        op match {
          case Append(rows) =>
            // appended keys are drawn from a disjoint range, so the
            // append never violates the merge key-uniqueness contract
            val files = TxnLog.stage(rows.toSeq.toDF("k", "v"), root, s"ap$i")
            TxnLog.commit(root, "append", files, Nil,
              readVersion = TxnLog.currentVersion(root), txnId = s"ap$i")
            model = model ++ rows
          case Merge(rows) =>
            TxnLog.mergeInto(spark, root, rows.toSeq.toDF("k", "v"), "k", s"mg$i")
            model = model ++ rows
          case Delete(mod, rem) =>
            TxnLog.deleteWhere(spark, root, col("k") % mod === rem, s"dl$i")
            model = model.filterNot { case (k, _) => k % mod == rem }
          case Compact =>
            val live = TxnLog.snapshotFiles(root)
            if (live.nonEmpty) {
              val packed = TxnLog.stage(TxnLog.read(spark, root).coalesce(1), root, s"cp$i")
              TxnLog.commit(root, "compact", packed, removed = live,
                readVersion = TxnLog.currentVersion(root), txnId = s"cp$i")
            }
          case Zorder =>
            if (TxnLog.snapshotFiles(root).nonEmpty)
              TxnLog.optimizeZorder(spark, root, "k", "v", nFiles = 2, txnId = s"zo$i")
          case Checkpoint =>
            TxnLog.checkpoint(root)
        }
        assert(tableRows(root) === model,
          s"seed=$seed step=$i op=$op: table diverged from the model")
        history(TxnLog.currentVersion(root)) = model
      }
      // time travel: every recorded version still shows its state
      history.foreach { case (v, expect) =>
        assert(tableRows(root, v) === expect,
          s"seed=$seed: version $v no longer travels to its state")
      }
      // and the statsAggregate count agrees with the model everywhere
      if (model.nonEmpty) {
        val agg = TxnLog.statsAggregate(spark, root, "k").head()
        assert(agg.getLong(0) === model.size.toLong, s"seed=$seed: metadata count")
      }
    }
  }
}
