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
  private case object CompactDeletes extends Op
  private case object Rename extends Op

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
    1 -> Gen.const(Checkpoint),
    1 -> Gen.const(CompactDeletes),
    1 -> Gen.const(Rename))

  private def tableRows(root: String, v: Long = Long.MaxValue): Map[Long, Long] = {
    val df = TxnLog.read(spark, root, v)
    // a version whose snapshot holds no files is the schemaless empty
    // frame — the model equivalent of the empty map
    if (df.columns.isEmpty) Map.empty
    else df.as[(Long, Long)].collect().toMap
  }

  /** CI runs seeds 1..3 with 10 ops; a deep search (one-off receipts,
    * not CI) widens via env: GRAFT_MODEL_SEEDS=12 GRAFT_MODEL_OPS=14.
    */
  private val modelSeeds = sys.env.get("GRAFT_MODEL_SEEDS").map(_.toLong).getOrElse(3L)
  private val modelOps = sys.env.get("GRAFT_MODEL_OPS").map(_.toInt).getOrElse(10)

  test("random op sequences: the table tracks the model at every step, and every version travels back") {
    for (seed <- 1L to modelSeeds) {
      val root = java.nio.file.Files.createTempDirectory(s"graft-model-$seed").toString
      TxnLog.init(root)
      var model = Map.empty[Long, Long]
      // the key column's CURRENT logical name (Rename flips it); the
      // PHYSICAL name stays "k" forever — raw stage/commit writes
      // physical, the logical APIs (merge/delete/zorder/aggregate)
      // take `keyName` and consult the map
      var keyName = "k"
      // version -> expected state, for the time-travel sweep at the end
      val history = scala.collection.mutable.Map.empty[Long, Map[Long, Long]]
      val ops = sample(Gen.listOfN(modelOps, opGen), seed)
      ops.zipWithIndex.foreach { case (op, i) =>
        op match {
          case Append(rows) =>
            // appended keys are drawn from a disjoint range, so the
            // append never violates the merge key-uniqueness contract;
            // the raw commit API stages PHYSICAL names by contract
            val files = TxnLog.stage(rows.toSeq.toDF("k", "v"), root, s"ap$i")
            TxnLog.commit(root, "append", files, Nil,
              readVersion = TxnLog.currentVersion(root), txnId = s"ap$i")
            model = model ++ rows
          case Merge(rows) =>
            TxnLog.mergeInto(spark, root,
              rows.toSeq.toDF(keyName, "v"), keyName, s"mg$i")
            model = model ++ rows
          case Delete(mod, rem) =>
            TxnLog.deleteWhere(spark, root, col(keyName) % mod === rem, s"dl$i")
            model = model.filterNot { case (k, _) => k % mod == rem }
          case Compact =>
            val live = TxnLog.snapshotFiles(root)
            if (live.nonEmpty) {
              // a raw copy-on-write must stage PHYSICAL names: rename
              // the logical read back through the column map
              val phys = TxnLog.read(spark, root)
                .withColumnsRenamed(TxnLog.columnMapping(root))
              val packed = TxnLog.stage(phys.coalesce(1), root, s"cp$i")
              TxnLog.commit(root, "compact", packed, removed = live,
                readVersion = TxnLog.currentVersion(root), txnId = s"cp$i")
            }
          case Zorder =>
            if (TxnLog.snapshotFiles(root).nonEmpty)
              TxnLog.optimizeZorder(spark, root, keyName, "v", nFiles = 2, txnId = s"zo$i")
          case CompactDeletes =>
            TxnLog.optimizeCompactDeletes(spark, root, 0.3, s"cd$i")
          case Rename =>
            val next = if (keyName == "k") "kk" else "k"
            TxnLog.renameColumn(root, keyName, next, s"rn$i")
            keyName = next
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
        val agg = TxnLog.statsAggregate(spark, root, keyName).head()
        assert(agg.getLong(0) === model.size.toLong, s"seed=$seed: metadata count")
      }
    }
  }

  /** CONCURRENT-WRITER sweep: two threads race random op sequences
    * against one table. No interleaving is scripted — instead the
    * COMMITTED LOG is replayed against an MVCC model after the fact:
    * appends/merges fold forward, a delete removes the predicate's
    * matches FROM ITS OWN READ SNAPSHOT (`states(readVersion)` — the
    * snapshot-isolation semantics the conflict matrix guarantees:
    * anything that would invalidate that snapshot's files aborts),
    * compaction/z-order are content-invariant. Every committed
    * version must equal its modeled state, which proves in one sweep
    * that aborted transactions published nothing, committed ones
    * serialized consistently, and no interleaving lost an update or
    * duplicated a key.
    */
  test("r13: concurrent writers — the committed log replays to a consistent MVCC model") {
    for (seed <- 1L to 2L) {
      val root = java.nio.file.Files.createTempDirectory(s"graft-race-$seed").toString
      TxnLog.init(root)
      val payloads = new java.util.concurrent.ConcurrentHashMap[String, Op]()
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

      def worker(tid: Int): Thread = new Thread(() => {
        try {
          // renames are excluded from the RACE sweep: per-thread
          // logical-name tracking under interleaving is a test-harness
          // problem, not a protocol one (rename conflicts are just
          // CAS retries — no file set to collide on)
          val ops = sample(Gen.listOfN(6, opGen), seed * 100 + tid)
            .filterNot(_ == Rename)
          ops.zipWithIndex.foreach { case (op, i) =>
            val id = s"w$tid-$i"
            try {
              op match {
                case Append(rows) =>
                  // per-thread disjoint key space: appends never race
                  // the merge keys, so key uniqueness stays testable
                  val shifted = rows.map { case (k, v) => (k + tid * 1000000L) -> v }
                  val files = TxnLog.stage(shifted.toSeq.toDF("k", "v"), root, id)
                  TxnLog.commit(root, "append", files, Nil,
                    readVersion = 0L, txnId = id)
                  payloads.put(id, Append(shifted)); ()
                case Merge(rows) =>
                  // merges race on a SHARED key range; a loser aborts
                  // (insert-insert protection) and retries re-reading
                  var attempts = 0
                  var done = false
                  while (!done && attempts < 4) {
                    attempts += 1
                    try {
                      TxnLog.mergeInto(spark, root, rows.toSeq.toDF("k", "v"), "k", id)
                      payloads.put(id, op); done = true
                    } catch { case _: TxnLog.ConflictException if attempts < 4 => () }
                  }
                case Delete(mod, rem) =>
                  if (TxnLog.deleteWhere(spark, root,
                      col("k") % mod === rem, id).isDefined) {
                    payloads.put(id, op); ()
                  }
                case Compact =>
                  val readV = TxnLog.currentVersion(root)
                  val live = TxnLog.snapshotFiles(root, readV)
                  if (live.nonEmpty) {
                    val packed = TxnLog.stage(
                      TxnLog.read(spark, root, readV).coalesce(1), root, id)
                    TxnLog.commit(root, "compact", packed, removed = live,
                      readVersion = readV, txnId = id)
                    payloads.put(id, Compact); ()
                  }
                case Zorder =>
                  if (TxnLog.snapshotFiles(root).nonEmpty) {
                    TxnLog.optimizeZorder(spark, root, "k", "v", nFiles = 2, txnId = id)
                    payloads.put(id, Zorder); ()
                  }
                case CompactDeletes =>
                  if (TxnLog.optimizeCompactDeletes(spark, root, 0.3, id).isDefined) {
                    payloads.put(id, CompactDeletes); ()
                  }
                case Rename => () // excluded above
                case Checkpoint =>
                  TxnLog.checkpoint(root); ()
              }
            } catch {
              // losing a race is legal; corrupting the table is not —
              // anything beyond a conflict abort fails the test
              case _: TxnLog.ConflictException => ()
            }
          }
        } catch { case t: Throwable => failures.add(t); () }
      })

      val ts = Seq(worker(1), worker(2))
      ts.foreach(_.start()); ts.foreach(_.join())
      assert(failures.isEmpty, s"seed=$seed: worker died: ${failures.peek()}")

      // replay the committed log against the MVCC model
      val states = scala.collection.mutable.Map(0L -> Map.empty[Long, Long])
      var prev = Map.empty[Long, Long]
      TxnLog.commits(root).foreach { c =>
        val next = payloads.get(c.txnId) match {
          case Append(rows) => prev ++ rows
          case Merge(rows)  => prev ++ rows
          case Delete(mod, rem) =>
            // snapshot semantics: the delete marked ITS snapshot's
            // matches; rows committed after its read are untouched
            prev -- states(c.readVersion).keys.filter(k => k % mod == rem)
          case Compact | Zorder | CompactDeletes => prev
          case null => fail(s"seed=$seed: committed txn ${c.txnId} has no payload")
          case _ => prev
        }
        states(c.version) = next
        prev = next
      }
      assert(tableRows(root) === prev,
        s"seed=$seed: final state diverged from the MVCC replay")
      // every committed version travels to its modeled state — no
      // interleaving lost an update, resurrected a row, or forked
      states.foreach { case (v, st) =>
        assert(tableRows(root, v) === st,
          s"seed=$seed: version $v diverged from its modeled state")
      }
      // key uniqueness survived racing merges (insert-insert guard)
      val all = TxnLog.read(spark, root)
      if (all.columns.nonEmpty)
        assert(all.count() === all.select("k").distinct().count(),
          s"seed=$seed: duplicate keys after concurrent merges")
    }
  }
}
