package graft.sources

import java.nio.file.{Files, Path, Paths, FileAlreadyExistsException}
import java.util.stream.Collectors

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal lakehouse transaction log: optimistic concurrency +
  * snapshot isolation over immutable parquet data files, the
  * coordination layer that ties the repo's physical-design operators
  * together — upsert rewrites (io_upsert), CDC between versions
  * (io_cdc_diff), compaction/layout jobs (io_compact_plan/io_zorder)
  * and incremental MV maintenance (mv_incremental) all need a table
  * whose state can change under them without torn reads or lost
  * updates.
  *
  * Design (the public Delta Lake recipe — Armbrust et al., "Delta
  * Lake: High-Performance ACID Table Storage over Cloud Object
  * Stores", VLDB 2020):
  *
  *  - DATA IS IMMUTABLE: writers stage new parquet files under
  *    `root/data/<txnId>/`; nothing ever rewrites a data file in
  *    place. An "upsert" is copy-on-write: stage rewritten files,
  *    log the old ones as removed.
  *  - THE LOG IS THE TABLE: `root/_log/<version>.json`, one record
  *    per commit, lists files added/removed. A snapshot at version V
  *    is the fold of records 1..V — resolution is METADATA-ONLY
  *    (O(commits) small JSON reads; never a data-directory listing,
  *    which at 100 TB is millions of objects and, on object stores,
  *    eventually consistent).
  *  - COMMIT IS A CAS ON THE NEXT VERSION NUMBER: the record is
  *    written to a temp file and hard-linked to `<v+1>.json` —
  *    link(2) is atomic and fails if the name exists, so exactly one
  *    writer wins each version; losers re-check conflicts and retry
  *    against the new head. (On HDFS the same CAS is atomic rename
  *    without overwrite; on S3 a conditional PUT — the local-FS link
  *    stands in for whichever the deployment provides.)
  *  - SNAPSHOT ISOLATION: readers resolve their file list once; data
  *    immutability makes the snapshot stable no matter what commits
  *    land afterwards. Writers declare the snapshot version they
  *    READ (`readVersion`); at commit time the file-level conflict
  *    check rejects lost updates: a commit that removes files
  *    conflicts iff a concurrent commit (> readVersion) already
  *    removed any of them — i.e. both rewrote the same data. Pure
  *    appends have an empty read set and never conflict; they just
  *    retry the CAS.
  *
  * `TxnLogSpec` covers the two-writer scenarios (conflict abort,
  * append auto-retry, snapshot stability, a real 2-thread CAS race);
  * the driver queries `tx_snapshot` / `tx_time_travel` / `tx_changes`
  * hash-check snapshot resolution, time travel, and version-diff CDC
  * against DuckDB via version predicates.
  */
object TxnLog {

  /** One committed log record. */
  case class Commit(version: Long, action: String, txnId: String,
                    readVersion: Long, added: Seq[String], removed: Seq[String])

  /** A commit lost the optimistic-concurrency check: a concurrent
    * commit rewrote data this transaction also rewrites. The caller
    * must re-read and re-stage (a blind retry would lose its update).
    */
  class ConflictException(msg: String) extends RuntimeException(msg)

  private def logDir(root: String): Path = Paths.get(root, "_log")

  private def entryPath(root: String, v: Long): Path =
    logDir(root).resolve(f"$v%020d.json")

  /** Create the table layout (idempotent). */
  def init(root: String): Unit = {
    Files.createDirectories(logDir(root))
    Files.createDirectories(Paths.get(root, "data"))
    ()
  }

  // ---- log encoding ----
  // One JSON object per file. Staged file paths are produced by
  // [[stage]] (UUID dir + parquet part names: no quotes/backslashes),
  // so the straightforward string-field extraction below is exact for
  // everything this log ever writes.

  private def render(c: Commit): String = {
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"version":${c.version},"action":"${c.action}","txnId":"${c.txnId}",""" +
      s""""readVersion":${c.readVersion},"added":${arr(c.added)},"removed":${arr(c.removed)}}"""
  }

  private def parse(line: String): Commit = {
    def num(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(line)
        .getOrElse(sys.error(s"txn log record missing $k: $line")).group(1).toLong
    def str(k: String): String =
      s""""$k":"([^"]*)"""".r.findFirstMatchIn(line)
        .getOrElse(sys.error(s"txn log record missing $k: $line")).group(1)
    def arr(k: String): Seq[String] = {
      val body = s""""$k":\\[([^\\]]*)\\]""".r.findFirstMatchIn(line)
        .getOrElse(sys.error(s"txn log record missing $k: $line")).group(1)
      if (body.isEmpty) Nil
      else body.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
    }
    Commit(num("version"), str("action"), str("txnId"), num("readVersion"),
      arr("added"), arr("removed"))
  }

  /** Committed records with `fromExclusive < version <= toInclusive`,
    * in version order. The version rides in the FILENAME, so records
    * outside the range are never opened — this is what makes
    * checkpoint-seeded resolution O(tail) in IO, not just in fold
    * work.
    */
  private def commitsInRange(root: String, fromExclusive: Long,
                             toInclusive: Long): Seq[Commit] = {
    val dir = logDir(root)
    if (!Files.isDirectory(dir)) return Nil
    Files.list(dir).collect(Collectors.toList[Path]).asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .map(p => (p.getFileName.toString.stripSuffix(".json").toLong, p))
      .filter { case (v, _) => v > fromExclusive && v <= toInclusive }
      .sortBy(_._1)
      .map { case (_, p) => parse(Files.readString(p)) }.toSeq
  }

  /** All committed records in version order. */
  def commits(root: String): Seq[Commit] =
    commitsInRange(root, 0L, Long.MaxValue)

  /** Head version (0 = empty table). */
  def currentVersion(root: String): Long =
    commits(root).lastOption.map(_.version).getOrElse(0L)

  /** Write a checkpoint of the CURRENT snapshot: the live file set at
    * the head version, one path per line, published atomically as
    * `_log/<version>.checkpoint`. From then on snapshot resolution
    * for any version ≥ this one starts from the checkpoint and folds
    * only the log TAIL — O(live files + commits since), not
    * O(commits ever) — the knob that keeps a long-lived table's
    * planning cost flat as its history grows (Delta writes the same
    * thing as parquet every 10 commits). Commit JSONs are kept, so
    * time travel to pre-checkpoint versions still works. Idempotent
    * per version; safe concurrent with writers (a checkpoint adds no
    * commit and changes no conflict outcome).
    */
  def checkpoint(root: String): Long = {
    val v = currentVersion(root)
    val target = logDir(root).resolve(f"$v%020d.checkpoint")
    if (v == 0L || Files.exists(target)) return v
    val live = snapshotFiles(root, v)
    val tmp = logDir(root).resolve(s".tmp-ckpt-$v")
    Files.writeString(tmp, live.mkString("\n"))
    try Files.createLink(target, tmp)
    catch { case _: FileAlreadyExistsException => () } // concurrent checkpointer won
    finally Files.deleteIfExists(tmp)
    v
  }

  /** Latest (version, live-file-list) checkpoint at or below `version`. */
  private def latestCheckpoint(root: String, version: Long): Option[(Long, Seq[String])] = {
    val dir = logDir(root)
    if (!Files.isDirectory(dir)) return None
    Files.list(dir).collect(Collectors.toList[Path]).asScala
      .filter(_.getFileName.toString.endsWith(".checkpoint"))
      .map(p => (p.getFileName.toString.stripSuffix(".checkpoint").toLong, p))
      .filter(_._1 <= version)
      .sortBy(_._1).lastOption
      .map { case (v, p) =>
        val body = Files.readString(p)
        (v, if (body.isEmpty) Nil else body.split("\n").toSeq)
      }
  }

  /** The live data files of the snapshot at `version`: the latest
    * checkpoint at or below it (if any) plus a fold of the log tail.
    * Metadata-only.
    */
  def snapshotFiles(root: String, version: Long = Long.MaxValue): Seq[String] = {
    val (from, seed) = latestCheckpoint(root, version).getOrElse((0L, Nil))
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    live ++= seed
    commitsInRange(root, from, version).foreach { c =>
      live ++= c.added; live --= c.removed
    }
    live.toSeq
  }

  /** Read the table at `version` (default: head). The file list is
    * resolved ONCE here; immutable data files make the returned frame
    * a stable snapshot regardless of later commits.
    *
    * `mergeSchema = true` is the X-A19 contract over the log: a
    * long-lived table's commits accumulate schema GENERATIONS (a new
    * column appears in files staged after some version); the merged
    * read unions the footers at planning time and old files yield
    * nulls for columns they predate — history is never rewritten.
    * Default off: single-generation tables skip the footer merge.
    */
  def read(s: SparkSession, root: String,
           version: Long = Long.MaxValue,
           mergeSchema: Boolean = false): DataFrame = {
    val files = snapshotFiles(root, version)
    if (files.isEmpty) s.emptyDataFrame
    else if (mergeSchema) s.read.option("mergeSchema", "true").parquet(files: _*)
    else s.read.parquet(files: _*)
  }

  /** Stage `df` as immutable parquet files under `root/data/<txnId>/`
    * and return their paths (not yet visible to any reader — only a
    * commit publishes them).
    */
  def stage(df: DataFrame, root: String, txnId: String): Seq[String] = {
    val dir = Paths.get(root, "data", txnId)
    df.write.mode("error").parquet(dir.toString)
    Files.list(dir).collect(Collectors.toList[Path]).asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(_.toString).sorted.toSeq
  }

  /** Commit staged files optimistically. `readVersion` is the
    * snapshot version this transaction's reads (and its `removed`
    * list) were computed against. Retries the version CAS until it
    * wins or a true conflict surfaces; throws [[ConflictException]]
    * iff a concurrent commit removed any file this one removes.
    */
  def commit(root: String, action: String, added: Seq[String],
             removed: Seq[String], readVersion: Long, txnId: String): Commit = {
    val myRemoved = removed.toSet
    var attempts = 0
    while (true) {
      attempts += 1
      if (attempts > 10000) sys.error(s"txn $txnId: CAS starvation after $attempts attempts")
      val log = commits(root)
      // txnId idempotency: a replayed transaction (crash-recovered
      // stream batch, retried job) finds its own earlier commit and
      // returns it instead of committing twice — the exactly-once
      // half of [[appendOnce]], checked INSIDE the CAS loop so a
      // concurrent duplicate that wins the race is also caught.
      val dup = log.find(_.txnId == txnId)
      if (dup.isDefined) return dup.get
      val head = log.lastOption.map(_.version).getOrElse(0L)
      // File-level lost-update check against everything that landed
      // after our snapshot: if a concurrent commit removed (rewrote)
      // a file we also remove, both transactions rewrote the same
      // data and ours must abort — a blind retry would silently drop
      // the other writer's update. Appends (removed = empty) skip
      // this entirely and only ever loop on the CAS.
      val clash = log.filter(_.version > readVersion)
        .flatMap(c => c.removed.filter(myRemoved.contains).map((c, _)))
      clash.headOption.foreach { case (c, f) =>
        throw new ConflictException(
          s"txn $txnId (read v$readVersion) rewrites $f, already rewritten " +
            s"by txn ${c.txnId} at v${c.version}")
      }
      val rec = Commit(head + 1, action, txnId, readVersion, added, removed)
      val tmp = logDir(root).resolve(s".tmp-$txnId-${rec.version}")
      Files.writeString(tmp, render(rec))
      try {
        Files.createLink(entryPath(root, rec.version), tmp)
        Files.deleteIfExists(tmp)
        return rec
      } catch {
        case _: FileAlreadyExistsException =>
          // lost the CAS: someone else owns this version — re-read the
          // log (conflict check included) and try the next one
          Files.deleteIfExists(tmp)
      }
    }
    sys.error("unreachable")
  }

  /** Per-file (min, max) of `statsCol`, computed at stage time and
    * written as a `_stats.json` sidecar next to the staged files —
    * the data-skipping metadata a range read prunes with (Delta keeps
    * the same stats inline in its log; a sidecar per staged dir keeps
    * this log's format untouched at the cost of one tiny read per
    * transaction dir, still metadata-scale). One line per file:
    * `path min max`.
    */
  def stageWithStats(df: DataFrame, root: String, txnId: String,
                     statsCol: String): Seq[String] = {
    val files = stage(df, root, txnId)
    val spark = df.sparkSession
    import org.apache.spark.sql.functions.{col, input_file_name, max => fmax, min => fmin}
    val stats = spark.read.parquet(Paths.get(root, "data", txnId).toString)
      .select(input_file_name().as("f"), col(statsCol).cast("long").as("s"))
      .groupBy("f").agg(fmin("s").as("lo"), fmax("s").as("hi"))
      .collect()
      .map(r => (r.getString(0).stripPrefix("file://").stripPrefix("file:"),
        r.getLong(1), r.getLong(2)))
    val body = stats.map { case (f, lo, hi) => s"$f $lo $hi" }.mkString("\n")
    Files.writeString(Paths.get(root, "data", txnId, "_stats.json"), body)
    files
  }

  /** The snapshot's live files whose [min, max] range of the staged
    * stats column overlaps [lo, hi]. Files staged WITHOUT stats are
    * always kept (pruning must never be unsound). Metadata-only: the
    * log fold plus one sidecar read per live transaction dir.
    */
  def prunedFiles(root: String, lo: Long, hi: Long,
                  version: Long = Long.MaxValue): Seq[String] = {
    val live = snapshotFiles(root, version)
    val byDir = live.groupBy(f => Paths.get(f).getParent)
    byDir.toSeq.flatMap { case (dir, files) =>
      val sidecar = dir.resolve("_stats.json")
      if (!Files.exists(sidecar)) files
      else {
        val ranges = Files.readString(sidecar).split("\n").filter(_.nonEmpty)
          .map { line =>
            val Array(f, l, h) = line.split(" ")
            f -> ((l.toLong, h.toLong))
          }.toMap
        files.filter(f => ranges.get(f).forall { case (l, h) => h >= lo && l <= hi })
      }
    }
  }

  /** Range read with file skipping: scans only [[prunedFiles]] and
    * applies the residual predicate (file ranges can straddle the
    * bounds). Equals `read(...).filter(col between lo and hi)` row
    * for row; touches a fraction of the files when the data was
    * staged range-clustered.
    */
  def readRange(s: SparkSession, root: String, statsCol: String, lo: Long,
                hi: Long, version: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.functions.col
    val files = prunedFiles(root, lo, hi, version)
    // no overlapping file means provably zero matching rows (files
    // without stats are never pruned) — keep the snapshot's schema
    val base = if (files.nonEmpty) s.read.parquet(files: _*)
               else read(s, root, version).limit(0)
    base.filter(col(statsCol) >= lo && col(statsCol) <= hi)
  }

  /** Physically delete data files referenced by NO snapshot at or
    * after `retainFromVersion` — storage reclamation after rewrites
    * (upserts/compactions strand their replaced files forever
    * otherwise; at 100 TB the stranded bytes quickly dwarf the live
    * table). The contract is Delta's VACUUM with a version horizon
    * instead of a timestamp: time travel to versions BEFORE the
    * horizon stops working (their files are gone — reads fail loudly
    * on missing files rather than returning partial data), every
    * retained version is untouched, and the log keeps ALL commit
    * records so provenance survives even where data does not.
    * Idempotent; returns the deleted paths.
    */
  def vacuum(root: String, retainFromVersion: Long): Seq[String] = {
    val head = currentVersion(root)
    val from = math.min(retainFromVersion, head)
    // union of live sets of every retained version; O(versions × log)
    // here — a production impl folds the log once, tracking last
    // version each file was live
    val keep = (from to head).flatMap(v => snapshotFiles(root, v)).toSet
    val victims = commits(root).flatMap(_.added).distinct
      .filterNot(keep)
      .filter(f => Files.exists(Paths.get(f)))
    victims.foreach(f => Files.deleteIfExists(Paths.get(f)))
    victims
  }

  /** Exactly-once streaming append — the `foreachBatch` sink for
    * writing a stream into the table:
    *
    * {{{
    * stream.writeStream.foreachBatch { (df, batchId) =>
    *   TxnLog.appendOnce(df, root, streamId = "ingest-q1", batchId); ()
    * }
    * }}}
    *
    * Structured Streaming replays a micro-batch whose side effects it
    * cannot prove committed; the (streamId, batchId) txnId makes the
    * replay a NO-OP — the log already holds that transaction, so the
    * data lands exactly once no matter how many times the batch runs
    * (the Delta `txnAppId`/`txnVersion` idempotent-writer contract).
    * A crash BETWEEN staging and commit leaves an orphaned staging
    * dir; the retry wipes and re-stages it (safe: its txnId is not in
    * the log, so no reader has ever resolved those files).
    *
    * Returns the commit (existing one if replayed).
    */
  def appendOnce(df: DataFrame, root: String, streamId: String,
                 batchId: Long): Commit = {
    val txnId = s"$streamId-b$batchId"
    commits(root).find(_.txnId == txnId).getOrElse {
      val dir = Paths.get(root, "data", txnId)
      if (Files.exists(dir)) { // orphan from a crashed earlier attempt
        import java.util.Comparator
        Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      }
      val files = stage(df, root, txnId)
      // appends have an empty read set: readVersion 0 never conflicts
      commit(root, "stream-append", files, Nil, readVersion = 0L, txnId)
    }
  }
}
