package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** SQL `UPDATE` and `MERGE INTO` (and rewrite-path `DELETE`) over
  * [[TxnLog]] tables — Spark's group-based row-level operation
  * framework (the public Iceberg copy-on-write recipe) wired to the
  * log's transactional commit:
  *
  *  1. Spark asks the operation for a SCAN of the candidate rows.
  *     That scan is a [[GraftScan]], so the command's ON/WHERE
  *     condition prunes FILES against the log's typed stats and
  *     blooms first — the "groups" that get rewritten are exactly
  *     the files the predicate could touch, and the scan CAPTURES
  *     that file list plus the snapshot version it resolved.
  *  2. Spark computes the replacement rows (updated + carried-over +
  *     merge-inserted) and hands them to the operation's WRITE — a
  *     real distributed [[BatchWrite]]: each task writes a parquet
  *     file into the transaction's staging directory through Spark's
  *     own `OutputWriterFactory` closure; only (path, rowCount)
  *     commit messages reach the driver.
  *  3. `commit` stages typed per-file stats over the written files
  *     and publishes ONE log record: `added` = the new files,
  *     `removed` = the captured scan set, `readVersion` = the
  *     captured snapshot — so the standard conflict matrix rejects a
  *     lost update (a concurrent rewrite/DV of any victim aborts
  *     this commit), and MERGE additionally sets
  *     `failOnConcurrentAppend` (read-set protection: a concurrent
  *     append may hold keys this merge decided to insert).
  *
  * Deletion vectors compose for free: the scan's readers already
  * drop DV'd rows, so a rewrite COMPACTS prior deletes into the new
  * files, and vectors on removed files die with them.
  *
  * 100 TB shape: rewrite scope = post-prune, post-RUNTIME-filter
  * file set (files that actually hold matches — [[GraftScan.filter]]),
  * writes are executor-side and stats-collected in one distributed
  * pass; the driver sees file names and bitmap-scale metadata only.
  *
  * Since r18 this group-based single-pass rewrite is the
  * `spark.graft.dml.mode=cow-group` variant: the DEFAULT `cow` mode
  * runs [[GraftDeltaOperation]] with a synchronous finalize (exact
  * per-row kill bitmaps for the change feed + survivor rewrite in
  * the same commit), and `mor` writes deletion vectors only. See
  * [[GraftRowLevelOperation.builder]] for the trade-off table.
  */
private[sources] class GraftRowLevelOperation(root: String,
                                              tableSchema: StructType,
                                              cmd: RowLevelOperation.Command)
  extends RowLevelOperation {

  /** (files the scan planned, snapshot version it resolved) — set on
    * the driver during scan planning, read at write commit.
    */
  @volatile private var scanned: Option[(Seq[String], Long)] = None

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String = s"GraftRowLevel($cmd, root=$root)"

  /** Require the `_file` metadata column. Group-based rewrites don't
    * strictly need it (the replaced file set is captured at scan
    * planning) — but Spark's ReplaceData exec only applies its
    * data-row projection through the metadata-carrying task: with no
    * metadata attribute the raw query rows (operation column
    * included) would reach the writer. Requiring `_file` keeps us on
    * the same projection path every production connector exercises,
    * at the cost of one repeated string per row in the rewrite scan.
    */
  override def requiredMetadataAttributes()
    : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(
      GraftTable.FileMetaCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(SparkSession.active, root, Long.MaxValue, tableSchema,
      options, onPlan = Some((fs, v) => scanned = Some((fs, v))))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def description(): String = s"GraftRowLevelWrite($cmd)"
        override def toBatch: BatchWrite =
          new GraftBatchWrite(root, info.schema(),
            action = cmd.toString.toLowerCase(java.util.Locale.ROOT),
            () => scanned,
            failOnConcurrentAppend = cmd == RowLevelOperation.Command.MERGE)
      }
    }
}

private object GraftRowLevelOperation {
  /** DML write-path selection, per session
    * (`SET spark.graft.dml.mode = cow | mor | cow-group`):
    *
    *  - `cow` (default): the delta write computes exact per-row kill
    *    bitmaps + change files, then a synchronous finalize step
    *    rewrites the touched files' SURVIVORS into the same commit —
    *    the table state ends fully copy-on-write (no residual DVs),
    *    while the bitmaps ride the commit as metadata so `t.feed`
    *    serves EXACT `update_preimage`/`update_postimage`/`delete`
    *    rows for COW DML (O(changed rows), never whole post-image
    *    files). Costs one extra read of the touched files.
    *  - `mor`: deletion vectors + insert files, no rewrite — write
    *    amplification O(changed rows); reads pay the DV filter until
    *    `optimizeCompactDeletes`.
    *  - `cow-group`: the single-pass group-based rewrite (Spark's
    *    ReplaceData framework) — reads touched files once and writes
    *    their full replacement; for near-full-file UPDATEs this is
    *    the cheapest write path, but the feed can only report its
    *    post-image files wholesale (conservative CDC).
    */
  def builder(root: String, tableSchema: StructType,
              info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation = {
        val mode = SparkSession.active.conf.get("spark.graft.dml.mode", "cow")
        require(mode == "cow" || mode == "mor" || mode == "cow-group",
          s"spark.graft.dml.mode must be cow, mor or cow-group, got $mode")
        if (mode == "cow-group")
          new GraftRowLevelOperation(root, tableSchema, info.command())
        else new GraftDeltaOperation(root, tableSchema, info.command(),
          finalizeCow = mode == "cow")
      }
    }
}

/** One written staging file. */
private case class GraftFileMessage(path: String, rows: Long)
  extends WriterCommitMessage

/** A delta task's result: files written (inserts) plus per-file
  * deleted-row bitmap words (sparse: only words with set bits). The
  * message is O(files + touched-rows/64) — never row-proportional.
  */
private case class GraftDeltaMessage(files: Seq[(String, Long)],
                                     deletes: Map[String, Array[Long]])
  extends WriterCommitMessage

/** MERGE-ON-READ row-level operations ([[SupportsDelta]]): DELETE /
  * UPDATE / MERGE write deletion-vector bits and NEW rows instead of
  * rewriting the touched files — the Iceberg position-delete /
  * Delta DV recipe through Spark's delta-write framework:
  *
  *  - the row ID is `(_file, _pos)` — the coordinates the scan's
  *    readers already materialize and the DV format already
  *    addresses;
  *  - updates arrive as DELETE + INSERT pairs
  *    (`representUpdateAsDeleteAndInsert`), so the writer is two
  *    primitives: set a bit, append a row;
  *  - each task accumulates per-file bitmaps locally (a BitSet per
  *    touched file) and ships O(touched-rows/64) words; the driver
  *    ORs them and publishes ONE commit: `added` = insert files,
  *    `dvFiles`/`dvs` = the vectors, nothing removed.
  *
  * At 100 TB this is the difference between a MERGE that rewrites
  * every stats-admissible file (copy-on-write) and one whose write
  * amplification is O(changed rows): a 0.1%-selectivity MERGE over a
  * 1M-file table writes KB of bitmap per touched file instead of
  * re-materializing each. Reads pay the DV filter until
  * `optimizeCompactDeletes` folds dense vectors back in — the
  * standard MOR maintenance contract. Mode selection is per session:
  * `SET spark.graft.dml.mode=mor` (default `cow`,
  * [[GraftRowLevelOperation]]).
  */
private[sources] class GraftDeltaOperation(root: String,
                                           tableSchema: StructType,
                                           cmd: RowLevelOperation.Command,
                                           finalizeCow: Boolean = false)
  extends RowLevelOperation with org.apache.spark.sql.connector.write.SupportsDelta {

  @volatile private var scanned: Option[(Seq[String], Long)] = None

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"GraftDelta($cmd, root=$root)"

  override def rowId(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(GraftTable.FileMetaCol),
      org.apache.spark.sql.connector.expressions.Expressions.column(GraftTable.PosMetaCol))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def requiredMetadataAttributes()
    : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(
      GraftTable.FileMetaCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(SparkSession.active, root, Long.MaxValue, tableSchema,
      options, onPlan = Some((fs, v) => scanned = Some((fs, v))))

  override def newWriteBuilder(info: LogicalWriteInfo)
    : org.apache.spark.sql.connector.write.DeltaWriteBuilder =
    new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.DeltaWrite =
        new org.apache.spark.sql.connector.write.DeltaWrite
          with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
          override def description(): String = s"GraftDeltaWrite($cmd)"

          /** Small-file hygiene (the Iceberg position-delta recipe):
            * cluster the delta rows by `_file` BEST-EFFORT — Spark
            * plans a RebalancePartitions, so with AQE a small MOR
            * update's post-images coalesce into a handful of write
            * tasks instead of one 1-row file per input task
            * (O(advisory-size partitions), not O(tasks)), while a
            * huge merge-insert load (null `_file`, one hash bucket)
            * is split back out by AQE's skew handling. Non-strict:
            * with AQE off the plan degrades to a plain shuffle —
            * never a failure. Delete bitmaps are unaffected (they OR
            * across tasks regardless of placement).
            */
          override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution =
            org.apache.spark.sql.connector.distributions.Distributions.clustered(
              Array(org.apache.spark.sql.connector.expressions.Expressions.column(
                GraftTable.FileMetaCol)))
          override def distributionStrictlyRequired(): Boolean = false
          override def requiredOrdering()
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
            Array.empty

          override def toBatch(): org.apache.spark.sql.connector.write.DeltaBatchWrite =
            new GraftDeltaBatchWrite(root, info.schema(),
              action = (if (finalizeCow) "" else "mor-") +
                cmd.toString.toLowerCase(java.util.Locale.ROOT),
              () => scanned,
              failOnConcurrentAppend = cmd == RowLevelOperation.Command.MERGE,
              finalizeCow = finalizeCow)
        }
    }
}

/** The delta batch write: insert files staged exactly like
  * [[GraftBatchWrite]], deletion bitmaps assembled from the sparse
  * per-task words, one commit carrying both.
  */
private class GraftDeltaBatchWrite(root: String, logicalSchema: StructType,
                                   action: String,
                                   scanned: () => Option[(Seq[String], Long)],
                                   failOnConcurrentAppend: Boolean,
                                   finalizeCow: Boolean = false)
  extends org.apache.spark.sql.connector.write.DeltaBatchWrite {

  private def spark = SparkSession.active
  private val txnId =
    s"sql-$action-a${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"
  private val physSchema = {
    val renames = TxnLog.columnMapping(root)
    StructType(logicalSchema.fields.map(f =>
      f.copy(name = renames.getOrElse(f.name, f.name))))
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
    : org.apache.spark.sql.connector.write.DeltaWriterFactory = {
    val dir = Paths.get(root, "data", txnId)
    Files.createDirectories(dir)
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, physSchema)
    new GraftDeltaWriterFactory(dir.toString, physSchema,
      new SerializableConfiguration(job.getConfiguration), owf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val deltas = messages.collect { case m: GraftDeltaMessage => m }
    val files = deltas.flatMap(_.files).collect { case (p, n) if n > 0 => p }
      .toSeq.sorted
    // OR the sparse word maps across tasks, render the DV hex per file
    val merged = scala.collection.mutable.Map.empty[String, Array[Long]]
    deltas.foreach(_.deletes.foreach { case (f, words) =>
      val cur = merged.getOrElseUpdate(f, new Array[Long](words.length))
      val grown = if (cur.length >= words.length) cur else java.util.Arrays.copyOf(cur, words.length)
      var i = 0
      while (i < words.length) { grown(i) |= words(i); i += 1 }
      merged(f) = grown
    })
    val (dvFiles, dvs) = merged.toSeq.sortBy(_._1).map { case (f, ws) =>
      (f, ws.map(w => f"$w%016x").mkString)
    }.unzip
    if (files.isEmpty && dvFiles.isEmpty) return
    // MOR post-images (insert halves of update pairs + merge inserts)
    // honor CHECK + NOT NULL like every other write; pure-DV deletes
    // stage no rows and skip via the empty-files early return
    TxnLog.checkStagedConstraints(spark, root, files)
    val readV = scanned().map(_._2).getOrElse(TxnLog.currentVersion(root))
    val statCols = GraftTable.statPaths(physSchema)
    // bucket-partitioned tables: post-image files re-record their
    // derived bucket stats so rewrites never lose bucket pruning
    val buckets = TxnLog.partitionFields(root).collect {
      case TxnLog.BucketField(n, c) if physSchema.fieldNames.contains(c) => (n, c)
    }
    val multi =
      if (files.isEmpty || (statCols.isEmpty && buckets.isEmpty)) Nil
      else TxnLog.statsForStaged(spark, root, txnId, statCols, files, buckets)
    // COW finalize: rewrite the touched files' SURVIVORS into this
    // same commit — added = change files + survivor files (survivors
    // marked row-preserving via `radds`), removed = the touched
    // files, and the kill bitmaps ride along as `dvFiles`/`dvs` so
    // the change feed serves exact pre-images at O(changed rows).
    // The table state ends pure copy-on-write: no residual vectors.
    val (survivors, survMulti) =
      if (finalizeCow && dvFiles.nonEmpty)
        TxnLog.stageCowSurvivors(spark, root, readV, dvFiles.zip(dvs), txnId)
      else (Nil, Nil)
    val allAdds = files ++ survivors
    val allMulti =
      if (multi.isEmpty && survMulti.isEmpty) Nil
      else (if (multi.isEmpty) files.map(_ => Map.empty[String, TxnLog.FileStat])
            else multi) ++
           (if (survMulti.isEmpty && survivors.nonEmpty)
              survivors.map(_ => Map.empty[String, TxnLog.FileStat])
            else survMulti)
    // declare the write schema only when rows were added: a DELETE's
    // LogicalWriteInfo schema is the operation's (not the table's),
    // and a pure-DV commit changes no schema anyway
    TxnLog.commit(root, action, added = allAdds,
      removed = if (finalizeCow) dvFiles else Nil,
      readVersion = readV, txnId = txnId, multiStats = allMulti,
      dvFiles = dvFiles, dvs = dvs,
      schemaId = if (files.isEmpty) "" else TxnLog.schemaFingerprint(physSchema),
      schemaJson =
        if (files.isEmpty) "" else GraftTable.declareJson(root, physSchema),
      failOnConcurrentAppend = failOnConcurrentAppend,
      radds = survivors)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case m: GraftDeltaMessage =>
        m.files.foreach { case (p, _) => Files.deleteIfExists(Paths.get(p)) }
      case _ => ()
    }
}

private class GraftDeltaWriterFactory(stagingDir: String, schema: StructType,
                                      conf: SerializableConfiguration,
                                      owf: OutputWriterFactory)
  extends org.apache.spark.sql.connector.write.DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
    : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] = {
    val path = s"$stagingDir/part-$partitionId-$taskId.parquet"
    new org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {
      // insert file opened LAZILY: a delete-only task writes no file
      private var writer: org.apache.spark.sql.execution.datasources.OutputWriter = _
      private var n = 0L
      private val deletes =
        scala.collection.mutable.Map.empty[String, java.util.BitSet]

      override def insert(row: InternalRow): Unit = {
        if (writer == null) {
          val attempt = new TaskAttemptID(
            new TaskID(new JobID("graft", 1), TaskType.MAP, partitionId), taskId.toInt)
          writer = owf.newInstance(path, schema,
            new TaskAttemptContextImpl(conf.value, attempt))
        }
        writer.write(row); n += 1
      }

      /** `id` carries the row's `(_file, _pos)` in [[rowId]] order. */
      override def delete(metadata: InternalRow, id: InternalRow): Unit = {
        val file = id.getUTF8String(0).toString
        val pos = id.getLong(1)
        require(pos < Int.MaxValue, s"row index $pos out of bitmap range for $file")
        deletes.getOrElseUpdate(file, new java.util.BitSet()).set(pos.toInt)
      }

      override def update(metadata: InternalRow, id: InternalRow,
                          row: InternalRow): Unit =
        throw new IllegalStateException(
          "updates are represented as delete+insert (representUpdateAsDeleteAndInsert)")

      override def commit(): WriterCommitMessage = {
        if (writer != null) writer.close()
        if (n == 0L) Files.deleteIfExists(Paths.get(path))
        GraftDeltaMessage(
          if (n > 0L) Seq((path, n)) else Nil,
          deletes.view.mapValues(_.toLongArray).toMap)
      }

      override def abort(): Unit = {
        if (writer != null) writer.close()
        Files.deleteIfExists(Paths.get(path))
        ()
      }

      override def close(): Unit = ()
    }
  }
}

/** A true DataSource V2 batch write into a [[TxnLog]] transaction:
  * executors write parquet into `data/<txnId>/` via Spark's own
  * serialized `OutputWriterFactory`, the driver collects (path,
  * rowCount) messages, stats the staged files in one distributed
  * pass, and publishes a single commit. Speculative / retried tasks
  * are safe: the commit coordinator admits one winner per partition,
  * losers' files stay unreferenced in the staging dir (reclaimed by
  * [[TxnLog.vacuumStaging]]'s orphan sweep once nothing references
  * the dir, ignored by stats alignment otherwise).
  */
private class GraftBatchWrite(root: String, logicalSchema: StructType,
                              action: String,
                              scanned: () => Option[(Seq[String], Long)],
                              failOnConcurrentAppend: Boolean)
  extends BatchWrite {

  private def spark = SparkSession.active
  private val txnId =
    s"sql-$action-a${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"
  // staged files carry PHYSICAL names (all generations of a renamed
  // table store the same column name); rows need no change — only
  // the writer schema's field names differ
  private val physSchema = {
    val renames = TxnLog.columnMapping(root)
    StructType(logicalSchema.fields.map(f =>
      f.copy(name = renames.getOrElse(f.name, f.name))))
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = Paths.get(root, "data", txnId)
    Files.createDirectories(dir)
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, physSchema)
    new GraftDataWriterFactory(dir.toString, physSchema,
      new SerializableConfiguration(job.getConfiguration), owf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case GraftFileMessage(p, n) if n > 0 => p
    }.toSeq.sorted
    val (removed, readV) =
      scanned().getOrElse((Nil, TxnLog.currentVersion(root)))
    if (files.isEmpty && removed.isEmpty) return // nothing matched, nothing inserted
    // X-A42's contract covers DML too: UPDATE/MERGE post-images must
    // honor CHECK + NOT NULL before anything publishes (a DELETE's
    // staged rows are carried-over survivors — already proven)
    if (action != "delete") TxnLog.checkStagedConstraints(spark, root, files)
    val statCols = GraftTable.statPaths(physSchema)
    // bucket-partitioned tables: post-image files re-record their
    // derived bucket stats so rewrites never lose bucket pruning
    val buckets = TxnLog.partitionFields(root).collect {
      case TxnLog.BucketField(n, c) if physSchema.fieldNames.contains(c) => (n, c)
    }
    val multi =
      if (files.isEmpty || (statCols.isEmpty && buckets.isEmpty)) Nil
      else TxnLog.statsForStaged(spark, root, txnId, statCols, files, buckets)
    TxnLog.commit(root, action, added = files, removed = removed,
      readVersion = readV, txnId = txnId, multiStats = multi,
      schemaId = TxnLog.schemaFingerprint(physSchema),
      schemaJson = GraftTable.declareJson(root, physSchema),
      failOnConcurrentAppend = failOnConcurrentAppend)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftFileMessage(p, _) => Files.deleteIfExists(Paths.get(p)); ()
      case _                      => ()
    }
}

private class GraftDataWriterFactory(stagingDir: String, schema: StructType,
                                     conf: SerializableConfiguration,
                                     owf: OutputWriterFactory)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    // per-(partition, task) names: a retried or speculative attempt
    // can never clobber another attempt's file
    val path = s"$stagingDir/part-$partitionId-$taskId.parquet"
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft", 0), TaskType.MAP, partitionId), taskId.toInt)
    val ctx = new TaskAttemptContextImpl(conf.value, attempt)
    val writer = owf.newInstance(path, schema, ctx)
    new DataWriter[InternalRow] {
      private var n = 0L
      override def write(row: InternalRow): Unit = { writer.write(row); n += 1 }
      override def commit(): WriterCommitMessage = {
        writer.close()
        if (n == 0L) Files.deleteIfExists(Paths.get(path)) // no empty-file litter
        GraftFileMessage(path, n)
      }
      override def abort(): Unit = {
        writer.close()
        Files.deleteIfExists(Paths.get(path))
        ()
      }
      override def close(): Unit = ()
    }
  }
}
