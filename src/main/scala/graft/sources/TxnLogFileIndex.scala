package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** A Spark [[FileIndex]] over a [[TxnLog]] snapshot — the integration
  * that makes log-level data skipping work for ARBITRARY DataFrame /
  * SQL filters, not just the explicit `readRange`/`readPoint` calls:
  * Catalyst hands every scan its pushed-down data filters, and
  * `listFiles` answers with only the files whose per-column
  * (min, max) stats and bloom filters cannot rule out — files the
  * query provably doesn't need are never opened, never even
  * `stat`-ed. This is the public Delta recipe (TahoeLogFileIndex):
  * the log, not the filesystem, names the files, so planning is
  * metadata-only and immune to eventually-consistent listings.
  *
  * Soundness mirrors the explicit read paths: an unknown predicate
  * shape, an unstatted column, or a bloom on a different column keep
  * the file. The snapshot is resolved ONCE at construction — the
  * index is a stable snapshot no matter what commits land after.
  */
class TxnLogFileIndex(spark: SparkSession, root: String,
                      state: Seq[(String, TxnLog.FileMeta)]) extends FileIndex {

  private val statuses: Seq[(FileStatus, TxnLog.FileMeta)] = state.map { case (f, m) =>
    val p = java.nio.file.Paths.get(f)
    (new FileStatus(java.nio.file.Files.size(p), false, 1, 128L * 1024 * 1024,
      java.nio.file.Files.getLastModifiedTime(p).toMillis, new Path("file://" + f)), m)
  }

  override def rootPaths: Seq[Path] = Seq(new Path("file://" + root))
  override def partitionSchema: StructType = StructType(Nil)
  override def inputFiles: Array[String] = state.map(_._1).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.map(_._1.getLen).sum

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = statuses.filter { case (_, m) =>
      dataFilters.forall(mayMatch(m, _))
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._1).toArray))
  }

  private def litLong(v: Any): Option[Long] = v match {
    case l: Long  => Some(l)
    case i: Int   => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte  => Some(b.toLong)
    case _        => None
  }

  /** Could any row of a file with metadata `m` satisfy `e`? Errs on
    * `true` for every shape it doesn't understand — pruning must
    * never be unsound. Only an EXACT statted-column match prunes
    * (the legacy unnamed stat is caller-asserted and the optimizer
    * is not a caller).
    */
  private def mayMatch(m: TxnLog.FileMeta, e: Expression): Boolean = e match {
    case And(l, r) => mayMatch(m, l) && mayMatch(m, r)
    case Or(l, r)  => mayMatch(m, l) || mayMatch(m, r)
    case EqualTo(a: AttributeReference, Literal(v, _)) => pointOk(m, a.name, v)
    case EqualTo(Literal(v, _), a: AttributeReference) => pointOk(m, a.name, v)
    case GreaterThan(a: AttributeReference, Literal(v, _)) =>
      litLong(v).forall(lv => m.stats.get(a.name).forall(_.hi > lv))
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      litLong(v).forall(lv => m.stats.get(a.name).forall(_.hi >= lv))
    case LessThan(a: AttributeReference, Literal(v, _)) =>
      litLong(v).forall(lv => m.stats.get(a.name).forall(_.lo < lv))
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      litLong(v).forall(lv => m.stats.get(a.name).forall(_.lo <= lv))
    case GreaterThan(Literal(v, _), a: AttributeReference) =>
      mayMatch(m, LessThan(a, Literal(v)))
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
      mayMatch(m, LessThanOrEqual(a, Literal(v)))
    case LessThan(Literal(v, _), a: AttributeReference) =>
      mayMatch(m, GreaterThan(a, Literal(v)))
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
      mayMatch(m, GreaterThanOrEqual(a, Literal(v)))
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists { case Literal(v, _) => pointOk(m, a.name, v) }
    case InSet(a: AttributeReference, vs) =>
      vs.exists(v => pointOk(m, a.name, v))
    case _ => true
  }

  /** Point predicate: range stats (numeric values) AND the bloom
    * filter (any value the build hashed) must both admit the value.
    */
  private def pointOk(m: TxnLog.FileMeta, column: String, v: Any): Boolean = {
    val rangeOk = litLong(v).forall(lv =>
      m.stats.get(column).forall(st => lv >= st.lo && lv <= st.hi))
    val probe: Any = v match {
      case u: UTF8String => u.toString // catalyst strings → lit()-able
      case other         => other
    }
    rangeOk && TxnLog.bloomAdmits(spark, m, column, probe)
  }
}
