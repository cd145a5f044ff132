package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering (Z-ordering / Morton
  * curves) — the physical-design lever that decides whether a 100 TB
  * scan with predicates on TWO columns reads 100 TB or 1 TB. Sorting
  * by one column gives perfect min/max file-skipping on that column
  * and none on any other; interleaving the bits of both columns into
  * one sort key gives each file a TIGHT bounding box in BOTH
  * dimensions, so a parquet reader's row-group stats prune files for
  * either predicate (the technique behind Delta/Iceberg OPTIMIZE
  * ZORDER BY; Morton 1966 is public domain).
  *
  * Everything here is deterministic integer bit math — no sampling, no
  * RNG — so layout decisions are reproducible in a SQL oracle.
  */
object LayoutOps {

  /** Morton z-value: interleave the low `bits` bits of `x` (even bit
    * positions) and `y` (odd positions) into a single long sort key.
    * Pure codegen'd integer shifts — scan-fused, shuffle-free.
    * Callers normalize x/y into [0, 2^bits) first (pmod / rank / bin).
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits outside [1, 31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Affine-normalize both dimensions into [0, 2^bits) before
    * interleaving: x' = floor((x − min_x) · (2^bits − 1) / span).
    * Interleaving RAW values is wrong whenever the dimensions differ
    * in scale — the wider column's high bits occupy all the top
    * interleave positions and the curve degenerates to a 1-D sort on
    * that column (plus constant offsets waste bits entirely). One tiny
    * min/max aggregate per layout job, broadcast back — the same
    * domain-mapping step Delta's OPTIMIZE ZORDER runs. Deterministic:
    * identical double affine + floor on any engine.
    */
  private def withNormalizedDims(df: DataFrame, xCol: String, yCol: String,
                                 bits: Int): DataFrame = {
    val maxCode = (1L << bits) - 1
    val stats = df.agg(
      min(col(xCol).cast("long")).as("__xmin"),
      max(col(xCol).cast("long")).as("__xmax"),
      min(col(yCol).cast("long")).as("__ymin"),
      max(col(yCol).cast("long")).as("__ymax"))
    def scaled(c: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0L)).otherwise(
        floor((c.cast("double") - lo.cast("double")) * lit(maxCode.toDouble) /
          (hi.cast("double") - lo.cast("double"))).cast("long"))
    df.crossJoin(broadcast(stats))
      .withColumn("__zx", scaled(col(xCol), col("__xmin"), col("__xmax")))
      .withColumn("__zy", scaled(col(yCol), col("__ymin"), col("__ymax")))
      .drop("__xmin", "__xmax", "__ymin", "__ymax")
  }

  /** Per-file bounding boxes of a z-ordered layout: rows sort by
    * (z of the NORMALIZED dims, tiebreak), files take `rowsPerFile`
    * consecutive rows, and the result reports each file's min/max of
    * the RAW dimensions — exactly the row-group stats a reader would
    * prune against. The global sort uses
    * [[RelationalOps.globalRowNumber]] (range-partition + offset
    * composition), so no single-partition window touches the fact
    * table at scale.
    *
    * Returns (file_id, n, min_x, max_x, min_y, max_y) — small (one row
    * per file) and fully deterministic given a unique tiebreak.
    */
  def zorderFileStats(df: DataFrame, xCol: String, yCol: String,
                      tiebreak: String, rowsPerFile: Int,
                      bits: Int = 16): DataFrame = {
    val z = withNormalizedDims(df, xCol, yCol, bits)
      .select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"), col(tiebreak).as("__tb"),
        zValue(col("__zx"), col("__zy"), bits).as("__z"))
    val numbered = RelationalOps.globalRowNumber(z,
      Seq(col("__z").asc, col("__tb").asc), "__rn")
    numbered
      .withColumn("file_id", ((col("__rn") - 1) / rowsPerFile).cast("long"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n"),
        min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"))
  }

  /** Compaction planning over file statistics — the OPTIMIZE side of
    * the lakehouse small-file problem: a streaming ingest leaves
    * thousands of under-sized files, and the compactor must group
    * NEIGHBORING files (so the merged file keeps a tight bounding box —
    * compaction that destroys clustering un-does [[zorderFileStats]])
    * into jobs of ~`targetRows` each. Greedy in layout order: running
    * row count over files sorted by file_id, group = starting offset
    * div target — each group takes consecutive files until the target
    * fills.
    *
    * This is a METADATA-ONLY plan: input is one row per file, so the
    * unpartitioned running-sum window is bounded by the file count (the
    * [[RelationalOps.globalRowNumber]] offsets argument — manifest
    * scale, not data scale; a 100 TB table at 128 MB/file is ~10⁶
    * manifest rows). Output: one row per file with its compaction
    * group, the group's total rows, and whether the group actually
    * merges anything (singleton groups at target size are already
    * compact — no-op jobs the compactor skips).
    */
  def compactionPlan(fileStats: DataFrame, fileIdCol: String, rowsCol: String,
                     targetRows: Long): DataFrame = {
    require(targetRows >= 1)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(fileIdCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val byGroup = org.apache.spark.sql.expressions.Window
      .partitionBy(col("compact_group"))
    fileStats.select(col(fileIdCol).as("file_id"), col(rowsCol).as("n_rows"))
      .withColumn("__cum", sum(col("n_rows")).over(w))
      .withColumn("compact_group",
        expr(s"(__cum - n_rows) div ${targetRows}L"))
      .withColumn("group_rows", sum(col("n_rows")).over(byGroup))
      .withColumn("merges",
        count(lit(1)).over(byGroup) > 1)
      .select(col("file_id"), col("n_rows"), col("compact_group"),
        col("group_rows"), col("merges"))
  }

  /** Write `df` physically z-ordered on (xCol, yCol): range-partition
    * by the normalized z-value into `nFiles` output files, sort within
    * each, drop the helper columns. The write itself is ordinary
    * parquet — the LAYOUT is the optimization, and any engine reading
    * the files gets the file-skipping for free from row-group stats.
    */
  /** The z-order clustering TRANSFORM alone: rows range-partitioned
    * and sorted by their Morton code, helper columns dropped — for
    * callers that stage the result through their own write path
    * (e.g. a transaction log rewrite).
    */
  def zorderClustered(df: DataFrame, xCol: String, yCol: String,
                      nFiles: Int, bits: Int = 16): DataFrame =
    withNormalizedDims(df, xCol, yCol, bits)
      .withColumn("__z", zValue(col("__zx"), col("__zy"), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__zx", "__zy", "__z")

  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
                  nFiles: Int, bits: Int = 16): Unit =
    zorderClustered(df, xCol, yCol, nFiles, bits)
      .write.mode("overwrite").parquet(path)
}
