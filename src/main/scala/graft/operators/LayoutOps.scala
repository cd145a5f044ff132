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

  /** N-dimensional Morton z-value: bit `i` of dimension `j` lands at
    * interleave position `i * d + j`, so `d * bits` must fit a long's
    * sign-free 63 bits. Pure codegen'd integer shifts — scan-fused,
    * shuffle-free. Callers normalize every dimension into [0, 2^bits)
    * first (pmod / rank / bin / [[withNormalizedDimsN]]).
    */
  def zValueN(dims: Seq[Column], bits: Int = 16): Column = {
    val d = dims.size
    require(d >= 1, "zValueN needs at least one dimension")
    require(bits >= 1 && d * bits <= 63,
      s"d=$d dims at bits=$bits overflow a long sort key (d*bits must be <= 63)")
    val longs = dims.map(_.cast("long"))
    (for {
      i <- 0 until bits
      (c, j) <- longs.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * d + j))
      .reduce(_ bitwiseOR _)
  }

  /** The 2-dim special case (x even positions, y odd) — bit-identical
    * to `zValueN(Seq(x, y), bits)`; kept for the established callers
    * and the SQL oracle that spells the interleave longhand.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits <= 31, s"bits=$bits outside [1, 31]")
    zValueN(Seq(x, y), bits)
  }

  /** 2-D HILBERT index (the canonical iterative xy2d — Hilbert 1891,
    * public-domain bit formulation): unlike Morton, the Hilbert curve
    * never jumps — consecutive indexes are always grid-adjacent — so
    * consecutive-row files get bounding boxes with up to ~2× less
    * perimeter than Morton's on the same data (Morton's diagonal
    * discontinuities stretch boxes across the seam; the receipt is
    * pinned in LayoutOpsSpec). This is the curve behind Databricks
    * liquid clustering's layout; Morton stays the N-dim default
    * because its interleave is a pure shift-or.
    *
    * The fold (quadrant index (3·rx) XOR ry scaled by s², then
    * rotate/reflect) runs as the NATIVE codegen'd
    * [[graft.functions.HilbertIndex]] (`graft_hilbert`) — one tight
    * Java loop per row; an expression-level fold would nest 32
    * interpreted higher-order functions (measured ~4× the whole
    * layout job's wall at sf0.1). Inputs must be normalized into
    * [0, 2^bits) — same contract as [[zValueN]]. Exact integer math;
    * the SQL oracle replays the identical fold as a generated CTE
    * chain.
    */
  def hilbertValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits outside [1, 31]")
    call_function("graft_hilbert", x.cast("long"), y.cast("long"), lit(bits))
  }

  /** d-dimensional HILBERT index (Skilling's transpose algorithm,
    * AIP Conf. Proc. 707, 2004 — public domain) via the native
    * codegen'd [[graft.functions.HilbertIndexN]]: the same jump-free
    * locality as [[hilbertValue]] at any dimensionality, one tight
    * O(d·bits) Java loop per row. Same normalization contract as
    * [[zValueN]] ([0, 2^bits) per dim; `d·bits` ≤ 63). The 2-dim
    * entry point keeps the canonical xy2d trace for its SQL oracle;
    * this is the `cols => 'a,b,c', curve => 'hilbert'` path.
    */
  def hilbertValueN(dims: Seq[Column], bits: Int = 16): Column = {
    val d = dims.size
    require(d >= 1, "hilbertValueN needs at least one dimension")
    require(bits >= 1 && d * bits <= 63,
      s"d=$d dims at bits=$bits overflow a long index (d*bits must be <= 63)")
    call_function("graft_hilbert_n",
      array(dims.map(_.cast("long")): _*), lit(bits))
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
                                 bits: Int): DataFrame =
    withNormalizedDimsN(df, Seq(xCol, yCol), bits)
      .withColumnRenamed("__zd0", "__zx").withColumnRenamed("__zd1", "__zy")

  /** A STRING dimension's order-preserving long embedding: skip
    * `skipChars` leading characters, then read the next 7 UTF-8
    * bytes zero-right-padded as a big-endian integer — binary
    * comparison of two strings sharing those skipped characters
    * equals numeric comparison of these longs whenever they differ
    * inside the 7-byte window (ties beyond it coarsen the curve but
    * never mis-order it: clustering is a layout decision, and the
    * per-file TYPED string stats collected after the rewrite (X-A44
    * base64 bounds) are what pruning actually compares). 7 bytes =
    * 56 bits keeps the value non-negative, so signed long order IS
    * unsigned byte order. Pure built-ins (substr/encode/rpad/hex/
    * conv) — codegen'd, no UDF, reproducible in a SQL oracle. NULL
    * embeds as 0 (sorts first, deterministic).
    */
  private[graft] def stringPrefixLong(c: Column,
                                      skipChars: Column = lit(0)): Column =
    coalesce(
      conv(hex(call_function("rpad",
        encode(c.substr(skipChars + lit(1), lit(16)), "UTF-8"),
        lit(7), lit(Array[Byte](0)))), 16, 10)
        .cast("long"),
      lit(0L))

  /** Character length of the common prefix of `lo` and `hi` (capped
    * at 64). Every string BETWEEN them in binary order shares that
    * prefix, so skipping it before the 7-byte embedding spends the
    * window on the bytes that actually discriminate — without this, a
    * `tenant-001`-style key population (one shared prefix, the most
    * common real shape) would collapse to a single embedded value.
    */
  private[graft] def commonPrefixChars(lo: Column, hi: Column): Column =
    aggregate(sequence(lit(1), lit(64)), lit(0),
      (acc, i) => when(acc === i - lit(1) &&
          lo.substr(i, lit(1)) === hi.substr(i, lit(1)) &&
          lo.substr(i, lit(1)) =!= lit(""), i).otherwise(acc))

  /** The N-dim normalization: one broadcast min/max aggregate over
    * ALL dimensions, each scaled into [0, 2^bits) as `__zd<j>`.
    * String dimensions participate through an order-preserving
    * common-prefix-stripped 7-byte embedding — `(tenant_id STRING,
    * ts)` clustering keys z-order like numeric ones.
    */
  private def withNormalizedDimsN(df: DataFrame, cols: Seq[String],
                                  bits: Int): DataFrame = {
    val maxCode = (1L << bits) - 1
    val isStr = cols.map(c =>
      df.schema(c).dataType == org.apache.spark.sql.types.StringType)
    val aggs = cols.zipWithIndex.flatMap { case (c, j) =>
      if (isStr(j)) Seq(min(col(c)).as(s"__min$j"), max(col(c)).as(s"__max$j"))
      else Seq(min(col(c).cast("long")).as(s"__min$j"),
        max(col(c).cast("long")).as(s"__max$j"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    def scaled(c: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0L)).otherwise(
        floor((c.cast("double") - lo.cast("double")) * lit(maxCode.toDouble) /
          (hi.cast("double") - lo.cast("double"))).cast("long"))
    val joined = df.crossJoin(broadcast(stats))
    val withDims = cols.zipWithIndex.foldLeft(joined) { case (d, (c, j)) =>
      val (lo, hi) = (col(s"__min$j"), col(s"__max$j"))
      val dim =
        if (!isStr(j)) scaled(col(c).cast("long"), lo, hi)
        else {
          // skip the corpus-wide common prefix (a column expression
          // over the broadcast stats), then embed the discriminating
          // window; lo/hi embed with the SAME skip so the affine
          // normalization sees one consistent coordinate system
          val skip = commonPrefixChars(lo, hi)
          scaled(stringPrefixLong(col(c), skip),
            stringPrefixLong(lo, skip), stringPrefixLong(hi, skip))
        }
      d.withColumn(s"__zd$j", dim)
    }
    withDims.drop(cols.indices.flatMap(j => Seq(s"__min$j", s"__max$j")): _*)
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
    zorderClusteredN(df, Seq(xCol, yCol), nFiles, bits)

  /** N-dim clustering: rows range-partitioned and sorted by their
    * d-dim Morton code, helper columns dropped. `bits` defaults shrink
    * with dimensionality so the code always fits a long (the caller
    * can pass an explicit budget).
    */
  def zorderClusteredN(df: DataFrame, cols: Seq[String],
                       nFiles: Int, bits0: Int = 0): DataFrame = {
    val bits = if (bits0 > 0) bits0 else math.min(16, 63 / cols.size)
    withNormalizedDimsN(df, cols, bits)
      .withColumn("__z",
        zValueN(cols.indices.map(j => col(s"__zd$j")), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop(cols.indices.map(j => s"__zd$j") :+ "__z": _*)
  }

  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
                  nFiles: Int, bits: Int = 16): Unit =
    zorderClustered(df, xCol, yCol, nFiles, bits)
      .write.mode("overwrite").parquet(path)

  /** Hilbert-clustered transform — [[zorderClustered]] with the
    * jump-free curve: rows range-partitioned and sorted by their
    * Hilbert index over the affine-normalized dims.
    */
  def hilbertClustered(df: DataFrame, xCol: String, yCol: String,
                       nFiles: Int, bits: Int = 16): DataFrame =
    withNormalizedDims(df, xCol, yCol, bits)
      .withColumn("__h", hilbertValue(col("__zx"), col("__zy"), bits))
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__zx", "__zy", "__h")

  /** N-dim Hilbert clustering — [[zorderClusteredN]] with the
    * jump-free curve ([[hilbertValueN]]); same bits-shrink-with-dims
    * default so the index always fits a long.
    */
  def hilbertClusteredN(df: DataFrame, cols: Seq[String],
                        nFiles: Int, bits0: Int = 0): DataFrame = {
    val bits = if (bits0 > 0) bits0 else math.min(16, 63 / cols.size)
    withNormalizedDimsN(df, cols, bits)
      .withColumn("__h",
        hilbertValueN(cols.indices.map(j => col(s"__zd$j")), bits))
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop(cols.indices.map(j => s"__zd$j") :+ "__h": _*)
  }

  /** Per-file bounding boxes of a Hilbert layout — [[zorderFileStats]]
    * with the Hilbert sort key; same deterministic
    * (file_id, n, min/max per dim) contract, so the two curves'
    * locality compares apples-to-apples.
    */
  def hilbertFileStats(df: DataFrame, xCol: String, yCol: String,
                       tiebreak: String, rowsPerFile: Int,
                       bits: Int = 16): DataFrame = {
    val h = withNormalizedDims(df, xCol, yCol, bits)
      .select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"), col(tiebreak).as("__tb"),
        hilbertValue(col("__zx"), col("__zy"), bits).as("__h"))
    val numbered = RelationalOps.globalRowNumber(h,
      Seq(col("__h").asc, col("__tb").asc), "__rn")
    numbered
      .withColumn("file_id", ((col("__rn") - 1) / rowsPerFile).cast("long"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n"),
        min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"))
  }
}
