package graft

import org.apache.spark.sql.functions._
import graft.operators.LayoutOps

class LayoutOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue interleaves bits (x even positions, y odd)") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (65535L, 65535L),
      (12345L, 54321L))
    val got = cases.toDF("x", "y")
      .select(LayoutOps.zValue(col("x"), col("y"), 16).as("z"))
      .as[Long].collect()
    assert(got.toSeq === cases.map { case (x, y) => ref(x, y, 16) })
    // interleave of 16-bit inputs stays within 32 bits
    assert(ref(65535L, 65535L, 16) === 0xFFFFFFFFL)
  }

  test("z-ordered files bound BOTH dimensions tighter than a 1-D sort") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val src = Tables.orders(spark, sfDir).select(
      pmod(col("o_custkey"), lit(65536)).as("x"),
      datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).as("y"),
      col("o_orderkey"))
    val nFiles = 8
    LayoutOps.zorderWrite(src, "x", "y", s"$dir/z", nFiles)
    // 1-D baseline: same file count, sorted by x only
    src.repartitionByRange(nFiles, col("x"))
      .sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$dir/linear")

    // Skipping metric (NOT box area — total area is roughly conserved
    // under any space partition): the expected fraction of files whose
    // x-extent contains a random x-point, PLUS the same for y. This is
    // what min/max pruning actually pays for a single-column predicate:
    // an x-sorted layout scores ~1/F on x but ~1.0 on y (every file
    // spans all of y); z-order bounds BOTH extents.
    def skipCost(path: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max($"x") - min($"x")).cast("double").as("dx"),
             (max($"y") - min($"y")).cast("double").as("dy"))
      val Array(rx, ry) = src.agg(
        (max($"x") - min($"x")).cast("double"),
        (max($"y") - min($"y")).cast("double")).as[(Double, Double)]
        .head() match { case (a, b) => Array(a, b) }
      spans.agg(avg($"dx" / rx) + avg($"dy" / ry)).as[Double].head()
    }
    val zCost = skipCost(s"$dir/z")
    val linCost = skipCost(s"$dir/linear")
    assert(zCost < linCost * 0.85,
      f"z-order skip cost $zCost%.3f not better than 1-D sort $linCost%.3f")

    // layout preserves content exactly
    val a = spark.read.parquet(s"$dir/z").select("o_orderkey")
      .as[Long].collect().sorted
    val b = src.select("o_orderkey").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  test("rectangle pruning over z-order stats scans fewer files than an id-ordered layout") {
    val src = Tables.orders(spark, sfDir).select(
      pmod(col("o_custkey"), lit(65536)).as("x"),
      datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).as("y"),
      col("o_orderkey"))
    // query rectangle = the inner quartile band of each dimension, so
    // the receipt holds at any scale factor
    val Array(xlo, xhi, ylo, yhi) = src.agg(
      expr("percentile(x, 0.25)"), expr("percentile(x, 0.5)"),
      expr("percentile(y, 0.25)"), expr("percentile(y, 0.5)"))
      .head().toSeq.map(v => math.round(v.asInstanceOf[Double])).toArray
    def scannedFraction(stats: org.apache.spark.sql.DataFrame): Double = {
      val rows = stats.select(col("file_id"),
        (!(col("max_x") < xlo || col("min_x") > xhi ||
           col("max_y") < ylo || col("min_y") > yhi)).as("scanned"))
        .collect()
      rows.count(_.getBoolean(1)).toDouble / rows.length
    }
    val zFrac = scannedFraction(
      LayoutOps.zorderFileStats(src, "x", "y", "o_orderkey", 100))
    // id-ordered baseline: same file size, files cut by insertion key —
    // min/max boxes then span both dimensions and nothing prunes
    val idOrdered = graft.operators.RelationalOps.globalRowNumber(
        src, Seq(col("o_orderkey").asc), "__rn")
      .withColumn("file_id", ((col("__rn") - 1) / 100).cast("long"))
      .groupBy(col("file_id"))
      .agg(min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
    val idFrac = scannedFraction(idOrdered)
    assert(zFrac < idFrac * 0.7,
      f"z-order should prune: scans $zFrac%.2f vs id-ordered $idFrac%.2f")
  }

  test("string clustering keys: the 7-byte prefix embedding is order-preserving and both dims bound tightly") {
    // order preservation on adversarial shapes: shorter-prefix vs
    // longer ("az" < "b"), shared prefixes, empties, multi-byte UTF-8
    val strs = Seq("", "a", "az", "b", "ba", "tenant-001", "tenant-002",
      "tenant-0021", "z", "ü", "é")
    val emb = strs.toDF("s")
      .select(col("s"), graft.operators.LayoutOps.stringPrefixLong(col("s")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def binLt(a: String, b: String): Boolean = {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n && x(i) == y(i)) i += 1
      if (i < n) (x(i) & 0xff) < (y(i) & 0xff) else x.length < y.length
    }
    for (a <- strs; b <- strs if binLt(a, b) &&
           !a.getBytes("UTF-8").take(7).sameElements(b.getBytes("UTF-8").take(7)))
      assert(emb(a) < emb(b), s"'$a' must embed below '$b'")

    // a (tenant STRING, ts LONG) z-order bounds BOTH dims per file
    val src = (0 until 4000).map { i =>
      (f"tenant-${i % 40}%03d", (i * 37 % 1000).toLong, i.toLong)
    }.toDF("tenant", "ts", "rid")
    val clustered = graft.operators.LayoutOps.zorderClusteredN(
      src, Seq("tenant", "ts"), nFiles = 8)
    assert(clustered.count() === 4000L)
    // per-partition (file) bounding boxes: most files must span far
    // less than the full tenant range AND less than the full ts range
    val boxes = clustered
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("tenant").as("t_lo"), max("tenant").as("t_hi"),
        min("ts").as("ts_lo"), max("ts").as("ts_hi"))
      .collect()
    assert(boxes.length >= 4)
    val tightTenant = boxes.count(r =>
      r.getString(1).take(9) != "tenant-00" ||
        r.getString(2).take(9) == r.getString(1).take(9) ||
        (r.getString(2).stripPrefix("tenant-").toInt -
          r.getString(1).stripPrefix("tenant-").toInt) <= 20)
    assert(tightTenant >= boxes.length / 2,
      s"string dim must bound tighter than the full range: " +
        boxes.map(r => (r.getString(1), r.getString(2))).mkString(", "))
    val tightTs = boxes.count(r => r.getLong(4) - r.getLong(3) <= 700)
    assert(tightTs >= 1, "ts dim must also gain some bounding")
  }

  test("zorderFileStats files carry rowsPerFile rows and cover all rows") {
    val src = Tables.orders(spark, sfDir).select(
      pmod(col("o_custkey"), lit(65536)).as("x"),
      datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).as("y"),
      col("o_orderkey"))
    val stats = LayoutOps.zorderFileStats(src, "x", "y", "o_orderkey", 100)
      .orderBy("file_id").collect()
    val total = src.count()
    assert(stats.map(_.getLong(1)).sum === total)
    // every file but the last is full
    stats.dropRight(1).foreach(r => assert(r.getLong(1) === 100L))
    assert(stats.map(_.getLong(0)).toSeq === stats.indices.map(_.toLong))
  }

  test("compactionPlan packs contiguous files to the target and flags real merges") {
    import spark.implicits._
    // 6 files of 10 rows, target 25: offset packing groups by starting
    // offset div 25 — offsets 0,10,20 -> g0; 30,40 -> g1; 50 -> g2
    val stats = (0L to 5L).map(i => (i, 10L)).toDF("file_id", "n")
    val plan = LayoutOps.compactionPlan(stats, "file_id", "n", targetRows = 25)
      .orderBy("file_id").collect()
    assert(plan.map(_.getAs[Long]("compact_group")).toSeq ===
      Seq(0L, 0L, 0L, 1L, 1L, 2L))
    val groupRows = plan.map(r =>
      r.getAs[Long]("compact_group") -> r.getAs[Long]("group_rows")).toMap
    assert(groupRows === Map(0L -> 30L, 1L -> 20L, 2L -> 10L))
    // multi-file groups merge; the trailing singleton does not
    assert(plan.map(r =>
      r.getAs[Long]("compact_group") -> r.getAs[Boolean]("merges")).toMap ===
      Map(0L -> true, 1L -> true, 2L -> false))
    // groups are CONTIGUOUS runs of file ids (clustering preserved)
    val byGroup = plan.groupBy(_.getAs[Long]("compact_group"))
      .view.mapValues(_.map(_.getAs[Long]("file_id")).sorted.toSeq)
    byGroup.foreach { case (_, ids) =>
      assert(ids === (ids.head to ids.last))
    }
    // an already-compact file (>= target) lands alone and is NOT a merge
    val big = Seq((0L, 30L), (1L, 30L)).toDF("file_id", "n")
    val bigPlan = LayoutOps.compactionPlan(big, "file_id", "n", targetRows = 25)
      .orderBy("file_id").collect()
    assert(bigPlan.map(_.getAs[Long]("compact_group")).distinct.length === 2)
    assert(bigPlan.forall(!_.getAs[Boolean]("merges")))
  }

  test("hilbertValue IS the canonical xy2d: cell-exact, bijective, and jump-free") {
    import spark.implicits._
    // reference implementation of the canonical iterative xy2d
    def xy2d(n: Long, x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val bits = 4; val n = 1L << bits
    val grid = (for (x <- 0L until n; y <- 0L until n) yield (x, y)).toDF("x", "y")
    val got = grid
      .select(col("x"), col("y"),
        LayoutOps.hilbertValue(col("x"), col("y"), bits).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = (for (x <- 0L until n; y <- 0L until n)
      yield (x, y) -> xy2d(n, x, y)).toMap
    assert(got === want, "the expression fold must equal the reference xy2d")
    // bijective over the grid…
    assert(got.values.toSet === (0L until n * n).toSet)
    // …and JUMP-FREE: consecutive indexes are grid-adjacent — the
    // Hilbert property Morton lacks (Morton's diagonal seams are what
    // stretch its bounding boxes)
    val inv = got.map(_.swap)
    (0L until n * n - 1).foreach { d =>
      val ((x1, y1), (x2, y2)) = (inv(d), inv(d + 1))
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"jump between d=$d and ${d + 1}")
    }
  }

  test("hilbert layout beats morton on bounding-box perimeter; pruning stays exact") {
    import spark.implicits._
    // deterministic scatter over a 256x256 domain, 64-row files
    val pts = (0 until 4096).map { i =>
      val h = graft.functions.TextFunctions.h7Jvm(
        s"pt$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((h % 256).toLong, ((h / 256) % 256).toLong, i.toLong)
    }.toDF("x", "y", "tb")
    def perimeter(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("max_x") - col("min_x") + col("max_y") - col("min_y")))
        .head().getLong(0)
    val hil = perimeter(LayoutOps.hilbertFileStats(pts, "x", "y", "tb", 64))
    val mor = perimeter(LayoutOps.zorderFileStats(pts, "x", "y", "tb", 64))
    info(f"total box perimeter hilbert=$hil morton=$mor (${mor.toDouble / hil}%.2fx)")
    assert(hil < mor,
      s"the jump-free curve must yield tighter boxes: hilbert=$hil morton=$mor")
  }

  test("hilbertValueN (Skilling d-dim): cell-exact vs the published transpose, " +
       "bijective and jump-free on the full 3-d grid") {
    import spark.implicits._
    // reference port of Skilling's published pseudocode (AIP Conf.
    // Proc. 707 (2004): AxesToTranspose + MSB-first interleave) —
    // checked against the codegen'd expression cell by cell
    def skilling(b: Int, coords: Array[Long]): Long = {
      val n = coords.length
      val x = coords.clone()
      var q = 1L << (b - 1)
      while (q > 1) {
        val p = q - 1
        for (i <- 0 until n) {
          if ((x(i) & q) != 0) x(0) ^= p
          else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        }
        q >>= 1
      }
      for (i <- 1 until n) x(i) ^= x(i - 1)
      var t2 = 0L
      q = 1L << (b - 1)
      while (q > 1) { if ((x(n - 1) & q) != 0) t2 ^= q - 1; q >>= 1 }
      for (i <- 0 until n) x(i) ^= t2
      var d = 0L
      for (k <- 0 until b; j <- 0 until n)
        d = (d << 1) | ((x(j) >>> (b - 1 - k)) & 1L)
      d
    }
    val bits = 3; val n = 1L << bits
    val grid = (for (x <- 0L until n; y <- 0L until n; z <- 0L until n)
      yield (x, y, z)).toDF("x", "y", "z")
    val got = grid.select(col("x"), col("y"), col("z"),
        LayoutOps.hilbertValueN(Seq(col("x"), col("y"), col("z")), bits).as("d"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    got.foreach { case ((x, y, z), d) =>
      assert(d === skilling(bits, Array(x, y, z)),
        s"cell ($x,$y,$z) diverged from the reference transpose")
    }
    // bijective over the full cube…
    assert(got.values.toSet === (0L until n * n * n).toSet)
    // …and JUMP-FREE: consecutive indexes are grid-adjacent in 3-d —
    // the defining Hilbert property at any dimensionality
    val inv = got.map(_.swap)
    (0L until n * n * n - 1).foreach { d =>
      val ((x1, y1, z1), (x2, y2, z2)) = (inv(d), inv(d + 1))
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) === 1L,
        s"jump between d=$d and ${d + 1}")
    }
    // the 4-d curve is jump-free too (bits=2: 256 cells)
    val g4 = (for (a <- 0L until 4; b <- 0L until 4; c <- 0L until 4;
                   e <- 0L until 4) yield (a, b, c, e)).toDF("a", "b", "c", "e")
    val got4 = g4.select(LayoutOps.hilbertValueN(
        Seq(col("a"), col("b"), col("c"), col("e")), 2).as("d"),
        col("a"), col("b"), col("c"), col("e"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got4.keySet === (0L until 256L).toSet)
    (0L until 255L).foreach { d =>
      val (p, q2) = (got4(d), got4(d + 1))
      assert(math.abs(p._1 - q2._1) + math.abs(p._2 - q2._2) +
        math.abs(p._3 - q2._3) + math.abs(p._4 - q2._4) === 1L,
        s"4-d jump between d=$d and ${d + 1}")
    }
  }

  test("hilbertValueN null-propagates a null coordinate like the 2-dim form (r19)") {
    import spark.implicits._
    val rows = Seq((Some(1L), Some(2L), Some(3L)), (Some(1L), None, Some(3L)),
      (None, None, None)).toDF("x", "y", "z")
    val dims = Seq(col("x"), col("y"), col("z"))
    // codegen path (DataFrame select)
    val got = rows.select(LayoutOps.hilbertValueN(dims, 4).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got(0).isDefined, "all-present coordinates index normally")
    assert(got(1).isEmpty && got(2).isEmpty,
      "a null coordinate must yield a null index, never cluster to a corner")
    // interpreted path agrees (the eval twin of doGenCode)
    val expr = graft.functions.HilbertIndexN(
      org.apache.spark.sql.catalyst.expressions.CreateArray(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal(1L),
        org.apache.spark.sql.catalyst.expressions.Literal(null,
          org.apache.spark.sql.types.LongType))), 4)
    assert(expr.eval(null) === null)
  }

  test("3-dim hilbert beats morton on bounding-box extent; both curves cluster") {
    import spark.implicits._
    // deterministic scatter over a 64^3 domain, 64-row files
    val pts = (0 until 4096).map { i =>
      val h = graft.functions.TextFunctions.h7Jvm(
        s"p3$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((h % 64).toLong, ((h / 64) % 64).toLong, ((h / 4096) % 64).toLong, i.toLong)
    }.toDF("x", "y", "z", "tb")
    def extent(key: org.apache.spark.sql.Column): Long = {
      val keyed = pts.select(col("x"), col("y"), col("z"), col("tb"), key.as("__k"))
      val numbered = graft.operators.RelationalOps.globalRowNumber(
        keyed, Seq(col("__k").asc, col("tb").asc), "__rn")
      numbered.withColumn("fid", ((col("__rn") - 1) / 64).cast("long"))
        .groupBy(col("fid"))
        .agg((max(col("x")) - min(col("x")) + max(col("y")) - min(col("y")) +
          max(col("z")) - min(col("z"))).as("ext"))
        .agg(sum(col("ext"))).head().getLong(0)
    }
    val dims = Seq(col("x"), col("y"), col("z"))
    val hil = extent(LayoutOps.hilbertValueN(dims, 6))
    val mor = extent(LayoutOps.zValueN(dims, 6))
    info(f"total 3-d box extent hilbert=$hil morton=$mor (${mor.toDouble / hil}%.2fx)")
    assert(hil < mor,
      s"the jump-free curve must yield tighter 3-d boxes: hilbert=$hil morton=$mor")
  }
}
