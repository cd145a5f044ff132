package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codebook-driven per-row vector operators (IVF cell assignment, PQ
  * encoding, ADC table construction).
  *
  * WHY these are native expressions taking the codebook as an ARRAY
  * CHILD rather than per-centroid column expressions over scalar
  * literals: a scalar `lit(x)` inlines its value into the generated
  * Java source text, so a plan built from N centroids × dim collected
  * DATA values produces source that changes whenever the data does —
  * every scale factor, retrain, or ingest batch recompiles several
  * seconds of janino output (measured ~5–9 s for the PQ encode's
  * m × ksub argmin forest). An array literal, by contrast, travels in
  * the codegen `references` table: the generated source is byte-
  * identical across codebooks, so the compile done on one dataset
  * (e.g. a bench warm-up corpus, or the previous ingest batch) is
  * reused verbatim on the next.
  *
  * These extend [[CodegenFallback]] deliberately: each call does
  * O(nlist · dim) – O(m · ksub · dsub) float work per row, so one
  * virtual eval dispatch per ROW is noise (the rule that bans
  * interpreted evaluation targets per-ELEMENT lambda dispatch, cf.
  * [[DotProductD]]'s rationale) — and fallback keeps the generated
  * source tiny and data-independent, which is the point.
  *
  * Determinism contract (all three): element reads widen float →
  * double before multiply; sums accumulate in index order; double
  * comparisons use `java.lang.Double.compare` (NaN greatest, the same
  * total order `array_sort` used in the expression formulation these
  * replaced); ties break to the LOWER index. Float traces are
  * bit-identical to the previous struct-sort formulation, so no
  * oracle changed when these landed.
  */
abstract class CodebookExpression extends Expression with CodegenFallback {
  override def nullable: Boolean = true

  /** Parse a foldable array<double> child once (driver or executor —
    * whoever evaluates first; Literal.eval ignores the row).
    */
  protected def constDoubles(e: Expression): Array[Double] =
    e.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  /** Analysis-time validation of a codebook child: a registered SQL
    * caller can hand `graft_cell_topn`/`graft_pq_encode`/`graft_adc`
    * anything, and a loose check surfaced as a runtime
    * ClassCastException/NPE from [[constDoubles]] deep inside an
    * executor instead of an analysis error at the call site. Requires
    * a FOLDABLE array<double> with no null elements, evaluated eagerly
    * (codebooks are bounded driver artifacts — nlist·dim / m·ksub·dsub
    * doubles — so the eval is cheap and happens once).
    */
  protected def codebookError(name: String, e: Expression): Option[String] = {
    if (!e.foldable) return Some(s"$name must be a foldable array<double>")
    e.dataType match {
      case ArrayType(DoubleType, _) =>
        val v = e.eval(null)
        if (v == null) return Some(s"$name must not be NULL")
        val a = v.asInstanceOf[ArrayData]
        if (a.numElements() == 0) return Some(s"$name must be non-empty")
        var i = 0
        while (i < a.numElements()) {
          if (a.isNullAt(i)) return Some(s"$name must not contain null elements")
          i += 1
        }
        None
      case t => Some(s"$name must be array<double>, got ${t.catalogString}")
    }
  }

  protected def constLen(e: Expression): Int =
    e.eval(null).asInstanceOf[ArrayData].numElements()

  protected def vecIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def numericArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** v[i] widened to double. */
  protected def elem(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
}

/** `graft_cell_topn(vec, nrm, centsFlat, centNrms, n)` → array<int>:
  * the indices of the `n` codebook cells nearest to `vec` by cosine,
  * best first — rank-1 assignment (`n = 1`) and multi-probe fan-out
  * (`n = nprobe`) in one operator. `centsFlat` is the nlist × dim
  * row-major flattening of the codebook; similarity for cell i is
  * `dot(vec, c_i) / (nrm · |c_i|)` with the same index-ordered dot
  * and divide order as the (negsim, cell) struct-sort it replaces.
  */
case class CellTopN(vec: Expression, nrm: Expression, cents: Expression,
                    centNrms: Expression, n: Int) extends CodebookExpression {

  override def children: Seq[Expression] = Seq(vec, nrm, cents, centNrms)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!numericArray(vec.dataType) || nrm.dataType != DoubleType || n < 1)
      return TypeCheckResult.TypeCheckFailure(
        "graft_cell_topn(vec, nrm double, centsFlat lit, centNrms lit, n >= 1)")
    codebookError("centsFlat", cents).orElse(codebookError("centNrms", centNrms))
      .orElse {
        // centsFlat must flatten to nlist complete rows of dim doubles
        if (constLen(cents) % constLen(centNrms) != 0)
          Some(s"centsFlat length ${constLen(cents)} is not a multiple of " +
            s"nlist = ${constLen(centNrms)}")
        else None
      }
      .map(TypeCheckResult.TypeCheckFailure(_))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_cell_topn"

  @transient private lazy val cFlat = constDoubles(cents)
  @transient private lazy val cNrms = constDoubles(centNrms)
  @transient private lazy val isFloat = vecIsFloat(vec)

  override def eval(input: InternalRow): Any = {
    val vAny = vec.eval(input)
    val nAny = nrm.eval(input)
    if (vAny == null || nAny == null) return null
    val v = vAny.asInstanceOf[ArrayData]
    val vn = nAny.asInstanceOf[Double]
    val nlist = cNrms.length
    val dim = cFlat.length / nlist
    val neg = new Array[Double](nlist)
    var i = 0
    while (i < nlist) {
      val upTo = math.min(dim, v.numElements())
      var sum = 0.0
      var k = 0
      while (k < upTo) {
        if (!v.isNullAt(k)) sum += elem(v, k, isFloat) * cFlat(i * dim + k)
        k += 1
      }
      neg(i) = -(sum / (vn * cNrms(i)))
      i += 1
    }
    val take = math.min(n, nlist)
    val out = new Array[Int](take)
    val used = new Array[Boolean](nlist)
    var r = 0
    while (r < take) {
      var best = -1
      var i2 = 0
      while (i2 < nlist) {
        if (!used(i2) &&
            (best < 0 || java.lang.Double.compare(neg(i2), neg(best)) < 0)) {
          best = i2
        }
        i2 += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CellTopN =
    copy(vec = newChildren(0), nrm = newChildren(1), cents = newChildren(2),
      centNrms = newChildren(3))
}

/** `graft_pq_encode(vec, cbFlat, m, ksub)` → array<int> of `m`
  * product-quantizer codes: segment s of `vec` (dsub = |cb| / (m·ksub)
  * dims) maps to its nearest sub-centroid by the rank-equivalent
  * distance `|c|² − 2·v_s·c` (the `v_s·v_s` term is constant within a
  * segment), ties to the lowest code. `cbFlat` is the (segment, code,
  * dim) row-major flattening. `|c|²` accumulates in index order once
  * per expression instance — the same doubles the driver-side literal
  * computation produced before.
  */
case class PqEncode(vec: Expression, cb: Expression, m: Int, ksub: Int)
    extends CodebookExpression {

  override def children: Seq[Expression] = Seq(vec, cb)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!numericArray(vec.dataType) || m < 1 || ksub < 1)
      return TypeCheckResult.TypeCheckFailure(
        "graft_pq_encode(vec, cbFlat lit, m >= 1, ksub >= 1)")
    codebookError("cbFlat", cb)
      .orElse {
        if (constLen(cb) % (m * ksub) != 0)
          Some(s"cbFlat length ${constLen(cb)} is not a multiple of " +
            s"m * ksub = ${m * ksub}")
        else None
      }
      .map(TypeCheckResult.TypeCheckFailure(_))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val cbFlat = constDoubles(cb)
  @transient private lazy val dsub = cbFlat.length / (m * ksub)
  @transient private lazy val c2: Array[Double] = {
    val out = new Array[Double](m * ksub)
    var sj = 0
    while (sj < m * ksub) {
      var s = 0.0
      var i = 0
      while (i < dsub) { val x = cbFlat(sj * dsub + i); s += x * x; i += 1 }
      out(sj) = s
      sj += 1
    }
    out
  }
  @transient private lazy val isFloat = vecIsFloat(vec)

  override def eval(input: InternalRow): Any = {
    val vAny = vec.eval(input)
    if (vAny == null) return null
    val v = vAny.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestJ = 0
      var bestD = Double.NaN
      var j = 0
      while (j < ksub) {
        val base = (s * ksub + j) * dsub
        val upTo = math.max(0, math.min(dsub, v.numElements() - s * dsub))
        var dot = 0.0
        var i = 0
        while (i < upTo) {
          val k = s * dsub + i
          if (!v.isNullAt(k)) dot += elem(v, k, isFloat) * cbFlat(base + i)
          i += 1
        }
        val d = c2(s * ksub + j) - 2.0 * dot
        if (j == 0 || java.lang.Double.compare(d, bestD) < 0) {
          bestD = d; bestJ = j
        }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqEncode =
    copy(vec = newChildren(0), cb = newChildren(1))
}

/** `graft_adc(vec, cbFlat, m, ksub)` → array<array<bigint>>: the
  * asymmetric-distance table of a PQ query — entry (s, j) is
  * `round(dot(vec_s, c_{s,j}) · 1e6)` in integer micro-units
  * (HALF_UP, the same half-away-from-zero contract as Spark's
  * `round` and DuckDB's), so candidate ADC scores downstream are
  * exact long sums on every engine.
  */
case class AdcTable(vec: Expression, cb: Expression, m: Int, ksub: Int)
    extends CodebookExpression {

  override def children: Seq[Expression] = Seq(vec, cb)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!numericArray(vec.dataType) || m < 1 || ksub < 1)
      return TypeCheckResult.TypeCheckFailure(
        "graft_adc(vec, cbFlat lit, m >= 1, ksub >= 1)")
    codebookError("cbFlat", cb)
      .orElse {
        if (constLen(cb) % (m * ksub) != 0)
          Some(s"cbFlat length ${constLen(cb)} is not a multiple of " +
            s"m * ksub = ${m * ksub}")
        else None
      }
      .map(TypeCheckResult.TypeCheckFailure(_))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def prettyName: String = "graft_adc"

  @transient private lazy val cbFlat = constDoubles(cb)
  @transient private lazy val dsub = cbFlat.length / (m * ksub)
  @transient private lazy val isFloat = vecIsFloat(vec)

  override def eval(input: InternalRow): Any = {
    val vAny = vec.eval(input)
    if (vAny == null) return null
    val v = vAny.asInstanceOf[ArrayData]
    val rows = new Array[ArrayData](m)
    var s = 0
    while (s < m) {
      val micro = new Array[Long](ksub)
      var j = 0
      while (j < ksub) {
        val base = (s * ksub + j) * dsub
        val upTo = math.max(0, math.min(dsub, v.numElements() - s * dsub))
        var dot = 0.0
        var i = 0
        while (i < upTo) {
          val k = s * dsub + i
          if (!v.isNullAt(k)) dot += elem(v, k, isFloat) * cbFlat(base + i)
          i += 1
        }
        micro(j) = java.math.BigDecimal.valueOf(dot * 1e6)
          .setScale(0, RoundingMode.HALF_UP).longValue()
        j += 1
      }
      rows(s) = new GenericArrayData(micro)
      s += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AdcTable =
    copy(vec = newChildren(0), cb = newChildren(1))
}
