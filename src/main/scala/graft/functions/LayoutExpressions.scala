package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 2-D Hilbert index `graft_hilbert(x, y, bits)` — the
  * canonical iterative xy2d as ONE whole-stage-codegen'd loop.
  *
  * The layout job runs this once per ROW of the table being
  * re-clustered; the expression-fold formulation it replaced nested 32
  * `transform(array(...))` higher-order functions, which Spark
  * evaluates interpreted (~10 lambda dispatches per level per row —
  * measured 8.3 s vs io_zorder's shift-or at sf0.1). Same integer
  * trace as the SQL oracle's generated CTE chain and LayoutOpsSpec's
  * reference implementation, bit for bit.
  *
  * `bits` is baked into the instance at resolution time (an integer
  * literal in the call, like graft_minhash's width); inputs are longs
  * already normalized into [0, 2^bits).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"graft_hilbert: bits=$bits outside [1, 31]")

  private val n: Long = 1L << bits

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert requires bigint coordinates, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hilbert"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // every local freshName'd: janino scopes method-wide, and two
      // fused hilbert calls would otherwise collide (the graft_dot
      // lesson)
      val x = ctx.freshName("hx"); val y = ctx.freshName("hy")
      val d = ctx.freshName("hd"); val s = ctx.freshName("hs")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a; long $y = $b; long $d = 0L;
         |for (long $s = ${n >> 1}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = ${n - 1}L - $x; $y = ${n - 1}L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

/** Native d-dimensional Hilbert index
  * `graft_hilbert_n(array(x1..xd), bits)` — Skilling's transpose
  * algorithm ("Programming the Hilbert curve", AIP Conf. Proc. 707,
  * 2004; public domain pseudocode) as one whole-stage-codegen'd pass:
  * AxesToTranspose (the inverse-undo + Gray-decode bit dance, O(d·b)
  * long ops) followed by MSB-first bit interleave of the transposed
  * axes into a single long distance.
  *
  * The 2-dim [[HilbertIndex]] keeps the canonical xy2d trace (its SQL
  * oracle replays that exact fold); this is the d>2 generalization
  * behind `optimize_zorder(cols => 'a,b,c', curve => 'hilbert')`.
  * Inputs are longs already affine-normalized into [0, 2^bits);
  * `d * bits` must fit 63 bits (checked per row — the driver-side
  * caller also bounds `bits` by 63/d).
  */
case class HilbertIndexN(child: Expression, bits: Int)
  extends UnaryExpression {

  require(bits >= 1 && bits <= 31, s"graft_hilbert_n: bits=$bits outside [1, 31]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert_n requires array<bigint> coordinates, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  // a null coordinate null-propagates (like the 2-dim [[HilbertIndex]])
  // rather than silently reading 0 and clustering the row to a corner
  override def nullable: Boolean = true

  override def prettyName: String = "graft_hilbert_n"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    require(n >= 1 && n * bits <= 63,
      s"graft_hilbert_n: $n dims x $bits bits exceeds a 63-bit index")
    val x = new Array[Long](n)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return null
      x(j) = arr.getLong(j); j += 1
    }
    // AxesToTranspose: inverse undo
    var q = 1L << (bits - 1)
    while (q > 1L) {
      val p = q - 1L
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t2 = 0L
    q = 1L << (bits - 1)
    while (q > 1L) { if ((x(n - 1) & q) != 0L) t2 ^= q - 1L; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t2; i += 1 }
    // interleave the transpose MSB-first: X[0] carries the index's
    // most significant bit at every level
    var d = 0L
    var k = 0
    while (k < bits) {
      var jj = 0
      while (jj < n) {
        d = (d << 1) | ((x(jj) >>> (bits - 1 - k)) & 1L)
        jj += 1
      }
      k += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("hn"); val x = ctx.freshName("hxs")
      val q = ctx.freshName("hq"); val p = ctx.freshName("hp")
      val t = ctx.freshName("ht"); val i = ctx.freshName("hi")
      val t2 = ctx.freshName("ht2"); val d = ctx.freshName("hd")
      val k = ctx.freshName("hk"); val j = ctx.freshName("hj")
      s"""
         |int $n = $a.numElements();
         |if ($n < 1 || $n * $bits > 63)
         |  throw new IllegalArgumentException(
         |    "graft_hilbert_n: " + $n + " dims x $bits bits exceeds a 63-bit index");
         |long[] $x = new long[$n];
         |for (int $j = 0; $j < $n && !${ev.isNull}; $j++) {
         |  if ($a.isNullAt($j)) ${ev.isNull} = true;
         |  else $x[$j] = $a.getLong($j);
         |}
         |if (!${ev.isNull}) {
         |  for (long $q = ${1L << (bits - 1)}L; $q > 1L; $q >>= 1) {
         |    long $p = $q - 1L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (($x[$i] & $q) != 0L) $x[0] ^= $p;
         |      else { long $t = ($x[0] ^ $x[$i]) & $p; $x[0] ^= $t; $x[$i] ^= $t; }
         |    }
         |  }
         |  for (int $i = 1; $i < $n; $i++) $x[$i] ^= $x[$i - 1];
         |  long $t2 = 0L;
         |  for (long $q = ${1L << (bits - 1)}L; $q > 1L; $q >>= 1)
         |    if (($x[$n - 1] & $q) != 0L) $t2 ^= $q - 1L;
         |  for (int $i = 0; $i < $n; $i++) $x[$i] ^= $t2;
         |  long $d = 0L;
         |  for (int $k = 0; $k < $bits; $k++)
         |    for (int $j = 0; $j < $n; $j++)
         |      $d = ($d << 1) | (($x[$j] >>> ($bits - 1 - $k)) & 1L);
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HilbertIndexN =
    copy(child = newChild)
}
