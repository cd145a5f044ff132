package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

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
