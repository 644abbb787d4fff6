package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Native layout-key expressions (SURVEY.md B194). The Morton key (B52) is a
 * fixed shift/mask ladder and composes fine from built-ins; the HILBERT index
 * cannot — each of its 16 rounds rotates/reflects the coordinate frame based
 * on the current quadrant, so a composed expression tree would re-expand the
 * (x, y) subtrees ~3× per round (3^16 nodes). This expression is the loop the
 * math wants: one fused pass in `nullSafeEval` and a literal Java loop in
 * `doGenCode`, identical semantics interpreted and compiled.
 *
 * Why Hilbert over Morton at 100 TB: both make a contiguous key range a
 * bounded tile (so parquet min/max stats prune BOTH dimensions), but Hilbert
 * has no diagonal jumps — consecutive keys are always grid-ADJACENT — so a
 * file's key range covers a more compact region and range probes touch fewer
 * files. The classic iterative xy2d (Wikipedia's formulation): walk bit
 * planes from the top; per plane, accumulate the quadrant's offset and
 * rotate/reflect the frame.
 */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "hilbert_index"
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BIGINT arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long] & 0xFFFFL
    var y = b.asInstanceOf[Long] & 0xFFFFL
    var d = 0L
    var s = 32768L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 65535L - x; y = 65535L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a & 0xFFFFL;
         |long $y = $b & 0xFFFFL;
         |long $d = 0L;
         |for (long $s = 32768L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = 65535L - $x; $y = 65535L - $y; }
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

object LayoutExpressions {
  import org.apache.spark.sql.GraftBridge

  /** 32-bit Hilbert index of (x, y) on the 65536×65536 grid (low 16 bits of
    * each input; wider domains wrap — locality cost only, never correctness,
    * same contract as the Morton key). */
  def hilbertKey(x: Column, y: Column): Column =
    GraftBridge.column(HilbertIndex(
      GraftBridge.expression(x.cast("long")),
      GraftBridge.expression(y.cast("long"))))
}
