package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expressions for the similarity hot path (SURVEY.md §7.3): a fused
 * dot-product / cosine kernel over two `array<float>` / `array<double>` columns
 * (mixed element types allowed — trained k-means centroids are double, raw
 * embeddings float).
 *
 * Why not `zip_with` + `aggregate`: those build an intermediate array per row and walk
 * it twice (3x for cosine, which needs both norms). This expression emits one fused
 * loop via `doGenCode` — single pass, three accumulators, no allocation — which is the
 * shape that matters when scoring billions of vectors. Semantics are identical to the
 * composed built-ins: elements promoted to double, accumulated in index order,
 * so oracle-verified results do not change when this kernel is substituted.
 *
 * Null behavior: null if either array is null (standard null-intolerant binary
 * expression), and null on a length mismatch — a dimensionality bug upstream must
 * surface as a missing score (and a count drop the tests catch), not a plausible
 * wrong score over a common prefix.
 */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double> arguments, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  /** Scala-side element read promoted to double. */
  protected def elemAt(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
    case _                       => arr.getDouble(i)
  }

  /** Codegen element read promoted to double. */
  protected def elemCode(arr: String, i: String, t: DataType): String = t match {
    case ArrayType(FloatType, _) => s"((double) $arr.getFloat($i))"
    case _                       => s"$arr.getDouble($i)"
  }
}

/** dot(a, b) = sum_i a(i)*b(i), accumulated in double; null on length mismatch. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        // A NULL element propagates to a NULL score, matching the composed
        // aggregate(zip_with(...)) built-ins bit-for-bit — getFloat on a
        // null slot would silently read 0.0 and fabricate a plausible score.
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += elemAt(x, i, left.dataType) * elemAt(y, i, right.dataType); i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else { $acc += ${elemCode(a, i, left.dataType)} * ${elemCode(b, i, right.dataType)}; }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot/(|a||b|) in one pass; 0.0 on zero norm; null on length mismatch. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null // see DotProduct
        val xi = elemAt(x, i, left.dataType); val yi = elemAt(y, i, right.dataType)
        dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0 else dot / denom
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else {
         |      double $xi = ${elemCode(a, i, left.dataType)};
         |      double $yi = ${elemCode(b, i, right.dataType)};
         |      $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |    }
         |  }
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  ${ev.value} = ($denom == 0.0) ? 0.0 : ($dot / $denom);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column wrappers + SQL registration for the native vector kernels. */
object VectorExpressions {
  import org.apache.spark.sql.{Column, GraftBridge}

  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
  def vecCosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Register `vec_dot` / `vec_cosine` for SQL use in a session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")
  }
}
