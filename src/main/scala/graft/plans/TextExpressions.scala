package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native word-shingle generator: `word_shingles(text, n)` -> array of
 * space-joined word n-grams, in ONE pass over the string.
 *
 * Why not `transform(sequence(...), i -> concat_ws(' ', element_at(split(text),...)))`:
 * higher-order-function lambdas are interpreted, and every inlined `split(text)`
 * subexpression is re-evaluated per lambda invocation — O(tokens^2) string splitting
 * per row (measured ~25x slower at bench scale). This expression tokenizes once and
 * emits the shingle array directly; one eval call per row (CodegenFallback — the call
 * itself is the whole work, so codegen would add nothing).
 *
 * Matches the HOF/oracle semantics exactly: split on single spaces (empty tokens
 * preserved), docs shorter than n words yield an empty array.
 */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle length must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
