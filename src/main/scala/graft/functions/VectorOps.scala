package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Vector math over `array<float>` embedding columns (SURVEY.md B12), built from
 * Catalyst higher-order functions (`zip_with` + `aggregate`) — fully codegen'd, no
 * UDF, no serialization of the array to the JVM heap per row.
 *
 * All arithmetic is promoted to DOUBLE before accumulation: the source columns are
 * float32, and both Spark and DuckDB (`::DOUBLE[]`) then fold in index order with
 * double precision, which keeps the oracle hash stable after round(.,4).
 */
object VectorOps {

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /**
   * Sign-bit LSH bucket over the first `bits` components: a content-derived coarse
   * partition key for blocked similarity joins. Pure comparisons — no float
   * arithmetic — so engines agree bit-for-bit.
   *
   * Vectors SHORTER than `bits` (and NULL vectors) bucket to NULL and drop
   * out of equi-joined blocking — under the session's default ANSI mode a
   * bare element_at past the end raises INVALID_ARRAY_INDEX, and one
   * malformed embedding must cost one row, never a 100 TB job. `bits` is
   * capped at 63: `1L << 64` silently wraps to bit 0, aliasing dimension 64
   * onto dimension 0's bit and colliding distinct sign patterns.
   */
  def signBucket(a: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
    val bucket = (0 until bits).map { i =>
      when(element_at(a, i + 1) >= 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    when(size(a) >= bits, bucket)
  }
}
