package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row for [[WeightedMean]]: a value and its weight. */
case class WeightedPoint(x: Double, w: Double)

/** Partial-aggregation buffer: running weighted sum and weight sum. */
case class WeightedBuf(sum: Double, wsum: Double)

/**
 * Typed UDAF (SURVEY.md B17): weighted arithmetic mean, Σ(x·w)/Σ(w).
 *
 * Implements `org.apache.spark.sql.expressions.Aggregator`, which Spark plans as a real
 * partial aggregate (map-side combine before the shuffle) — the scalable shape for a
 * custom aggregate, unlike a collect-and-fold. Register with `functions.udaf(new
 * WeightedMean)`. Equivalent oracle SQL: `sum(x*w)/sum(w)`.
 */
class WeightedMean extends Aggregator[WeightedPoint, WeightedBuf, Double] {
  override def zero: WeightedBuf = WeightedBuf(0.0, 0.0)
  override def reduce(b: WeightedBuf, p: WeightedPoint): WeightedBuf =
    WeightedBuf(b.sum + p.x * p.w, b.wsum + p.w)
  override def merge(a: WeightedBuf, b: WeightedBuf): WeightedBuf =
    WeightedBuf(a.sum + b.sum, a.wsum + b.wsum)
  override def finish(b: WeightedBuf): Double =
    if (b.wsum == 0.0) Double.NaN else b.sum / b.wsum
  override def bufferEncoder: Encoder[WeightedBuf] = Encoders.product[WeightedBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
