package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

/**
 * Stream-stream joins (SURVEY.md B186): both inputs are unbounded streams and
 * every matching pair must be emitted exactly once — Spark's
 * `StreamingSymmetricHashJoin`: each side's rows are buffered in the keyed
 * state store AND probed against the other side's buffer as micro-batches
 * arrive, so a match is found regardless of which side's row lands first.
 *
 * Scale posture (100 TB / unbounded): the ONLY thing that keeps this viable is
 * the watermark + time-bound pair. Both sides are watermarked and the join
 * condition carries an event-time interval (`rightTs ∈ [leftTs, leftTs + w]`),
 * which lets the engine evict a buffered row as soon as the other side's
 * watermark passes the last instant it could still match — state is
 * O(rate × (window + delay)) per side, NOT O(stream length). An equi-key in
 * the condition is equally load-bearing: it makes the join plan a keyed
 * shuffle on both sides (state store per partition, RocksDB-backed on a
 * cluster) instead of a broadcast-everything theta join. Callers omit either
 * at their peril — Spark rejects un-watermarked append-mode outer joins but
 * will happily run an inner join with unbounded state.
 *
 * Deterministic batch twin: an inner interval join's RESULT is watermark-
 * independent (the watermark bounds state and latency, never which pairs
 * match), so the same join over the same bounded inputs in batch mode is the
 * oracle — q_stream_join's DuckDB SQL replays exactly that.
 */
object StreamJoins {

  /**
   * Watermarked inner interval join. `left`/`right` must be streaming
   * DataFrames with disjoint column names; `cond` must include the equi-key
   * and both-sided event-time bounds as described above. `delay` is the
   * late-data allowance for BOTH watermarks (e.g. "1 hour").
   */
  def intervalJoin(left: DataFrame, leftTs: String,
                   right: DataFrame, rightTs: String,
                   delay: String, cond: Column): DataFrame =
    left.withWatermark(leftTs, delay)
      .join(right.withWatermark(rightTs, delay), cond)

  /**
   * Watermarked LEFT OUTER interval join (B206). The outer semantics are
   * WHERE the watermark earns its keep twice over: a left row's null-padded
   * result can only emit once the RIGHT watermark proves no match can still
   * arrive (the engine holds the row exactly until `rightWm > leftTs +
   * upperBound + delay`, then emits it padded) — without the time bound the
   * row would wait forever and the join would silently be inner. Matched
   * pairs stream out exactly like [[intervalJoin]]; with a bounded drain
   * (AvailableNow) Spark's terminal no-data batch advances the watermark
   * past all buffered state, so every unmatched left row emits and the
   * result set equals the batch left join — which is what makes the DuckDB
   * replay an exact oracle, not an approximation.
   */
  def intervalJoinOuter(left: DataFrame, leftTs: String,
                        right: DataFrame, rightTs: String,
                        delay: String, cond: Column): DataFrame =
    left.withWatermark(leftTs, delay)
      .join(right.withWatermark(rightTs, delay), cond, "left_outer")

  /**
   * Watermarked FULL OUTER interval join (B236) — both sides' unmatched rows
   * emit null-padded, each held exactly until the OPPOSITE side's watermark
   * proves no match can still arrive (the left row waits on the right
   * watermark like the left-outer case; a right row waits on the left
   * watermark passing `rightTs` since the interval bounds `leftTs ≥ rightTs −
   * upperBound`). State stays O(rate × (window + delay)) per side — the
   * outer-ness changes WHEN a buffered row is released, never how long it is
   * kept. Same closure idiom as left-outer: with an AvailableNow drain and a
   * far-future sentinel on EACH side, the terminal no-data batch evicts every
   * remaining unmatched row on BOTH sides, so the drained result equals the
   * batch full join — the DuckDB replay stays an exact oracle.
   */
  def intervalJoinFull(left: DataFrame, leftTs: String,
                       right: DataFrame, rightTs: String,
                       delay: String, cond: Column): DataFrame =
    left.withWatermark(leftTs, delay)
      .join(right.withWatermark(rightTs, delay), cond, "full_outer")
}
