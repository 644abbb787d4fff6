package graft

import org.apache.spark.sql.functions._

/**
 * Soundness evidence for the B198/B234 `mv_hll` materialized-view column:
 * the mview rewrite substitutes `hll_union_agg(mv_hll)` (a union over the
 * view's per-group partial sketches) for the query's own
 * `hll_sketch_agg(x)` (a union over per-partition partial sketches).
 *
 * Two empirical facts this spec pins, measured on Spark's DataSketches HLL
 * (lgK=12, promotion from coupon to estimating mode at 3/4·2^(lgK-3)=384
 * coupons):
 *
 *  1. In COUPON mode (distinct count under the promotion point) the
 *     estimate is EXACT and therefore a pure function of the value set —
 *     invariant across input partitioning, across how the set was split
 *     into partial sketches, and across both merge paths the engine uses
 *     (`hll_union_agg` re-aggregation and the scalar `hll_union` fold in
 *     refreshMview). The rewrite is bitwise-transparent here.
 *
 *  2. In ESTIMATING mode the estimate is NOT partition-invariant — even
 *     for the plain un-rewritten query (a single-partial sketch keeps the
 *     HIP estimator; any merge drops to the composite estimator), measured
 *     as 4980 vs 4948 for the same 5000-distinct input under
 *     repartition(1) vs repartition(32). Spark itself treats the estimate
 *     as implementation-defined there, so "rewrite-on == rewrite-off" is
 *     not a meaningful contract past the promotion point; the error BOUND
 *     is. This is why the engine's audit queries hash exact counts and
 *     bound booleans — never a raw estimating-mode estimate.
 */
class HllDeterminismSpec extends GraftSuite {

  private def build(cards: Seq[Int]) = {
    import spark.implicits._
    cards.zipWithIndex.flatMap { case (n, g) =>
      // Duplicates on purpose: distinct-ness is the sketch's to handle.
      (0 until n * 3).map(i => (g.toLong, (g * 1000000L) + (i % n).toLong))
    }.toDF("g", "v")
  }

  private def paths(df: org.apache.spark.sql.DataFrame): Seq[Map[Long, Long]] = {
    // Path A: the query's own shape, under two different partition layouts.
    def direct(parts: Int): Map[Long, Long] =
      df.repartition(parts).groupBy(col("g"))
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(v))").as("e"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Path B: the REWRITE's shape — per-(g, subkey) partial sketches (the
    // view's finer groups), re-aggregated with hll_union_agg.
    val b = df.withColumn("sub", pmod(hash(col("v")), lit(7)))
      .groupBy(col("g"), col("sub"))
      .agg(expr("hll_sketch_agg(v)").as("sk"))
      .groupBy(col("g"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Path C: the refresh FOLD's shape — stored sketch unioned with an
    // insert-delta sketch via the scalar hll_union.
    val lo = df.filter(pmod(hash(col("v")), lit(2)) === 0)
      .groupBy(col("g")).agg(expr("hll_sketch_agg(v)").as("sk_lo"))
    val hi = df.filter(pmod(hash(col("v")), lit(2)) === 1)
      .groupBy(col("g")).agg(expr("hll_sketch_agg(v)").as("sk_hi"))
    val c = lo.join(hi, Seq("g"), "full_outer")
      .select(col("g"), expr(
        "hll_sketch_estimate(" +
          "case when sk_lo is null then sk_hi when sk_hi is null then sk_lo " +
          "else hll_union(sk_lo, sk_hi) end)").as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(direct(1), direct(32), b, c)
  }

  test("coupon mode: estimate is exact, split- and merge-invariant (rewrite transparency)") {
    val cards = Seq(5, 120, 250, 383)
    val Seq(a1, a32, b, c) = paths(build(cards))
    assert(a1 === a32, "estimate must not depend on input partitioning")
    assert(b === a1, "hll_union_agg over arbitrary partials must equal the direct sketch")
    assert(c === a1, "a scalar hll_union fold must equal the direct sketch")
    // The B55/B96 exactness contract the mview audit query leans on: below
    // the promotion point the estimate IS the exact distinct count.
    cards.zipWithIndex.foreach { case (n, g) =>
      assert(a1(g.toLong) == n.toLong,
        s"coupon-mode estimate must be exact: group $g expected $n, got ${a1(g.toLong)}")
    }
  }

  test("all-NULL input yields an empty sketch (estimate 0), not NULL — fold parity") {
    // The refresh fold's delta sketch for a delete-only group aggregates
    // only NULL inputs (the insert-gated CASE projects NULL for deletes);
    // the fold's union CASE relies on that producing an EMPTY sketch whose
    // union is a no-op — and an all-NULL group must estimate 0 identically
    // on the stored path and the direct path, or rewrite-on/off diverge.
    import spark.implicits._
    val df = Seq((1L, Option.empty[Long]), (1L, None), (2L, Some(5L)))
      .toDF("g", "v")
    val r = df.groupBy(col("g"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(v))").as("e"))
      .orderBy(col("g")).collect()
    assert(!r(0).isNullAt(1) && r(0).getLong(1) == 0L,
      s"all-NULL group must estimate 0 via an empty sketch, got ${r(0)}")
    assert(r(1).getLong(1) == 1L)
  }

  test("estimating mode: bound holds on every path; bitwise equality is NOT a contract") {
    val cards = Seq(5000, 20000)
    val all = paths(build(cards))
    cards.zipWithIndex.foreach { case (n, g) =>
      all.zipWithIndex.foreach { case (m, i) =>
        val est = m(g.toLong)
        assert(math.abs(est - n.toDouble) <= 0.05 * n,
          s"path $i group $g: estimate $est outside 5% of $n")
      }
    }
    // No equality assertion across paths ON PURPOSE: measured divergence
    // (HIP vs composite estimator) is real — see the class doc. Anything
    // hash-gated must therefore carry exact counts or bound booleans, never
    // a raw estimating-mode estimate.
  }
}
