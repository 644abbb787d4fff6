package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Graph analytics over edge lists (extension family alongside
 * [[Dedup.connectedComponents]]): authority scoring of the kind web-corpus
 * curation uses for domain quality (PageRank-family centrality).
 *
 * Determinism stance: ranks are computed in INTEGER fixed-point (mass scale
 * [[Graphs.Scale]], damping as the rational dampNum/dampDen, `div` floor
 * division) — no floating point anywhere, so results are bit-identical across
 * engines, partitionings, and summation orders. Floating-point PageRank is
 * famously irreproducible on distributed sums; fixed-point sidesteps it rather
 * than rounding it away.
 */
object Graphs {

  /** Fixed-point mass scale: total rank mass ≈ 1e9 integer units. */
  val Scale = 1000000000L

  /**
   * Weighted PageRank with a FIXED number of iterations over `edges(src, dst,
   * weight)`. Per iteration: each node sends `rank * w / outw` along its edges
   * (floor division), and new rank = (1-d) * Scale/n + d * inflow with
   * d = dampNum/dampDen (all integer). Nodes with no in-edges keep the teleport
   * term only; dangling-node mass is dropped (the standard simplified variant).
   *
   * Scale shape: per iteration one equi-join of edges against ranks plus one
   * dst-keyed sum — linear shuffles, the canonical distributed PageRank step.
   * Ranks are localCheckpointed per iteration (constant plan depth, same
   * reasoning as [[Similarity.kmeansCentroids]]); overflow-safe for
   * rank*weight < 2^63 (weight up to ~9e9 at full mass).
   */
  def pagerank(edges0: DataFrame, iters: Int,
               dampNum: Long = 17, dampDen: Long = 20): DataFrame = {
    require(iters >= 0 && dampNum > 0 && dampNum < dampDen,
      s"need 0 < dampNum < dampDen and iters >= 0; got $dampNum/$dampDen, $iters")
    // Materialize the edge list ONCE: it is referenced by outw, the node set, and
    // every iteration's join — without this the caller's edge derivation (often a
    // window + aggregation over raw data) re-executes once per reference.
    val edges = Iterate.materialize(edges0.select(col("src"), col("dst"), col("weight")))
    // Materialize the node set too: it is referenced twice (the count below
    // and the rank seed), and each reference would otherwise re-run the
    // union+distinct shuffle over the edge list.
    val nodes = Iterate.materialize(edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct())
    val outw = edges.groupBy(col("src")).agg(sum(col("weight")).as("outw"))
    val nDf = broadcast(nodes.agg(count(lit(1)).as("n")))
    var ranks = nodes.crossJoin(nDf)
      .select(col("node"), expr(s"$Scale div n").as("rank"), col("n"))
    for (_ <- 0 until iters) {
      val inflow = edges
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .join(outw, "src")
        .select(col("dst").as("node"),
          expr("(rank * weight) div outw").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      // Lazy materialization: no action follows until the next round's (or the
      // caller's) job, so folding it in halves the per-round job count.
      ranks = Iterate.materialize(ranks.join(inflow, Seq("node"), "left")
        .select(col("node"),
          expr(s"(($Scale div n) * ${dampDen - dampNum}) div $dampDen + " +
            s"($dampNum * coalesce(inflow, 0L)) div $dampDen").as("rank"),
          col("n")), eager = false)
    }
    ranks.select(col("node"), col("rank"))
  }

  /**
   * Single-source BFS levels over an undirected edge list `(a, b)`: exactly
   * `maxDepth` rounds of frontier min-propagation, so on return `lvl` is the
   * true shortest-path distance for every node within `maxDepth` hops of
   * `source`; farther nodes are absent. The same wavefront shape as
   * [[Dedup.connectedComponents]] (one edge⋈levels join + one dst-keyed min per
   * round, levels materialized per round for constant plan depth) with distance
   * `+1` in place of label minimum — all integer, bit-identical anywhere.
   */
  def bfsLevels(edges0: DataFrame, source: Column, maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    // Self-loops filtered BEFORE symmetrization (both legs): a loop-only node
    // would otherwise enter the node set forever unreached and permanently
    // defeat the early-exit below. Materialized BEFORE the two-leg union —
    // both legs reference it, and the caller's edge derivation (often an
    // explode+aggregate over raw data, e.g. wordEdges) would otherwise
    // re-execute once per leg inside the symmetrization job.
    val noLoops = Iterate.materialize(
      edges0.filter(col("a") =!= col("b")).select(col("a"), col("b")))
    val edges = Iterate.materialize(
      noLoops.select(col("a").as("src"), col("b").as("dst"))
        .union(noLoops.select(col("b").as("src"), col("a").as("dst")))
        .distinct())
    // Seed the SOURCE row explicitly: the endpoint-derived node set misses a
    // source with no (non-loop) edges, and without its level-0 row the
    // result would omit the one node that is within 0 hops by definition —
    // while the all-null early-exit never fires and every round runs empty.
    val nodeType = edges.schema("src").dataType
    val seed = edges0.sparkSession.range(1)
      .select(source.cast(nodeType).as("node"), lit(0L).as("lvl"))
    var levels = Iterate.materialize(
      edges.select(col("src").as("node")).distinct()
        .select(col("node"),
          when(col("node") === source, 0L).otherwise(lit(null).cast("long")).as("lvl"))
        .unionByName(seed)
        .groupBy(col("node")).agg(min(col("lvl")).as("lvl")))
    var depth = 0
    var done = false
    while (depth < maxDepth && !done) {
      val reach = edges
        .join(levels.filter(col("lvl").isNotNull)
          .select(col("node").as("src"), col("lvl")), "src")
        .groupBy(col("dst").as("node")).agg((min(col("lvl")) + 1L).as("nlvl"))
      // Lazy materialization (r15): the early-exit probe right below is an
      // action over the new levels anyway — it computes (and caches) the
      // checkpoint, so a separate eager job per round is pure dispatch
      // overhead. Plan depth stays constant either way.
      levels = Iterate.materialize(levels.join(reach, Seq("node"), "left")
        .select(col("node"), least(col("lvl"), col("nlvl")).as("lvl")),
        eager = false)
      // Early exit once every node is reached: a BFS level is final the round it
      // is assigned (uniform +1 propagation), so further rounds are no-ops. On a
      // diameter-3 graph with maxDepth 8 this halves the job count (measured).
      done = levels.filter(col("lvl").isNull).isEmpty
      depth += 1
    }
    levels.filter(col("lvl").isNotNull)
  }

  /**
   * Per-node triangle participation counts over an undirected edge list `(a, b)`
   * (self-loops ignored), via DEGREE-ORDERED wedge enumeration — the standard
   * distributed-triangle algorithm [Suri & Vassilvitskii, "Counting Triangles and
   * the Curse of the Last Reducer", WWW'11]: orient every edge from the endpoint
   * with smaller (degree, id) to the larger, enumerate wedges only at each
   * node's out-neighbors, and close them against the oriented edge list. Every
   * triangle is counted exactly once, at its lowest-ordered vertex.
   *
   * Why the degree ordering matters at scale: out-degrees are bounded by
   * O(sqrt(edges)) under this orientation, so the wedge count — the shuffle
   * volume — is O(E^1.5) worst-case instead of the O(sum deg^2) a hub vertex
   * causes under naive enumeration; the "curse of the last reducer" (one celebrity
   * node owning almost all wedges) is exactly what it removes.
   *
   * Plan shape: one dedup shuffle, one degree agg (broadcast back), one
   * out-neighbor collect per node with in-array pair enumeration (the
   * [[Dedup.enumeratePairs]] shape — no wedge self-join recompute), one equi-join
   * against the oriented edges, one 3-way explode + count.
   */
  def triangleCounts(edges0: DataFrame): DataFrame = {
    // Materialized ONCE: the deduped edge list feeds the degree agg, both
    // orientation joins, and the closing join — unmaterialized, the caller's edge
    // derivation (often an explode over raw data, far larger than the edge list)
    // re-executes per reference (measured 3x on the word graph).
    val und = Iterate.materialize(edges0
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct())
    // deg is joined twice under differing projections — no ReusedExchange, so
    // materialize it too (the same multiply-referenced-subplan rule as und).
    val deg = Iterate.materialize(
      und.select(col("u").as("node"))
        .unionAll(und.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg")))
    // Total order: (deg, node). Orient u->v iff ord(u) < ord(v). No broadcast
    // hint: the degree table is node-count-sized — tiny for vocabulary graphs,
    // arbitrarily large for id graphs — so AQE's runtime size decides.
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val oriented = withDeg.select(
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("src"), struct(col("dv").as("d"), col("v").as("n")).as("dst")))
        .otherwise(
          struct(col("v").as("src"), struct(col("du").as("d"), col("u").as("n")).as("dst")))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    // Wedges at src: ordered pairs of out-neighbors; sort_array on (deg, node)
    // structs yields exactly the orientation order, so pair (y, z) needs edge
    // y->z (never z->y) to close.
    val wedges = oriented.groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("nbrs"))
      .filter(size(col("nbrs")) > 1)
      .select(col("src"), Dedup.enumeratePairs(col("nbrs"), "y", "z").as("p"))
      .select(col("src"), col("p.y.n").as("y"), col("p.z.n").as("z"))
    val closed = wedges.join(
      oriented.select(col("src").as("y"), col("dst.n").as("z")), Seq("y", "z"))
    closed.select(explode(array(col("src"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }
}
