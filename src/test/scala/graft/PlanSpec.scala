package graft

import org.apache.spark.sql.execution.ExplainMode

/**
 * Plan-shape regression tests: the scale properties the engine is designed around
 * (scan pushdown, column pruning, broadcast dims, top-k without global sort) must
 * stay visible in the physical plan — a silent regression here costs nothing at test
 * SF and everything at cluster SF.
 */
class PlanSpec extends GraftSuite {

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, sfTiny).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  /** Simple-mode plan string — REQUIRED for negative assertions on exchange
    * partitioning: formatted mode prints bare `Exchange` nodes with their
    * `hashpartitioning(...)` arguments in a separate detail block, so substring
    * negations like "Exchange hashpartitioning" are vacuously true there. */
  private def simplePlanOf(q: String): String =
    SparkEntry.queries(q)(spark, sfTiny).queryExecution.executedPlan.toString

  test("q_agg_pricing pushes the shipdate predicate into the parquet scan") {
    val p = planOf("q_agg_pricing")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(l_shipdate"))
  }

  test("q_agg_pricing prunes lineitem to the referenced columns only") {
    val p = planOf("q_agg_pricing")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_orderkey") && !read.contains("l_partkey"),
      s"scan reads unneeded columns: $read")
  }

  test("q_join_broadcast plans a broadcast hash join, not a shuffle join") {
    val p = planOf("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_join_star broadcasts the dimension tables") {
    val p = planOf("q_join_star")
    assert(p.contains("BroadcastExchange"))
  }

  test("q_topk uses TakeOrderedAndProject (no global sort)") {
    val p = simplePlanOf("q_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange rangepartitioning"))
  }

  test("q_join_anti plans an anti join (no materialized subtraction)") {
    val p = planOf("q_join_anti")
    assert(p.contains("LeftAnti"))
  }

  test("q_json_extract reads only the columns it needs") {
    val p = planOf("q_json_extract")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("user_id") && !read.contains("event_id"), read)
  }

  test("native kernels appear in the similarity plan (not HOF compositions)") {
    val p = planOf("q_sim_cosine_topk")
    assert(p.contains("vec_cosine"))
    assert(!p.contains("zip_with"))
  }

  test("q_sample_per_source never reads the text column (metadata-only sampling)") {
    // The sample ranks on md5(id) and projects (source, rank, doc_id) — the wide
    // text column must be pruned out of the scan or the 100 TB cost is the corpus.
    val p = planOf("q_sample_per_source")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("text"), s"scan must not read text: $read")
  }

  test("q_join_left plans a real left-outer join, no nested-loop fallback") {
    val p = planOf("q_join_left")
    assert(p.contains("LeftOuter"), p.linesIterator.filter(_.contains("Join")).mkString("\n"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q_decontaminate broadcasts the benchmark shingles (corpus streams once)") {
    val p = planOf("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      "benchmark side must broadcast — a shuffle join here re-shuffles the corpus")
  }

  test("q_corpus_clean windows are key-partitioned (no single-partition window)") {
    // A Window without PARTITION BY pulls the corpus into one task; both dedup
    // stages must partition by their content hash.
    val plan = SparkEntry.queries("q_corpus_clean")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    val windowSpecs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowSpecs.nonEmpty)
    // Partitioned spec: windowspecdefinition(<partitionCols...>, <sort> ASC/DESC, frame).
    // Unpartitioned: the FIRST argument is already a sort spec — that's the 100 TB
    // failure mode this test pins out.
    assert(windowSpecs.forall { l =>
      val inner = l.substring(l.indexOf("windowspecdefinition(") + "windowspecdefinition(".length)
      val firstArg = inner.takeWhile(_ != ',')
      !firstArg.contains(" ASC") && !firstArg.contains(" DESC")
    }, s"every window must declare partition columns:\n${windowSpecs.mkString("\n")}")
  }

  test("q_chunk_overlap plans with zero shuffles (pure per-row explode)") {
    // Chunking must stay embarrassingly parallel: any Exchange here would mean the
    // layout serializes the corpus through a shuffle at 100 TB. (The final ORDER BY
    // is presentation-only; inspect the pre-sort child.)
    val p = SparkEntry.queries("q_chunk_overlap")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    val preSort = p.linesIterator.dropWhile(l => !l.contains("Generate")).mkString("\n")
    assert(preSort.nonEmpty,
      s"expected an explode (Generate) node in the chunk plan — pin is vacuous without it:\n$p")
    assert(!preSort.contains("Exchange hashpartitioning"),
      s"chunk layout must not shuffle:\n$preSort")
  }

  test("q_dedup_spans never falls back to a nested-loop or cartesian join") {
    val p = SparkEntry.queries("q_dedup_spans")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "span removal must stay equi-join-only")
  }

  test("q_mix_weights broadcasts the totals row (no shuffle of the per-source agg)") {
    val p = SparkEntry.queries("q_mix_weights")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"))
  }

  test("retrieval queries cut candidates with TakeOrderedAndProject, not global sorts") {
    // Both BM25's top-20 and hybrid's two top-50 cuts must be top-k pushdowns; a
    // global range-partitioned sort of scored candidates is the 100 TB failure mode.
    val bm = SparkEntry.queries("q_text_bm25")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(bm.contains("TakeOrderedAndProject"))
    val hy = SparkEntry.queries("q_hybrid_retrieval")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(hy.contains("TakeOrderedAndProject"))
    assert(hy.contains("BroadcastExchange"), "query vector must broadcast")
  }

  test("wave-2/3 queries keep their designed plan shapes") {
    // q_merge_upsert: ONE key-shuffle full-outer join, never a nested loop.
    val mu = planOf("q_merge_upsert")
    assert(mu.contains("FullOuter") && !mu.contains("BroadcastNestedLoopJoin"), mu.take(500))
    // q_pii_redact: pure per-row scrub — no aggregation exchange before the
    // final presentation sort (regex work fuses into the scan stage).
    val pii = simplePlanOf("q_pii_redact")
    assert(!pii.contains("Exchange hashpartitioning"), "scrub must not shuffle")
    // q_entity_jaro: in-block enumeration — no cartesian/nested-loop pair join.
    val ej = planOf("q_entity_jaro")
    assert(!ej.contains("CartesianProduct") && !ej.contains("BroadcastNestedLoopJoin"))
    // q_histogram_eqdepth: boundaries broadcast back, never a range-partitioned
    // global sort of the data (the ntile failure mode).
    val hq = simplePlanOf("q_histogram_eqdepth")
    assert(hq.contains("BroadcastExchange"))
    assert(!hq.contains("Exchange rangepartitioning(cents"), "no global data sort")
  }

  test("round-3 additions keep their designed plan shapes") {
    // q_mix_materialize: the per-source weights join must broadcast (the corpus
    // never shuffles on source), and the copy explosion is a Generate node.
    val mm = SparkEntry.queries("q_mix_materialize")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(mm.contains("BroadcastHashJoin") && mm.contains("Generate"),
      mm.take(600))
    assert(!mm.contains("SortMergeJoin"), "weights join must not shuffle the corpus")
    // q_text_normalize: pure per-row expression work - no exchange before the
    // presentation sort.
    val tn = simplePlanOf("q_text_normalize")
    assert(tn.contains("normalize_nfc") || tn.contains("NormalizeNfc") ||
      tn.contains("staticinvoke") || tn.contains("strip_accents"),
      s"native expressions must appear in the plan:\n${tn.take(600)}")
    assert(!tn.contains("Exchange hashpartitioning"), "normalization must not shuffle")
  }

  test("runtime Bloom-filter pruning injects into a selective fact-fact join") {
    // At 100 TB a shuffle join where one side is selectively filtered should
    // runtime-prune the OTHER side before the exchange (Spark's InjectRuntimeFilter
    // — the dynamic twin of static pushdown). Thresholds are floored here because
    // test-SF tables are below the 10 GB default; the point is that the engine's
    // join shapes are eligible — an extra aggregate/projection between scan and
    // join would silently disqualify them.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val li = Tables.lineitem(spark, sfTiny)
      val o = Tables.orders(spark, sfTiny).filter(col("o_orderpriority") === "1-URGENT")
      val plan = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter on the lineitem side:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("wave-5 queries keep their designed plan shapes") {
    // q_sql_tpch5: the four dims ride broadcasts; sort-merge shuffles are
    // reserved for the two fact tables (lineitem⋈orders, then ⋈customer).
    val t5 = simplePlanOf("q_sql_tpch5")
    assert(t5.contains("BroadcastHashJoin"), t5.take(600))
    assert(!t5.contains("CartesianProduct") && !t5.contains("BroadcastNestedLoopJoin"),
      "tpch5 must stay equi-key end to end")
    // q_skyline: frontier via per-price agg + window + broadcast join back —
    // never an all-pairs product (the oracle's NOT EXISTS is the O(n²) spec,
    // not the plan).
    val sky = simplePlanOf("q_skyline")
    assert(!sky.contains("CartesianProduct") && !sky.contains("BroadcastNestedLoopJoin"),
      s"skyline must not plan an all-pairs join:\n${sky.take(600)}")
    assert(sky.contains("BroadcastHashJoin"), "per-price frontier stats must broadcast")
    // q_anomaly_mad: both per-group stats joins broadcast — the fact table
    // never shuffles on the group key for them.
    val mad = simplePlanOf("q_anomaly_mad")
    assert(mad.contains("BroadcastHashJoin") && !mad.contains("SortMergeJoin"),
      s"MAD stats must broadcast back onto the fact:\n${mad.take(600)}")
    // q_sql_lateral: Catalyst must decorrelate the LATERAL ORDER BY/LIMIT into
    // a ranked window over one key shuffle — no nested-loop per-customer scan.
    val lat = simplePlanOf("q_sql_lateral")
    assert(!lat.contains("CartesianProduct") && !lat.contains("BroadcastNestedLoopJoin"),
      s"lateral top-k must decorrelate, not nested-loop:\n${lat.take(600)}")
    // q_sql_tpch18: the lineitem aggregate reduces BEFORE the orders join (the
    // join input is the HAVING-filtered agg, so HashAggregate must sit below
    // the first join) and the top-100 is TakeOrderedAndProject, not a global sort.
    val t18 = simplePlanOf("q_sql_tpch18")
    assert(t18.contains("TakeOrderedAndProject"), t18.take(600))
  }

  test("recursive CTE sustains deep fixpoints (60-level chain, exact closure)") {
    // q_sql_recursive's nation tree is only 5 levels; this pins that the
    // UnionLoop iteration is a real fixpoint at depth (60 iterations, each a
    // frontier-edge equi-join), not something that happens to work shallow.
    // Depths beyond spark.sql.cteRecursionLevelLimit (default 100) need that
    // conf raised — the knob a deeper hierarchy would tune.
    spark.range(0, 60).selectExpr("id AS k",
      "CASE WHEN id = 0 THEN CAST(NULL AS BIGINT) ELSE id - 1 END AS parent")
      .createOrReplaceTempView("chain")
    val row = spark.sql("""
      WITH RECURSIVE walk(k, depth) AS (
        SELECT k, 0 FROM chain WHERE parent IS NULL
        UNION ALL
        SELECT c.k, w.depth + 1 FROM chain c JOIN walk w ON c.parent = w.k)
      SELECT max(depth), count(*), sum(depth) FROM walk""").collect()(0)
    assert(row.getInt(0) == 59 && row.getLong(1) == 60L && row.getLong(2) == 59L * 60 / 2)
  }

  test("q_sql_recursive runs the ENGINE's fixpoint (UnionLoop), not a hand unroll") {
    // Spark 4's recursive CTE plans a UnionLoop node — the engine owns the
    // iteration. If the parser/planner ever silently degraded the recursion to
    // a one-shot union, the rollup would lose levels and the oracle hash would
    // catch it; this pin catches the PLAN regression directly.
    val qe = SparkEntry.queries("q_sql_recursive")(spark, sfTiny).queryExecution
    assert(qe.optimizedPlan.toString.contains("UnionLoop"),
      s"expected UnionLoop in the optimized plan:\n${qe.optimizedPlan.toString.take(800)}")
  }

  test("graft-synth DSv2 source prunes columns, prunes id-range splits, reports stats") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.functions.col
    def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
      df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case b: BatchScanExec => b }.get
    val base = spark.read.format("graft-synth")
      .option("rows", "160000").option("parts", "16").load()

    // Column pruning: only the selected column reaches the reader.
    assert(scanOf(base.select(col("lang"))).scan.readSchema().fieldNames.toSeq
      === Seq("lang"))

    // Partition pruning: doc_id < 10000 keeps 1 of 16 id-range splits — and the
    // row-level residual filter keeps the pruning honest (count unchanged).
    val narrow = base.filter(col("doc_id") < 10000)
    assert(scanOf(narrow).inputRDD.getNumPartitions === 1,
      "id-range pushdown must drop 15 of 16 splits at planning time")
    assert(narrow.count() === 10000L)
    // Un-filtered scan keeps all 16 splits (pruning is predicate-driven).
    assert(scanOf(base.select(col("doc_id"))).inputRDD.getNumPartitions === 16)

    // Reported statistics shrink with the pushed bounds — what lets the
    // optimizer broadcast a tightly-bounded synth side.
    val bounded = base.filter(col("doc_id") < 100).queryExecution
      .optimizedPlan.stats.sizeInBytes
    val full = base.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(bounded < full,
      s"pruned stats ($bounded) must be smaller than full-table stats ($full)")
  }

  test("binned range joins stay equi-join-only where the theta join nested-loops") {
    // The whole point of the bin rewrite: with broadcast OFF (both sides "big",
    // the 100 TB posture), the rewritten joins must plan as shuffle equi joins
    // while the naive theta formulation of the SAME predicate falls back to a
    // nested loop — proving the pin is non-vacuous.
    import org.apache.spark.sql.functions.col
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      for (q <- Seq("q_join_bins", "q_join_overlap")) {
        val p = SparkEntry.queries(q)(spark, sfTiny).queryExecution.executedPlan.toString
        assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
          s"$q must never nested-loop:\n$p")
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          s"$q must carry a real equi join on the bin id:\n$p")
      }
      val naive = Tables.customer(spark, sfTiny).join(Tables.supplier(spark, sfTiny),
        col("c_acctbal") >= col("s_acctbal") - 500 &&
          col("c_acctbal") < col("s_acctbal") + 500)
      val np = naive.queryExecution.executedPlan.toString
      assert(np.contains("BroadcastNestedLoopJoin") || np.contains("CartesianProduct"),
        s"naive theta join unexpectedly avoided the nested loop — contrast is stale:\n$np")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("join strategy hints override the planner's default choice") {
    // The escape hatch when statistics mislead AQE at 100 TB: the SAME equi-join
    // is forced through each physical strategy by hint alone. Broadcast is
    // disabled so the contrast is the hint's doing, not sizes.
    import org.apache.spark.sql.functions.col
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val c = Tables.customer(spark, sfTiny).select(col("c_custkey"), col("c_nationkey"))
      val o = Tables.orders(spark, sfTiny).select(col("o_custkey"), col("o_totalprice"))
      def planWith(hint: String): String =
        c.hint(hint).join(o, col("c_custkey") === col("o_custkey"))
          .queryExecution.executedPlan.toString
      assert(planWith("shuffle_hash").contains("ShuffledHashJoin"),
        "SHUFFLE_HASH hint must force a shuffled hash join")
      assert(planWith("merge").contains("SortMergeJoin"),
        "MERGE hint must force a sort-merge join")
      assert(planWith("broadcast").contains("BroadcastHashJoin"),
        "BROADCAST hint must force a broadcast join even with the threshold off")
      // default under disabled broadcast: sort-merge
      val default = c.join(o, col("c_custkey") === col("o_custkey"))
        .queryExecution.executedPlan.toString
      assert(default.contains("SortMergeJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("q_join_spatial stays a grid equi-join — no all-pairs distance product") {
    // The 2D neighbor join must reach every qualifying pair through the 3×3
    // cell-id equi-join; a CartesianProduct/nested-loop here would be the
    // O(|C|·|S|) distance join the grid exists to avoid at 100 TB.
    val p = simplePlanOf("q_join_spatial")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"spatial join must bin, not cross:\n${p.take(600)}")
  }
}
