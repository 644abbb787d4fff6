package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

/**
 * B234 — automatic materialized-view query rewrite. The positive pin proves
 * the natural GROUP BY answers from the view (plan) with join-identical
 * results (values vs the rule detached); the negative pins prove the rule
 * never fires when the rewrite would NOT be the same computation: stale
 * view, filtered scan, unmaintained aggregate, different keys, policied base.
 */
class MviewRewriteSpec extends GraftSuite {

  private lazy val root = {
    val r = tmpDir("graft_mvr")
    spark.conf.set("spark.sql.catalog.gmvr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmvr.root", r)
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS gmvr.fact")
    (0L until 300L).map(i => (i, i % 7, i % 3, i * 11 % 1000))
      .toDF("id", "k1", "k2", "x")
      .writeTo("gmvr.fact").create()
    spark.sql(
      "CALL gmvr.system.create_mview(source => 'fact', name => 'fact_mv', " +
        "keys => 'k1,k2', sum_col => 'x')")
    org.apache.spark.sql.GraftBridge.addOptimization(spark,
      graft.plans.MviewRewriteRule(spark))
    r
  }

  private def natural: DataFrame = {
    val _ = root
    spark.table("gmvr.fact").groupBy(col("k1"), col("k2"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      .orderBy(col("k1"), col("k2"))
  }

  private def scansOf(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case s: DataSourceV2ScanRelation => s.relation.table.name()
    }

  private def answersFromView(df: DataFrame): Boolean = {
    val scans = scansOf(df)
    scans.exists(_.contains("fact_mv")) && !scans.exists(_.contains("fact@"))
  }

  test("a fresh view answers the natural aggregate with identical results") {
    assert(answersFromView(natural), s"expected view scan, got ${scansOf(natural)}")
    val got = natural.collect().map(_.toSeq).toSeq
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cls.experimental.extraOptimizations
    cls.experimental.extraOptimizations = Nil
    try {
      val real = natural
      assert(!answersFromView(real), "sanity: rule off, base scan")
      assert(real.collect().map(_.toSeq).toSeq === got)
    } finally cls.experimental.extraOptimizations = saved
  }

  test("one source commit past the fold floor stops the rewrite until refresh") {
    val _ = root
    import spark.implicits._
    graft.plans.MviewDiagnostics.clear()
    Seq((900L, 1L, 1L, 50L)).toDF("id", "k1", "k2", "x")
      .writeTo("gmvr.fact").append()
    assert(!answersFromView(natural), "stale view must never serve")
    // The refusal names the fix: the matching-but-stale view and the
    // refresh call that resumes serving.
    val notes = graft.plans.MviewDiagnostics.recent
    assert(notes.exists(n => n.contains("STALE") && n.contains("fact_mv") &&
      n.contains("refresh_mview")), s"expected a staleness note, got: $notes")
    // The un-rewritten answer includes the new row.
    val n11 = natural.filter(col("k1") === 1 && col("k2") === 1).head
    val expect = (0L until 300L).filter(i => i % 7 == 1 && i % 3 == 1)
    assert(n11.getLong(2) === expect.size + 1)
    assert(n11.getLong(3) === expect.map(_ * 11 % 1000).sum + 50)
    // Refresh folds the delta; the rewrite comes back with the SAME numbers.
    spark.sql("CALL gmvr.system.refresh_mview(name => 'fact_mv')")
    graft.plans.MviewDiagnostics.clear()
    assert(answersFromView(natural))
    assert(graft.plans.MviewDiagnostics.recent.isEmpty,
      "a served rewrite must not log a staleness note")
    val again = natural.filter(col("k1") === 1 && col("k2") === 1).head
    assert(again.getLong(2) === n11.getLong(2) && again.getLong(3) === n11.getLong(3))
  }

  test("an aliased grouping key keeps the alias's name and exprId through the rewrite") {
    val _ = root
    // `k1 AS foo` + ORDER BY foo: the parent Sort references the ALIAS's
    // exprId — a rewrite that re-emitted the underlying k1 attribute would
    // fail binding (or silently change the result schema to `k1`).
    val df = spark.table("gmvr.fact").groupBy(col("k1"), col("k2"))
      .agg(count(lit(1)).as("n"))
      .select(col("k1").as("foo"), col("k2"), col("n"))
      .orderBy(col("foo"), col("k2"))
    // Build the aliased-key aggregate the analyzer way: GROUP BY k1 with
    // k1 AS foo in the select list.
    spark.table("gmvr.fact").createOrReplaceTempView("mvr_fact_v")
    val sql = spark.sql(
      """SELECT k1 AS foo, k2, count(*) AS n FROM mvr_fact_v
        |GROUP BY k1, k2 ORDER BY foo, k2""".stripMargin)
    assert(answersFromView(sql), s"aliased-key rewrite must fire, got ${scansOf(sql)}")
    assert(sql.columns.toSeq === Seq("foo", "k2", "n"), "alias name must survive")
    val got = sql.collect().map(_.toSeq).toSeq
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cls.experimental.extraOptimizations
    cls.experimental.extraOptimizations = Nil
    try assert(sql.collect().map(_.toSeq).toSeq === got)
    finally cls.experimental.extraOptimizations = saved
    val _2 = df // silence unused warning-by-convention
  }

  test("AVG over a NULL-bearing sum column serves from mv_nncount, not mv_count") {
    val _ = root
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS gmvr.nfact")
    spark.sql("DROP TABLE IF EXISTS gmvr.nfact_mv")
    // x NULL on every 3rd row — avg(x) divides by the NON-NULL count, so a
    // rewrite serving mv_sum/mv_count would be silently wrong here — and
    // ENTIRELY NULL for k=3 (i % 4 == 3 rows): that group's avg is NULL,
    // which the rewrite must reproduce (its legacy-mode divide answers NULL
    // at mv_nncount = 0 where an ANSI divide would raise DIVIDE_BY_ZERO).
    (0L until 120L).map(i => (i, i % 4,
        if (i % 3 == 0 || i % 4 == 3) None else Some(i * 7 % 100): Option[Long]))
      .toDF("id", "k", "x")
      .writeTo("gmvr.nfact").create()
    spark.sql(
      "CALL gmvr.system.create_mview(source => 'nfact', name => 'nfact_mv', " +
        "keys => 'k', sum_col => 'x')")
    val df = spark.table("gmvr.nfact").groupBy(col("k"))
      .agg(avg(col("x")).as("ax"), count(lit(1)).as("n"))
      .orderBy(col("k"))
    val scans = scansOf(df)
    assert(scans.exists(_.contains("nfact_mv")) &&
      !scans.exists(_.contains("nfact@")), s"avg must rewrite, got $scans")
    val got = df.collect().map(_.toSeq).toSeq
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cls.experimental.extraOptimizations
    cls.experimental.extraOptimizations = Nil
    try assert(df.collect().map(_.toSeq).toSeq === got,
      "rewritten avg must equal the base avg under NULLs")
    finally cls.experimental.extraOptimizations = saved
    // The all-NULL group came back as NULL, not a divide-by-zero failure.
    assert(got.exists(r => r.head == 3L && r(1) == null),
      s"expected a NULL avg for the all-null group, got $got")
  }

  test("TRY-mode aggregates never rewrite: overflow semantics differ from the view") {
    val _ = root
    spark.table("gmvr.fact").createOrReplaceTempView("mvr_fact_try")
    val trySum = spark.sql(
      "SELECT k1, k2, try_sum(x) AS s FROM mvr_fact_try GROUP BY k1, k2")
    assert(!answersFromView(trySum),
      s"try_sum must not serve from the view, got ${scansOf(trySum)}")
    val tryAvg = spark.sql(
      "SELECT k1, k2, try_avg(x) AS a FROM mvr_fact_try GROUP BY k1, k2")
    assert(!answersFromView(tryAvg),
      s"try_avg must not serve from the view, got ${scansOf(tryAvg)}")
  }

  test("AVG of the declared sum column derives from mv_sum/mv_nncount, bit-identical") {
    val _ = root
    val df = spark.table("gmvr.fact").groupBy(col("k1"), col("k2"))
      .agg(avg(col("x")).as("ax"), count(lit(1)).as("n"))
      .orderBy(col("k1"), col("k2"))
    assert(answersFromView(df), s"avg must rewrite, got ${scansOf(df)}")
    val got = df.collect().map(_.toSeq).toSeq
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cls.experimental.extraOptimizations
    cls.experimental.extraOptimizations = Nil
    try assert(df.collect().map(_.toSeq).toSeq === got)
    finally cls.experimental.extraOptimizations = saved
    // AVG of a NON-declared column never rewrites.
    assert(!answersFromView(spark.table("gmvr.fact").groupBy(col("k1"), col("k2"))
      .agg(avg(col("id")).as("a"))))
  }

  test("non-identical computations never rewrite") {
    val _ = root
    val f = spark.table("gmvr.fact")
    // Filtered scan: not the view's input.
    assert(!answersFromView(f.filter(col("id") < 100)
      .groupBy(col("k1"), col("k2")).agg(count(lit(1)).as("n"))))
    // Unmaintained aggregate (max).
    assert(!answersFromView(f.groupBy(col("k1"), col("k2"))
      .agg(max(col("x")).as("m"))))
    // Sum of a different column.
    assert(!answersFromView(f.groupBy(col("k1"), col("k2"))
      .agg(sum(col("id")).as("s"))))
    // Key OUTSIDE the view's set (k1 alone is now the ROLLUP positive —
    // pinned below — but any key the view does not carry can never fire).
    assert(!answersFromView(f.groupBy(col("id"))
      .agg(count(lit(1)).as("n"))))
    // Partial overlap is not a subset: (k1, id) must scan the base.
    assert(!answersFromView(f.groupBy(col("k1"), col("id"))
      .agg(count(lit(1)).as("n"))))
    // Distinct count is not count(*).
    assert(!answersFromView(f.groupBy(col("k1"), col("k2"))
      .agg(countDistinct(col("x")).as("d"))))
  }

  test("creating a view WHILE the rule is attached seeds from the base, not itself") {
    // V2 CTAS registers the target before running the seed query, and the
    // pre-seeded fold floor makes the empty shell look fresh — without the
    // gen>=1 guard the rule rewrites the view's own seed into a read of its
    // empty self and the view is born holding nothing.
    val _ = root
    spark.sql("DROP TABLE IF EXISTS gmvr.self_mv")
    spark.sql("CALL gmvr.system.create_mview(source => 'fact', " +
      "name => 'self_mv', keys => 'k1', sum_col => 'x')")
    val seeded = spark.table("gmvr.self_mv")
      .agg(sum(col("mv_count"))).head.getLong(0)
    assert(seeded === spark.table("gmvr.fact").count(),
      "the seed must aggregate the BASE table, never the empty view shell")
    spark.sql("DROP TABLE IF EXISTS gmvr.self_mv")
  }

  test("a policied base table never serves the (raw) view to policed sessions") {
    val _ = root
    spark.sql("ALTER TABLE gmvr.fact SET TBLPROPERTIES(" +
      "'graft.rowFilter' = 'id % 2 = 0', 'graft.policy.exemptRoles' = 'adm')")
    try {
      assert(!answersFromView(natural), "policied base must scan, not rewrite")
      // And the policed scan really filters.
      assert(natural.agg(sum(col("n"))).head.getLong(0) === 151) // 150 evens + id 900
    } finally spark.sql("ALTER TABLE gmvr.fact UNSET TBLPROPERTIES(" +
      "'graft.rowFilter', 'graft.policy.exemptRoles')")
  }

  test("ROLLUP: a coarser GROUP BY answers by re-aggregating the finer view") {
    val _ = root
    // Earlier tests' metadata commits (policy SET/UNSET) advanced the base
    // past the fold floor — refold so freshness holds for the rollup pins.
    spark.sql("CALL gmvr.system.refresh_mview(name => 'fact_mv')")
    def coarse: DataFrame = spark.table("gmvr.fact").groupBy(col("k1"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        avg(col("x")).as("ax"))
      .orderBy(col("k1"))
    assert(answersFromView(coarse), s"expected view rollup, got ${scansOf(coarse)}")
    val got = coarse.collect().map(_.toSeq).toSeq
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cls.experimental.extraOptimizations
    cls.experimental.extraOptimizations = Nil
    try {
      val real = coarse
      assert(!answersFromView(real), "sanity: rule off, base scan")
      assert(real.collect().map(_.toSeq).toSeq === got,
        "rollup must reproduce the base aggregate exactly (count/sum/avg)")
    } finally cls.experimental.extraOptimizations = saved
  }

  test("FILTERED rewrite: key-only predicates replay on the view, exact and rollup") {
    val _ = root
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    def ruleOff[T](body: => T): T = {
      val saved = cls.experimental.extraOptimizations
      cls.experimental.extraOptimizations = Nil
      try body finally cls.experimental.extraOptimizations = saved
    }
    // Exact keys + equality filter on a view key.
    def fExact: DataFrame = spark.table("gmvr.fact").filter(col("k2") === 1)
      .groupBy(col("k1"), col("k2"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      .orderBy(col("k1"))
    assert(answersFromView(fExact), s"expected view scan, got ${scansOf(fExact)}")
    val gotExact = fExact.collect().map(_.toSeq).toSeq
    ruleOff {
      assert(!answersFromView(fExact), "sanity: rule off, base scan")
      assert(fExact.collect().map(_.toSeq).toSeq === gotExact)
    }
    // Rollup + RANGE filter (any deterministic key-only predicate commutes).
    def fRoll: DataFrame = spark.table("gmvr.fact").filter(col("k2") >= 1)
      .groupBy(col("k1"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), avg(col("x")).as("ax"))
      .orderBy(col("k1"))
    assert(answersFromView(fRoll), s"expected filtered rollup, got ${scansOf(fRoll)}")
    val gotRoll = fRoll.collect().map(_.toSeq).toSeq
    ruleOff { assert(fRoll.collect().map(_.toSeq).toSeq === gotRoll) }
    // Negatives: any DATA-column predicate refuses — the view cannot replay
    // a within-group selection.
    assert(!answersFromView(spark.table("gmvr.fact").filter(col("x") > 100)
      .groupBy(col("k1"), col("k2")).agg(count(lit(1)).as("n"))))
    assert(!answersFromView(spark.table("gmvr.fact").filter(col("id") === 5L)
      .groupBy(col("k1"), col("k2")).agg(count(lit(1)).as("n"))))
    // Mixed key+data predicate refuses too (one conjunct is enough to taint).
    assert(!answersFromView(spark.table("gmvr.fact")
      .filter(col("k2") === 1 && col("x") > 100)
      .groupBy(col("k1")).agg(count(lit(1)).as("n"))))
    // Non-deterministic key predicate refuses.
    assert(!answersFromView(spark.table("gmvr.fact")
      .filter(col("k2") === (rand() * 3).cast("long"))
      .groupBy(col("k1")).agg(count(lit(1)).as("n"))))
  }

  test("HAVING over a rewritten aggregate composes: the filter rides the view read") {
    // No special code path exists or is needed — the rewrite preserves the
    // Aggregate's output exprIds, so a parent Filter (HAVING) just applies
    // to the substituted result. This pin keeps that composition honest.
    val _ = root
    def having: DataFrame = {
      val agg = spark.table("gmvr.fact").groupBy(col("k1"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      agg.filter(col("sx") > 5000L).orderBy(col("k1"))
    }
    assert(answersFromView(having), s"expected view rollup, got ${scansOf(having)}")
    val got = having.collect().map(_.toSeq).toSeq
    assert(got.nonEmpty, "fixture sanity: some group must clear the HAVING bar")
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cls.experimental.extraOptimizations
    cls.experimental.extraOptimizations = Nil
    try assert(having.collect().map(_.toSeq).toSeq === got)
    finally cls.experimental.extraOptimizations = saved
  }

  test("ROLLUP staleness: one source commit past the floor stops the rollup too") {
    val _ = root
    import spark.implicits._
    def coarse: DataFrame = spark.table("gmvr.fact").groupBy(col("k2"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    Seq((901L, 2L, 2L, 60L)).toDF("id", "k1", "k2", "x")
      .writeTo("gmvr.fact").append()
    assert(!answersFromView(coarse), "stale view must never serve a rollup")
    val n2 = coarse.filter(col("k2") === 2).head
    spark.sql("CALL gmvr.system.refresh_mview(name => 'fact_mv')")
    assert(answersFromView(coarse))
    val again = coarse.filter(col("k2") === 2).head
    assert(again.getLong(1) === n2.getLong(1) && again.getLong(2) === n2.getLong(2))
  }
}
