package graft

import org.apache.spark.sql.functions._

/**
 * B198 × B233 / B237 cross-feature pins (the round-14 adversarial sweep):
 *
 *  - HIDDEN-TRANSFORM-partitioned sources compose with mviews untouched:
 *    the transform shapes the write layout only, the fold/seed read logical
 *    rows (pin: fold == full recompute on a bucket(4,k)-partitioned source).
 *
 *  - POLICIED sources compose CONSISTENTLY as long as the regime is fixed:
 *    seed, incremental folds, and recompute all read through the same
 *    row-filter, so the view equals what any (non-exempt) reader would
 *    aggregate — policies here are table-scoped, visibility is uniform.
 *
 *  - A policy CHANGED after the seed is the sweep's REAL find: the fold
 *    read deltas under the new filter while stored rows reflect the old one
 *    — the view ended up consistent with NO regime (a k=1 group no current
 *    reader can see next to a half-folded k=0 group). The fix stamps the
 *    seed session's effective regime (`mview.policy`) and refuses folds
 *    under a different one; recompute_mview — which replaces every value
 *    under the current regime — is the named remedy and re-stamps.
 */
class MviewPolicySpec extends GraftSuite {

  private lazy val root = {
    val dir = tmpDir("graft_mvpol")
    spark.conf.set("spark.sql.catalog.gmp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmp.root", dir)
    dir
  }

  test("hidden-transform-partitioned source: fold == full recompute") {
    val _ = root
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS gmp.hsrc")
    spark.sql("DROP TABLE IF EXISTS gmp.hsrc_mv")
    spark.sql("CREATE TABLE gmp.hsrc (id BIGINT, k BIGINT, x BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    (0L until 100L).map(i => (i, i % 7, i % 50)).toDF("id", "k", "x")
      .writeTo("gmp.hsrc").append()
    spark.sql("CALL gmp.system.create_mview(source => 'hsrc', " +
      "name => 'hsrc_mv', keys => 'k', sum_col => 'x')")
    (100L until 130L).map(i => (i, i % 7, i % 50)).toDF("id", "k", "x")
      .writeTo("gmp.hsrc").append()
    spark.sql("CALL gmp.system.refresh_mview(name => 'hsrc_mv')")
    // Compare the folded view against a full recompute — estimate for the
    // sketch column (its serialized bytes are insertion-order-dependent).
    val v = spark.table("gmp.hsrc_mv")
      .select(col("k"), col("mv_count"), col("mv_sum"), col("mv_nncount"),
        col("mv_min"), col("mv_max"),
        expr("hll_sketch_estimate(mv_hll)").as("nd"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val full = spark.table("gmp.hsrc").groupBy(col("k"))
      .agg(count(lit(1)).as("c"), sum(col("x")).cast("long").as("s"),
        count(col("x")).as("nn"), min(col("x")).as("mn"), max(col("x")).as("mx"),
        expr("hll_sketch_estimate(hll_sketch_agg(cast(x as long)))").as("nd"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(v === full, "fold over a hidden-partitioned source must equal full recompute")
    spark.sql("DROP TABLE IF EXISTS gmp.hsrc_mv")
    spark.sql("DROP TABLE IF EXISTS gmp.hsrc")
  }

  test("policied source: consistent under a fixed regime; regime change refuses; recompute re-stamps") {
    val _ = root
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS gmp.psrc")
    spark.sql("DROP TABLE IF EXISTS gmp.psrc_mv")
    (0L until 100L).map(i => (i, i % 5, i % 40)).toDF("id", "k", "x")
      .writeTo("gmp.psrc")
      .tableProperty("graft.rowFilter", "k <> 0")
      .create()
    spark.sql("CALL gmp.system.create_mview(source => 'psrc', " +
      "name => 'psrc_mv', keys => 'k', sum_col => 'x')")
    // The stamp records the seed regime.
    val stamp0 = spark.sql("SHOW TBLPROPERTIES gmp.psrc_mv")
      .filter(col("key") === "mview.policy").head.getString(1)
    assert(stamp0.contains("graft.rowFilter=k <> 0"), s"got stamp [$stamp0]")
    // Fixed regime: fold == the policied aggregate (k=0 in neither).
    (100L until 120L).map(i => (i, i % 5, i % 40)).toDF("id", "k", "x")
      .writeTo("gmp.psrc").append()
    spark.sql("CALL gmp.system.refresh_mview(name => 'psrc_mv')")
    val v = spark.table("gmp.psrc_mv").select("k", "mv_count")
      .orderBy("k").collect().map(_.toSeq).toSeq
    val policied = spark.table("gmp.psrc").groupBy(col("k"))
      .agg(count(lit(1)).as("c")).orderBy("k").collect().map(_.toSeq).toSeq
    assert(v === policied,
      "under a fixed regime the view must equal the policied aggregate")
    // Regime CHANGE: the fold refuses loudly instead of mixing regimes.
    spark.sql(
      "ALTER TABLE gmp.psrc SET TBLPROPERTIES ('graft.rowFilter' = 'k <> 1')")
    (200L until 220L).map(i => (i, i % 5, i % 40)).toDF("id", "k", "x")
      .writeTo("gmp.psrc").append()
    val e = intercept[Exception] {
      spark.sql("CALL gmp.system.refresh_mview(name => 'psrc_mv')")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("mix visibility regimes")),
      s"regime change must refuse the fold, got $e")
    // recompute_mview is the named remedy: replaces every value under the
    // CURRENT regime and re-stamps — folds then resume.
    spark.sql("CALL gmp.system.recompute_mview(name => 'psrc_mv')")
    val stamp1 = spark.sql("SHOW TBLPROPERTIES gmp.psrc_mv")
      .filter(col("key") === "mview.policy").head.getString(1)
    assert(stamp1.contains("graft.rowFilter=k <> 1"), s"got stamp [$stamp1]")
    val v1 = spark.table("gmp.psrc_mv").select("k", "mv_count")
      .orderBy("k").collect().map(_.toSeq).toSeq
    val policied1 = spark.table("gmp.psrc").groupBy(col("k"))
      .agg(count(lit(1)).as("c")).orderBy("k").collect().map(_.toSeq).toSeq
    assert(v1 === policied1,
      "post-recompute the view must equal the NEW regime's aggregate")
    (300L until 310L).map(i => (i, i % 5, i % 40)).toDF("id", "k", "x")
      .writeTo("gmp.psrc").append()
    spark.sql("CALL gmp.system.refresh_mview(name => 'psrc_mv')")
    val v2 = spark.table("gmp.psrc_mv").select("k", "mv_count")
      .orderBy("k").collect().map(_.toSeq).toSeq
    val policied2 = spark.table("gmp.psrc").groupBy(col("k"))
      .agg(count(lit(1)).as("c")).orderBy("k").collect().map(_.toSeq).toSeq
    assert(v2 === policied2, "folds must resume after the re-stamp")
    spark.sql("DROP TABLE IF EXISTS gmp.psrc_mv")
    spark.sql("DROP TABLE IF EXISTS gmp.psrc")
  }

  test("rewrite serves a policied base from a regime-matching view; exempt/mismatched regimes refuse") {
    val _ = root
    import spark.implicits._
    org.apache.spark.sql.GraftBridge.addOptimization(spark,
      graft.plans.MviewRewriteRule(spark))
    spark.sql("DROP TABLE IF EXISTS gmp.rsrc")
    spark.sql("DROP TABLE IF EXISTS gmp.rsrc_mv")
    (0L until 200L).map(i => (i, i % 4, i % 30)).toDF("id", "k", "x")
      .writeTo("gmp.rsrc")
      .tableProperty("graft.rowFilter", "k <> 0")
      .tableProperty("graft.policy.exemptRoles", "auditor")
      .create()
    spark.sql("CALL gmp.system.create_mview(source => 'rsrc', " +
      "name => 'rsrc_mv', keys => 'k', sum_col => 'x')")
    graft.plans.MviewRewriteRule.invalidateCache()
    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case s: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => s.relation.table.name()
      }
    def served(df: org.apache.spark.sql.DataFrame): Boolean = {
      val s = scansOf(df)
      s.exists(_.contains("rsrc_mv")) && !s.exists(_.contains("rsrc@"))
    }
    def q = spark.table("gmp.rsrc").groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx")).orderBy(col("k"))
    // Non-exempt session, regime matches the stamp: SERVES, and the values
    // equal the policied aggregate (both paths read through k <> 0).
    assert(served(q), s"same-regime policied base must serve, got ${scansOf(q)}")
    val got = q.collect().map(_.toSeq).toSeq
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cls.experimental.extraOptimizations
    cls.experimental.extraOptimizations = Nil
    try {
      assert(!served(q), "sanity: rule off, base scan")
      assert(q.collect().map(_.toSeq).toSeq === got,
        "policied rewrite must reproduce the policied aggregate exactly")
      assert(!got.exists(_.head == 0L), "sanity: the filter really applies")
    } finally cls.experimental.extraOptimizations = saved
    // An EXEMPT session reads RAW — a filtered view must refuse it.
    spark.conf.set("spark.graft.role", "auditor")
    try {
      assert(!served(q),
        "an exempt session must never be served filtered aggregates")
      // And the exempt session's un-rewritten read really is raw (k=0 back).
      assert(q.collect().exists(_.getLong(0) == 0L),
        "sanity: exemption reads raw")
    } finally spark.conf.unset("spark.graft.role")
    assert(served(q), "back to the matching regime: serves again")
    spark.sql("DROP TABLE IF EXISTS gmp.rsrc_mv")
    spark.sql("DROP TABLE IF EXISTS gmp.rsrc")
  }

  test("a pre-stamp view on a source that GREW policies refuses the fold") {
    val _ = root
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS gmp.lsrc")
    spark.sql("DROP TABLE IF EXISTS gmp.lsrc_mv")
    (0L until 60L).map(i => (i, i % 3, i % 20)).toDF("id", "k", "x")
      .writeTo("gmp.lsrc").create()
    spark.sql("CALL gmp.system.create_mview(source => 'lsrc', " +
      "name => 'lsrc_mv', keys => 'k', sum_col => 'x')")
    // Simulate a pre-r14 view: strip the stamp by manifest surgery.
    val dir = new org.apache.hadoop.fs.Path(root, "lsrc_mv")
    val hconf = spark.sessionState.newHadoopConf()
    graft.sources.GraftManifest.publishNext(dir, hconf) { cur =>
      cur.copy(gen = cur.gen + 1, props = cur.props - "mview.policy")
    }
    // Unpoliced source, missing stamp: folds still work (the whole pre-r14
    // fleet) — missing stamp reads as the unpoliced regime.
    (60L until 70L).map(i => (i, i % 3, i % 20)).toDF("id", "k", "x")
      .writeTo("gmp.lsrc").append()
    spark.sql("CALL gmp.system.refresh_mview(name => 'lsrc_mv')")
    // The source then grows a policy: the unpoliced stamp mismatches — refuse.
    spark.sql(
      "ALTER TABLE gmp.lsrc SET TBLPROPERTIES ('graft.rowFilter' = 'k <> 2')")
    val e = intercept[Exception] {
      spark.sql("CALL gmp.system.refresh_mview(name => 'lsrc_mv')")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("mix visibility regimes")),
      s"a legacy view must refuse folding a newly-policied source, got $e")
    spark.sql("DROP TABLE IF EXISTS gmp.lsrc_mv")
    spark.sql("DROP TABLE IF EXISTS gmp.lsrc")
  }

  test("a renamed declared column refuses folds with the remedy named; the rewrite stops firing") {
    // B190 x B198 (round-14 sweep): mview.keys / mview.sum store SOURCE
    // column names. After RENAME COLUMN on a declared column, the fold and
    // the recompute must refuse with an error naming the VIEW declaration
    // and the remedy, never a bare UNRESOLVED_COLUMN from inside the fold
    // -- and the rewrite must simply stop serving (stale declaration names
    // match no candidate).
    val _ = root
    import spark.implicits._
    org.apache.spark.sql.GraftBridge.addOptimization(spark,
      graft.plans.MviewRewriteRule(spark))
    spark.sql("DROP TABLE IF EXISTS gmp.rnsrc")
    spark.sql("DROP TABLE IF EXISTS gmp.rnsrc_mv")
    (0L until 60L).map(i => (i, i % 3, i % 20)).toDF("id", "k", "x")
      .writeTo("gmp.rnsrc").create()
    spark.sql("CALL gmp.system.create_mview(source => 'rnsrc', " +
      "name => 'rnsrc_mv', keys => 'k', sum_col => 'x')")
    spark.sql("ALTER TABLE gmp.rnsrc RENAME COLUMN x TO amount")
    (60L until 70L).map(i => (i, i % 3, i % 20)).toDF("id", "k", "amount")
      .writeTo("gmp.rnsrc").append()
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val e1 = intercept[Exception] {
      spark.sql("CALL gmp.system.refresh_mview(name => 'rnsrc_mv')") }
    assert(msgs(e1).exists(m => m.contains("renamed or dropped") &&
      m.contains("recreate the view")), s"fold must name the remedy, got $e1")
    val e2 = intercept[Exception] {
      spark.sql("CALL gmp.system.recompute_mview(name => 'rnsrc_mv')") }
    assert(msgs(e2).exists(_.contains("renamed or dropped")),
      s"recompute must name the remedy too, got $e2")
    // The rewrite refuses quietly: stale declaration names, base scan.
    graft.plans.MviewRewriteRule.invalidateCache()
    val q = spark.table("gmp.rnsrc").groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
    val scans = q.queryExecution.optimizedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2ScanRelation => s.relation.table.name() }
    assert(!scans.exists(_.contains("rnsrc_mv")),
      s"a drifted-declaration view must never serve, got $scans")
    spark.sql("DROP TABLE IF EXISTS gmp.rnsrc_mv")
    spark.sql("DROP TABLE IF EXISTS gmp.rnsrc")
  }
}
