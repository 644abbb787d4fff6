package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

/**
 * B231 ∘ B234 — the two join-aggregate-rewriting optimizer machines
 * COMPOSING. `SELECT d.pk, count(*), sum(f.x) FROM fact f JOIN dim d ON
 * f.k1 = d.pk GROUP BY d.pk` is rewritable by BOTH rules: RELY join
 * elimination substitutes pk→k1 and drops the join (the dim contributes
 * nothing else), and the mview rewrite answers the surviving single-table
 * aggregate from the view — the full composition leaves ONLY a view scan.
 * Both rules live in the same "User Provided Optimizers" fixpoint batch, so
 * registration order decides which fires first within a pass but not
 * correctness: this spec pins identical RESULTS under both orders, the full
 * composition (no dim scan, no fact scan) when elimination runs first, and
 * the fact-scan-free guarantee in the reverse order too (there the mview
 * JOIN rewrite fires first; the view ⋈ dim join survives because the FK
 * declaration lives on the fact table, not the view — correct, one tiny
 * join heavier).
 */
class RelyMviewCompositionSpec extends GraftSuite {

  private lazy val root = {
    val dir = tmpDir("graft_rmc")
    spark.conf.set("spark.sql.catalog.gcomp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcomp.root", dir)
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS gcomp.cfact")
    spark.sql("DROP TABLE IF EXISTS gcomp.cfact_mv")
    spark.sql("DROP TABLE IF EXISTS gcomp.cdim")
    // fk NULL on every 5th row — elimination must add k1 IS NOT NULL, and
    // the mview rewrite must replay that key-only filter on the view.
    (0L until 200L).map(i =>
        (i, if (i % 5 == 0) None else Some(i % 6), i * 13 % 500))
      .toDF("id", "k1", "x")
      .writeTo("gcomp.cfact")
      .tableProperty("graft.foreignKey.k1", "k1 REFERENCES cdim (pk) RELY")
      .create()
    (0L until 6L).map(i => (i, s"a${i % 2}")).toDF("pk", "attr")
      .writeTo("gcomp.cdim")
      .tableProperty("graft.primaryKey", "pk RELY")
      .create()
    spark.sql("CALL gcomp.system.create_mview(source => 'cfact', " +
      "name => 'cfact_mv', keys => 'k1', sum_col => 'x')")
    dir
  }

  private def scansOf(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case s: DataSourceV2ScanRelation => s.relation.table.name()
    }
  // GraftTable.name() is always `graft.<table>@<gen>` regardless of the
  // catalog alias the session registered it under.
  private def leaf(n: String): String =
    n.stripPrefix("graft.").takeWhile(_ != '@')
  private def joins(df: DataFrame): Seq[LJoin] =
    df.queryExecution.optimizedPlan.collect { case j: LJoin => j }

  private def q: DataFrame = {
    val f = spark.table("gcomp.cfact")
    val d = spark.table("gcomp.cdim")
    f.join(d, col("k1") === col("pk"))
      .groupBy(col("pk"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      .orderBy(col("pk"))
  }

  private def withRules[T](rules: Seq[org.apache.spark.sql.catalyst.rules
      .Rule[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]])(
      body: => T): T = {
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cls.experimental.extraOptimizations
    // Direct assignment (not addOptimization) so THE ORDER UNDER TEST is
    // exactly `rules`, not prepend-order arithmetic.
    cls.experimental.extraOptimizations = rules
    try body finally cls.experimental.extraOptimizations = saved
  }

  test("RELY elimination then mview rewrite: only the view scan survives") {
    val _ = root
    val rely = graft.plans.RelyJoinEliminationRule(spark)
    val mv = graft.plans.MviewRewriteRule(spark)
    graft.plans.MviewRewriteRule.invalidateCache()
    // Ground truth with both rules detached.
    val base = withRules(Nil)(q.collect().map(_.toSeq).toSeq)
    withRules(Seq(rely, mv)) {
      val plan = q
      val named = scansOf(plan).map(leaf)
      assert(joins(plan).isEmpty,
        s"full composition must leave no join, got ${plan.queryExecution.optimizedPlan}")
      assert(named == Seq("cfact_mv"),
        s"full composition must scan ONLY the view, got $named")
      assert(plan.collect().map(_.toSeq).toSeq === base,
        "composed rewrite changed results")
    }
  }

  test("reverse order: mview join rewrite fires first — still no fact scan, same results") {
    val _ = root
    val rely = graft.plans.RelyJoinEliminationRule(spark)
    val mv = graft.plans.MviewRewriteRule(spark)
    graft.plans.MviewRewriteRule.invalidateCache()
    val base = withRules(Nil)(q.collect().map(_.toSeq).toSeq)
    withRules(Seq(mv, rely)) {
      val plan = q
      val named = scansOf(plan).map(leaf)
      assert(named.contains("cfact_mv") && !named.contains("cfact"),
        s"the fact scan must be gone in either order, got $named")
      assert(plan.collect().map(_.toSeq).toSeq === base,
        "composed rewrite changed results (reverse order)")
    }
  }
}
