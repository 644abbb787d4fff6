package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Join => LJoin}
import org.apache.spark.sql.functions._

/**
 * B231 — RELY PK-FK join elimination. Positive pin: a declared inner PK-FK
 * join projecting no dimension columns (beyond the pk, substituted to the fk)
 * loses its Join node AND its answer is bit-identical to the join actually
 * executed (rule detached). Negative pins: every qualifying condition broken
 * one at a time keeps the Join — a rule that over-fires rewrites joins it
 * cannot prove redundant, which is a silent wrong-rows bug at any scale.
 */
class RelyJoinEliminationSpec extends GraftSuite {

  private lazy val root = {
    val dir = tmpDir("relyspec")
    spark.conf.set("spark.sql.catalog.relycat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.relycat.root", dir)
    import spark.implicits._
    // fact: fk NULL on every 4th row; fk values 0..9 all present in dim.
    (0L until 40L).map(i =>
        (if (i % 4 == 0) None else Some(i % 10), i * 7 % 101))
      .toDF("cust", "cents")
      .writeTo("relycat.fact")
      .tableProperty("graft.foreignKey.cust",
        "cust REFERENCES dim (pk) RELY")
      .create()
    (0L until 10L).map(i => (i, s"seg${i % 3}")).toDF("pk", "seg")
      .writeTo("relycat.dim")
      .tableProperty("graft.primaryKey", "pk RELY")
      .create()
    // Same dim WITHOUT the RELY keyword: documentation only, never trusted.
    (0L until 10L).map(i => (i, s"seg${i % 3}")).toDF("pk", "seg")
      .writeTo("relycat.dim_norely")
      .tableProperty("graft.primaryKey", "pk")
      .create()
    // A fact whose FK names dim_norely WITH RELY — isolates the PK-side
    // RELY check (the fk declaration itself is fine).
    (0L until 40L).map(i => (Some(i % 10): Option[Long], i)).toDF("cust", "cents")
      .writeTo("relycat.fact_nr")
      .tableProperty("graft.foreignKey.cust",
        "cust REFERENCES dim_norely (pk) RELY")
      .create()
    // Dim PARTITIONED on a payload column: the catalog FULLY handles
    // partition-key predicates, so a seg-filtered read of this table reaches
    // the post-pushdown rule as a bare-looking ScanRelation with silently
    // pruned entries — the soundness hole the full-manifest guard closes.
    (0L until 10L).map(i => (i, s"seg${i % 3}")).toDF("pk", "seg")
      .writeTo("relycat.dim_part")
      .partitionedBy(col("seg"))
      .tableProperty("graft.primaryKey", "pk RELY")
      .create()
    (0L until 40L).map(i =>
        (if (i % 4 == 0) None else Some(i % 10), i * 7 % 101))
      .toDF("cust", "cents")
      .writeTo("relycat.fact_p")
      .tableProperty("graft.foreignKey.cust",
        "cust REFERENCES dim_part (pk) RELY")
      .create()
    org.apache.spark.sql.GraftBridge.addOptimization(spark,
      graft.plans.RelyJoinEliminationRule(spark))
    dir
  }

  private def fact = { root; spark.table("relycat.fact") }
  private def dim = { root; spark.table("relycat.dim") }

  private def joins(df: DataFrame): Seq[LJoin] =
    df.queryExecution.optimizedPlan.collect { case j: LJoin => j }

  private def qualifying: DataFrame = {
    val f = fact; val d = dim
    f.join(d, f("cust") === d("pk"))
      .groupBy(pmod(d("pk"), lit(3)).as("grp"))
      .agg(sum(col("cents")).as("cents"), count(lit(1)).as("n"))
      .orderBy(col("grp"))
  }

  test("qualifying PK-FK join is eliminated and the answer is join-identical") {
    val elided = qualifying
    assert(joins(elided).isEmpty, "declared RELY join must be eliminated")
    // IsNotNull(fk) must replace the inner join's null-key drop.
    val hasNotNull = elided.queryExecution.optimizedPlan.exists {
      case LFilter(c, _) => c.toString.toLowerCase.contains("isnotnull")
      case _ => false
    }
    assert(hasNotNull, "nullable fk needs an IS NOT NULL guard")
    val got = elided.collect().map(_.toSeq)
    // Ground truth: the SAME plan with the rule detached — the join runs.
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cls.experimental.extraOptimizations
    cls.experimental.extraOptimizations = Nil
    try {
      val real = qualifying
      assert(joins(real).nonEmpty, "sanity: rule off, join present")
      assert(real.collect().map(_.toSeq).toSeq === got.toSeq)
    } finally cls.experimental.extraOptimizations = saved
  }

  test("projecting a dimension payload column keeps the join") {
    val f = fact; val d = dim
    val df = f.join(d, f("cust") === d("pk"))
      .groupBy(col("seg")).agg(sum(col("cents")).as("cents"))
    assert(joins(df).nonEmpty)
  }

  test("a payload-blocked refusal leaves an actionable diagnostic") {
    graft.plans.RelyDiagnostics.clear()
    val f = fact; val d = dim
    f.join(d, f("cust") === d("pk"))
      .groupBy(col("seg")).agg(sum(col("cents")).as("cents"))
      .queryExecution.optimizedPlan
    val notes = graft.plans.RelyDiagnostics.recent
    assert(notes.exists(n => n.contains("non-key dimension column") &&
      n.contains("seg")), s"expected a payload-refusal note, got: $notes")
    // A fully-qualifying query fires and leaves NO new note.
    graft.plans.RelyDiagnostics.clear()
    qualifying.queryExecution.optimizedPlan
    assert(graft.plans.RelyDiagnostics.recent.isEmpty,
      "an eliminated join must not log a refusal")
  }

  test("a primaryKey declaration without RELY is never trusted") {
    // fact_nr's FK declaration names dim_norely WITH RELY, so only the
    // dimension's missing PK RELY keyword blocks — isolated.
    val f = { root; spark.table("relycat.fact_nr") }
    val d = spark.table("relycat.dim_norely")
    val df = f.join(d, f("cust") === d("pk"))
      .groupBy(pmod(d("pk"), lit(3)).as("grp"))
      .agg(sum(col("cents")).as("cents"))
    assert(joins(df).nonEmpty)
  }

  test("a LEFT OUTER join to a declared PK is eliminated WITHOUT the null guard") {
    val f = fact; val d = dim
    // pk referenced: substitution needs the FK declaration too (unmatched
    // rows: RELY says unmatched ⇔ fk IS NULL ⇔ the null-extended pk = fk).
    val df = f.join(d, f("cust") === d("pk"), "left")
      .groupBy(pmod(d("pk"), lit(3)).as("grp"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("grp"))
    assert(joins(df).isEmpty, "left outer to a RELY PK must be eliminated")
    val got = df.collect().map(_.toSeq)
    // All 40 fact rows survive — the 10 null-fk rows land in the null group.
    assert(got.map(_(1).asInstanceOf[Long]).sum === 40L)
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cls.experimental.extraOptimizations
    cls.experimental.extraOptimizations = Nil
    try assert(df.collect().map(_.toSeq).toSeq === got.toSeq)
    finally cls.experimental.extraOptimizations = saved
  }

  test("a LEFT OUTER join without the PK RELY keyword is never eliminated") {
    val f = { root; spark.table("relycat.fact_nr") }
    val d = spark.table("relycat.dim_norely")
    val df = f.join(d, f("cust") === d("pk"), "left")
      .agg(count(lit(1)).as("n"))
    assert(joins(df).nonEmpty)
  }

  test("a FULL OUTER join is never eliminated") {
    val f = fact; val d = dim
    val df = f.join(d, f("cust") === d("pk"), "full")
      .agg(count(lit(1)).as("n"))
    assert(joins(df).nonEmpty)
  }

  test("a filtered dimension is never eliminated") {
    val f = fact; val d = dim.filter(col("seg") === "seg1")
    val df = f.join(d, f("cust") === d("pk"))
      .groupBy(pmod(d("pk"), lit(3)).as("grp"))
      .agg(count(lit(1)).as("n"))
    assert(joins(df).nonEmpty)
  }

  test("a PARTITION-pruned dimension is never eliminated (post-pushdown posture)") {
    // The partition filter is FULLY handled by the scan (no residual Filter
    // node survives pushdown), so only the entry-list-vs-manifest guard can
    // see that the dimension was pruned. Without it the rule would eliminate
    // the join and resurrect fact rows whose dimension rows were pruned away.
    val f = { root; spark.table("relycat.fact_p") }
    val d = spark.table("relycat.dim_part").filter(col("seg") === "seg1")
    val df = f.join(d, f("cust") === d("pk"))
      .groupBy(pmod(d("pk"), lit(3)).as("grp"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("grp"))
    assert(joins(df).nonEmpty, "partition-pruned dim must keep the join")
    // Sanity: the filter really was pushed out of the plan (no Filter node
    // over the dim scan), i.e. this test exercises the pushed-filter hole
    // and not the ordinary Filter-node refusal.
    val dimFilters = d.queryExecution.optimizedPlan.collect {
      case fl: LFilter => fl
    }
    assert(dimFilters.isEmpty,
      "pin requires the partition predicate to be fully handled by the scan")
    val got = df.collect().map(_.toSeq)
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cls.experimental.extraOptimizations
    cls.experimental.extraOptimizations = Nil
    try assert(df.collect().map(_.toSeq).toSeq === got.toSeq)
    finally cls.experimental.extraOptimizations = saved
  }

  test("an unpruned scan of a PARTITIONED dimension still eliminates") {
    // The guard must not over-refuse: a full-table read of the partitioned
    // dim has entries == manifest entries and remains eligible.
    val f = { root; spark.table("relycat.fact_p") }
    val d = spark.table("relycat.dim_part")
    val df = f.join(d, f("cust") === d("pk"))
      .groupBy(pmod(d("pk"), lit(3)).as("grp"))
      .agg(count(lit(1)).as("n"))
    assert(joins(df).isEmpty, "full scan of a partitioned dim must eliminate")
  }

  test("a same-leaf-name dimension in another namespace is never eliminated") {
    // fact_x declares `cust REFERENCES other.dim (pk) RELY`; joining to the
    // root-namespace relycat.dim (same leaf name, own PK RELY) must NOT
    // validate the FK leg — referential integrity was declared against a
    // DIFFERENT table.
    import spark.implicits._
    root
    if (!spark.catalog.tableExists("relycat.fact_x")) {
      (0L until 20L).map(i => (Some(i % 10): Option[Long], i)).toDF("cust", "cents")
        .writeTo("relycat.fact_x")
        .tableProperty("graft.foreignKey.cust",
          "cust REFERENCES other.dim (pk) RELY")
        .create()
    }
    val f = spark.table("relycat.fact_x")
    val d = dim // relycat.dim — root namespace, NOT relycat.other.dim
    val df = f.join(d, f("cust") === d("pk"))
      .groupBy(pmod(d("pk"), lit(3)).as("grp"))
      .agg(count(lit(1)).as("n"))
    assert(joins(df).nonEmpty,
      "a qualified REFERENCES must only match the qualified table")
  }

  test("an undeclared fact key (aliased/derived) is never eliminated") {
    val f = fact.withColumn("cust2", col("cust") + 0L)
    val d = dim
    val df = f.join(d, f("cust2") === d("pk"))
      .groupBy(pmod(d("pk"), lit(3)).as("grp"))
      .agg(count(lit(1)).as("n"))
    assert(joins(df).nonEmpty)
  }

  // ---- composite keys -------------------------------------------------

  private lazy val compositeTables: Unit = {
    root
    import spark.implicits._
    if (!spark.catalog.tableExists("relycat.dim_c")) {
      // Composite PK (pk1, pk2): unique decomposition of 0..59.
      (0L until 60L).map(i => (i / 10, i % 10, s"seg${i % 3}"))
        .toDF("pk1", "pk2", "seg")
        .writeTo("relycat.dim_c")
        .tableProperty("graft.primaryKey", "pk1, pk2 RELY")
        .create()
      // NULLABLE composite FK: fk1 null every 7th row, fk2 null every 11th.
      (0L until 80L).map(i => (
          if (i % 7 == 0) None: Option[Long] else Some(i % 6),
          if (i % 11 == 0) None: Option[Long] else Some(i % 10),
          i * 13 % 101))
        .toDF("fk1", "fk2", "cents")
        .writeTo("relycat.fact_c")
        .tableProperty("graft.foreignKey.ck",
          "fk1, fk2 REFERENCES dim_c (pk1, pk2) RELY")
        .create()
    }
  }

  private def factC = { compositeTables; spark.table("relycat.fact_c") }
  private def dimC = { compositeTables; spark.table("relycat.dim_c") }

  test("composite PK-FK inner join eliminates with a per-column null guard") {
    val f = factC; val d = dimC
    def q = f.join(d, f("fk1") === d("pk1") && f("fk2") === d("pk2"))
      .groupBy(pmod(d("pk2"), lit(4)).as("grp"))
      .agg(sum(col("cents")).as("cents"), count(lit(1)).as("n"))
      .orderBy(col("grp"))
    assert(joins(q).isEmpty, "declared composite RELY join must be eliminated")
    // BOTH nullable fk components need IS NOT NULL (any-null drops the row).
    val guardStr = q.queryExecution.optimizedPlan.collect {
      case LFilter(c, _) => c.toString.toLowerCase }.mkString(" ")
    assert(guardStr.contains("isnotnull(fk1") && guardStr.contains("isnotnull(fk2"),
      s"both components need a null guard, got: $guardStr")
    val got = q.collect().map(_.toSeq)
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cls.experimental.extraOptimizations
    cls.experimental.extraOptimizations = Nil
    try {
      assert(joins(q).nonEmpty, "sanity: rule off, join present")
      assert(q.collect().map(_.toSeq).toSeq === got.toSeq)
    } finally cls.experimental.extraOptimizations = saved
  }

  test("a PARTIAL composite key match never fires") {
    val f = factC; val d = dimC
    // Only pk1 equated: no uniqueness guarantee — must keep the join.
    val df = f.join(d, f("fk1") === d("pk1"))
      .groupBy(pmod(d("pk1"), lit(3)).as("grp"))
      .agg(count(lit(1)).as("n"))
    assert(joins(df).nonEmpty, "partial key match must never eliminate")
    // An extra non-PK conjunct disqualifies too (not a bare PK cover).
    val df2 = f.join(d, f("fk1") === d("pk1") && f("fk2") === d("pk2") &&
        f("cents") === d("pk2"))
      .groupBy(pmod(d("pk2"), lit(4)).as("grp"))
      .agg(count(lit(1)).as("n"))
    assert(joins(df2).nonEmpty, "a non-PK conjunct must never eliminate")
  }

  test("composite LEFT OUTER: unused dim eliminates; a USED pk never does") {
    val fn = factC; val d = dimC
    // Unused dim: row-preservation from PK uniqueness alone — eliminates.
    val unused = fn.join(d, fn("fk1") === d("pk1") && fn("fk2") === d("pk2"), "left")
      .agg(count(lit(1)).as("n"))
    assert(joins(unused).isEmpty, "unused composite outer must eliminate")
    assert(unused.head.getLong(0) === 80L)
    // USED pk: a MATCH-SIMPLE unmatched row (fk1 set, fk2 null) would
    // fabricate a value under substitution, and nullability can't be ruled
    // out through the catalog — must keep the join.
    val usedPk = fn.join(d, fn("fk1") === d("pk1") && fn("fk2") === d("pk2"), "left")
      .groupBy(pmod(d("pk2"), lit(4)).as("grp")).agg(count(lit(1)).as("n"))
    assert(joins(usedPk).nonEmpty,
      "composite outer with a used pk must keep the join")
  }

  test("SEMI/ANTI joins to a declared PK-FK dim eliminate to fk null checks") {
    val f = fact; val d = dim
    // EXISTS shape: semi join → IS NOT NULL filter, join gone.
    def semi = f.join(d, f("cust") === d("pk"), "left_semi")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
    assert(joins(semi).isEmpty, "semi join to RELY dim must be eliminated")
    val Array(sRow) = semi.collect()
    assert(sRow.getLong(0) === 30L) // 40 rows minus the 10 null-fk rows
    // NOT EXISTS shape: anti join → IS NULL filter, join gone.
    def anti = f.join(d, f("cust") === d("pk"), "left_anti")
      .agg(count(lit(1)).as("n"))
    assert(joins(anti).isEmpty, "anti join to RELY dim must be eliminated")
    assert(anti.head.getLong(0) === 10L) // exactly the null-fk rows
    // Rule-off ground truth for both.
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cls.experimental.extraOptimizations
    cls.experimental.extraOptimizations = Nil
    try {
      assert(joins(semi).nonEmpty && joins(anti).nonEmpty, "sanity: rule off")
      assert(semi.head.getLong(0) === 30L && anti.head.getLong(0) === 10L)
    } finally cls.experimental.extraOptimizations = saved
    // Composite semi: both components' null checks install (any-null drops).
    val fc = factC; val dc = dimC
    def csemi = fc.join(dc, fc("fk1") === dc("pk1") && fc("fk2") === dc("pk2"),
        "left_semi").agg(count(lit(1)).as("n"))
    assert(joins(csemi).isEmpty, "composite semi must eliminate")
    val expect = (0L until 80L).count(i => i % 7 != 0 && i % 11 != 0).toLong
    assert(csemi.head.getLong(0) === expect)
    // No-fire battery: missing PK RELY; partial composite key.
    val fnr = { root; spark.table("relycat.fact_nr") }
    val dnr = spark.table("relycat.dim_norely")
    assert(joins(fnr.join(dnr, fnr("cust") === dnr("pk"), "left_semi")
      .agg(count(lit(1)).as("n"))).nonEmpty, "no PK RELY → semi join stays")
    assert(joins(fc.join(dc, fc("fk1") === dc("pk1"), "left_semi")
      .agg(count(lit(1)).as("n"))).nonEmpty, "partial key → semi join stays")
    // A filtered dimension changes which rows match — never eliminated.
    assert(joins(f.join(d.filter(col("seg") === "seg1"),
      f("cust") === d("pk"), "left_semi")
      .agg(count(lit(1)).as("n"))).nonEmpty)
  }

  test("a qualified REFERENCES never matches a deeper-nested same-suffix table") {
    // fact_sfx (root ns) declares `other.dimq` — a dimension at the DEEPER
    // namespace a.other (same trailing components, own PK RELY) must NOT
    // validate: qualified names resolve exactly (absolute, or relative to
    // the declaring fact's namespace), never by suffix.
    import spark.implicits._
    root
    if (!spark.catalog.tableExists("relycat.a.other.dimq")) {
      (0L until 10L).map(i => (i, s"s$i")).toDF("pk", "seg")
        .writeTo("relycat.a.other.dimq")
        .tableProperty("graft.primaryKey", "pk RELY")
        .create()
      (0L until 20L).map(i => (Some(i % 10): Option[Long], i)).toDF("cust", "cents")
        .writeTo("relycat.fact_sfx")
        .tableProperty("graft.foreignKey.cust",
          "cust REFERENCES other.dimq (pk) RELY")
        .create()
      // Positive control: a fact INSIDE namespace `a` declaring the same
      // relative name resolves to a.other.dimq and eliminates.
      (0L until 20L).map(i => (Some(i % 10): Option[Long], i)).toDF("cust", "cents")
        .writeTo("relycat.a.fact_rel")
        .tableProperty("graft.foreignKey.cust",
          "cust REFERENCES other.dimq (pk) RELY")
        .create()
    }
    val d = spark.table("relycat.a.other.dimq")
    val fRoot = spark.table("relycat.fact_sfx")
    val kept = fRoot.join(d, fRoot("cust") === d("pk"))
      .groupBy(pmod(d("pk"), lit(3)).as("grp")).agg(count(lit(1)).as("n"))
    assert(joins(kept).nonEmpty,
      "suffix-only match must never validate the FK leg")
    val fRel = spark.table("relycat.a.fact_rel")
    val elided = fRel.join(d, fRel("cust") === d("pk"))
      .groupBy(pmod(d("pk"), lit(3)).as("grp")).agg(count(lit(1)).as("n"))
    assert(joins(elided).isEmpty,
      "fact-namespace-relative resolution must still eliminate")
  }

  test("DISTINCT over a declared RELY PK eliminates; non-covering/real aggs never do") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LAgg}
    val d = dim
    def aggsOf(df: DataFrame) =
      df.queryExecution.optimizedPlan.collect { case ag: LAgg => ag }
    // Covering distinct: the PK is in the grouping — no Aggregate survives.
    val dd = d.select(col("pk"), col("seg")).distinct()
    assert(aggsOf(dd).isEmpty, "distinct covering the RELY PK must eliminate")
    assert(dd.count() === 10L)
    // Filter-stable: uniqueness holds on any subset.
    val df = d.filter(col("seg") === "seg1").distinct()
    assert(aggsOf(df).isEmpty, "a filtered covering distinct still eliminates")
    val got = df.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cls.experimental.extraOptimizations
    cls.experimental.extraOptimizations = Nil
    try {
      assert(aggsOf(d.distinct()).nonEmpty, "sanity: rule off, distinct stays")
      assert(df.collect().map(_.toSeq).toSeq.sortBy(_.toString) === got)
    } finally cls.experimental.extraOptimizations = saved
    // Non-covering distinct keeps its aggregate.
    assert(aggsOf(d.select(col("seg")).distinct()).nonEmpty)
    // A real aggregate over the PK keeps (outputs are not passthroughs).
    assert(aggsOf(d.groupBy(col("pk")).agg(count(lit(1)).as("n"))).nonEmpty)
    // No RELY keyword — never trusted.
    val nr = spark.table("relycat.dim_norely")
    assert(aggsOf(nr.select(col("pk"), col("seg")).distinct()).nonEmpty)
    // Composite PK: both columns must be in the grouping.
    val dc = dimC
    assert(aggsOf(dc.select(col("pk1"), col("pk2")).distinct()).isEmpty,
      "composite covering distinct must eliminate")
    assert(aggsOf(dc.select(col("pk1")).distinct()).nonEmpty,
      "partial composite distinct must keep the aggregate")
  }

  test("the rule also fires through a SparkSessionExtensions-built session") {
    // Injected rules run INSIDE the operator-optimization fixpoint (pre scan
    // pushdown, DataSourceV2Relation vintage) — the other node shape.
    val base = spark
    val dir = root
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.catalog.relycat", "graft.sources.GraftCatalog")
        .config("spark.sql.catalog.relycat.root", dir)
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      assert(s ne base)
      val f = s.table("relycat.fact"); val d = s.table("relycat.dim")
      val df = f.join(d, f("cust") === d("pk"))
        .agg(sum(col("cents")).as("cents"), count(lit(1)).as("n"))
      assert(joins(df).isEmpty, "extensions-injected rule must fire")
      val Array(r) = df.collect()
      assert(r.getLong(1) === 30L) // 40 rows minus the 10 null-fk rows
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }
}
