package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** The custom TopKPerKey operator (logical node + strategy + two-phase exec):
  * correctness vs the window formulation, plan shape, and the map-side
  * reduction that is its reason to exist. */
class TopKPlanSpec extends GraftSuite {
  import spark.implicits._

  private def events = Tables.events(spark, sfTiny)
    .select(col("event_id"), col("event_type"),
      floor(col("value") * 100).cast("long").as("cents"))

  test("native top-k per key equals the window formulation") {
    val native = Relational.topKPerGroupNative(events,
        Seq(col("event_type")), Seq(col("cents").desc, col("event_id")), 10)
      .select("event_id").as[Long].collect().toSet
    val window = Relational.topKPerGroup(events, Seq("event_type"),
        Seq(col("cents").desc, col("event_id")), 10)
      .select("event_id").as[Long].collect().toSet
    assert(native === window)
    assert(native.size === 50) // 5 event types x top 10
  }

  test("k larger than every group returns all rows; ties keep the tiebreak winner") {
    val df = Seq((1L, "a", 5L), (2L, "a", 5L), (3L, "b", 1L))
      .toDF("event_id", "event_type", "cents")
    val all = Relational.topKPerGroupNative(df,
        Seq(col("event_type")), Seq(col("cents").desc, col("event_id")), 99)
      .select("event_id").as[Long].collect().toSet
    assert(all === Set(1L, 2L, 3L))
    val top1 = Relational.topKPerGroupNative(df,
        Seq(col("event_type")), Seq(col("cents").desc, col("event_id")), 1)
      .select("event_id").as[Long].collect().toSet
    assert(top1 === Set(1L, 3L), "equal cents must resolve by event_id tiebreak")
  }

  test("plan is Final <- Exchange <- Partial and the partial bounds the shuffle") {
    val q = Relational.topKPerGroupNative(events.repartition(8),
      Seq(col("event_type")), Seq(col("cents").desc, col("event_id")), 10)
    // collect() executes q's OWN queryExecution (count() would build a separate
    // one and leave these metrics at zero, making the bound assertions vacuous).
    q.collect()
    val plan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val s = plan.toString
    assert(s.contains("TopKPerKeyFinal") && s.contains("TopKPerKeyPartial"), s.take(800))
    assert(s.indexOf("TopKPerKeyFinal") < s.indexOf("Exchange") &&
      s.indexOf("Exchange") < s.indexOf("TopKPerKeyPartial"),
      s"exchange must sit between final and partial:\n${s.take(800)}")
    // AQE wraps materialized shuffle stages in QueryStageExec, whose inner
    // plan is a field, not a child — plain collect() cannot see the partial.
    def allExecs(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[graft.plans.TopKPerKeyExec] = {
      val here = p match {
        case e: graft.plans.TopKPerKeyExec => Seq(e); case _ => Nil
      }
      val kids = p match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(qs.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case other => other.children
      }
      here ++ kids.flatMap(allExecs)
    }
    val execs = allExecs(plan)
    val partial = execs.find(_.partial).get
    val total = events.count()
    val emitted = partial.metrics("numOutputRows").value
    // 5 keys x k=10 x 8 partitions = 400 max; input is ~1000 rows at sfTiny.
    assert(emitted > 0, "metric not populated — the inspected plan never ran")
    assert(emitted <= 5L * 10 * 8,
      s"partial emitted $emitted, above the keys*k*partitions bound")
    assert(emitted < total,
      s"partial must reduce the shuffle ($emitted vs $total input rows)")
  }

  test("empty group list = GLOBAL top-k (AllTuples gather, not a planner crash)") {
    import spark.implicits._
    val df = (0L until 5000L).map(i => (i, (i * 37 % 1000).toDouble))
      .toDF("id", "score").repartition(8)
    val got = graft.operators.Relational
      .topKPerGroupNative(df, Seq.empty, Seq(col("score").desc, col("id")), 25)
      .orderBy(col("score").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = df.orderBy(col("score").desc, col("id")).limit(25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === want,
      "global top-k must equal orderBy+limit (partials bound map-side, one gather)")
  }

  test("float/double group keys are rejected (UnsafeRow byte equality vs -0.0/NaN)") {
    // Spark's NormalizeFloatingNumbers rule does not know this node, so raw
    // byte-equality grouping would split -0.0 vs 0.0. The operator refuses
    // rather than silently diverging from the window formulation.
    val df = Seq((1L, 0.0), (2L, -0.0)).toDF("event_id", "fkey")
    val e = intercept[IllegalArgumentException] {
      Relational.topKPerGroupNative(df, Seq(col("fkey")), Seq(col("event_id")), 1)
    }
    assert(e.getMessage.contains("float"))
  }

  test("the strategy also plans through a SparkSessionExtensions-built session") {
    // The spark.sql.extensions path (no addStrategy call anywhere): build a
    // session with GraftExtensions and plan the node through ITS planner.
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      assert(s ne base)
      val df = s.range(20).select(col("id"), (col("id") % 3).as("k"))
      import org.apache.spark.sql.GraftBridge
      import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
      val sortPlan = GraftBridge.analyzed(df.sort(col("id"))) match {
        case so: Sort => so
        case other => fail(s"expected Sort, got $other")
      }
      val keyExprs = GraftBridge.analyzed(df.select(col("k"))) match {
        case p: Project => p.projectList
          .map(identity[org.apache.spark.sql.catalyst.expressions.Expression])
        case other => fail(s"expected Project, got $other")
      }
      val node = graft.plans.TopKPerKey(keyExprs, sortPlan.order, 2, sortPlan.child)
      val out = GraftBridge.ofRows(s, node)
      assert(out.queryExecution.executedPlan.toString.contains("TopKPerKey"),
        "the extensions-injected strategy must plan the node")
      assert(out.count() === 6) // 3 keys x top 2
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }
}
