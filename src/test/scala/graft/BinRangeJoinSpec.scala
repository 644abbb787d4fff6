package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * BinRangeJoinRule: the conf-gated optimizer rule that turns a natural
 * `ON p BETWEEN lo AND hi` theta join into the binned equi join — same
 * DataFrame code, linear plan (see graft.plans.BinRangeJoin).
 */
class BinRangeJoinSpec extends GraftSuite {

  test("rule rewrites the theta join to an equi join with bit-identical results") {
    val base = spark // materialize the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // QueryExecution caches per Dataset — build a FRESH frame per plan probe
      // so each one sees the current conf.
      def theta() = {
        val points = s.range(0, 400).select(col("id").as("pid"),
          ((col("id") * 37 % 500) - 100).cast("double").as("x"))
        val intervals = s.range(0, 150).select(col("id").as("iid"),
          ((col("id") * 53 % 400) - 120).cast("double").as("lo"))
          .withColumn("hi", col("lo") + (col("iid") % 60).cast("double"))
        points.join(intervals, col("x") >= col("lo") && col("x") < col("hi"))
      }
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
          .toSeq.sorted

      // Dormant without the conf: the natural plan is a nested loop.
      s.conf.unset("spark.graft.rangeJoin.binWidth")
      val off = theta().queryExecution.executedPlan.toString
      assert(off.contains("BroadcastNestedLoopJoin") || off.contains("CartesianProduct"),
        s"baseline lost its nested loop — contrast is stale:\n$off")
      val offRows = pairs(theta())

      // Conf on: the SAME code now plans a shuffle equi join on the bin id.
      s.conf.set("spark.graft.rangeJoin.binWidth", "25.0")
      val on = theta().queryExecution.executedPlan.toString
      assert(!on.contains("BroadcastNestedLoopJoin") && !on.contains("CartesianProduct"),
        s"rule did not fire:\n$on")
      assert(on.contains("SortMergeJoin") || on.contains("ShuffledHashJoin"),
        s"expected a real equi join on the bin id:\n$on")
      val onRows = pairs(theta())
      assert(onRows === offRows)
      assert(offRows.nonEmpty, "vacuous fixture")

      // An equi-keyed join with an interval residual must be LEFT ALONE —
      // it already hash-partitions; the rewrite would only add explode cost.
      val keyedPoints = s.range(0, 100).select(col("id").as("pid"),
        (col("id") % 7).as("k"), (col("id") % 50).cast("double").as("x"))
      val keyedIv = s.range(0, 40).select(col("id").as("iid"),
        (col("id") % 7).as("k2"), (col("id") % 30).cast("double").as("lo"))
        .withColumn("hi", col("lo") + 10.0)
      val keyed = keyedPoints.join(keyedIv,
        col("k") === col("k2") && col("x") >= col("lo") && col("x") < col("hi"))
      assert(!keyed.queryExecution.optimizedPlan.toString.contains("__graft_bin"),
        "rule must skip equi-keyed joins")

      // NON-FINITE bounds have no bin: under Spark's total double order
      // `p <= NaN` is TRUE, so an interval with a NaN upper bound matches
      // unboundedly many bins — silently flooring it (NaN -> bin 0) would
      // DROP matches the original theta join returned. The rewrite must
      // refuse LOUDLY with a message naming the conf, never answer wrong.
      import s.implicits._
      val wildIv = Seq((900L, 1.0, Double.NaN), (901L, 5.0, 15.0))
        .toDF("iid", "lo", "hi")
      val points2 = s.range(0, 50).select(col("id").as("pid"),
        col("id").cast("double").as("x"))
      val wild = points2.join(wildIv,
        col("x") >= col("lo") && col("x") < col("hi"))
      val ex = intercept[Exception] { wild.collect() }
      def chain(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
      assert(chain(ex).contains("non-finite"),
        s"expected the loud non-finite refusal, got: ${chain(ex)}")
      // All-finite doubles still rewrite and run (proved above); integral
      // bins never pay the guard.
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
