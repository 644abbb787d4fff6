package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/**
 * Co-located joins via bucketed tables: after bucketing both sides on the join key,
 * the equi-join plans with NO shuffle exchange — the pay-once partitioning contract
 * that removes the dominant cost from recurring fact-fact joins at scale.
 */
class BucketingSpec extends GraftSuite {

  test("bucketed-bucketed equi-join plans without a shuffle exchange") {
    val li = Tables.lineitem(spark, sfTiny).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sfTiny).select("o_orderkey", "o_totalprice")
    Relational.bucketedWrite(li, "li_bucketed", 4, Seq("l_orderkey"))
    Relational.bucketedWrite(o, "o_bucketed", 4, Seq("o_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("date-partitioned write enables partition pruning on read") {
    val dir = tmpDir("partitioned") + "/events"
    Tables.events(spark, sfTiny)
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").parquet(dir)
    val pruned = spark.read.parquet(dir)
      .filter(col("day") === "2024-01-05")
      .groupBy(col("event_type")).count()
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") &&
      plan.linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("day")),
      s"no partition pruning in:\n$plan")
    // the pruned read returns exactly the batch-filtered result
    val expected = Tables.events(spark, sfTiny)
      .filter(to_date(col("ts")) === "2024-01-05")
      .groupBy(col("event_type")).count()
    assert(pruned.collect().map(_.toString).sorted.toSeq ===
      expected.collect().map(_.toString).sorted.toSeq)
  }

  test("approximate sketches stay within tolerance of exact values") {
    val li = Tables.lineitem(spark, sfTiny)
    val approx = li.agg(
      approx_count_distinct(col("l_partkey")).as("nd"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50"))
      .collect().head
    val exact = li.agg(
      countDistinct(col("l_partkey")).as("nd"),
      percentile(col("l_extendedprice"), lit(0.5)).as("p50"))
      .collect().head
    assert(math.abs(approx.getLong(0) - exact.getLong(0)).toDouble / exact.getLong(0) < 0.05)
    assert(math.abs(approx.getDouble(1) - exact.getDouble(1)) / exact.getDouble(1) < 0.05)
  }
}
