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
    val p = planOf("q_topk")
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
}
