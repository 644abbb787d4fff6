package graft

import org.apache.spark.sql.functions._
import graft.queries.{StarQueries, TextQueries}

/** Edge-case pins for the wave-4 queries: B110 typed cogroup reconciliation and
  * B109 mergeable heavy-hitters (approx_top_k accumulate/combine/estimate).
  */
class CogroupTopkSpec extends GraftSuite {
  import spark.implicits._

  test("cogroup recon: a customer with no orders gets zeros, not a dropped row") {
    // sf0.001 has no childless customers, so build the case directly with the same
    // per-key logic the query uses: key 2 exists only on the customer side.
    val cust = Seq((1L, "alice"), (2L, "bob")).toDF("c_custkey", "c_name")
      .as[(Long, String)]
    val ords = Seq((1L, 100L, 10L), (1L, 50L, 17L)).toDF("k", "cents", "day")
      .as[(Long, Long, Long)]
    val out = cust.groupByKey(_._1).cogroup(ords.groupByKey(_._1)) { (k, cs, os) =>
      val name = cs.toSeq.headOption.map(_._2).getOrElse("<unknown>")
      val rows = os.toArray
      val days = rows.map(_._3).sorted
      val maxGap = if (days.length < 2) 0L
        else days.sliding(2).map(p => p(1) - p(0)).max
      Iterator((k, name, rows.length.toLong, rows.map(_._2).sum, maxGap))
    }.collect().sortBy(_._1)
    assert(out === Array((1L, "alice", 2L, 150L, 7L), (2L, "bob", 0L, 0L, 0L)))
  }

  test("cogroup recon: duplicate order days leave the max gap deterministic") {
    val q = StarQueries.queries("q_cogroup_recon")(spark, sfTiny)
    val once = q.collect()
    val again = q.collect()
    assert(once.sameElements(again))
    // every customer in the table appears exactly once (full-outer posture)
    val nCust = Tables.customer(spark, sfTiny).count()
    assert(once.length.toLong === nCust)
  }

  test("approx_top_k sketch is exact here: vocab stays far below capacity") {
    // The hash-gate argument for q_approx_topk: a frequent-items sketch evicts
    // nothing while #distinct < maxItemsTracked (1024). Pin the precondition and
    // the consequence (sketch top-10 == exact top-10) at the test SF.
    val vocab = Tables.documents(spark, sfTiny)
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w"))).as[Long].head()
    assert(vocab < 1024L, s"vocab $vocab must stay under sketch capacity")
    val sketched = TextQueries.queries("q_approx_topk")(spark, sfTiny)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = Tables.documents(spark, sfTiny)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sketched.sameElements(exact))
  }
}
