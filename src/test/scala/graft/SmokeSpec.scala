package graft

/** Driver-contract smoke: entry returns rows; every declared query runs non-empty on
  * sf0.001; oracle SQL keys all have matching queries. */
class SmokeSpec extends GraftSuite {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs and returns rows on sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (_, fn) =>
      fn(spark, sfTiny).count() == 0
    }.map(_._1)
    assert(empty.isEmpty, s"empty results: $empty")
  }
}
