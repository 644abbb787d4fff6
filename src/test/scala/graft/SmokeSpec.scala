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

  test("memoized catalog fixtures void on out-of-band DML and rebuild to the same answer") {
    import org.apache.spark.sql.functions._
    // First run builds the cdfq fixture; a hostile out-of-band commit then
    // moves the head generation, which must VOID the memo (reuse requires
    // the exact expected gen) — the second run rebuilds and answers
    // identically instead of reading the tampered table.
    val r1 = SparkEntry.queries("q_catalog_cdf")(spark, sfTiny)
      .collect().map(_.toSeq).toSeq
    spark.sql("DELETE FROM graft.cdfq WHERE o_orderkey % 13 = 1") // gen 5: voids
    val r2 = SparkEntry.queries("q_catalog_cdf")(spark, sfTiny)
      .collect().map(_.toSeq).toSeq
    assert(r1 == r2, "fixture must rebuild after out-of-band DML, not serve tampered state")
    // And the warm path really is a reuse: a third run leaves the head
    // generation untouched (no rebuild happened).
    val dir = new org.apache.hadoop.fs.Path(
      Tables.scratchDir(spark, "catalog", sfTiny), "cdfq")
    val conf = spark.sessionState.newHadoopConf()
    val genBefore = graft.sources.GraftManifest.currentGen(dir, conf)
    val fsBefore = dir.getFileSystem(conf)
      .getFileStatus(new org.apache.hadoop.fs.Path(dir, s"manifest-$genBefore.txt"))
      .getModificationTime
    SparkEntry.queries("q_catalog_cdf")(spark, sfTiny).count()
    assert(graft.sources.GraftManifest.currentGen(dir, conf) == genBefore)
    assert(dir.getFileSystem(conf)
      .getFileStatus(new org.apache.hadoop.fs.Path(dir, s"manifest-$genBefore.txt"))
      .getModificationTime == fsBefore, "warm run must not rebuild the fixture")
  }
}
