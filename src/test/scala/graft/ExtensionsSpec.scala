package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession

/** GraftExtensions must inject the native SQL functions into a fresh session. */
class ExtensionsSpec extends GraftSuite {

  test("withExtensions injects vec_dot/vec_cosine/word_shingles for SQL") {
    val base = spark // materialize the shared session (and its SparkContext) first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = try {
      val s = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne base)
      val r = s.sql(
        """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
          |       word_shingles('a b c d', 2) AS sh,
          |       jaro_winkler('MARTHA', 'MARHTA') AS jw""".stripMargin).collect().head
      assert(r.getDouble(0) === 11.0)
      assert(r.getSeq[String](1) === Seq("a b", "b c", "c d"))
      assert(r.getDouble(2) === 0.9611111111111111)
      s
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
    assert(ext.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("vec_cosine")))
  }
}
