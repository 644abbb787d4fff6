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
      val composed = "\u00e9"          // precomposed e-acute
      val decomposed = "e\u0301"       // e + combining acute
      val r = s.sql(
        """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
          |       word_shingles('a b c d', 2) AS sh,
          |       jaro_winkler('MARTHA', 'MARHTA') AS jw,
          |""".stripMargin +
        s"       normalize_nfc('$decomposed') AS nfc, " +
        s"       strip_accents('caf$composed') AS sa, " +
         "       md5_prefix60('x') AS h").collect().head
      assert(r.getDouble(0) === 11.0)
      assert(r.getSeq[String](1) === Seq("a b", "b c", "c d"))
      assert(r.getDouble(2) === 0.9611111111111111)
      assert(r.getString(3) === composed)
      assert(r.getString(4) === "cafe")
      assert(r.getLong(5) >= 0L)
      s
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
    assert(ext.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("vec_cosine")))
  }
}
