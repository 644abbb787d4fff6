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

  test("extensions-injected mview rule serves the JOIN-aggregate rewrite (pre-pushdown vintage)") {
    // The runtime-attached twin (GraftBridge.addOptimization) sees
    // post-pushdown DataSourceV2ScanRelation nodes — MviewRewriteSpec pins
    // that vintage. The spark.sql.extensions injection runs mid-optimizer
    // over raw DataSourceV2Relation nodes; this pin proves the join rewrite
    // fires there too, with values matching the defining arithmetic.
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.catalog.gext", "graft.sources.GraftCatalog")
        .config("spark.sql.catalog.gext.root", tmpDir("graft_extmv"))
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import org.apache.spark.sql.functions._
      import s.implicits._
      s.sql("DROP TABLE IF EXISTS gext.f")
      s.sql("DROP TABLE IF EXISTS gext.d")
      s.sql("DROP TABLE IF EXISTS gext.f_mv")
      (0L until 120L).map(i => (i, i % 5, i * 3 % 40))
        .toDF("id", "fk", "x").writeTo("gext.f").create()
      (0L until 5L).map(i => (i, i % 2)).toDF("pk", "grp")
        .writeTo("gext.d").create()
      s.sql("CALL gext.system.create_mview(source => 'f', name => 'f_mv', " +
        "keys => 'fk', sum_col => 'x')")
      val df = s.table("gext.f")
        .join(s.table("gext.d"), col("fk") === col("pk"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        .orderBy(col("grp"))
      import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
      val scans = df.queryExecution.optimizedPlan.collect {
        case sr: DataSourceV2ScanRelation => sr.relation.table.name() }
      assert(scans.exists(_.contains("f_mv")) && !scans.exists(_.startsWith("f@")),
        s"the injected rule must substitute the view for the fact scan, got $scans")
      // Values against the defining arithmetic (no rule-off replay needed).
      val expect = (0L until 120L).groupBy(i => (i % 5) % 2)
        .map { case (g, is) => (g, is.size.toLong, is.map(i => i * 3 % 40).sum) }
        .toSeq.sortBy(_._1)
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq === expect)
      s.sql("DROP TABLE IF EXISTS gext.f_mv")
      s.sql("DROP TABLE IF EXISTS gext.f")
      s.sql("DROP TABLE IF EXISTS gext.d")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
