package graft

import graft.functions.VectorOps
import graft.plans.VectorExpressions
import org.apache.spark.sql.functions._

/**
 * The native codegen kernels (graft.plans) must be bit-identical to the composed
 * higher-order-function versions (graft.functions.VectorOps) — that identity is what
 * lets the fast kernel replace the HOF path under oracle-verified queries.
 */
class VectorExpressionSpec extends GraftSuite {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfTiny).limit(50).cache()

  test("native dot == zip_with/aggregate dot, exactly") {
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .select(VectorExpressions.vecDot(col("a.embedding"), col("b.embedding")).as("fast"),
        VectorOps.dot(col("a.embedding"), col("b.embedding")).as("slow"))
    assert(pairs.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("native cosine == composed cosine, exactly") {
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .select(VectorExpressions.vecCosine(col("a.embedding"), col("b.embedding")).as("fast"),
        VectorOps.cosine(col("a.embedding"), col("b.embedding")).as("slow"))
    assert(pairs.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("interpreted eval matches codegen") {
    // Force the interpreted path through a local Row eval via collect on a tiny df.
    val vals = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(VectorExpressions.vecDot(col("a"), col("b")).as("d"),
        VectorExpressions.vecCosine(col("a"), col("b")).as("c"))
      .collect().head
    assert(vals.getDouble(0) === 32.0)
    assert(math.abs(vals.getDouble(1) - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-15)
  }

  test("null inputs yield null") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    val r = df.select(VectorExpressions.vecDot(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
  }

  test("md5_prefix60 equals the conv(substr(md5)) composition exactly") {
    val toks = Tables.documents(spark, sfTiny)
      .select(explode(split(col("text"), " ")).as("t")).limit(5000)
    val cmp = toks.select(
      graft.functions.TextOps.md5Long(col("t")).as("fast"),
      conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long").as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("SQL registration works") {
    VectorExpressions.register(spark)
    emb.limit(5).createOrReplaceTempView("emb_t")
    val n = spark.sql(
      "SELECT vec_cosine(a.embedding, b.embedding) AS c FROM emb_t a JOIN emb_t b")
      .filter(col("c").isNotNull).count()
    assert(n === 25)
  }
}
