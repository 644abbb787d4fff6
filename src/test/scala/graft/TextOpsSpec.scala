package graft

import graft.functions.{TextOps, VectorOps}
import org.apache.spark.sql.functions._

/** Edge semantics of the column-function layer. */
class TextOpsSpec extends GraftSuite {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq("x").toDF("dummy").select(c).collect().head.getAs[T](0)

  test("shingles: n longer than the doc yields empty; n=1 equals tokens") {
    val df = Seq("a b c").toDF("text")
    val r = df.select(
      TextOps.shingles(col("text"), 5).as("s5"),
      TextOps.shingles(col("text"), 1).as("s1"),
      TextOps.shingles(col("text"), 2).as("s2")).collect().head
    assert(r.getSeq[String](0).isEmpty)
    assert(r.getSeq[String](1) === Seq("a", "b", "c"))
    assert(r.getSeq[String](2) === Seq("a b", "b c"))
  }

  test("tokenSetFingerprint is permutation- and repetition-invariant") {
    val df = Seq(("a b c", "c b a a b"), ("a b c", "a b d")).toDF("x", "y")
    val fps = df.select(
      (TextOps.tokenSetFingerprint(col("x")) === TextOps.tokenSetFingerprint(col("y")))
        .as("eq")).as[Boolean].collect()
    assert(fps.toSeq === Seq(true, false))
  }

  test("rollingHash is order-sensitive (unlike the set fingerprint)") {
    val df = Seq(("a b c", "c b a")).toDF("x", "y")
    val r = df.select(
      (TextOps.rollingHash(col("x")) === TextOps.rollingHash(col("y"))).as("eq"))
      .as[Boolean].collect().head
    assert(!r)
  }

  test("qualityScore stays in [0,1] and rewards diversity") {
    val df = Seq("a a a a a a", "b c d e f g").toDF("text")
    val scores = df.select(TextOps.qualityScore(col("text"), Seq("a")).as("s"))
      .as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(1) > scores(0)) // diverse, stopword-free doc scores higher
  }

  test("md5Long is non-negative and below 2^60") {
    val vals = Tables.documents(spark, sfTiny).limit(100)
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .select(TextOps.md5Long(col("t")).as("h")).as[Long].collect()
    assert(vals.forall(h => h >= 0L && h < (1L << 60)))
  }

  test("signBucket covers [0, 2^bits) and depends only on signs") {
    val df = Seq(
      (Array(1.0f, -1.0f, 1.0f), Array(5.0f, -0.1f, 99f)),
      (Array(-1.0f, -1.0f, -1.0f), Array(-2f, -3f, -4f))
    ).toDF("a", "b")
    val r = df.select(
      VectorOps.signBucket(col("a"), 3).as("ba"),
      VectorOps.signBucket(col("b"), 3).as("bb")).as[(Long, Long)].collect()
    assert(r.forall { case (x, y) => x == y }) // same sign pattern -> same bucket
    assert(r.forall { case (x, _) => x >= 0 && x < 8 })
  }

  test("stopwordRatio counts multiplicity") {
    val r = Seq("the a the b").toDF("text")
      .select(TextOps.stopwordRatio(col("text"), Seq("the")).as("r"))
      .as[Double].collect().head
    assert(r === 0.5)
  }

  test("jaroWinkler: canonical values, edge cases, threshold gating") {
    val pairs = Seq(
      ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("", "abc"), ("", ""),
      ("same", "same"), ("ab", "cd"))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), TextOps.jaroWinkler(col("a"), col("b")).as("jw"))
      .as[(String, String, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("MARTHA", "MARHTA")) === 0.9611111111111111) // textbook value
    assert(got(("DIXON", "DICKSONX")) === 0.8133333333333332)
    assert(got(("", "abc")) === 0.0)
    assert(got(("", "")) === 0.0)     // DuckDB-pinned: both-empty is 0, not 1
    assert(got(("same", "same")) === 1.0)
    assert(got(("ab", "cd")) === 0.0) // no matches
  }

  test("jaroWinkler works on UTF-8 BYTES (DuckDB byte-oriented contract)") {
    // DuckDB-probed values: 'café' is 5 bytes there, not 4 chars.
    val got = Seq(("café", "cafe"), ("日本", "日木")).toDF("a", "b")
      .select(TextOps.jaroWinkler(col("a"), col("b")).as("jw"))
      .as[Double].collect().toSeq
    assert(got === Seq(0.8483333333333334, 0.9333333333333333))
  }

  test("normalizeNfc composes decomposed sequences and is identity on NFC text") {
    // "e" + U+0301 composes to U+00E9; already-composed and ASCII pass through.
    val df = Seq(("e\u0301", "caf\u00e9", "plain")).toDF("d", "c", "p")
    val r = df.select(
      TextOps.normalizeNfc(col("d")).as("d2"),
      length(TextOps.normalizeNfc(col("d"))).as("dl"),
      TextOps.normalizeNfc(col("c")).as("c2"),
      TextOps.normalizeNfc(col("p")).as("p2")).collect().head
    assert(r.getString(0) === "\u00e9" && r.getInt(1) === 1)
    assert(r.getString(2) === "caf\u00e9" && r.getString(3) === "plain")
  }

  test("stripAccents folds composed AND decomposed accents; ascii and null safe") {
    val df = Seq(
      (s"caf\u00e9 na\u00efve e\u0301clair", Option("x")),
      ("ascii only", Option.empty[String])).toDF("t", "n")
    val got = df.select(
      TextOps.stripAccents(col("t")).as("s"),
      TextOps.stripAccents(col("n")).as("sn")).collect()
    assert(got(0).getString(0) === "cafe naive eclair")
    assert(got(1).getString(0) === "ascii only")
    assert(got(1).isNullAt(1))
    // Non-decomposable letters are untouched (same posture as DuckDB's NFD path).
    val od = Seq("bl\u00f8d").toDF("t")
      .select(TextOps.stripAccents(col("t"))).collect().head.getString(0)
    assert(od === "bl\u00f8d")
    // Astral (non-BMP) combining marks strip too: U+11100 CHAKMA CANDRABINDU is
    // Mn but lives above the BMP - char-wise getType sees surrogates and would
    // keep it (DuckDB strips it; codepoint iteration matches).
    val astral = Seq("a\ud804\udd00b").toDF("t")
      .select(TextOps.stripAccents(col("t"))).collect().head.getString(0)
    assert(astral === "ab")
  }
}
