package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Column-level text-analysis building blocks (SURVEY.md §2 Part B: B13/B14 and the
 * LLM-pipeline text operators). Everything here is pure Catalyst expression
 * composition — codegen-friendly, no UDFs — so whole-stage codegen keeps the hot path
 * fused at any scale.
 *
 * Hash choice: MD5. It is the one hash with identical semantics in Spark
 * (`functions.md5`) and DuckDB (`md5`), which makes MinHash signatures, fingerprints,
 * and SimHash bit vectors oracle-verifiable. Seeded families are derived as
 * `md5(seed || ':' || token)`.
 */
object TextOps {

  /** Whitespace tokenization — documents.text is space-separated lowercase tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token set (first-occurrence order; sort before hashing). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /**
   * Word-level n-gram shingles via the native one-pass expression
   * [[graft.plans.WordShingles]] (the HOF composition re-splits the text per lambda
   * invocation — quadratic; see that class's scaladoc). Documents shorter than `n`
   * tokens yield an empty array.
   */
  def shingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.plans.WordShingles(GraftBridge.expression(text), n))
  }

  /** Distinct shingle set. */
  def shingleSet(text: Column, n: Int): Column = array_distinct(shingles(text, n))

  /** Member of the seeded MD5 hash family: `md5(seed:s)`. */
  def seededMd5(seed: Column, s: Column): Column = md5(concat(seed, lit(":"), s))

  /** First 15 hex digits of md5 as a non-negative BIGINT (60 bits; DuckDB-equal).
    * Native single-pass evaluation — see [[graft.plans.Md5Prefix60]]. */
  def md5Long(s: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.plans.Md5Prefix60(GraftBridge.expression(s)))
  }

  /**
   * Content fingerprint over the *sorted distinct token set* (B14): documents that are
   * permutations/duplications of the same vocabulary collide. One md5 per doc.
   */
  def tokenSetFingerprint(text: Column): Column =
    md5(concat_ws(" ", sort_array(tokenSet(text))))

  /**
   * Rolling polynomial hash of the token stream (order-sensitive document
   * fingerprint): fold h -> (h*31 + md5Long(tok) % P) % P with P = 2^31-1.
   * Expressed with the `aggregate` higher-order function — stays in codegen,
   * no shuffle, no UDF. DuckDB twin: list_reduce over the same per-token hashes.
   */
  def rollingHash(text: Column): Column = {
    val P = 2147483647L
    aggregate(
      tokens(text),
      lit(0L),
      (acc, tok) => (acc * 31L + md5Long(tok) % P) % P)
  }

  /** Token count (B13). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Jaro-Winkler similarity (record linkage / entity resolution) — native
    * expression, bit-exact to DuckDB's `jaro_winkler_similarity` (see
    * [[graft.plans.JaroWinkler]] for the pinned variant). */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.plans.JaroWinkler(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** Unicode NFC normalization (see [[graft.plans.NormalizeNfc]]; oracle twin is
    * DuckDB's `nfc_normalize`). */
  def normalizeNfc(s: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.plans.NormalizeNfc(GraftBridge.expression(s)))
  }

  /** Accent folding via NFD + combining-mark removal (see
    * [[graft.plans.StripAccents]]; oracle twin is DuckDB's `strip_accents`). */
  def stripAccents(s: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.plans.StripAccents(GraftBridge.expression(s)))
  }

  /** Ratio of tokens present in `stopwords` (quality-scoring ingredient). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    val stops = array(stopwords.map(lit): _*)
    size(filter(t, tok => array_contains(stops, tok))).cast("double") /
      size(t).cast("double")
  }

  /**
   * Heuristic quality score in [0,1] (LLM-corpus filtering style): rewards lexical
   * diversity (distinct/total tokens), penalizes stopword share. Deterministic,
   * oracle-expressible.
   */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    val diversity = size(array_distinct(t)).cast("double") / size(t).cast("double")
    lit(0.5) * diversity + lit(0.5) * (lit(1.0) - stopwordRatio(text, stopwords))
  }
}
