package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-preparation operators for LLM training-data pipelines (north-star
 * extension alongside [[Dedup]] / [[Similarity]]): deterministic train/valid/test
 * splitting and the end-to-end cleaning funnel that composes the individually
 * verified filters into one pipeline.
 */
object Corpus {

  /**
   * Deterministic stratified split by hashed id: bucket = md5-derived 60-bit hash of
   * `"split:" + id` mod 100, mapped to train/valid/test by percentage cut points.
   *
   * Why hash, not `randomSplit`: a document's assignment depends only on its own id —
   * reproducible across engines (md5 is the shared cross-engine hash), stable under
   * corpus growth (new docs never reshuffle old assignments — at 100 TB you append
   * data without re-splitting the world), and needs no RNG seed plumbing. One
   * codegen'd expression per row, no shuffle.
   */
  def hashSplit(docs: DataFrame, idCol: String,
                trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct < 100,
      s"split points must partition 0..100: train=$trainPct valid=$validPct")
    val bucket = pmod(
      TextOps.md5Long(concat(lit("split:"), col(idCol).cast("string"))), lit(100))
    docs.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + validPct, "valid")
        .otherwise("test"))
  }

  /** Stopword list shared by the quality filter and its oracle SQL. */
  val Stopwords: Seq[String] = Seq("the", "a")

  /**
   * Quality-gate predicate equivalent to `qualityScore >= 0.55`, expressed in EXACT
   * integer arithmetic: score = 0.5*uniq/tok + 0.5*(1 - stop/tok) >= 0.55 reduces to
   * `10*(uniq - stop) >= tok`. Filtering on the float score would be a cross-engine
   * hazard (a quotient landing exactly on the threshold rounds differently in Spark
   * vs DuckDB); the integer form cannot drift.
   */
  def qualityGate(text: Column): Column = {
    val t = TextOps.tokens(text)
    val stops = array(Stopwords.map(lit): _*)
    val nStop = size(filter(t, tok => array_contains(stops, tok)))
    (lit(10) * (size(array_distinct(t)) - nStop)) >= size(t)
  }

  /**
   * End-to-end corpus-cleaning funnel (the composition a training-data pipeline
   * actually runs, built from the individually hash-verified operators):
   *
   *   raw -> quality gate -> language filter -> exact dedup (keep min id per
   *   md5(text)) -> token-set-fingerprint near-dup collapse (keep min id) ->
   *   per-stage survivor counts.
   *
   * Output: one row per stage (stage_ord, stage, n_docs, n_tokens) — the funnel
   * report every corpus job publishes. Each dedup stage shuffles once on a
   * fixed-width hash key (never on raw text); everything else is a codegen'd scan.
   */
  def cleanFunnel(docs: DataFrame, keepLang: String = "en"): DataFrame = {
    val quality = docs.filter(qualityGate(col("text")))
    val inLang = quality.filter(col("lang") === keepLang)
    val exactW = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val exact = inLang.withColumn("rn", row_number().over(exactW))
      .filter(col("rn") === 1).drop("rn")
    val fpW = Window.partitionBy(TextOps.tokenSetFingerprint(col("text")))
      .orderBy(col("doc_id"))
    val nearDup = exact.withColumn("rn", row_number().over(fpW))
      .filter(col("rn") === 1).drop("rn")
    def stage(df: DataFrame, ord: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(TextOps.tokenCount(col("text"))), lit(0L)).as("n_tokens"))
        .select(lit(ord.toLong).as("stage_ord"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    stage(docs, 0, "raw")
      .unionByName(stage(quality, 1, "quality"))
      .unionByName(stage(inLang, 2, s"lang_$keepLang"))
      .unionByName(stage(exact, 3, "exact_dedup"))
      .unionByName(stage(nearDup, 4, "neardup_fp"))
      .orderBy(col("stage_ord"))
  }
}
