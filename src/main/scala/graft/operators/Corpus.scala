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

  /**
   * Deterministic per-group cap (data-mixing primitive: "at most k docs per
   * source/domain"): rank rows within each group by an md5-derived hash of their id
   * and keep the first `k` — uniform-in-expectation like a random sample, but
   * reproducible, engine-independent, and re-runnable to the same result. One
   * window shuffle on the group key; a group's ranking never depends on other
   * groups, so skewed sources cost only their own partition.
   */
  def perGroupSample(docs: DataFrame, groupCol: String, idCol: String,
                     k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(
      TextOps.md5Long(concat(lit("sample:"), col(idCol).cast("string"))), col(idCol))
    docs.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
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
   * Sequence packing (the pre-training "concat and split" layout): documents are
   * laid out in deterministic `doc_id` order and cut into fixed-capacity token
   * bins; a document may span bins (it is split at the capacity boundary, exactly
   * like GPT-style corpus packing). Emits, per doc: its shard, the bin and offset
   * where it starts, and the bin where it ends — everything downstream chunk
   * assembly needs.
   *
   * Scale shape: packing is computed WITHIN shards (`doc_id % nShards`), so the
   * cumulative-sum window never serializes the corpus through a single task; bins
   * are globally unique as (shard, bin). All arithmetic is integer-exact
   * (cumulative longs + floor division) — no float in the layout.
   */
  def packSequences(docs: DataFrame, seqLen: Int, nShards: Int = 32): DataFrame = {
    require(seqLen > 0 && nShards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tok"))
      .withColumn("shard", pmod(col("doc_id"), lit(nShards)).cast("long"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        expr(s"(cum - n_tok) div $seqLen").as("bin_start"),
        expr(s"(cum - n_tok) % $seqLen").as("off_start"),
        expr(s"(cum - 1) div $seqLen").as("bin_end"))
  }

  /**
   * Gopher/C4-style rule-filter battery: per-document boolean flags for the
   * heuristic quality rules production corpus pipelines apply before training.
   * Every threshold is expressed in EXACT integer arithmetic (cross-multiplied
   * ratios), so no float boundary can flip a flag between engines:
   *
   *  - `r_len`:     token count within [minTok, maxTok]
   *  - `r_wordlen`: mean token length within [2, 12] chars. Token lengths sum to
   *                 `length(text) - (n_tok - 1)` for space-joined text (counted
   *                 without re-tokenizing), so the test is
   *                 `2*n_tok <= sum_len <= 12*n_tok`.
   *  - `r_stop`:    at least one stopword present (Gopher's "has common words").
   *  - `r_rep`:     3-gram repetition bounded: distinct 3-grams >= 30% of total
   *                 (10*distinct >= 3*total) — heavy internal repetition is the
   *                 classic low-quality signal.
   *  - `r_pass`:    conjunction of all rules.
   */
  def ruleFlags(docs: DataFrame, minTok: Int = 10, maxTok: Int = 1000): DataFrame = {
    val t = TextOps.tokens(col("text"))
    val nTok = size(t)
    val sumLen = length(col("text")) - (nTok - lit(1))
    val stops = array(Stopwords.map(lit): _*)
    val sh = TextOps.shingles(col("text"), 3)
    val rLen = nTok.between(minTok, maxTok)
    val rWordlen = (sumLen >= nTok * lit(2)) && (sumLen <= nTok * lit(12))
    val rStop = size(filter(t, tok => array_contains(stops, tok))) > 0
    val rRep = size(array_distinct(sh)) * lit(10) >= size(sh) * lit(3)
    docs.withColumn("r_len", rLen)
      .withColumn("r_wordlen", rWordlen)
      .withColumn("r_stop", rStop)
      .withColumn("r_rep", rRep)
      .withColumn("r_pass", rLen && rWordlen && rStop && rRep)
  }

  /**
   * Benchmark decontamination (the eval-leak scan every serious training-data
   * pipeline runs): find corpus documents sharing at least `minShared` distinct
   * word `n`-grams with any benchmark document. Returns one row per contaminated
   * (doc, benchmark) pair with the shared-shingle count.
   *
   * Scale shape: the benchmark set is tiny relative to the corpus — its exploded
   * shingles broadcast; the corpus streams once through a shingle equi-join
   * (never a doc × benchmark cross join), then one (doc, bench) count-agg. At
   * 100 TB this is a linear scan of the corpus against an in-memory shingle map.
   */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
                    minShared: Int = 3): DataFrame = {
    val corpusSh = corpus.select(col("doc_id"),
      explode(TextOps.shingleSet(col("text"), n)).as("sh"))
    val benchSh = benchmark.select(col("doc_id").as("bench_id"),
      explode(TextOps.shingleSet(col("text"), n)).as("sh"))
    corpusSh.join(broadcast(benchSh), "sh")
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /**
   * Unigram language-model score per document (the CCNet-style "how much does
   * this text look like the corpus" signal, with the corpus itself as the LM):
   * token negative log-likelihood -ln(count(tok)/total), averaged per document.
   * Two linear aggregations (global token counts, per-doc score join) — no
   * quadratic stage; the token-frequency table is corpus-vocabulary-sized and
   * broadcastable in practice.
   */
  def unigramLogLoss(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    toks.join(freq, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        round(avg(-log(col("cnt").cast("double") / col("total").cast("double"))), 4)
          .as("avg_nll"))
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
   * report every corpus job publishes.
   *
   * Scale shape: SINGLE PASS. Every doc is classified with its per-stage survival
   * flags in one scan (the naive per-stage-DataFrame union would rescan the corpus
   * once per stage and recompute each stage's predecessors — 5 scans at 100 TB);
   * the two dedup ranks come from windows partitioned by a fixed-width content
   * hash (never by raw text); the funnel rows are then unpivoted from ONE
   * aggregation row with `stack`.
   */
  def cleanFunnel(docs: DataFrame, keepLang: String = "en"): DataFrame = {
    val exactW = Window.partitionBy(col("l_ok"), md5(col("text")))
      .orderBy(col("doc_id"))
    val fpW = Window.partitionBy(col("e_keep"), TextOps.tokenSetFingerprint(col("text")))
      .orderBy(col("doc_id"))
    // Flags are cumulative: a row only competes in a dedup window among rows that
    // survived every earlier stage (the flag is part of the partition key, so
    // non-survivors rank in their own irrelevant partitions).
    val flagged = docs
      .withColumn("q_ok", qualityGate(col("text")))
      .withColumn("l_ok", col("q_ok") && col("lang") === keepLang)
      .withColumn("e_keep", col("l_ok") && row_number().over(exactW) === 1)
      .withColumn("nd_keep", col("e_keep") && row_number().over(fpW) === 1)
      .withColumn("tok", TextOps.tokenCount(col("text")))
    def c(cond: Column) = count(when(cond, lit(1)))
    def t(cond: Column) = coalesce(sum(when(cond, col("tok"))), lit(0L))
    flagged.agg(
        count(lit(1)).as("c0"), coalesce(sum(col("tok")), lit(0L)).as("t0"),
        c(col("q_ok")).as("c1"), t(col("q_ok")).as("t1"),
        c(col("l_ok")).as("c2"), t(col("l_ok")).as("t2"),
        c(col("e_keep")).as("c3"), t(col("e_keep")).as("t3"),
        c(col("nd_keep")).as("c4"), t(col("nd_keep")).as("t4"))
      .select(expr(
        s"""stack(5,
           | 0L, 'raw',         c0, t0,
           | 1L, 'quality',     c1, t1,
           | 2L, 'lang_$keepLang', c2, t2,
           | 3L, 'exact_dedup', c3, t3,
           | 4L, 'neardup_fp',  c4, t4) AS (stage_ord, stage, n_docs, n_tokens)""".stripMargin))
      .orderBy(col("stage_ord"))
  }
}
