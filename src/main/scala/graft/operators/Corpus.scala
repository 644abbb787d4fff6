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

  /**
   * Deterministic stratified Bernoulli sampling (B196 — the
   * `DataFrameStatFunctions.sampleBy` contract made reproducible): each
   * stratum keeps its own fraction, expressed in integer BASIS POINTS so the
   * keep decision is an exact integer compare, never a float threshold. The
   * coin is an md5-derived hash of the row id (engine-independent,
   * re-runnable to the same membership — resampling a 100 TB corpus must not
   * depend on partition layout or RNG state), so the sample is uniform in
   * expectation within each stratum and IDENTICAL across runs and engines.
   * Strata absent from `fractionsBp` drop entirely. Pure scan + filter: no
   * shuffle, no driver state, fractions ride a literal map expression.
   */
  def stratifiedSample(docs: DataFrame, stratumCol: String, idCol: String,
                       fractionsBp: Map[String, Int]): DataFrame = {
    require(fractionsBp.nonEmpty && fractionsBp.values.forall(bp => bp >= 0 && bp <= 10000),
      s"fractions must be basis points in [0, 10000]: $fractionsBp")
    val bpMap = map(fractionsBp.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val coin = pmod(
      TextOps.md5Long(concat(lit("strat:"), col(idCol).cast("string"))), lit(10000))
    docs.filter(coin < coalesce(
      element_at(bpMap, col(stratumCol).cast("string")), lit(0)))
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
   * Sliding-window document chunking with overlap (the RAG/pre-training layout
   * complementary to [[packSequences]]: packing concatenates docs into fixed bins,
   * chunking splits one doc into overlapping windows). Chunk `i` starts at token
   * `i*stride` and takes up to `chunkSize` tokens; `nChunks = 1` for short docs,
   * else `ceil((n - chunkSize)/stride) + 1` so the final window always reaches the
   * last token. Emits per chunk: index, token start, width, and the md5 of the
   * chunk text (the chunk's content identity, verifiable cross-engine).
   *
   * Scale shape: one `explode` over a per-row integer sequence — output rows =
   * total chunks, no shuffle at all; chunk assembly is a codegen'd `slice` +
   * `concat_ws` on the already-split token array.
   */
  def chunkDocs(docs: DataFrame, chunkSize: Int = 32, stride: Int = 24): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize; got chunkSize=$chunkSize stride=$stride")
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"),
        TextOps.tokenCount(col("text")).as("n_tok"))
      .withColumn("n_chunks",
        when(col("n_tok") <= chunkSize, lit(1L))
          .otherwise(expr(s"(n_tok - $chunkSize + ${stride - 1}) div $stride") + lit(1L)))
      .select(col("doc_id"), col("tk"), col("n_tok"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("tok_start", col("chunk_idx") * stride)
      .withColumn("n_tok_chunk",
        least(lit(chunkSize.toLong), col("n_tok") - col("tok_start")))
      .select(col("doc_id"), col("chunk_idx"), col("tok_start"), col("n_tok_chunk"),
        md5(concat_ws(" ",
          slice(col("tk"), (col("tok_start") + 1).cast("int"),
            col("n_tok_chunk").cast("int")))).as("chunk_md5"))
  }

  /**
   * Frequent-span removal — the bounded-window form of exact-substring dedup
   * [Lee et al., "Deduplicating Training Data Makes Language Models Better"]:
   * any word `n`-gram occurring in >= `minDf` distinct documents is boilerplate;
   * tokens covered by such a gram are removed from every document EXCEPT where the
   * position is also covered by a gram the document itself OWNS (owner = the
   * minimum doc_id containing the gram). The owner-protection rule makes the
   * invariant hold even when frequent grams overlap: every frequent gram's
   * owner occurrence survives intact — without it, removing doc 2's copy of a
   * gram owned by doc 1 could destroy doc 2's own owned copy of an overlapping
   * gram, leaving zero surviving copies corpus-wide. Emits per doc: token count,
   * removed-token count, and the md5 of the reassembled cleaned text.
   *
   * Scale shape (all linear, no quadratic stage): one posexplode to grams, one
   * gram-key agg for (df, owner), coverage explosion only for *frequent-gram
   * occurrences* (a tiny fraction of the corpus), one anti-join on (doc, pos),
   * one per-doc reassembly agg. The true suffix-array ExactSubstr finds unbounded
   * match lengths; fixed `n` trades that for a pure dataflow shape — a span of
   * length >= n is still fully covered by its constituent n-grams.
   */
  def stripFrequentSpans(docs: DataFrame, n: Int = 5, minDf: Int = 2): DataFrame = {
    require(n >= 2 && minDf >= 2, s"need n >= 2, minDf >= 2; got n=$n minDf=$minDf")
    val grams = docs.select(col("doc_id"),
      posexplode(TextOps.shingles(col("text"), n)).as(Seq("s", "gram")))
    val bad = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("df"), min(col("doc_id")).as("owner"))
      .filter(col("df") >= minDf)
    val occ = grams.join(bad.select(col("gram"), col("owner")), "gram")
    def positions(df: DataFrame) = df
      .select(col("doc_id"), explode(sequence(col("s"), col("s") + (n - 1))).as("p"))
      .distinct()
    // Positions covered by a gram this doc owns are protected — the surviving copy.
    val owned = positions(occ.filter(col("doc_id") === col("owner")))
    val covered = positions(occ.filter(col("doc_id") > col("owner")))
      .join(owned, Seq("doc_id", "p"), "left_anti")
    val toks = docs.select(col("doc_id"),
      posexplode(TextOps.tokens(col("text"))).as(Seq("p", "tok")))
    // Reassembly: order-preserving concat of surviving tokens (sort_array on
    // struct(pos, tok) sorts by pos first — deterministic regardless of partitioning).
    val kept = toks.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(sort_array(collect_list(struct(col("p"), col("tok")))),
            x => x.getField("tok")))).as("clean_md5"))
    docs.select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tok"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        (col("n_tok") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_md5"), md5(lit(""))).as("clean_md5"))
  }

  /**
   * PII scrub patterns: (name, regex, replacement), applied IN ORDER (email first —
   * after it runs, its replacements contain no digits, so the later numeric
   * patterns can't partially re-match a redacted span). The regex dialect is the
   * intersection of Java regex and RE2 (`\b`, `\d`, bounded repetition — verified
   * equivalent), so the oracle mirrors the exact patterns.
   */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9._]+@[a-z0-9]+\\.[a-z]+", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"))

  /**
   * PII redaction (the pre-training scrub pass every public-web corpus runs):
   * sequential regexp_replace of email / IPv4 / phone patterns. Pure codegen'd
   * per-row expression — no shuffle, no UDF; at 100 TB this fuses into the scan.
   */
  def scrubPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (t, (_, pat, repl)) =>
      regexp_replace(t, pat, repl)
    }

  /** Per-pattern match counts on the UNredacted text (audit trail for the scrub). */
  def piiCounts(text: Column): Seq[(String, Column)] =
    PiiPatterns.map { case (name, pat, _) =>
      s"n_$name" -> regexp_count(text, lit(pat)).cast("long")
    }

  /**
   * Gopher-style TOP-SHARE repetition signals (complementary to [[ruleFlags]]'s
   * distinct-shingle ratio): the fraction of tokens claimed by the single most
   * frequent word / bigram. Heavy boilerplate (navigation strings, templated spam)
   * concentrates mass on one term in a way vocabulary-ratio rules miss. Flags use
   * exact integer cross-multiplication (word share > 20%, bigram share > 18% — the
   * Gopher thresholds) so no float boundary can flip them cross-engine.
   *
   * Scale shape: two explode → (doc, term) count → per-doc max aggs. Both are
   * linear with map-side partial aggregation; nothing per-doc is held in memory
   * (the token array is never collected), so a 1 GB document costs its share of
   * rows, not a task's heap.
   */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    def topShare(exploded: DataFrame, termCol: String) =
      exploded.groupBy(col("doc_id"), col(termCol)).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as(s"c_top_$termCol"))
    val topWord = topShare(docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("word")), "word")
    val topBigram = topShare(docs.select(col("doc_id"),
      explode(TextOps.shingles(col("text"), 2)).as("bigram")), "bigram")
    docs.select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tok"))
      .join(topWord, Seq("doc_id"))
      .join(topBigram, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"), col("c_top_word"),
        coalesce(col("c_top_bigram"), lit(0L)).as("c_top_bigram"),
        (lit(5) * col("c_top_word") > col("n_tok")).as("flag_word"),
        (lit(100) * coalesce(col("c_top_bigram"), lit(0L)) >
          lit(18) * (col("n_tok") - 1)).as("flag_bigram"))
  }

  /**
   * Per-document word-distribution entropy (quality/diversity signal): for token
   * counts c over total n, H = sum_w (c/n) ln(n/c). Emitted as a SCALED-INTEGER sum
   * of per-term floor(1e6 * c * ln(n/c) / n) — each term floors independently, so
   * the cross-partition/cross-engine SUM is over integers and order-independent
   * (a plain float entropy sum would drift with aggregation order). `ln` agrees
   * bit-for-bit across engines in practice (tfidf/unigram-NLL precedent); a term
   * would have to land within ~1 ulp of an integer boundary to flip.
   *
   * Scale shape: one (doc, tok) count agg + one per-doc sum — linear, partial-agg
   * friendly, vocabulary never materialized per task.
   */
  def wordEntropy(docs: DataFrame): DataFrame = {
    // spread (r16): the single-file corpus arrives as ONE partition, and this
    // operator's explode+count is pure per-row CPU — profiled as one 1.5 s
    // task on an idle 32-core session (guide §2.5). The (doc_id, tok) agg
    // keys are doc-local, so extra map partitions cost no partial-agg blowup.
    val counts = graft.Tables.spread(docs)
      .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tok"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("n_tok"), col("tok"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("doc_id"), col("n_tok"))
      .agg(count(lit(1)).as("n_uniq"),
        sum(expr("CAST(floor(1000000.0 * c * ln(n_tok / c) / n_tok) AS BIGINT)"))
          .as("entropy_scaled"))
      .select(col("doc_id"), col("n_tok"), col("n_uniq"), col("entropy_scaled"))
  }

  /**
   * Domain-mixing planner: per-source token inventory plus the integer basis-point
   * repeat factor that would rebalance every source to a uniform share of the
   * training mix (the "how many epochs of each domain" table a data-mixture run
   * starts from). All arithmetic is integer floor division — `share_bp` is the
   * source's observed share, `repeat_bp` the up/down-sampling factor, and
   * `tokens_after` the resulting contribution; no float can drift cross-engine.
   *
   * Scale shape: one agg by source (sources are few — the totals row broadcasts),
   * then a scalar projection. Overflow-safe to ~9e14 total tokens (x10000 < 2^63).
   */
  def mixWeights(docs: DataFrame): DataFrame = {
    val per = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col("text"))).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("total_tok"),
      count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("(n_tokens * 10000) div total_tok").as("share_bp"),
        expr("(total_tok * 10000) div (n_sources * n_tokens)").as("repeat_bp"),
        expr("(n_tokens * ((total_tok * 10000) div (n_sources * n_tokens))) div 10000")
          .as("tokens_after"))
  }

  /**
   * Model-based quality scoring (B207 — the "apply a pretrained classifier
   * at corpus scale" step every production pipeline has: CCNet/fastText
   * quality filters, NSFW gates): a LINEAR model over hashed token features,
   * scored as one scan — per token, feature index = md5-hash mod `dims`
   * (B116's feature-hashing trick: no vocabulary object ships anywhere),
   * weight = a fixed INTEGER function of the index (the "frozen model";
   * swap in real trained weights via the same map-literal slot), per-doc
   * score = the exact integer sum of its tokens' weights. Integer weights
   * are the load-bearing choice: the score is order-independent and
   * engine-exact, so the classify-and-gate decision (`score ≥ 0`) replays
   * bit-for-bit — no sigmoid, no float sum, no threshold jitter. Work is
   * one explode + one grouped sum; the model never leaves the expression.
   */
  def modelQualityScore(docs: DataFrame, dims: Int = 256): DataFrame = {
    val idx = pmod(TextOps.md5Long(col("tok")), lit(dims))
    // Knuth-multiplicative spread over the index, centered: w ∈ [-10^6, 10^6].
    val weight = pmod(idx * lit(2654435761L), lit(2000001L)) - lit(1000000L)
    docs.select(col("doc_id"), col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
      .withColumn("w", weight)
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("w")).as("score"), count(lit(1)).as("n_tokens"))
      .withColumn("keep", col("score") >= 0L)
  }

  /**
   * Temperature-scaled domain mixing (B201, the multilingual-sampling `T`
   * parameter — mBERT/XLM-R's p_i ∝ share_i^(1/T)): at T=2 small sources
   * upweight and the head flattens, the standard correction for
   * head-domain dominance. Exponent fixed at 1/2 because `sqrt` is
   * IEEE-correctly-rounded in EVERY engine (generic `pow` is not a
   * cross-engine contract), and the per-source √tokens are QUANTIZED to
   * integers (floor(√·10^6)) BEFORE the normalizing sum — integer sums are
   * exact and order-independent, so the resulting basis points replay
   * bit-identically regardless of partition layout or engine. One grouped
   * aggregation + a broadcast 1-row total; no shuffle beyond the groupBy.
   */
  def mixWeightsTemperature(docs: DataFrame): DataFrame = {
    val per = docs.groupBy(col("source"))
      .agg(sum(TextOps.tokenCount(col("text"))).as("n_tokens"))
      .withColumn("sq", floor(sqrt(col("n_tokens").cast("double")) * 1000000d)
        .cast("long"))
    val tot = per.agg(sum(col("n_tokens")).as("total_tok"), sum(col("sq")).as("total_sq"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        expr("(n_tokens * 10000) div total_tok").as("share_bp"),
        expr("(sq * 10000) div total_sq").as("temp_bp"))
      .withColumn("upweighted", col("temp_bp") > col("share_bp"))
  }

  /**
   * Leakage-safe train/valid/test split: near-duplicate documents must never
   * straddle a split boundary — a test doc with a train-side near-twin is silent
   * eval contamination, the failure mode a per-doc hash split cannot prevent.
   * Composition: connected components over the near-dup pair graph assign every
   * doc a group id (its cluster minimum; singletons group with themselves), then
   * the [[hashSplit]] hash is taken over the GROUP id, so whole clusters move as
   * one. Using the same `split:` salt keeps singleton assignments identical to
   * the plain per-doc split — adding dedup pairs only ever moves cluster members,
   * never the untouched majority.
   *
   * Scale shape: CC is the iterative min-label kernel (checkpointed lineage), the
   * label join is one shuffle on doc_id, the split itself is a per-row hash.
   */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
                       trainPct: Int = 80, validPct: Int = 10): DataFrame =
    leakageSafeSplitFromLabels(docs,
      Dedup.connectedComponentsStar(pairs)
        .select(col("id").as("doc_id"), col("lbl")),
      trainPct, validPct)

  /** [[leakageSafeSplit]] over PRECOMPUTED component labels `(doc_id, lbl)` —
    * the materialized-cluster posture ([[Dedup.StandardLabels]]): splits and
    * collapse policies must read the SAME labels, or a component could
    * straddle the train/test boundary one query and not the next. */
  def leakageSafeSplitFromLabels(docs: DataFrame, labels: DataFrame,
                                 trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    val grouped = docs.join(labels, Seq("doc_id"), "left")
      .withColumn("group_id", coalesce(col("lbl"), col("doc_id"))).drop("lbl")
    hashSplit(grouped, "group_id", trainPct, validPct)
  }

  /**
   * Audited count-min-sketch heavy hitters (same contract family as
   * q_approx_distinct's HLL audit): the top-`k` terms by EXACT count, each carrying
   * two sketch-audit booleans — `est_ge_exact` (CMS can only overestimate — holds
   * unconditionally) and `est_within_bound` (estimate ≤ exact + ⌈eps·N⌉, the sketch's
   * accuracy guarantee at `confidence`). The estimates themselves are
   * hash-seed-dependent, so the verified surface is the exact counts plus the
   * guarantee booleans — deterministic under the fixed seed.
   *
   * Scale shape: the sketch is the 100 TB path — one mergeable pass, fixed
   * O(width·depth) memory per executor, no shuffle of term space; probing is
   * driver-side O(k). The exact top-k here is the AUDIT side (one term-keyed agg),
   * present precisely so the oracle can check the sketch against ground truth.
   *
   * NOTE: unlike the rest of the query surface, this executes EAGERLY at call time
   * (sketch build + audit collect) and returns a small local DataFrame — the same
   * driver-materialized posture as [[Similarity.kmeansCentroids]]' Lloyd steps;
   * callers wanting only a plan/schema should not call it.
   */
  def heavyHittersAudited(docs: DataFrame, k: Int = 20, eps: Double = 5e-4,
                          confidence: Double = 0.999, seed: Int = 42): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(TextOps.tokens(col("text"))).as("term"))
    val sketch = toks.stat.countMinSketch("term", eps, confidence, seed)
    val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("term")).limit(k)
      .as[(String, Long)].collect()
    val bound = math.ceil(eps * sketch.totalCount()).toLong
    spark.createDataset(exact.toSeq.map { case (term, cnt) =>
      val est = sketch.estimateCount(term)
      (term, cnt, est >= cnt, est <= cnt + bound)
    }).toDF("term", "exact_cnt", "est_ge_exact", "est_within_bound")
  }

  /**
   * Domain-mixing materialization: apply [[mixWeights]]'s integer repeat factors to
   * the corpus itself, emitting one row per (document, copy). A factor of
   * `repeat_bp` basis points becomes `repeat_bp div 10000` whole copies plus one
   * extra copy for the deterministic `repeat_bp mod 10000` / 10000 fraction of
   * documents, selected by an md5 hash of the doc id (same RNG-free posture as
   * [[hashSplit]] — membership is stable under corpus growth and re-runs).
   *
   * Scale shape: the per-source weights table broadcasts (sources are few), the
   * corpus streams once through `explode(sequence(...))` — output size is the
   * planned token budget, never an intermediate blow-up. Fractional selection uses
   * a different hash salt than the train split so epoch-resampling never correlates
   * with split assignment.
   *
   * `maxRepeatBp` caps the up-sampling factor (default 20 epochs): uniform
   * rebalance against a rare source would otherwise demand an unbounded repeat —
   * a 1-token source in a 1M-token mix asks for ~10^9 bp, and `sequence()` would
   * materialize it. Every real mixing recipe caps epochs for the same reason
   * (repetition stops helping long before that); the cap is mirrored in the oracle.
   */
  def materializeMix(docs: DataFrame, maxRepeatBp: Long = 200000L): DataFrame = {
    val w = mixWeights(docs)
      .select(col("source"), least(col("repeat_bp"), lit(maxRepeatBp)).as("repeat_bp"))
    val frac = pmod(
      TextOps.md5Long(concat(lit("mix:"), col("doc_id").cast("string"))), lit(10000))
    docs.join(broadcast(w), "source")
      .withColumn("n_copies",
        expr("repeat_bp div 10000") +
          when(frac < col("repeat_bp") % 10000L, 1L).otherwise(0L))
      .filter(col("n_copies") >= 1L)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_idx"))
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
   *
   * `excludeSelfPairs` applies ONLY when the benchmark is a slice of the
   * corpus itself (shared doc_id space): it drops the trivial doc==bench
   * identity pairs. Leave it false for an independent benchmark table —
   * there a numeric id collision is two UNRELATED documents, and dropping
   * the pair would silently report a genuinely contaminated document clean.
   *
   * `excludeSelfPairs` is REQUIRED (no default). The default flipped twice
   * across releases (r11: true→false, r13: false→true) — each flip silently
   * changed results for callers relying on it. A required parameter makes
   * every call site state which benchmark topology it has: `true` for a
   * corpus-slice benchmark (drop trivial identity pairs), `false` for an
   * independent benchmark table (an id collision is two unrelated documents
   * — dropping the pair would hide real leakage).
   */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
                    minShared: Int = 3,
                    excludeSelfPairs: Boolean): DataFrame = {
    val corpusSh = corpus.select(col("doc_id"),
      explode(TextOps.shingleSet(col("text"), n)).as("sh"))
    val benchSh = benchmark.select(col("doc_id").as("bench_id"),
      explode(TextOps.shingleSet(col("text"), n)).as("sh"))
    val joined = corpusSh.join(broadcast(benchSh), "sh")
    (if (excludeSelfPairs) joined.filter(col("doc_id") =!= col("bench_id"))
     else joined)
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
