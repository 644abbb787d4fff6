package graft.queries

import graft.Tables
import graft.functions.VectorOps
import graft.operators.{Similarity, VectorIndex}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity-search query set over the `embeddings` table (SURVEY.md B12 + the
 * LLM-pipeline north-star: brute-force exact top-k, IVF approximate top-k, sign-LSH
 * blocked embedding near-dup, per-label vector stats).
 *
 * Cross-engine float determinism: all dot products are accumulated in DOUBLE over the
 * float32 inputs in index order on both engines; ranking/thresholding always happens
 * on round(cos, 4) with vec_id tiebreaks, so the top-k cut is stable.
 */
object VectorQueries {
  type Q = (SparkSession, String) => DataFrame

  /** DuckDB cosine between two DOUBLE[] expressions. */
  private def dcos(a: String, b: String): String =
    s"round(list_dot_product($a,$b)/(sqrt(list_dot_product($a,$a))*sqrt(list_dot_product($b,$b))),4)"

  val queries: Map[String, Q] = Map(
    // B12 exact path: broadcast 5 query vectors, stream the corpus once, top-5 each.
    "q_sim_cosine_topk" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.bruteForceTopK(qs, emb.select(col("vec_id"), col("embedding")), 5)
        .orderBy(col("q_id"), col("rnk"))
    },

    // B197: hard-negative mining — for 5 anchors, the 5 most-similar corpus
    // vectors with a DIFFERENT label (the contrastive near-miss set). One
    // broadcast anchor batch, one corpus scan, label filter before scoring.
    "q_mine_hardneg" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val anchors = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("label").as("q_label"))
      Similarity.mineHardNegatives(anchors,
          emb.select(col("vec_id"), col("embedding"), col("label")), 5)
        .orderBy(col("q_id"), col("rnk"))
    },

    // B12 approximate path: IVF with 8 fixed centroids, nprobe=2, top-5.
    "q_sim_ann_ivf" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("centroid_id"), col("embedding").as("c_vec"))
      val qs = emb.filter(col("vec_id") >= 100 && col("vec_id") < 105)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.ivfTopK(qs, emb.select(col("vec_id"), col("embedding")),
          centroids, 5, 2)
        .orderBy(col("q_id"), col("rnk"))
    },

    // B12 approximate path, trained variant: IVF over k-means centroids (k=8,
    // 2 Lloyd iterations, fixed init ids — fully deterministic, see
    // Similarity.kmeansCentroids), nprobe=2, top-5.
    "q_sim_ann_kmeans" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val corpus = emb.select(col("vec_id"), col("embedding"))
      val centroids = Similarity.kmeansCentroids(corpus, 8, 2)
      val qs = emb.filter(col("vec_id") >= 100 && col("vec_id") < 105)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.ivfTopK(qs, corpus, centroids, 5, 2)
        .orderBy(col("q_id"), col("rnk"))
    },

    // B176: product-quantization ANN — per-subspace codebooks (m=8 subvectors
    // of the 64-dim embedding, 32 codewords each, deterministic seeded L2
    // Lloyd), corpus encoded to 8 small ints per vector (the 100 TB memory
    // story: 256 bytes of floats → 8 bytes of codes in the index), queries
    // scored by ADC table lookups. Inputs are L2-NORMALIZED so the PQ's L2
    // ranking approximates the exact arm's cosine ranking. The hash gate
    // rides the exact arm (SQL-replayable) plus `recall_ok`, a floor on the
    // PQ arm's TOTAL top-5 overlap across the query batch — deterministic by
    // the codebook contract, and far above the ~1-hit chance level on this
    // near-random synthetic corpus (where top-5 cosine gaps are smaller than
    // any quantizer's reconstruction error — the audit is honest about what
    // PQ buys on unclusterable data).
    "q_sim_ann_pq" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val corpus = emb.select(col("vec_id"), col("embedding"))
      val normCorpus = VectorIndex.normalized(
        emb.select(col("vec_id"), col("embedding")), "embedding", "embedding")
      val qs = emb.filter(col("vec_id") >= 100 && col("vec_id") < 105)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val normQs = VectorIndex.normalized(
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 105)
          .select(col("vec_id").as("q_id"), col("embedding")),
        "embedding", "q_vec")
      val exact = Similarity.bruteForceTopK(qs, corpus, 5)
      // The PQ arm READS the per-dataset persisted index (trained + encoded
      // once — VectorIndex; reuse is hash-safe by the deterministic-training
      // contract) instead of re-training per invocation.
      val (model, index) = VectorIndex.pq(s, d)
      val pq = Similarity.pqTopK(normQs, normCorpus, 5, trainFraction = 0.3,
          trained = Some(model), encoded = Some(index))
        .select(col("q_id"), col("vec_id"))
      val totalHits = exact.select(col("q_id"), col("vec_id"))
        .join(pq, Seq("q_id", "vec_id")).count()
      exact.select(col("q_id"), col("rnk"), col("vec_id"), col("cos"))
        .withColumn("recall_ok", lit(totalHits >= 4L))
        .orderBy(col("q_id"), col("rnk"))
    },

    // B192: scalar-quantization ANN (FAISS SQ8, asymmetric) — the corpus
    // compresses to per-vector (scale, int8 codes) and queries score against
    // the codes; deterministic integer math makes the approximate scores
    // themselves SQL-replayable, so this arm's ranking rides the hash gate
    // directly (no floor booleans needed).
    "q_sim_ann_sq" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") >= 300 && col("vec_id") < 305)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.sqTopK(qs, emb.select(col("vec_id"), col("embedding")), 5,
          encoded = Some(VectorIndex.sq(s, d)))
        .orderBy(col("q_id"), col("rnk"))
    },

    // B203: two-stage retrieval — SQ8 approximate scan keeps 25 candidates
    // per query, exact cosine re-ranks them to a top-5; candidate join is
    // broadcast (corpus never shuffles), final ranking fully SQL-replayable.
    "q_sim_rerank" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") >= 300 && col("vec_id") < 305)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.sqRerankTopK(qs, emb.select(col("vec_id"), col("embedding")), 5, 25,
          encoded = Some(VectorIndex.sq(s, d)))
        .orderBy(col("q_id"), col("rnk"))
    },

    // B12 approximate path 2: sign-LSH bucketed top-k (no training, one equi-join).
    "q_sim_ann_lsh" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") >= 200 && col("vec_id") < 206)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.lshTopK(qs, emb.select(col("vec_id"), col("embedding")), 5, 3)
        .orderBy(col("q_id"), col("rnk"))
    },

    // Embedding-cosine near-dup with sign-LSH blocking (recall bounded by blocking —
    // the documented LSH trade-off; exact within buckets). 4 sign bits = 16 buckets
    // keeps the within-bucket pair count ~1/16 of the naive quadratic.
    "q_dedup_embed" -> { (s, d) =>
      Similarity.nearDupPairs(
          Tables.embeddings(s, d).select(col("vec_id"), col("embedding")), 0.3, 4)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Vector column stats per label (array aggregation exercise).
    "q_vec_stats" -> { (s, d) =>
      Tables.embeddings(s, d)
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n"),
          round(avg(VectorOps.l2Norm(col("embedding"))), 4).as("avg_norm"),
          round(avg(element_at(col("embedding"), 1).cast("double")), 4).as("avg_c1"))
        .orderBy(col("label"))
    },

    // Symmetric int8 quantization (the 100 TB embedding-store compression layout):
    // per-vector scale = max |x_i|, codes = floor(127*x/scale). The full code
    // vector's identity (md5 + integer checksum + saturation count) is verified.
    // `scale_bp` is floor(scale*10000): floor of the shared IEEE double is
    // engine-safe where round-to-decimal on a dyadic float is not.
    "q_vec_quantize" -> { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
        .withColumn("scale", array_max(transform(col("e"), x => abs(x))))
        .withColumn("codes",
          when(col("scale") === 0, transform(col("e"), _ => lit(0)))
            .otherwise(transform(col("e"),
              x => floor(lit(127.0) * x / col("scale")).cast("int"))))
        .select(col("vec_id"),
          floor(col("scale") * 10000).cast("long").as("scale_bp"),
          aggregate(col("codes"), lit(0L), (a, x) => a + x).as("code_sum"),
          size(filter(col("codes"), c => abs(c) === 127)).cast("long").as("n_sat"),
          md5(concat_ws(",", transform(col("codes"), _.cast("string")))).as("code_md5"))
        .orderBy(col("vec_id"))
    },

    // Hybrid retrieval (the RAG-shaped pipeline): BM25 keyword candidates and
    // cosine vector candidates (query = vec 0) fused by reciprocal-rank fusion in
    // INTEGER arithmetic (1e6 div (60+rank)), top-10. Both candidate lists are
    // top-50 via TakeOrderedAndProject; the rank windows run over the already
    // limited 50-row sets, never the corpus. Documents and embeddings share ids.
    "q_hybrid_retrieval" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val bmTop = TextQueries.bm25Scores(Tables.documents(s, d))
        .select(col("doc_id"), col("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(50)
      val bmRank = bmTop.withColumn("r_bm25",
          row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("r_bm25"))
      val emb = Tables.embeddings(s, d)
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_vec"))
      // NOT spread (r16, measured): repartitioning the corpus to parallelize
      // the cosine shuffles the heavy embedding arrays once to save cheap
      // per-row math — guide §8's anti-pattern; the matched A/B read +0.035 s.
      val cosTop = emb.filter(col("vec_id") > 0).crossJoin(broadcast(qv))
        .select(col("vec_id"),
          round(VectorOps.cosine(col("embedding"), col("q_vec")), 4).as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(50)
      val vecRank = cosTop.withColumn("r_vec",
          row_number().over(Window.orderBy(col("cos").desc, col("vec_id"))).cast("long"))
        .select(col("vec_id").as("doc_id"), col("r_vec"))
      bmRank.join(vecRank, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("r_bm25"), col("r_vec"),
          (coalesce(expr("1000000 div (60 + r_bm25)"), lit(0L)) +
            coalesce(expr("1000000 div (60 + r_vec)"), lit(0L))).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(10)
    },

    // ANN evaluation harness: recall@5 of the IVF probe against the exact
    // brute-force top-5, per query — the metric every ANN deployment is tuned
    // by (nlist/nprobe trade-offs are meaningless without it). Both arms reuse
    // the operators verified by their own queries; the hit join is on (q_id,
    // vec_id) over two 25-row sets — metadata-scale after the heavy lifting.
    "q_sim_recall" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val corpus = emb.select(col("vec_id"), col("embedding"))
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("centroid_id"), col("embedding").as("c_vec"))
      val exact = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 105)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
        corpus, 5).select(col("q_id"), col("vec_id"))
      val approx = Similarity.ivfTopK(
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 105)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
        corpus, centroids, 5, 2).select(col("q_id"), col("vec_id"))
      val hits = exact.join(approx, Seq("q_id", "vec_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 105)
        .select(col("vec_id").as("q_id"))
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          round(coalesce(col("n_hits"), lit(0L)).cast("double") / lit(5.0), 4)
            .as("recall"))
        .orderBy(col("q_id"))
    },

    // B184: per-ARM ANN recall harness — the audit that makes the
    // nlist/nprobe/m/k trade-offs measurable side by side: every approximate
    // arm (IVF, PQ, IVF-PQ) scored as recall@5 against the SAME brute-force
    // truth over the SAME 5-query batch. The PQ model trains ONCE and both PQ
    // arms reuse it (the single-pass multi-subspace Lloyd), so the harness
    // costs one training, three candidate scans. The IVF arm is
    // SQL-replayable, so its mean recall rides the hash gate exactly; the PQ
    // arms' k-means codebooks are not DuckDB-expressible — their measured
    // recall is pinned as a deterministic floor boolean (`recall_ok`, the
    // same honest channel q_sim_ann_pq uses) with mean_recall_bp = -1
    // marking "measured, floor-audited, not SQL-replayed" (the spec suite
    // pins the exact per-arm values).
    "q_sim_recall_arms" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val corpus = emb.select(col("vec_id"), col("embedding"))
      val qs = emb.filter(col("vec_id") >= 100 && col("vec_id") < 105)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("centroid_id"),
          col("embedding").as("c_vec"))
      val exact = Similarity.bruteForceTopK(qs, corpus, 5)
        .select(col("q_id"), col("vec_id"))
      val normCorpus = VectorIndex.normalized(
        emb.select(col("vec_id"), col("embedding")), "embedding", "embedding")
      val normQs = VectorIndex.normalized(
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 105)
          .select(col("vec_id").as("q_id"), col("embedding")),
        "embedding", "q_vec")
      val normCentroids = VectorIndex.normalized(
        emb.filter(col("vec_id") < 8)
          .select(col("vec_id").cast("int").as("centroid_id"), col("embedding")),
        "embedding", "c_vec")
      // Both PQ arms and both SQ arms read the PER-DATASET persisted index
      // (VectorIndex: trained + encoded once per dataset, shared with
      // q_sim_ann_pq/q_sim_ann_sq/q_sim_rerank — the deployment posture where
      // the harness audits the SAME index production queries serve from).
      val (model, index) = VectorIndex.pq(s, d)
      val sqIndex = VectorIndex.sq(s, d)
      // Each arm's top-k is <= 25 rows: collect the id pairs and intersect on
      // the driver (metadata-scale), so the brute-force truth is computed
      // ONCE, not re-derived inside three join plans.
      def pairsOf(arm: DataFrame): Set[(Long, Long)] =
        arm.select(col("q_id").cast("long"), col("vec_id").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = pairsOf(exact)
      def hitsOf(arm: DataFrame): Long = pairsOf(arm).count(truth).toLong
      // The six arms are INDEPENDENT actions over a mostly-idle local cluster
      // — submitted sequentially they serialize six job latencies. Overlap
      // them from driver threads (guide §2.6): Spark's scheduler interleaves
      // the jobs and each arm's tail back-fills the others' idle cores. The
      // collected sets are deterministic per arm, so result and hash are
      // identical to the sequential drive (r15 optimization).
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.DurationInt
      // Dedicated pool, NOT ExecutionContext.Implicits.global (r16, the r15
      // verdict's watch item): each arm BLOCKS in collect(), and the global
      // pool's work-stealing threads are shared with everything else in the
      // JVM — under load the blocked arms can starve the pool and serialize
      // worse than the sequential original. Six fixed threads, one per arm,
      // torn down with the query.
      val armPool = java.util.concurrent.Executors.newFixedThreadPool(6)
      implicit val armEc: ExecutionContext =
        ExecutionContext.fromExecutorService(armPool)
      val armF = Seq(
        Future(hitsOf(Similarity.ivfTopK(qs, corpus, centroids, 5, 2))),
        Future(hitsOf(Similarity.pqTopK(normQs, normCorpus, 5,
          trainFraction = 0.3, trained = Some(model), encoded = Some(index)))),
        Future(hitsOf(Similarity.ivfPqTopK(normQs, normCorpus,
          normCentroids, 5, 2, trainFraction = 0.3, trained = Some(model),
          encoded = Some(index)))),
        // B192/B203 arms: SQ8 and its exact re-rank are DETERMINISTIC (integer
        // quantization, no trained codebooks), so their recall is an exact
        // SQL-replayable basis-point number, like the IVF arm. Re-rank recall
        // dominates SQ8 recall BY CONSTRUCTION: every truth member inside the
        // candidate list is exact-cosine-selected, so repair is monotone.
        Future(hitsOf(Similarity.sqTopK(qs, corpus, 5, encoded = Some(sqIndex)))),
        Future(hitsOf(
          Similarity.sqRerankTopK(qs, corpus, 5, 25, encoded = Some(sqIndex)))))
      val Seq(ivfHits, pqHits, ivfPqHits, sqHits, rerankHits) =
        try Await.result(Future.sequence(armF), 10.minutes)
        finally armPool.shutdown()
      import s.implicits._
      Seq(
        ("ivf", 5L, ivfHits * 10000L / 25L, true),
        ("pq", 5L, -1L, pqHits >= 4L),
        ("ivfpq", 5L, -1L, ivfPqHits >= 2L),
        ("sq", 5L, sqHits * 10000L / 25L, true),
        ("rerank", 5L, rerankHits * 10000L / 25L, rerankHits >= sqHits)
      ).toDF("arm", "n_queries", "mean_recall_bp", "recall_ok")
        .orderBy(col("arm"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q_sim_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |scored AS (
         |  SELECT q_id, vec_id, ${dcos("qv", "v")} AS cos
         |  FROM c CROSS JOIN q WHERE vec_id <> q_id),
         |ranked AS (
         |  SELECT q_id, vec_id, cos,
         |   CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
         |  FROM scored)
         |SELECT q_id, rnk, vec_id, cos FROM ranked WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin,

    // B197: identical brute-force replay with the label-mismatch filter.
    "q_mine_hardneg" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv, label AS q_label
         |  FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
         |scored AS (
         |  SELECT q_id, q_label, vec_id, label AS neg_label, ${dcos("qv", "v")} AS cos
         |  FROM c CROSS JOIN q WHERE vec_id <> q_id AND label <> q_label),
         |ranked AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
         |  FROM scored)
         |SELECT q_id, q_label, rnk, vec_id, neg_label, cos
         |FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    // B176: the oracle replays the EXACT arm (the SQL-expressible truth) and
    // pins the PQ arm's deterministic recall floor.
    "q_sim_ann_pq" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id >= 100 AND vec_id < 105),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |scored AS (
         |  SELECT q_id, vec_id, ${dcos("qv", "v")} AS cos
         |  FROM c CROSS JOIN q WHERE vec_id <> q_id),
         |ranked AS (
         |  SELECT q_id, vec_id, cos,
         |   CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
         |  FROM scored)
         |SELECT q_id, rnk, vec_id, cos, true AS recall_ok
         |FROM ranked WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin,

    "q_sim_ann_ivf" ->
      s"""WITH cent AS (SELECT CAST(vec_id AS INT) AS centroid_id, embedding::DOUBLE[] AS cv
         |  FROM embeddings WHERE vec_id < 8),
         |corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id >= 100 AND vec_id < 105),
         |bucketed AS (
         |  SELECT vec_id, v, centroid_id AS bucket FROM (
         |    SELECT c.vec_id, c.v, t.centroid_id,
         |     row_number() OVER (PARTITION BY c.vec_id
         |       ORDER BY ${dcos("c.v", "t.cv")} DESC, t.centroid_id) AS crnk
         |    FROM corp c CROSS JOIN cent t) WHERE crnk = 1),
         |probes AS (
         |  SELECT q_id, qv, centroid_id AS bucket FROM (
         |    SELECT q.q_id, q.qv, t.centroid_id,
         |     row_number() OVER (PARTITION BY q.q_id
         |       ORDER BY ${dcos("q.qv", "t.cv")} DESC, t.centroid_id) AS crnk
         |    FROM q CROSS JOIN cent t) WHERE crnk <= 2),
         |scored AS (
         |  SELECT p.q_id, b.vec_id, ${dcos("p.qv", "b.v")} AS cos
         |  FROM bucketed b JOIN probes p USING (bucket) WHERE b.vec_id <> p.q_id)
         |SELECT q_id, rnk, vec_id, cos FROM (
         |  SELECT q_id, vec_id, cos,
         |   CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
         |  FROM scored) WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin,

    "q_sim_ann_kmeans" -> {
      def assign(corp: String, cent: String): String =
        s"""(SELECT centroid_id, vec_id, v FROM (
           |  SELECT t.centroid_id, c.vec_id, c.v,
           |    row_number() OVER (PARTITION BY c.vec_id
           |      ORDER BY ${dcos("c.v", "t.cv")} DESC, t.centroid_id) AS crnk
           |  FROM $corp c CROSS JOIN $cent t) WHERE crnk = 1)""".stripMargin
      def recompute(a: String): String =
        s"""(SELECT centroid_id, list(cval ORDER BY pos) AS cv FROM (
           |  SELECT a.centroid_id, d.pos, round(avg(a.v[d.pos]), 4) AS cval
           |  FROM $a a CROSS JOIN dim d GROUP BY a.centroid_id, d.pos)
           | GROUP BY centroid_id)""".stripMargin
      s"""WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |dim AS (SELECT unnest(range(1, 65)) AS pos),
         |c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS centroid_id, v AS cv
         |  FROM (SELECT vec_id, v FROM corp ORDER BY vec_id LIMIT 8)),
         |a1 AS (SELECT * FROM ${assign("corp", "c0")}),
         |c1 AS (SELECT * FROM ${recompute("a1")}),
         |a2 AS (SELECT * FROM ${assign("corp", "c1")}),
         |c2 AS (SELECT * FROM ${recompute("a2")}),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM corp
         |  WHERE vec_id >= 100 AND vec_id < 105),
         |bucketed AS (SELECT vec_id, v, centroid_id AS bucket FROM (
         |  SELECT c.vec_id, c.v, t.centroid_id,
         |    row_number() OVER (PARTITION BY c.vec_id
         |      ORDER BY ${dcos("c.v", "t.cv")} DESC, t.centroid_id) AS crnk
         |  FROM corp c CROSS JOIN c2 t) WHERE crnk = 1),
         |probes AS (SELECT q_id, qv, centroid_id AS bucket FROM (
         |  SELECT q.q_id, q.qv, t.centroid_id,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY ${dcos("q.qv", "t.cv")} DESC, t.centroid_id) AS crnk
         |  FROM q CROSS JOIN c2 t) WHERE crnk <= 2),
         |scored AS (SELECT p.q_id, b.vec_id, ${dcos("p.qv", "b.v")} AS cos
         |  FROM bucketed b JOIN probes p USING (bucket) WHERE b.vec_id <> p.q_id)
         |SELECT q_id, rnk, vec_id, cos FROM (
         |  SELECT q_id, vec_id, cos,
         |   CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
         |  FROM scored) WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin
    },

    "q_sim_ann_lsh" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |   (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
         |    + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
         |    + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END) AS bucket
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM e
         |  WHERE vec_id >= 200 AND vec_id < 206),
         |scored AS (
         |  SELECT q.q_id, e.vec_id, ${dcos("q.qv", "e.v")} AS cos
         |  FROM e JOIN q USING (bucket) WHERE e.vec_id <> q.q_id),
         |ranked AS (
         |  SELECT q_id, vec_id, cos,
         |   CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
         |  FROM scored)
         |SELECT q_id, rnk, vec_id, cos FROM ranked WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin,

    "q_dedup_embed" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |   (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
         |    + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
         |    + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
         |    + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
         |  FROM embeddings),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${dcos("a.v", "b.v")} AS cos
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cos FROM pairs WHERE cos >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,

    "q_vec_stats" ->
      """SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
        | round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))),4) AS avg_norm,
        | round(avg(CAST(embedding[1] AS DOUBLE)),4) AS avg_c1
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    // B192: full SQL replay of the SQ8 arm — same quantization, same
    // index-order dot product, same (·scale/127) dequantization, same
    // round-4 ranking cut.
    "q_sim_ann_sq" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |s AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS scale FROM v),
        |enc AS (SELECT vec_id, scale,
        |    CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
        |         ELSE list_transform(e, x -> CAST(floor(127.0 * x / scale) AS INT)) END AS codes
        |  FROM s),
        |q AS (SELECT vec_id AS q_id, e AS qv FROM v
        |  WHERE vec_id >= 300 AND vec_id < 305),
        |scored AS (
        |  SELECT q_id, enc.vec_id,
        |    round(list_dot_product(qv, list_transform(codes, c -> CAST(c AS DOUBLE)))
        |      * enc.scale / 127.0, 4) AS sqdot
        |  FROM enc CROSS JOIN q WHERE enc.vec_id <> q_id),
        |ranked AS (
        |  SELECT q_id, vec_id, sqdot,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sqdot DESC, vec_id) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT q_id, rnk, vec_id, sqdot FROM ranked WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,

    // B203: replay stage 1 (SQ8 top-25) then stage 2 (exact cosine top-5).
    "q_sim_rerank" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |s AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS scale FROM v),
        |enc AS (SELECT vec_id, scale,
        |    CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
        |         ELSE list_transform(e, x -> CAST(floor(127.0 * x / scale) AS INT)) END AS codes
        |  FROM s),
        |q AS (SELECT vec_id AS q_id, e AS qv FROM v
        |  WHERE vec_id >= 300 AND vec_id < 305),
        |stage1 AS (
        |  SELECT q_id, enc.vec_id,
        |    round(list_dot_product(qv, list_transform(codes, c -> CAST(c AS DOUBLE)))
        |      * enc.scale / 127.0, 4) AS sqdot
        |  FROM enc CROSS JOIN q WHERE enc.vec_id <> q_id),
        |cands AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sqdot DESC, vec_id) AS r
        |    FROM stage1) WHERE r <= 25),
        |rescored AS (
        |  SELECT c.q_id, c.vec_id, ${dcos("q.qv", "v.e")} AS cos
        |  FROM cands c JOIN v ON v.vec_id = c.vec_id JOIN q ON q.q_id = c.q_id),
        |ranked AS (
        |  SELECT q_id, vec_id, cos,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
        |  FROM rescored)
        |SELECT q_id, rnk, vec_id, cos FROM ranked WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,

    "q_vec_quantize" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |s AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS scale FROM v),
        |q AS (SELECT vec_id, CAST(floor(scale * 10000) AS BIGINT) AS scale_bp,
        |       CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
        |            ELSE list_transform(e, x -> CAST(floor(127.0 * x / scale) AS INT)) END AS codes
        |      FROM s)
        |SELECT vec_id, scale_bp,
        | CAST(list_sum(codes) AS BIGINT) AS code_sum,
        | CAST(len(list_filter(codes, c -> abs(c) = 127)) AS BIGINT) AS n_sat,
        | md5(array_to_string(codes, ',')) AS code_md5
        |FROM q ORDER BY vec_id""".stripMargin,

    "q_hybrid_retrieval" ->
      s"""WITH ${TextQueries.duckBm25},
         |bmtop AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_bm25
         |          FROM (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 50)),
         |qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0),
         |cos AS (SELECT vec_id, ${dcos("e", "q")} AS cos
         |        FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id > 0)
         |        CROSS JOIN qv),
         |vtop AS (SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS r_vec
         |         FROM (SELECT vec_id AS doc_id, cos FROM cos ORDER BY cos DESC, vec_id LIMIT 50))
         |SELECT doc_id, CAST(r_bm25 AS BIGINT) AS r_bm25, CAST(r_vec AS BIGINT) AS r_vec,
         | coalesce(1000000 // (60 + r_bm25), 0) + coalesce(1000000 // (60 + r_vec), 0) AS rrf
         |FROM bmtop FULL OUTER JOIN vtop USING (doc_id)
         |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

    "q_sim_recall" ->
      s"""WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id >= 100 AND vec_id < 105),
         |cent AS (SELECT CAST(vec_id AS INT) AS centroid_id, embedding::DOUBLE[] AS cv
         |  FROM embeddings WHERE vec_id < 8),
         |exact AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id,
         |   row_number() OVER (PARTITION BY q_id
         |     ORDER BY ${dcos("v", "qv")} DESC, vec_id) AS rnk
         |  FROM corp CROSS JOIN q WHERE vec_id <> q_id) WHERE rnk <= 5),
         |bucketed AS (SELECT vec_id, v, centroid_id AS bucket FROM (
         |  SELECT c.vec_id, c.v, t.centroid_id,
         |   row_number() OVER (PARTITION BY c.vec_id
         |     ORDER BY ${dcos("c.v", "t.cv")} DESC, t.centroid_id) AS crnk
         |  FROM corp c CROSS JOIN cent t) WHERE crnk = 1),
         |probes AS (SELECT q_id, qv, centroid_id AS bucket FROM (
         |  SELECT q.q_id, q.qv, t.centroid_id,
         |   row_number() OVER (PARTITION BY q.q_id
         |     ORDER BY ${dcos("q.qv", "t.cv")} DESC, t.centroid_id) AS crnk
         |  FROM q CROSS JOIN cent t) WHERE crnk <= 2),
         |approx AS (SELECT q_id, vec_id FROM (
         |  SELECT p.q_id, b.vec_id,
         |   row_number() OVER (PARTITION BY p.q_id
         |     ORDER BY ${dcos("p.qv", "b.v")} DESC, b.vec_id) AS rnk
         |  FROM bucketed b JOIN probes p USING (bucket)
         |  WHERE b.vec_id <> p.q_id) WHERE rnk <= 5),
         |hits AS (SELECT e.q_id, count(*) AS n
         |  FROM exact e JOIN approx a ON e.q_id = a.q_id AND e.vec_id = a.vec_id
         |  GROUP BY e.q_id)
         |SELECT q.q_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
         |  round(CAST(coalesce(h.n, 0) AS DOUBLE) / 5.0, 4) AS recall
         |FROM q LEFT JOIN hits h USING (q_id)
         |ORDER BY q.q_id""".stripMargin,

    // B184: the IVF arm's mean recall is replayed exactly (same CTE chain as
    // q_sim_recall); the PQ arms' codebooks are not SQL-expressible — the
    // oracle pins their deterministic floor booleans and the -1 sentinel.
    "q_sim_recall_arms" ->
      s"""WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id >= 100 AND vec_id < 105),
         |cent AS (SELECT CAST(vec_id AS INT) AS centroid_id, embedding::DOUBLE[] AS cv
         |  FROM embeddings WHERE vec_id < 8),
         |exact AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id,
         |   row_number() OVER (PARTITION BY q_id
         |     ORDER BY ${dcos("v", "qv")} DESC, vec_id) AS rnk
         |  FROM corp CROSS JOIN q WHERE vec_id <> q_id) WHERE rnk <= 5),
         |bucketed AS (SELECT vec_id, v, centroid_id AS bucket FROM (
         |  SELECT c.vec_id, c.v, t.centroid_id,
         |   row_number() OVER (PARTITION BY c.vec_id
         |     ORDER BY ${dcos("c.v", "t.cv")} DESC, t.centroid_id) AS crnk
         |  FROM corp c CROSS JOIN cent t) WHERE crnk = 1),
         |probes AS (SELECT q_id, qv, centroid_id AS bucket FROM (
         |  SELECT q.q_id, q.qv, t.centroid_id,
         |   row_number() OVER (PARTITION BY q.q_id
         |     ORDER BY ${dcos("q.qv", "t.cv")} DESC, t.centroid_id) AS crnk
         |  FROM q CROSS JOIN cent t) WHERE crnk <= 2),
         |approx AS (SELECT q_id, vec_id FROM (
         |  SELECT p.q_id, b.vec_id,
         |   row_number() OVER (PARTITION BY p.q_id
         |     ORDER BY ${dcos("p.qv", "b.v")} DESC, b.vec_id) AS rnk
         |  FROM bucketed b JOIN probes p USING (bucket)
         |  WHERE b.vec_id <> p.q_id) WHERE rnk <= 5),
         |ivf_hits AS (SELECT count(*) AS n
         |  FROM exact e JOIN approx a ON e.q_id = a.q_id AND e.vec_id = a.vec_id),
         |enc AS (SELECT vec_id, scale,
         |    CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
         |         ELSE list_transform(v, x -> CAST(floor(127.0 * x / scale) AS INT)) END AS codes
         |  FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale FROM corp)),
         |sq_scored AS (
         |  SELECT q_id, enc.vec_id,
         |    round(list_dot_product(qv, list_transform(codes, c -> CAST(c AS DOUBLE)))
         |      * enc.scale / 127.0, 4) AS sqdot
         |  FROM enc CROSS JOIN q WHERE enc.vec_id <> q_id),
         |sq5 AS (SELECT q_id, vec_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sqdot DESC, vec_id) AS r
         |  FROM sq_scored) WHERE r <= 5),
         |sq_hits AS (SELECT count(*) AS n
         |  FROM exact e JOIN sq5 a ON e.q_id = a.q_id AND e.vec_id = a.vec_id),
         |sq25 AS (SELECT q_id, vec_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sqdot DESC, vec_id) AS r
         |  FROM sq_scored) WHERE r <= 25),
         |rr5 AS (SELECT q_id, vec_id FROM (
         |  SELECT c.q_id, c.vec_id,
         |   row_number() OVER (PARTITION BY c.q_id
         |     ORDER BY ${dcos("q.qv", "cv.v")} DESC, c.vec_id) AS r
         |  FROM sq25 c JOIN corp cv ON cv.vec_id = c.vec_id
         |    JOIN q ON q.q_id = c.q_id) WHERE r <= 5),
         |rr_hits AS (SELECT count(*) AS n
         |  FROM exact e JOIN rr5 a ON e.q_id = a.q_id AND e.vec_id = a.vec_id)
         |SELECT 'ivf' AS arm, CAST(5 AS BIGINT) AS n_queries,
         |  CAST((SELECT n FROM ivf_hits) * 10000 // 25 AS BIGINT) AS mean_recall_bp,
         |  true AS recall_ok
         |UNION ALL SELECT 'ivfpq', 5, -1, true
         |UNION ALL SELECT 'pq', 5, -1, true
         |UNION ALL SELECT 'sq', 5,
         |  CAST((SELECT n FROM sq_hits) * 10000 // 25 AS BIGINT), true
         |UNION ALL SELECT 'rerank', 5,
         |  CAST((SELECT n FROM rr_hits) * 10000 // 25 AS BIGINT), true
         |ORDER BY arm""".stripMargin
  )
}
