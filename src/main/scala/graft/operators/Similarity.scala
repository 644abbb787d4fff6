package graft.operators

import graft.functions.VectorOps
import graft.plans.VectorExpressions.{vecCosine, vecDot}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate/exact nearest-neighbor search over embedding columns (SURVEY.md B12 —
 * the LLM-pipeline similarity-search operator family).
 *
 * Scale design: the exact path broadcasts the (small) query set and streams the
 * corpus — one pass, no shuffle of the corpus, per-partition top-k then a tiny final
 * top-k. The approximate paths (IVF, sign-LSH) first shuffle the corpus ONCE into
 * content-derived buckets and probe only matching buckets — the 100 TB shape, where a
 * full scan per query batch is not affordable.
 */
object Similarity {

  /** Shared top-k tail: rank per query on the score with explicit NULL
    * ordering (a null score must NEVER outrank a real candidate — ascending
    * sorts default NULLS FIRST, which put a dim-mismatched vector at rank 1)
    * and the vec_id tiebreak that makes the cut deterministic. */
  private def rankTopK(scored: DataFrame, scoreCol: String,
                       ascending: Boolean, k: Int): DataFrame =
    ranked(scored, scoreCol, ascending, k)
      .select(col("q_id"), col("rnk"), col("vec_id"), col(scoreCol))

  /** The ranking kernel behind [[rankTopK]] and [[mineHardNegatives]] (one
    * definition so the ordering contract can never diverge between arms).
    * NaN scores normalize to NULL first: Spark's total order puts NaN ABOVE
    * every number, so a NaN cosine (inf/inf from an overflowed embedding)
    * would otherwise outrank every real candidate in the descending arms —
    * the exact inversion the nulls_last ordering exists to prevent. */
  private def ranked(scored: DataFrame, scoreCol: String,
                     ascending: Boolean, k: Int): DataFrame = {
    val cleaned = scored.withColumn(scoreCol,
      when(isnan(col(scoreCol)), lit(null)).otherwise(col(scoreCol)))
    val order =
      if (ascending) col(scoreCol).asc_nulls_last else col(scoreCol).desc_nulls_last
    val w = Window.partitionBy(col("q_id")).orderBy(order, col("vec_id"))
    cleaned.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /**
   * Exact brute-force top-k cosine neighbors for each query vector.
   * `queries`: (q_id, q_vec); `corpus`: (vec_id, embedding). The broadcast join
   * keeps the corpus un-shuffled; ranking on round(cos,4) with vec_id tiebreak makes
   * the cut deterministic across engines.
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(vecCosine(col("q_vec"), col("embedding")), 4))
    rankTopK(scored, "cos", ascending = false, k)
  }

  /**
   * Hard-negative mining (B197, the contrastive-training miner): for each
   * anchor, the k corpus vectors MOST cosine-similar to it that carry a
   * DIFFERENT label — exactly the near-miss negatives a triplet/InfoNCE
   * trainer wants (random negatives are trivially far; hard ones define the
   * decision boundary). `anchors`: (q_id, q_vec, q_label); `corpus`:
   * (vec_id, embedding, label). The anchor batch broadcasts (mining runs in
   * per-batch waves, |anchors| << |corpus|), the corpus streams through ONE
   * un-shuffled scan, and the label-mismatch filter prunes before scoring —
   * map-side work ending in the same partial top-k aggregation as
   * [[bruteForceTopK]]; round-4 scores + vec_id tiebreak keep the cut
   * deterministic across engines.
   */
  def mineHardNegatives(anchors: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(anchors))
      .filter(col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
      .withColumn("cos", round(vecCosine(col("q_vec"), col("embedding")), 4))
    ranked(scored, "cos", ascending = false, k)
      .select(col("q_id"), col("q_label"), col("rnk"), col("vec_id"),
        col("label").as("neg_label"), col("cos"))
  }

  /**
   * IVF-style approximate top-k: the corpus is pre-bucketed by nearest centroid (one
   * shuffle, amortized over all queries); each query probes only its `nprobe` nearest
   * centroid buckets. Recall < 1 by design; at 100 TB the probed fraction is
   * nprobe/nlist of the corpus instead of all of it.
   * `centroids`: (centroid_id, c_vec) — small, broadcast everywhere.
   */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int): DataFrame = {
    val bucketed = nearestCentroid(centroids)("vec_id", "embedding", "bucket", 1)(corpus)
    val probes = nearestCentroid(centroids)("q_id", "q_vec", "bucket", nprobe)(queries)
    // The probe set is queries x nprobe — a query BATCH, small by contract
    // (|Q| << corpus): broadcast it so the bucketed corpus is never shuffled
    // for the join (guide §3.1 — size estimates through the rank expressions
    // are unreliable, so the strategy is pinned, not inferred).
    val scored = bucketed.join(broadcast(probes), "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(vecCosine(col("q_vec"), col("embedding")), 4))
    rankTopK(scored, "cos", ascending = false, k)
  }

  /** Assign each row its `n` nearest centroids (cosine, round-4, id
    * tiebreak). Rows whose similarity to EVERY centroid is null (a
    * dim-mismatched vector) or NaN (an overflowed one — NaN sorts ABOVE
    * every number in Spark's total order and would otherwise win the .desc
    * ranking into an arbitrary cluster) drop out instead of silently
    * joining. Shared by the IVF and IVF-PQ paths.
    *
    * Centroids are metadata-scale by contract (k trained centroids,
    * materialized on the driver between Lloyd iterations already), so they
    * embed as a LITERAL array and each row ranks them with native array
    * expressions — r16: this replaces the old crossJoin(broadcast) +
    * row_number window, whose Exchange(hashpartitioning(idCol)) + two Sorts
    * shuffled the k-times-exploded corpus per assignment (guide §2.4: the
    * 100 TB IVF assignment is embarrassingly parallel — one narrow map
    * pass). Semantics are the window's exactly: score = round(cosine, 4),
    * null/NaN pairs drop, order cdist DESC then centroid_id ASC, keep n
    * (Spark's comparison operators use the same NaN-is-greatest total order
    * the sort used, so the comparator reproduces tie behavior bit-for-bit). */
  private def nearestCentroid(centroids: DataFrame)(
      idCol: String, vecCol: String, idOut: String, n: Int)(df: DataFrame): DataFrame = {
    val local = centroids
      .select(col("centroid_id").cast("int"), col("c_vec").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).sortBy(_._1).toSeq
    val scored = transform(typedlit(local), c => struct(
      round(vecCosine(col(vecCol), c.getField("_2")), 4).as("cdist"),
      c.getField("_1").as("cid")))
    val valid = filter(scored, s =>
      s.getField("cdist").isNotNull && !isnan(s.getField("cdist")))
    val ranked = array_sort(valid, (a, b) => {
      val (da, db) = (a.getField("cdist"), b.getField("cdist"))
      when(da > db, -1).when(da < db, 1)
        .when(a.getField("cid") < b.getField("cid"), -1)
        .when(a.getField("cid") > b.getField("cid"), 1)
        .otherwise(0)
    })
    df.withColumn("_nc", explode(slice(ranked, 1, n)))
      .withColumn(idOut, col("_nc").getField("cid"))
      .drop("_nc")
  }

  /**
   * Deterministic seeded Lloyd's k-means over an embedding corpus, producing trained
   * IVF centroids `(centroid_id, c_vec: array<double>)` for [[ivfTopK]].
   *
   * Determinism contract (what makes the result oracle-expressible cross-engine):
   * initialization is the `k` smallest `vec_id` rows OF THE TRAINING SET
   * (orderBy + limit — ids need not be dense from 0), re-identified 0..k-1 in `vec_id` order; a FIXED
   * number of Lloyd iterations (no convergence test); assignment ranks on
   * `round(cosine, 4)` with `centroid_id` tiebreak; each recomputed centroid
   * component is `round(avg, 4)`, which absorbs floating-point sum-order drift
   * between engines/runs. A cluster that captures no vectors drops out (both engines
   * agree — the assignment join is inner).
   *
   * Scale posture: each iteration is one broadcast of k centroids + one linear pass
   * over the training set + one (centroid, dim)-keyed agg of exploded rows — no
   * quadratic stage. Centroids are MATERIALIZED on the driver between iterations
   * (k × dim doubles — metadata-scale, the same per-step centroid collect MLlib's
   * own KMeans does), so iteration i+1's plan never contains iteration i's: jobs
   * and wall-clock are linear in `iters`, plan depth is constant, no lineage
   * blow-up at iters=10+. `trainFraction < 1` trains on a deterministic
   * hash-sampled subset (`pmod(hash(vec_id), 10000) < frac*10000` — reproducible
   * and oracle-expressible, unlike RNG sampling) — the 100 TB path, where Lloyd
   * iterations touch a sample and only the final bucketing pass sees the corpus.
   */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int,
                      trainFraction: Double = 1.0,
                      metric: String = "cosine"): DataFrame = {
    require(metric == "cosine" || metric == "l2",
      s"kmeans metric must be cosine or l2, got '$metric'")
    require(trainFraction > 0.0 && trainFraction <= 1.0,
      s"trainFraction must be in (0, 1], got $trainFraction")
    // Assignment similarity: cosine (IVF default) or negated squared L2 (the
    // PQ codebook metric — Lloyd's mean update IS the L2 centroid).
    def sim(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      if (metric == "l2") -round(vecL2sq(a, b), 4)
      else round(vecCosine(a, b), 4)
    val train =
      if (trainFraction >= 1.0) corpus
      else corpus.filter(
        pmod(hash(col("vec_id")), lit(10000)) <
          lit(math.round(trainFraction * 10000).toInt))
    // Initialize from the TRAINING set: under sampling, an init pass over the
    // full corpus would be an extra full scan per training (x m for PQ).
    val init = train.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("c_vec"))
      .withColumn("centroid_id",
        (row_number().over(Window.orderBy(col("vec_id"))) - 1).cast("int"))
      .select(col("centroid_id"), col("c_vec"))
    // Centroids live on the driver between iterations (k x dim doubles —
    // metadata-scale, the same posture MLlib's Lloyd takes). r16: each
    // iteration's assignment embeds them as a LITERAL array and picks the
    // argmax with native array expressions — the old crossJoin(broadcast) +
    // row_number window paid a broadcast build plus an
    // Exchange(hashpartitioning(vec_id)) + two Sorts over the k-times-
    // exploded training set PER ITERATION (guide §2.4). Ordering contract
    // unchanged: rank on sim DESC with centroid_id ASC tiebreak under
    // Spark's NaN-is-greatest total order (the comparator's >/< reproduce
    // it), rows with all-null sims drop out (slice+explode of an empty
    // array), each recomputed component is round(avg, 4).
    var cents: Seq[(Int, Seq[Double])] = collectCentroids(init)
    for (_ <- 0 until iters) {
      val scored = transform(typedlit(cents), c => struct(
        sim(col("embedding").cast("array<double>"), c.getField("_2")).as("cdist"),
        c.getField("_1").as("cid")))
      val valid = filter(scored, s => s.getField("cdist").isNotNull)
      val ranked = array_sort(valid, (a, b) => {
        val (da, db) = (a.getField("cdist"), b.getField("cdist"))
        when(da > db, -1).when(da < db, 1)
          .when(a.getField("cid") < b.getField("cid"), -1)
          .when(a.getField("cid") > b.getField("cid"), 1)
          .otherwise(0)
      })
      val assigned = train
        .withColumn("_top", explode(slice(ranked, 1, 1)))
        .select(col("_top").getField("cid").as("centroid_id"), col("embedding"))
      val recomputed = assigned
        .select(col("centroid_id"), posexplode(col("embedding")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 4).as("cval"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cval")))).as("pv"))
        .select(col("centroid_id"), expr("transform(pv, p -> p.cval)").as("c_vec"))
      cents = collectCentroids(recomputed)
    }
    localCentroidFrame(train.sparkSession, cents)
  }

  /** Squared L2 distance between two array columns — native HOFs, codegen'd. */
  private def vecL2sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /**
   * Product-quantization ANN (the FAISS `IndexPQ` design, Spark-first): the
   * vector splits into `m` subvectors; each subspace gets its own small
   * codebook (trained by the SAME deterministic seeded Lloyd as the IVF path,
   * on the sliced corpus); the corpus is then ENCODED once — `m` small ints
   * per vector. At 100 TB this is the memory story: a 64-float embedding
   * becomes m bytes in the index, and the scan compares codes, not floats.
   * Queries never decode: each query precomputes an ADC table (its distance
   * to every codeword, m × k doubles — metadata-scale, broadcast with the
   * query row), and a candidate's approximate distance is m table lookups
   * (`element_at`) summed — native expressions end to end, no UDF.
   *
   * Determinism: codebooks inherit kmeansCentroids' contract; encoding takes
   * the FIRST minimal codeword (`array_position` of `array_min` over
   * round(·,4) distances); ranking breaks ties on vec_id. Recall < 1 by
   * design — audit it against the exact arm (q_sim_ann_pq pins a floor).
   */
  /** Trained PQ model: per-subspace codebooks as driver-side literals. */
  private[graft] case class PqModel(books: Seq[Seq[Seq[Double]]], m: Int, sub: Int) {
    private def bookLit(j: Int) = typedlit(books(j))
    private def subvec(c: org.apache.spark.sql.Column, j: Int) =
      slice(c, j * sub + 1, sub)
    /** code_j = index of the nearest codeword in subspace j (L2, first-min). */
    def codeCols(c: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] =
      (0 until m).map { j =>
        val dists = transform(bookLit(j), cw =>
          round(vecL2sq(subvec(c.cast("array<double>"), j), cw), 4))
        ((array_position(dists, array_min(dists)) - 1).cast("int")).as(s"code_$j")
      }
    /** ADC table per subspace: the query's distance to every codeword. */
    def adcCols(qv: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] =
      (0 until m).map { j =>
        transform(bookLit(j), cw =>
          round(vecL2sq(subvec(qv.cast("array<double>"), j), cw), 4)).as(s"adc_$j")
      }
    /** Candidate distance = m table lookups summed. */
    def adist: org.apache.spark.sql.Column =
      round((0 until m).map(j =>
        element_at(col(s"adc_$j"), col(s"code_$j") + 1)).reduce(_ + _), 4)
  }

  /**
   * SINGLE-PASS multi-subspace Lloyd (the 100 TB training shape): all m
   * codebooks train together — ONE job per Lloyd iteration over the sampled
   * corpus exploded to (vec_id, subspace, subvec) rows, instead of m
   * independent trainings each re-scanning the sample (m×iters mini-jobs;
   * the round-6 plan's one identified scale-weakness). All m×k centroids
   * broadcast as one (subspace, centroid_id, c_vec) table; assignment is an
   * equi-join on the subspace key; the recompute is one
   * (subspace, centroid, pos) aggregation. The exploded sample persists
   * across iterations so iteration i+1 re-reads the cache, not the source.
   *
   * Determinism is UNCHANGED from the per-subspace formulation (hash-pinned):
   * init takes the k smallest-vec_id training rows — the same rows seed every
   * subspace, exactly as each independent training's init did (slicing
   * preserves vec_id order); assignment ranks round-4 L2 within
   * (vec_id, subspace) with centroid_id tiebreak; each recomputed component
   * is round(avg, 4); empty clusters drop (inner join).
   */
  private[graft] def trainPq(corpus: DataFrame, m: Int, codebookK: Int,
                      iters: Int, trainFraction: Double = 1.0): PqModel = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // Probe the corpus dimensionality from the first usable row, with a
    // CLEAR validation: a bare head().getInt on an empty corpus (or a
    // NULL/empty first embedding) dies with an obscure NPE/NoSuchElement
    // far from the actual problem.
    val dimRow = corpus.select(size(col("embedding")).as("d"))
      .filter(col("d").isNotNull && col("d") > 0).limit(1).collect()
    require(dimRow.nonEmpty,
      "PQ training needs at least one non-null, non-empty embedding")
    val dim = dimRow(0).getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subvectors")
    val sub = dim / m
    val train =
      if (trainFraction >= 1.0) corpus
      else corpus.filter(
        pmod(hash(col("vec_id")), lit(10000)) <
          lit(math.round(trainFraction * 10000).toInt))
    def slices(c: org.apache.spark.sql.Column) = array(
      (0 until m).map(j => slice(c.cast("array<double>"), j * sub + 1, sub)): _*)
    // (vec_id, j, subvec): m rows per sampled vector, one linear explode.
    val exploded = train.select(col("vec_id"),
      posexplode(slices(col("embedding"))).as(Seq("j", "subvec")))
    exploded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Seed every subspace from the k smallest-vec_id training rows.
      var books: Seq[(Int, Int, Seq[Double])] =
        train.orderBy(col("vec_id")).limit(codebookK)
          .withColumn("centroid_id",
            (row_number().over(Window.orderBy(col("vec_id"))) - 1).cast("int"))
          .select(col("centroid_id"), posexplode(slices(col("embedding"))).as(Seq("j", "c_vec")))
          .select(col("j"), col("centroid_id"), col("c_vec"))
          .as[(Int, Int, Seq[Double])].collect().sortBy(t => (t._1, t._2)).toSeq
      for (_ <- 0 until iters) {
        val cents = books.toDF("j", "centroid_id", "c_vec")
        // Nearest-centroid via max_by over the unique (cdist, -centroid_id)
        // order — a hash AGGREGATE with map-side partials, not the window's
        // sort shuffle; picks exactly the row_number()=1 row of the previous
        // formulation (cdist DESC, centroid_id ASC), bit-identically.
        val assigned = exploded.join(broadcast(cents), "j")
          .withColumn("cdist", -round(vecL2sq(col("subvec"), col("c_vec")), 4))
          .filter(col("cdist").isNotNull)
          .groupBy(col("vec_id"), col("j"), col("subvec"))
          .agg(max_by(col("centroid_id"),
            struct(col("cdist"), (-col("centroid_id")).as("nid"))).as("centroid_id"))
          .select(col("j"), col("centroid_id"), col("subvec"))
        // New codebooks collect to the driver: m × k × sub doubles —
        // metadata-scale, the same per-step materialization MLlib does.
        books = assigned
          .select(col("j"), col("centroid_id"), posexplode(col("subvec")))
          .groupBy(col("j"), col("centroid_id"), col("pos"))
          .agg(round(avg(col("col")), 4).as("cval"))
          .groupBy(col("j"), col("centroid_id"))
          .agg(array_sort(collect_list(struct(col("pos"), col("cval")))).as("pv"))
          .select(col("j"), col("centroid_id"), expr("transform(pv, p -> p.cval)").as("c_vec"))
          .as[(Int, Int, Seq[Double])].collect().sortBy(t => (t._1, t._2)).toSeq
      }
      val byJ = books.groupBy(_._1)
      PqModel((0 until m).map(j =>
        byJ.getOrElse(j, Seq.empty).sortBy(_._2).map(_._3)), m, sub)
    } finally exploded.unpersist(blocking = false)
  }

  /**
   * Scalar-quantization ANN (the FAISS `IndexScalarQuantizer` SQ8 shape,
   * asymmetric variant): the index stores per-vector (scale, int8 codes) —
   * B36's symmetric quantization layout, 4x less memory than float32 — and
   * the float query scores AGAINST THE CODES: dot(q, dequant(codes)) =
   * (scale/127)·dot(q, codes), one scalar multiply after the
   * integer-weighted sum. No training, no codebook, one corpus pass; ranking
   * error is bounded by the per-vector quantization step. Unlike the
   * k-means-trained arms the whole computation is deterministic integer
   * math over IEEE doubles, so the APPROXIMATE scores themselves are
   * SQL-replayable — the only ANN arm whose scores ride the hash gate
   * directly.
   */
  /** SQ8-encode a `(vec_id, embedding)` corpus: per-vector max-abs scale +
    * 127-step integer codes. THE single encoder definition — the inline
    * [[sqTopK]] path and the materialized [[VectorIndex]] build both call
    * it, so the two can never drift off the bit-identical contract. The
    * scale lands in its own column first: referenced inside the transform
    * lambda it is a plain per-row attribute (evaluated once), where an
    * embedded array_max aggregate would re-evaluate per ELEMENT — O(dim^2)
    * per row at corpus scale. */
  def sqEncode(corpus: DataFrame): DataFrame =
    corpus
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("__e"))
      .withColumn("sq_scale", array_max(transform(col("__e"), x => abs(x))))
      .select(col("vec_id"), col("sq_scale"),
        when(col("sq_scale") === 0, transform(col("__e"), _ => lit(0)))
          .otherwise(transform(col("__e"),
            x => floor(lit(127.0) * x / col("sq_scale")).cast("int")))
          .as("codes"))

  def sqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             encoded: Option[DataFrame] = None): DataFrame = {
    // A caller holding a MATERIALIZED SQ8 index (VectorIndex.sq — the
    // deployment posture: encode once, every query reads codes) passes it in;
    // otherwise encode inline in the same pass (identical values — integer
    // quantization over IEEE doubles survives the parquet round trip exactly).
    val enc = encoded.map(_.select(col("vec_id"), col("sq_scale"), col("codes")))
      .getOrElse(sqEncode(corpus))
    val scored = enc.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sqdot", round(
        aggregate(zip_with(transform(col("q_vec"), x => x.cast("double")),
            col("codes"), (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
          * col("sq_scale") / lit(127.0), 4))
    rankTopK(scored, "sqdot", ascending = false, k)
  }

  /**
   * Two-stage retrieval (B203, the production ANN serving pattern: cheap
   * approximate scoring over the whole index → EXACT re-rank of the short
   * candidate list): stage 1 is [[sqTopK]]'s SQ8 asymmetric scan (4× smaller
   * index, approximate scores), keeping `candK` per query; stage 2 joins the
   * ≤ ¦Q¦·candK candidates — broadcast, the corpus never shuffles — back to
   * their TRUE float vectors and re-ranks by exact cosine. Recall is set by
   * candK (errors the quantizer introduces inside the candidate set are
   * repaired; only candidates it dropped entirely stay lost), while the
   * exact-scoring cost is candidate-proportional, not corpus-proportional.
   * Both stages are deterministic and SQL-replayable, so the final ranking
   * rides the hash gate directly — no floor booleans.
   */
  def sqRerankTopK(queries: DataFrame, corpus: DataFrame,
                   k: Int, candK: Int,
                   encoded: Option[DataFrame] = None): DataFrame = {
    val cands = sqTopK(queries, corpus, candK, encoded)
      .select(col("q_id"), col("vec_id"))
    val scored = corpus.join(broadcast(cands), "vec_id")
      .join(broadcast(queries), "q_id")
      .withColumn("cos", round(vecCosine(col("q_vec"), col("embedding")), 4))
    rankTopK(scored, "cos", ascending = false, k)
  }

  /** Materialized PQ index: `(vec_id, embedding, code_0..code_{m-1})` — the
    * FAISS index-BUILD step as a reusable DataFrame. Encoding is the expensive
    * per-row pass (m × k codeword distances); a caller running several PQ arms
    * (flat PQ + IVF-PQ, a recall harness) encodes ONCE, persists, and hands
    * the index to each arm via their `encoded` parameter. */
  def pqEncode(corpus: DataFrame, model: PqModel): DataFrame =
    corpus.select(col("vec_id") +: col("embedding") +:
      model.codeCols(col("embedding")): _*)

  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             m: Int = 8, codebookK: Int = 32, iters: Int = 3,
             trainFraction: Double = 1.0,
             trained: Option[PqModel] = None,
             encoded: Option[DataFrame] = None): DataFrame = {
    // Codebook training on a deterministic hash sample is the 100 TB posture
    // (FAISS trains quantizers on samples); encoding still sees every vector.
    // A caller evaluating several PQ arms passes the model in (train once)
    // and optionally the pre-encoded index (encode once).
    val model = trained.getOrElse(trainPq(corpus, m, codebookK, iters, trainFraction))
    val codeNames = (0 until model.m).map(j => s"code_$j")
    val encodedAll = encoded.getOrElse(pqEncode(corpus, model))
    val enc = encodedAll.select((col("vec_id") +: codeNames.map(col)): _*)
    // ADC tables ride the (tiny) query rows; the encoded corpus is scanned
    // once for all queries, distance = m element_at lookups.
    val withTables = queries.select(col("q_id") +: model.adcCols(col("q_vec")): _*)
    val scored = enc.crossJoin(broadcast(withTables))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adist", model.adist)
    rankTopK(scored, "adist", ascending = true, k)
  }

  /**
   * IVF-PQ (the FAISS `IndexIVFPQ` composition — the production ANN shape):
   * coarse quantizer buckets the corpus by nearest centroid (one shuffle,
   * the IVF step), PQ codes score candidates WITHIN the probed buckets only.
   * At 100 TB both levers stack: the probe touches nprobe/nlist of the
   * corpus, and what it touches is m-byte codes, not full vectors. Built by
   * composing the two existing kernels — the bucketed-join shape of
   * [[ivfTopK]] with [[pqTopK]]'s candidate scoring restricted per bucket.
   */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                k: Int, nprobe: Int, m: Int = 8, codebookK: Int = 32,
                iters: Int = 3, trainFraction: Double = 1.0,
                trained: Option[PqModel] = None,
                encoded: Option[DataFrame] = None): DataFrame = {
    // Codebooks train and the corpus ENCODES once, unbucketed (unbiased, one
    // pass); buckets then carry codes, not vectors — the index a 100 TB
    // deployment would materialize (and a caller evaluating several arms
    // materializes literally, via `encoded` = [[pqEncode]] output).
    val model = trained.getOrElse(trainPq(corpus, m, codebookK, iters, trainFraction))
    val codeNames = (0 until model.m).map(j => s"code_$j")
    val encodedAll = encoded.getOrElse(pqEncode(corpus, model))
    val bucketedCodes =
      nearestCentroid(centroids)("vec_id", "embedding", "bucket", 1)(encodedAll)
        .select((col("bucket") +: col("vec_id") +: codeNames.map(col)): _*)
    val probes = nearestCentroid(centroids)("q_id", "q_vec", "bucket", nprobe)(
      queries.select(col("q_id"), col("q_vec")))
      .select(col("q_id"), col("bucket"))
    val qTables = queries.select(col("q_id") +: model.adcCols(col("q_vec")): _*)
    // Candidates = probed buckets' codes, keyed by owner query; scoring is an
    // EQUI-join on q_id against the broadcast ADC tables — per-query work is
    // its own candidate set, never |Q| × corpus.
    val scored = bucketedCodes.join(broadcast(probes), "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(qTables), "q_id")
      .withColumn("adist", model.adist)
    rankTopK(scored, "adist", ascending = true, k)
  }

  /** Collect the k centroid rows and rebuild a local DataFrame — truncates lineage
    * so each Lloyd step starts from data, not from the previous step's plan. This is
    * metadata-scale driver traffic (k × dim doubles), not a data collect. */
  private def collectCentroids(df: DataFrame): Seq[(Int, Seq[Double])] =
    df.select(col("centroid_id").cast("int"), col("c_vec").cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1).toSeq

  private def localCentroidFrame(
      spark: org.apache.spark.sql.SparkSession,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    cents.toDF("centroid_id", "c_vec")
  }

  /**
   * Sign-LSH bucketed approximate top-k: corpus and queries are both keyed by the
   * sign pattern of their first `bits` components; each query scores only its own
   * bucket (~corpus/2^bits candidates). The cheapest ANN shape — one equi-join on a
   * precomputable key, no centroid training; recall < 1 by design.
   */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int): DataFrame = {
    val bucketedCorpus = corpus
      .withColumn("bucket", VectorOps.signBucket(col("embedding"), bits))
    val bucketedQueries = queries
      .withColumn("bucket", VectorOps.signBucket(col("q_vec"), bits))
    val scored = bucketedCorpus.join(bucketedQueries, "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(vecCosine(col("q_vec"), col("embedding")), 4))
    rankTopK(scored, "cos", ascending = false, k)
  }

  /**
   * Embedding near-dup pairs with sign-LSH blocking: vectors sharing the sign pattern
   * of their first `bits` components (and the same `blockCols`) are compared; pairs
   * with round(cosine,4) >= threshold survive. Exact within a bucket; recall < 1
   * across buckets by construction (documented LSH trade-off).
   */
  def nearDupPairs(corpus: DataFrame, threshold: Double, bits: Int = 3,
                   blockCols: Seq[String] = Nil): DataFrame = {
    // Precompute each vector's norm ONCE (linear) so the quadratic pair stage does a
    // single fused dot product per pair instead of three array passes.
    val withBucket = corpus
      .withColumn("bucket", VectorOps.signBucket(col("embedding"), bits))
      .withColumn("nrm", sqrt(vecDot(col("embedding"), col("embedding"))))
    val keys = ("bucket" +: blockCols)
    val joined = withBucket.as("a").join(withBucket.as("b"),
      keys.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _) &&
        col("a.vec_id") < col("b.vec_id"))
    joined
      // Zero-norm vectors can never be cosine near-dups — and without this
      // guard 0/0 = NaN would PASS the >= filter (Spark orders NaN above all
      // numerics), reporting spurious pairs. Matches the native
      // CosineSimilarity contract (zero norm scores 0.0).
      .filter(col("a.nrm") > 0 && col("b.nrm") > 0)
      .withColumn("cos", round(
        vecDot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")), 4))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("cos"))
  }
}
