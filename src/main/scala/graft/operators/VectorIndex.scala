package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted ANN index for the bench vector-query family (the deployment posture
 * Similarity's B203 doc describes: at 100 TB an ANN index is trained and encoded
 * ONCE, materialized as a table, and every retrieval query READS it — it is never
 * re-trained per query).
 *
 * What is materialized, once per (dataset dir, index params):
 *  - `pq_index/` parquet: `(vec_id, embedding, code_0..code_{m-1})` — the
 *    L2-NORMALIZED corpus plus its PQ codes ([[Similarity.pqEncode]] output).
 *    Flat-PQ scans read the code columns; IVF-PQ additionally buckets on the
 *    normalized embedding.
 *  - `pq_model.txt`: the m per-subspace codebooks (m × k × sub doubles —
 *    metadata-scale; `Double.toString` round-trips exactly, so a reloaded model
 *    scores bit-identically to the freshly trained one).
 *  - `sq_index/` parquet: `(vec_id, sq_scale, codes)` — the SQ8 per-vector
 *    (scale, int8 codes) layout over the RAW (un-normalized) corpus, shared by
 *    the SQ arm and the two-stage rerank's stage 1.
 *  - `SIGNATURE`: written LAST — index params + the full per-part fingerprint
 *    (name, length, mtime of every part of the source `embeddings.parquet`)
 *    plus the VERSIONED directory the artifacts live in. Readers accept the
 *    on-disk index only when the signature matches, so a regenerated dataset
 *    or changed params rebuilds instead of serving a stale index.
 *
 * Atomic publication: every build (full or incremental) writes into a FRESH
 * `idx-<digest>` directory and flips `SIGNATURE` last — a reader that
 * validated an old signature keeps lazily reading the old directory, which no
 * rebuild ever overwrites (torn-read-free without locks; stale dirs are
 * /tmp-scale garbage).
 *
 * Incremental maintenance (the FAISS `add()` posture): when the source
 * GROWS append-only — every previously-indexed part still present
 * byte-identical, new parts added — the trained codebooks are REUSED: only
 * the new vectors are encoded, and the new index directory is the old rows
 * unioned with the new codes. Zero training jobs; at 100 TB this is the
 * difference between a nightly add() and a weekly full retrain. Hash-safe by
 * construction: SQ8 codes are per-vector deterministic (identical whether
 * encoded incrementally or from scratch), and PQ codes only feed recall-gated
 * booleans, never hash-compared values. Any non-append change (part rewritten,
 * shrunk, renamed) falls back to the full deterministic rebuild.
 *
 * Reuse levels: an in-JVM memo (one build per session run) and the on-disk
 * signature (a later JVM over the same dataset re-reads, zero training). All
 * trained/encoded artifacts are deterministic functions of the data
 * ([[Similarity.trainPq]]'s seeded-Lloyd contract), so reuse cannot change any
 * query's result hash. Single-writer assumption: concurrent builders of the SAME
 * dataset may redo work (last signature wins) but never publish a torn index.
 */
object VectorIndex {
  /** Index parameters pinned by the bench family (q_sim_ann_pq, q_sim_recall_arms). */
  val M = 8
  val CodebookK = 32
  val Iters = 3
  val TrainFraction = 0.3

  final case class Handle(model: Similarity.PqModel, pqPath: String, sqPath: String)

  private val built =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Handle]()

  /** Drop the in-JVM memo (spec hook; production reuse is signature-gated). */
  private[graft] def resetMemo(): Unit = built.clear()

  /** L2-normalize `df`'s `vec` array column into `out` (shared by the PQ
    * queries: PQ ranks by L2, normalization makes that approximate the exact
    * arm's cosine ranking). DataFrame-level so the norm lands in its own
    * column first — inside the division lambda it is then a per-row
    * attribute, evaluated ONCE; a Column-shaped helper would embed the
    * sum-of-squares aggregate in the lambda body and re-evaluate it per
    * ELEMENT (O(dim^2) per row — ruinous at real embedding widths). When
    * `out` differs from `vec`, the source column is dropped. */
  def normalized(df: DataFrame, vec: String, out: String): DataFrame = {
    val n = sqrt(aggregate(transform(col(vec), x => x.cast("double") * x),
      lit(0.0), (acc, v) => acc + v))
    // Zero-norm guard: 0/0 = NaN per element, and one NaN vector poisons PQ
    // training for the dataset's lifetime (NaN is NOT null, sorts ABOVE all
    // numbers, so it wins a cluster assignment and spreads through the
    // centroid averages into the persisted codebooks). A zero vector has no
    // direction — it stays a zero vector, exactly the 0.0 the cosine
    // expression answers for it.
    val r = df.withColumn("__l2n", n)
      .withColumn(out, transform(col(vec), x =>
        when(col("__l2n") === 0.0, lit(0.0))
          .otherwise(x.cast("double") / col("__l2n"))))
      .drop("__l2n")
    if (out == vec) r else r.drop(vec)
  }

  /** The trained PQ model + the materialized code index for a dataset. */
  def pq(spark: SparkSession, sfDir: String): (Similarity.PqModel, DataFrame) = {
    val h = handle(spark, sfDir)
    (h.model, spark.read.parquet(h.pqPath))
  }

  /** The materialized SQ8 index `(vec_id, sq_scale, codes)` for a dataset. */
  def sq(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(handle(spark, sfDir).sqPath)

  private def handle(spark: SparkSession, sfDir: String): Handle =
    built.computeIfAbsent((spark, sfDir), _ => loadOrBuild(spark, sfDir))

  /** Per-part listing of the source table: (name, length, mtime), sorted. */
  private def parts(sfDir: String): Seq[(String, Long, Long)] = {
    val f = new java.io.File(s"$sfDir/embeddings.parquet")
    val files =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty)
          // Spark's own hidden-file convention: '.' AND '_' prefixes are
          // metadata (_SUCCESS, _committed...). Fingerprinting _SUCCESS
          // would void the incremental add() path on every real Spark
          // append (the marker's mtime changes), and a new '_' name would
          // reach spark.read.parquet as a 0-byte non-parquet "part".
          .filter(p => p.isFile && !p.getName.startsWith(".") &&
            !p.getName.startsWith("_"))
          .sortBy(_.getName).toSeq
      else Seq(f)
    files.map(p => (p.getName, p.length, p.lastModified))
  }

  private def sigOf(ps: Seq[(String, Long, Long)]): String =
    s"v2 m=$M k=$CodebookK iters=$Iters frac=$TrainFraction parts=" +
      ps.map { case (n, l, t) => s"$n:$l:$t" }.mkString(";")

  /** Short stable digest naming the versioned index directory for a signature. */
  private def digest(sig: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
      .digest(sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(8).map(b => f"$b%02x").mkString
  }

  private def sqEncode(emb: DataFrame): DataFrame =
    Similarity.sqEncode(emb.select(col("vec_id"), col("embedding")))

  private def loadOrBuild(spark: SparkSession, sfDir: String): Handle = {
    val root = new java.io.File(Tables.scratchDir(spark, "vecindex", sfDir))
    val sigFile = new java.io.File(root, "SIGNATURE")
    val curParts = parts(sfDir)
    val sig = sigOf(curParts)
    // SIGNATURE format: first line the signature, second the idx dir name.
    val published: Option[(String, String)] =
      if (!sigFile.isFile) None
      else read(sigFile).split("\n", 2) match {
        case Array(s, dirName) => Some((s, dirName.trim))
        case _ => None
      }
    def handleFor(dirName: String): Option[Handle] = {
      val dir = new java.io.File(root, dirName)
      val modelFile = new java.io.File(dir, "pq_model.txt")
      if (!modelFile.isFile) None
      else Some(Handle(readModel(modelFile),
        new java.io.File(dir, "pq_index").getAbsolutePath,
        new java.io.File(dir, "sq_index").getAbsolutePath))
    }
    // Bind the published-and-valid handle ONCE (no double disk read), and
    // fall through to the build path when the published dir is missing/torn.
    val publishedValid: Option[Handle] =
      published.filter(_._1 == sig).flatMap(p => handleFor(p._2))
    publishedValid match {
      case Some(h) => h
      case None =>
        val prev = published
        val newDir = new java.io.File(root, s"idx-${digest(sig)}")
        // CONTENT-ADDRESSED reuse: the directory name is a digest of the
        // signed parts-state, and every artifact is a deterministic function
        // of that state — if a VALID index for this digest already exists
        // (a reverted fingerprint: append published idx-B, then the appended
        // parts were deleted and the state is A again), re-publishing the
        // signature at it is both correct and free. Building INTO it with
        // overwrite would violate the no-rebuild-ever-overwrites torn-read
        // guarantee for a reader still scanning it.
        handleFor(newDir.getName) match {
          case Some(h) =>
            write(sigFile, s"$sig\n${newDir.getName}")
            return h
          case None =>
        }
        newDir.mkdirs()
        val pqPath = new java.io.File(newDir, "pq_index").getAbsolutePath
        val sqPath = new java.io.File(newDir, "sq_index").getAbsolutePath
        val modelFile = new java.io.File(newDir, "pq_model.txt")
        // Append-only growth? Every previously-signed part must still be
        // present byte-identical (name, length, mtime) with at least one new
        // part — then the old codebooks are reused and only new vectors
        // encode (the FAISS add() posture). Anything else → full rebuild.
        // The OLD signature parse is Try-guarded: a torn/older-format
        // SIGNATURE (crash mid-write truncates) must degrade to a full
        // rebuild, never throw out of the memoizer and wedge the dataset.
        val incremental: Option[(Handle, Seq[String])] = prev.flatMap {
          case (oldSig, oldDirName) =>
            val oldParts = scala.util.Try(
              "parts=(.*)".r.findFirstMatchIn(oldSig)
                .map(_.group(1).split(";").filter(_.nonEmpty).toSeq.map { e =>
                  val Array(n, l, t) = e.split(":"); (n, l.toLong, t.toLong)
                }).getOrElse(Seq.empty)).getOrElse(Seq.empty)
            val cur = curParts.toSet
            val newNames = curParts.map(_._1).toSet -- oldParts.map(_._1).toSet
            val sameParams =
              oldSig.take(math.max(0, oldSig.indexOf("parts="))) ==
                sig.take(sig.indexOf("parts="))
            if (sameParams && oldParts.nonEmpty && newNames.nonEmpty &&
                oldParts.forall(cur.contains))
              handleFor(oldDirName).map(h => (h,
                newNames.toSeq.sorted.map(n => s"$sfDir/embeddings.parquet/$n")))
            else None
        }
        val model = incremental match {
          case Some((oldH, newPaths)) =>
            val fresh = spark.read.parquet(newPaths: _*)
              .select(col("vec_id"), col("embedding"))
            val freshNorm = normalized(fresh, "embedding", "embedding")
            spark.read.parquet(oldH.pqPath)
              .unionByName(Similarity.pqEncode(freshNorm, oldH.model))
              .write.mode("overwrite").parquet(pqPath)
            spark.read.parquet(oldH.sqPath)
              .unionByName(sqEncode(fresh))
              .write.mode("overwrite").parquet(sqPath)
            oldH.model
          case None =>
            val emb = Tables.embeddings(spark, sfDir)
            val normCorpus = normalized(
              emb.select(col("vec_id"), col("embedding")), "embedding", "embedding")
            val m = Similarity.trainPq(normCorpus, M, CodebookK, Iters, TrainFraction)
            Similarity.pqEncode(normCorpus, m)
              .write.mode("overwrite").parquet(pqPath)
            sqEncode(emb).write.mode("overwrite").parquet(sqPath)
            m
        }
        write(modelFile, renderModel(model))
        write(sigFile, s"$sig\n${newDir.getName}") // publish LAST
        Handle(model, pqPath, sqPath)
    }
  }

  /** One line per (subspace, codeword): `j|cid|d0,d1,...` — Double.toString
    * round-trips exactly, so the reloaded codebooks are bit-identical. */
  private def renderModel(m: Similarity.PqModel): String = {
    val header = s"${m.m} ${m.sub}"
    val lines = for {
      (book, j) <- m.books.zipWithIndex
      (cw, cid) <- book.zipWithIndex
    } yield s"$j|$cid|${cw.mkString(",")}"
    (header +: lines).mkString("\n")
  }

  private def readModel(f: java.io.File): Similarity.PqModel = {
    val lines = read(f).split("\n").toSeq
    val Array(m, sub) = lines.head.trim.split(" ").map(_.toInt)
    val rows = lines.tail.filter(_.nonEmpty).map { l =>
      val Array(j, cid, vals) = l.split("\\|", 3)
      (j.toInt, cid.toInt, vals.split(",").toSeq.map(_.toDouble))
    }
    val byJ = rows.groupBy(_._1)
    Similarity.PqModel(
      (0 until m).map(j => byJ.getOrElse(j, Seq.empty).sortBy(_._2).map(_._3)), m, sub)
  }

  private def read(f: java.io.File): String =
    new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)

  private def write(f: java.io.File, s: String): Unit =
    java.nio.file.Files.write(f.toPath,
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
