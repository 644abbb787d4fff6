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
 *  - `SIGNATURE`: written LAST — index params + a fingerprint (length, mtime) of
 *    the source `embeddings.parquet`. Readers accept the on-disk index only when
 *    the signature matches, so a regenerated dataset or changed params rebuilds
 *    instead of serving a stale index.
 *
 * Reuse levels: an in-JVM memo (one build per session run) and the on-disk
 * signature (a later JVM over the same dataset re-reads, zero training). All
 * trained/encoded artifacts are deterministic functions of the data
 * ([[Similarity.trainPq]]'s seeded-Lloyd contract), so reuse cannot change any
 * query's result hash. Single-writer assumption: concurrent builders of the SAME
 * dataset may redo work (last signature wins) but never publish a torn index,
 * because the signature gates every read and is written after the data.
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

  /** L2-normalize an embedding column (shared by the PQ queries: PQ ranks by L2,
    * normalization makes that approximate the exact arm's cosine ranking). */
  def normalize(c: Column): Column = {
    val n = sqrt(aggregate(transform(c, x => x.cast("double") * x),
      lit(0.0), (acc, v) => acc + v))
    transform(c, x => x.cast("double") / n)
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

  private def fingerprint(sfDir: String): String = {
    val f = new java.io.File(s"$sfDir/embeddings.parquet")
    val (len, mtime) =
      if (f.isDirectory) {
        val parts = Option(f.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
        (parts.map(_.length).sum, parts.map(_.lastModified).foldLeft(0L)(math.max))
      } else (f.length, f.lastModified)
    s"v1 m=$M k=$CodebookK iters=$Iters frac=$TrainFraction len=$len mtime=$mtime"
  }

  private def loadOrBuild(spark: SparkSession, sfDir: String): Handle = {
    val root = new java.io.File(Tables.scratchDir(spark, "vecindex", sfDir))
    val pqPath = new java.io.File(root, "pq_index").getAbsolutePath
    val sqPath = new java.io.File(root, "sq_index").getAbsolutePath
    val modelFile = new java.io.File(root, "pq_model.txt")
    val sigFile = new java.io.File(root, "SIGNATURE")
    val sig = fingerprint(sfDir)
    if (sigFile.isFile && read(sigFile) == sig && modelFile.isFile)
      Handle(readModel(modelFile), pqPath, sqPath)
    else {
      root.mkdirs()
      sigFile.delete() // invalidate first: a failed build must not look published
      val emb = Tables.embeddings(spark, sfDir)
      val normCorpus = emb.select(col("vec_id"),
        normalize(col("embedding")).as("embedding"))
      val model = Similarity.trainPq(normCorpus, M, CodebookK, Iters, TrainFraction)
      Similarity.pqEncode(normCorpus, model)
        .write.mode("overwrite").parquet(pqPath)
      val e = transform(col("embedding"), x => x.cast("double"))
      val scale = array_max(transform(e, x => abs(x)))
      emb.select(col("vec_id"), scale.as("sq_scale"),
          when(scale === 0, transform(e, _ => lit(0)))
            .otherwise(transform(e, x => floor(lit(127.0) * x / scale).cast("int")))
            .as("codes"))
        .write.mode("overwrite").parquet(sqPath)
      write(modelFile, renderModel(model))
      write(sigFile, sig) // publish
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
