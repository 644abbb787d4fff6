package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media blob + typed metadata (the 100 TB multimodal column shape). */
case class MediaRow(media_id: Long, kind: String, content: Array[Byte],
                    width: Int, height: Int, sample_rate: Int)

/** Decoded per-item features (fixed-dim, schema-stable). */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                         mean_byte: Double, feature: Array[Double])

/**
 * Multimodal-column plumbing (north-star extension): image/audio/video travel as
 * opaque `binary` columns with typed metadata; decode / feature-extraction runs
 * batch-wise per partition so a real codec would amortize model/codec init across a
 * partition (the Scala analogue of arrow-batched mapInPandas).
 *
 * The DECODE STEP IS A STUB: real image/audio codecs are not available in this
 * environment, so `decodePartition` computes a deterministic byte-statistics feature
 * in place of a real embedding. Everything around it — binary column handling, typed
 * metadata, partition-batched execution, fixed-dim output schema, downstream
 * aggregation — is the real, tested plumbing; swapping in a codec changes only the
 * marked function body.
 */
object Multimodal {
  val FeatureDim = 4

  /**
   * Derive a deterministic media table from `documents`: content = md5 digest bytes
   * of the text (16-byte stand-in blob), kind cycles image/audio/video, metadata
   * varies with the id. Real pipelines read these columns from parquet/blob stores.
   */
  def deriveMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      unhex(md5(col("text"))).as("content"),
      (lit(64) + (col("doc_id") % 4) * 32).cast("int").as("width"),
      (lit(64) + (col("doc_id") % 2) * 64).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, 16000).otherwise(0).cast("int").as("sample_rate"))

  /**
   * STUB decode: byte statistics standing in for codec + model inference.
   * Deterministic: mean unsigned byte value, and per-lane means (lane = index mod
   * FeatureDim). Replace this body with the real decoder at integration time.
   */
  def decodeStub(content: Array[Byte]): (Double, Array[Double]) = {
    val n = content.length
    val laneSums = new Array[Double](FeatureDim)
    val laneCounts = new Array[Long](FeatureDim)
    var total = 0.0
    var i = 0
    while (i < n) {
      val v = (content(i) & 0xff).toDouble
      total += v
      laneSums(i % FeatureDim) += v
      laneCounts(i % FeatureDim) += 1
      i += 1
    }
    val feats = Array.tabulate(FeatureDim) { j =>
      if (laneCounts(j) == 0) 0.0 else laneSums(j) / laneCounts(j)
    }
    (if (n == 0) 0.0 else total / n, feats)
  }

  /**
   * Partition-batched decode: one iterator pass per partition (codec init would sit
   * before the `map`), fixed-dim output. Typed Dataset API so the schema is
   * compile-checked.
   */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // [real pipeline: initialize codec / model ONCE here]
      rows.map { r =>
        val (mean, feats) = decodeStub(r.content)
        MediaFeatures(r.media_id, r.kind, r.content.length.toLong, mean, feats)
      }
    }
  }

  /**
   * Video frame-sampling plumbing: keep every `everyK`-th chunk of the blob
   * (placeholder for keyframe extraction); returns (media_id, frame_idx, frame).
   */
  def frameSample(media: Dataset[MediaRow], everyK: Int, frameBytes: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video").as[MediaRow]
      .flatMap { r =>
        r.content.grouped(frameBytes).zipWithIndex.collect {
          case (chunk, idx) if idx % everyK == 0 => (r.media_id, idx, chunk)
        }
      }.toDF("media_id", "frame_idx", "frame")
  }

  /** End-to-end: derive -> decode -> per-kind feature aggregate (oracle-friendly). */
  def featurePipeline(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media = deriveMediaTable(docs).as[MediaRow]
    decodeFeatures(media)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("mean_byte")), 4).as("avg_mean_byte"),
        round(avg(element_at(col("feature"), 1)), 4).as("avg_lane0"))
      .orderBy(col("kind"))
  }
}
