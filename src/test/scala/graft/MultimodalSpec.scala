package graft

import graft.multimodal.{MediaRow, Multimodal}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: schema, stub decode determinism, frame sampling. */
class MultimodalSpec extends GraftSuite {
  import spark.implicits._

  private lazy val media = Multimodal.deriveMediaTable(Tables.documents(spark, sfTiny))

  test("media table has binary content and typed metadata") {
    val sch = media.schema
    assert(sch("content").dataType.typeName === "binary")
    assert(sch("width").dataType.typeName === "integer")
    val kinds = media.select("kind").distinct().as[String].collect().toSet
    assert(kinds === Set("image", "audio", "video"))
    assert(media.filter(col("kind") === "audio")
      .filter(col("sample_rate") =!= 16000).count() === 0)
  }

  test("decode is deterministic and fixed-dim") {
    val feats = Multimodal.decodeFeatures(media.as[MediaRow]).cache()
    assert(feats.filter(size(col("feature")) =!= Multimodal.FeatureDim).count() === 0)
    assert(feats.filter(col("n_bytes") =!= 16L).count() === 0) // md5 digests
    val twice = Multimodal.decodeFeatures(media.as[MediaRow])
    val a = feats.orderBy("media_id").select("mean_byte").as[Double].collect()
    val b = twice.orderBy("media_id").select("mean_byte").as[Double].collect()
    assert(a.toSeq === b.toSeq)
  }

  test("decodeStub computes unsigned byte statistics") {
    val (mean, feats) = Multimodal.decodeStub(Array[Byte](0, -1, 0, -1)) // -1 = 0xff
    assert(mean === 127.5)
    assert(feats.toSeq === Seq(0.0, 255.0, 0.0, 255.0))
  }

  test("frameSample keeps every k-th chunk of video blobs only") {
    val frames = Multimodal.frameSample(media.as[MediaRow], everyK = 2, frameBytes = 4)
    // 16-byte blobs, 4-byte frames -> chunks 0..3, kept 0 and 2
    assert(frames.select("frame_idx").distinct().as[Int].collect().toSet === Set(0, 2))
    val nVideos = media.filter(col("kind") === "video").count()
    assert(frames.count() === nVideos * 2)
  }
}
