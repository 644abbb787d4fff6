package graft

import graft.multimodal.{MediaRow, Multimodal}
import org.apache.spark.sql.functions._

/**
 * Multimodal columns with REAL codecs: BMP encode/decode via javax.imageio, WAV via
 * javax.sound.sampled, frame-container parse for video. The decode must recover the
 * header dims and the exact md5-cycle pixel/sample values the encoder planted.
 */
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

  test("BMP roundtrip: ImageIO decode recovers header dims and exact planted pixels") {
    val digest = Multimodal.digestVals("hello")
    val bytes = Multimodal.encodeBmp(digest, 24, 16)
    assert(bytes.length > 54, "a real BMP container has headers")
    assert(bytes(0) === 'B'.toByte && bytes(1) === 'M'.toByte, "BMP magic")
    val (w, h, units, mean, lanes) = Multimodal.decodeImage(bytes)
    assert((w, h, units) === (24, 16, 384L))
    // 384 pixels cycle the 16 digest values exactly 24 times.
    assert(mean === digest.sum.toDouble / 16)
    val expLane0 = (digest(0) + digest(4) + digest(8) + digest(12)).toDouble / 4
    assert(lanes(0) === expLane0)
  }

  test("WAV roundtrip: javax.sound decode recovers sample rate and planted samples") {
    val digest = Multimodal.digestVals("world")
    val bytes = Multimodal.encodeWav(digest, 16000, Multimodal.AudioSamples)
    assert(new String(bytes.slice(0, 4)) === "RIFF")
    val (sr, one, units, mean, _) = Multimodal.decodeAudio(bytes)
    assert((sr, one, units) === (16000, 1, Multimodal.AudioSamples.toLong))
    assert(mean === digest.sum.toDouble / 16)
  }

  test("video container decodes per-frame BMPs with pooled stats") {
    val bytes = Multimodal.encodeVideo("clip", 16, 16)
    val (w, h, units, mean, _) = Multimodal.decodeVideo(bytes)
    assert((w, h) === (16, 16))
    assert(units === Multimodal.VideoFrames.toLong * 256)
    val expected = (0 until Multimodal.VideoFrames)
      .flatMap(f => Multimodal.digestVals("clip:" + f)).sum.toDouble / (16 * Multimodal.VideoFrames)
    assert(math.abs(mean - expected) < 1e-12)
  }

  test("distributed decode is deterministic, fixed-dim, and header dims match metadata") {
    val feats = Multimodal.decodeFeatures(media.as[MediaRow]).cache()
    assert(feats.filter(size(col("feature")) =!= Multimodal.FeatureDim).count() === 0)
    // Decoded header dims must equal the typed metadata for images and video.
    val joined = feats.join(media.select(col("media_id"), col("width"), col("height")), "media_id")
    assert(joined.filter(col("kind") =!= "audio")
      .filter(col("dec_w") =!= col("width") || col("dec_h") =!= col("height"))
      .count() === 0)
    assert(joined.filter(col("kind") === "audio").filter(col("dec_w") =!= 16000).count() === 0)
    val twice = Multimodal.decodeFeatures(media.as[MediaRow])
    val a = feats.orderBy("media_id").select("mean_val").as[Double].collect()
    val b = twice.orderBy("media_id").select("mean_val").as[Double].collect()
    assert(a.toSeq === b.toSeq)
  }

  test("frameSample keeps every k-th decodable frame of video blobs only") {
    val frames = Multimodal.frameSample(media.as[MediaRow], everyK = 2)
    // 3-frame containers, kept frames 0 and 2.
    assert(frames.select("frame_idx").distinct().as[Int].collect().toSet === Set(0, 2))
    val nVideos = media.filter(col("kind") === "video").count()
    assert(frames.count() === nVideos * 2)
    // each sampled frame is itself a decodable BMP
    val first = frames.select("frame").as[Array[Byte]].head()
    val (w, h, _, _, _) = Multimodal.decodeImage(first)
    assert(w >= 16 && h >= 16)
  }
}
