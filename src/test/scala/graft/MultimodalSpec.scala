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

  test("malformed containers fail with reasons, never EOF/NPE (adversarial-parse pins)") {
    // Truncated mid-prefix: n=2, one complete 4-byte frame, 3 trailing bytes —
    // the count gate passes but frame 1's length prefix is short. The parser's
    // contract is IllegalArgumentException with a reason, never EOFException.
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeInt(2); dos.writeInt(4); dos.write(Array[Byte](1, 2, 3, 4))
    dos.write(Array[Byte](9, 9, 9)) // 3 bytes: not a full prefix
    val truncated = bos.toByteArray
    val ex = intercept[IllegalArgumentException] { Multimodal.videoFrames(truncated) }
    assert(ex.getMessage.contains("truncated container"))
    // A structurally-valid container whose frame bytes are not a decodable
    // image: the error row must carry a REASON, not "NullPointerException".
    val bos2 = new java.io.ByteArrayOutputStream()
    val dos2 = new java.io.DataOutputStream(bos2)
    dos2.writeInt(1); dos2.writeInt(8); dos2.write(new Array[Byte](8))
    val badFrame = MediaRow(91003L, "video", bos2.toByteArray, 16, 16, 0)
    val res = Multimodal.decodeResults(Seq(badFrame).toDS()).collect()
    assert(res.length === 1 && !res.head.ok)
    assert(res.head.error.contains("undecodable frame 0"),
      s"error row must carry the frame-decode reason, got: ${res.head.error}")
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

  test("planted corrupt blobs become counted error rows, good rows unchanged") {
    val goodDocs = Tables.documents(spark, sfTiny).limit(30)
    val good = Multimodal.deriveMediaTable(goodDocs).as[MediaRow]
    // Planted corruption, one per codec family:
    //  - truncated BMP (header cut mid-way) -> ImageIO.read returns null
    //  - garbage WAV header -> AudioSystem throws UnsupportedAudioFileException
    //  - hostile frame length prefix (Int.MaxValue) -> allocation bomb if trusted
    val truncatedBmp = Multimodal.encodeBmp(Multimodal.digestVals("x"), 16, 16).take(20)
    val garbageWav = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val bomb = {
      val out = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(out)
      dos.writeInt(1); dos.writeInt(Int.MaxValue)
      dos.write(Array.fill[Byte](32)(0))
      out.toByteArray
    }
    val corrupt = Seq(
      MediaRow(90001L, "image", truncatedBmp, 16, 16, 0),
      MediaRow(90002L, "audio", garbageWav, 0, 0, 16000),
      MediaRow(90003L, "video", bomb, 16, 16, 0)).toDS()
    val mixed = good.union(corrupt)

    val results = Multimodal.decodeResults(mixed).cache()
    val bad = results.filter(!_.ok).collect().sortBy(_.media_id)
    assert(bad.map(_.media_id).toSeq === Seq(90001L, 90002L, 90003L))
    assert(bad.forall(r => r.error != null && r.error.nonEmpty))
    // The hostile length prefix must be rejected by validation, not attempted.
    assert(bad.last.error.contains("frame"), s"got: ${bad.last.error}")

    // Good rows decode to exactly what the clean-corpus decode produces.
    val cleanFeats = Multimodal.decodeFeatures(good)
      .orderBy("media_id").select("media_id", "mean_val").as[(Long, Double)].collect()
    val mixedFeats = Multimodal.decodeFeatures(mixed)
      .orderBy("media_id").select("media_id", "mean_val").as[(Long, Double)].collect()
    assert(mixedFeats.toSeq === cleanFeats.toSeq)
  }

  test("frameSample and frameFeatures skip corrupt containers instead of throwing") {
    val corrupt = Seq(
      MediaRow(91001L, "video", Array[Byte](0, 0), 16, 16, 0), // too short
      MediaRow(91002L, "video", Multimodal.encodeVideo("ok", 16, 16), 16, 16, 0))
      .toDS()
    val frames = Multimodal.frameSample(corrupt, everyK = 1)
    assert(frames.select("media_id").distinct().as[Long].collect().toSeq === Seq(91002L))
    val feats = Multimodal.frameFeatures(corrupt, everyK = 1)
    assert(feats.count() === Multimodal.VideoFrames.toLong)
    // Per-frame means recover the planted per-frame digests exactly.
    val means = feats.orderBy("frame_idx").select("mean_px").as[Double].collect()
    val expected = (0 until Multimodal.VideoFrames)
      .map(f => Multimodal.digestVals("ok:" + f).sum.toDouble / 16)
    assert(means.toSeq === expected)
  }

  test("audioWindowEnergy skips corrupt clips; non-positive everyK fails fast") {
    val rows = Seq(
      MediaRow(92001L, "audio", Array[Byte](1, 2, 3), 0, 0, 16000), // garbage
      MediaRow(92002L, "audio",
        Multimodal.encodeWav(Multimodal.digestVals("ok"), 16000,
          Multimodal.AudioSamples), 0, 0, 16000))
      .toDS()
    val e = Multimodal.audioWindowEnergy(rows, 16)
    assert(e.select("media_id").as[Long].collect().toSeq === Seq(92002L),
      "one bad blob must cost one row, never the job")
    val bad = intercept[IllegalArgumentException] {
      Multimodal.frameSample(rows, everyK = 0)
    }
    assert(bad.getMessage.contains("everyK"))
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

  test("resizeImage round-trips down- and up-scales; corrupt inputs skipped") {
    val src = Multimodal.encodeBmp(Multimodal.digestVals("resize-me"), 16, 16)
    val (dw, dh, n, _, _) = Multimodal.decodeImage(Multimodal.resizeImage(src, 4, 6))
    assert((dw, dh, n) === ((4, 6, 24L)))
    // Upscale: nearest-neighbor replicates pixels; mean of a 2x source block
    // structure is preserved exactly when dims divide.
    val (uw, uh, un, _, _) = Multimodal.decodeImage(Multimodal.resizeImage(src, 32, 32))
    assert((uw, uh, un) === ((32, 32, 1024L)))
    // Exact pixel check: output (x,y) must equal source (x*16/32, y*16/32).
    val up = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.resizeImage(src, 32, 32)))
    val s0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(src))
    assert(up.getRGB(31, 31) === s0.getRGB(15, 15))
    assert(up.getRGB(2, 3) === s0.getRGB(1, 1))
    // Corrupt input: resizeFeatures drops the row, never throws.
    val bad = Seq(MediaRow(99L, "image", Array[Byte](1, 2, 3), 16, 16, 0)).toDS()
    assert(Multimodal.resizeFeatures(bad, 4, 4).count() === 0L)
  }
}
