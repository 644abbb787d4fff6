package graft.multimodal

import java.awt.image.{BufferedImage, DataBufferByte}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media blob + typed metadata (the 100 TB multimodal column shape). */
case class MediaRow(media_id: Long, kind: String, content: Array[Byte],
                    width: Int, height: Int, sample_rate: Int)

/**
 * Decoded per-item features (fixed-dim, schema-stable). `dec_w`/`dec_h` are the
 * dimensions read from the decoded container header (image/video: pixel dims;
 * audio: (sample_rate, 1)); `n_units` is the decoded payload size (pixels or
 * samples); `mean_val` and `feature` are statistics over decoded pixel/sample
 * values (lane j = units at linear index ≡ j mod FeatureDim, the index running
 * per decoded raster — per FRAME for video, so frame boundaries re-align the
 * lanes; a single image or audio clip has one raster and the two readings
 * coincide).
 */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long, n_units: Long,
                         dec_w: Int, dec_h: Int, mean_val: Double,
                         feature: Array[Double])

/**
 * Per-row decode outcome: `ok = false` rows carry the failure reason in `error` and
 * zeroed feature fields. At 100 TB corrupt blobs are a statistical certainty; the
 * error channel turns "one bad blob kills the job after task retries" into "one bad
 * blob becomes one counted error row" — the reference's own error-row-skip semantics
 * (dagster_project/pipeline.py:76-77) applied to media decode.
 */
case class MediaDecodeResult(media_id: Long, kind: String, n_bytes: Long, ok: Boolean,
                             error: String, n_units: Long, dec_w: Int, dec_h: Int,
                             mean_val: Double, feature: Array[Double])

/**
 * Multimodal columns (north-star extension): image/audio/video travel as opaque
 * `binary` columns with typed metadata; decode / feature-extraction runs batch-wise
 * per partition so codec init amortizes across a partition (the Scala analogue of
 * arrow-batched mapInPandas).
 *
 * The decode is REAL: images are genuine BMP containers encoded and decoded with
 * `javax.imageio` (header parse + pixel raster), audio is genuine 8-bit PCM WAV
 * encoded and decoded with `javax.sound.sampled` (header parse + sample stream),
 * video is a length-prefixed container of BMP frames decoded frame-by-frame. Pixel
 * and sample VALUES are deterministic md5-cycles of the source text, which is what
 * makes the decoded statistics independently computable by the DuckDB oracle — the
 * oracle predicts what a correct decoder must recover, so a header-parse or raster
 * bug breaks the hash match.
 */
object Multimodal {
  val FeatureDim = 4
  /** Samples per generated WAV clip (multiple of 16 so means reduce exactly). */
  val AudioSamples = 256
  /** Frames per generated video container. */
  val VideoFrames = 3

  // ImageIO's default stream cache is a temp FILE per encode/decode call — a
  // per-row disk write in the hot path. Memory-cache instead.
  ImageIO.setUseCache(false)

  /** md5 digest as unsigned ints — the deterministic pixel/sample source. */
  def digestVals(s: String): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map(_ & 0xff)
  }

  /** Encode a gray BMP: pixel at linear index i (row-major) = digest(i mod 16). */
  def encodeBmp(digest: Array[Int], w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val data = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    var i = 0
    while (i < w * h) {
      val v = digest(i % 16).toByte
      data(i * 3) = v; data(i * 3 + 1) = v; data(i * 3 + 2) = v
      i += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  /** Encode an 8-bit unsigned PCM mono WAV: sample i = digest(i mod 16). */
  def encodeWav(digest: Array[Int], sampleRate: Int, n: Int): Array[Byte] = {
    val pcm = Array.tabulate[Byte](n)(i => digest(i % 16).toByte)
    val fmt = new AudioFormat(sampleRate.toFloat, 8, 1, /*signed=*/ false, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Length-prefixed container of BMP frames; frame f's pixels cycle md5(text:f). */
  def encodeVideo(text: String, w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    dos.writeInt(VideoFrames)
    (0 until VideoFrames).foreach { f =>
      val fb = encodeBmp(digestVals(text + ":" + f), w, h)
      dos.writeInt(fb.length); dos.write(fb)
    }
    out.toByteArray
  }

  /**
   * Derive a deterministic media table from `documents`: one real encoded blob per
   * doc, kind cycling image/audio/video, dimensions varying with the id. Real
   * pipelines read these columns from parquet/blob stores; the generation step
   * stands in for ingest.
   */
  def deriveMediaTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val w = (16 + (id % 4) * 8).toInt   // 16..40, multiple of 8
      val h = (16 + (id % 2) * 16).toInt  // 16 or 32 -> w*h is a multiple of 16
      val sr = if (id % 3 == 1) 16000 else 0
      val content = kind match {
        case "image" => encodeBmp(digestVals(text), w, h)
        case "audio" => encodeWav(digestVals(text), sr, AudioSamples)
        case _       => encodeVideo(text, w, h)
      }
      MediaRow(id, kind, content, w, h, sr)
    }.toDF()
  }

  /** Accumulator for (mean, lane-means) over decoded unit values. */
  private final class Stats {
    var total = 0.0; var n = 0L
    val laneSums = new Array[Double](FeatureDim)
    val laneCounts = new Array[Long](FeatureDim)
    def add(i: Long, v: Double): Unit = {
      total += v; n += 1
      val lane = (i % FeatureDim).toInt
      laneSums(lane) += v; laneCounts(lane) += 1
    }
    def mean: Double = if (n == 0) 0.0 else total / n
    def lanes: Array[Double] = Array.tabulate(FeatureDim) { j =>
      if (laneCounts(j) == 0) 0.0 else laneSums(j) / laneCounts(j)
    }
  }

  /**
   * Real BMP decode: header dims + gray-channel raster stats. `ImageIO.read`
   * signals an undecodable container by returning NULL (not by throwing) — turn
   * that into a clean exception so the Try in [[decodeResults]] can catch it
   * instead of an NPE surfacing at first pixel access.
   */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Long, Double, Array[Double]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image container (${bytes.length} bytes)")
    val st = new Stats
    accumulateImage(img, st)
    (img.getWidth, img.getHeight, st.n, st.mean, st.lanes)
  }

  private def accumulateImage(img: BufferedImage, st: Stats): Unit = {
    val w = img.getWidth; val h = img.getHeight
    var i = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        st.add(i, (img.getRGB(x, y) & 0xff).toDouble) // gray: any channel
        i += 1; x += 1
      }
      y += 1
    }
  }

  /** Real WAV decode: header sample-rate + unsigned 8-bit sample stats. */
  def decodeAudio(bytes: Array[Byte]): (Int, Int, Long, Double, Array[Double]) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val sr = ais.getFormat.getSampleRate.toInt
    val pcm = ais.readAllBytes()
    val st = new Stats
    var i = 0
    while (i < pcm.length) { st.add(i.toLong, (pcm(i) & 0xff).toDouble); i += 1 }
    (sr, 1, st.n, st.mean, st.lanes)
  }

  /** Container parse + per-frame BMP decode; stats pooled across frames. */
  def decodeVideo(bytes: Array[Byte]): (Int, Int, Long, Double, Array[Double]) = {
    val frames = videoFrames(bytes)
    val st = new Stats
    var w = 0; var h = 0
    frames.zipWithIndex.foreach { case (fb, idx) =>
      val img = ImageIO.read(new ByteArrayInputStream(fb))
      // Same NULL-means-undecodable contract as decodeImage: surface a real
      // failure reason, not an NPE with a null message, in the error row.
      require(img != null, s"undecodable frame $idx (${fb.length} bytes)")
      w = img.getWidth; h = img.getHeight
      accumulateImage(img, st)
    }
    (w, h, st.n, st.mean, st.lanes)
  }

  /**
   * Parse the length-prefixed frame container into raw BMP frame blobs.
   *
   * Every length field is validated against the bytes actually present BEFORE any
   * allocation: a corrupt/adversarial frame count or frame length (e.g.
   * `Int.MaxValue`) would otherwise be an allocation bomb — `new Array[Byte](len)`
   * on a hostile prefix can OOM an executor, which task retries only amplify.
   * Throws `IllegalArgumentException` on any malformed prefix; callers in the
   * distributed path wrap in Try and emit an error row instead.
   */
  def videoFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(bytes.length >= 4, s"container too short (${bytes.length} bytes)")
    val dis = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = dis.readInt()
    // Each frame needs at least its own 4-byte length prefix.
    require(n >= 0 && n.toLong * 4 <= bytes.length - 4,
      s"frame count $n impossible for ${bytes.length}-byte container")
    var remaining = bytes.length - 4
    (0 until n).map { f =>
      // The count check above bounds TOTAL prefix bytes, but a frame body can
      // consume what a later prefix needed — a truncated container would then
      // hit readInt's EOFException, breaking the IllegalArgumentException
      // contract this parser documents. Check before reading.
      require(remaining >= 4,
        s"truncated container: frame $f needs a 4-byte length prefix, " +
          s"$remaining bytes remain")
      val len = dis.readInt()
      remaining -= 4
      require(len >= 0 && len <= remaining,
        s"frame length $len exceeds remaining $remaining container bytes")
      val fb = new Array[Byte](len)
      dis.readFully(fb)
      remaining -= len
      fb
    }
  }

  /**
   * Partition-batched decode with a per-row error channel: one iterator pass per
   * partition (codec/model init sits before the `map`), fixed-dim output. Typed
   * Dataset API so the schema is compile-checked. `mapPartitions` is the right tool
   * exactly here: opaque binary + a stateful codec does not fit a Catalyst
   * expression. Each row's decode is wrapped in Try — a corrupt blob yields an
   * `ok = false` row carrying the failure reason, never a task-killing throw.
   */
  def decodeResults(media: Dataset[MediaRow]): Dataset[MediaDecodeResult] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Codec init amortizes here (ImageIO scans its reader registry once per JVM).
      rows.map { r =>
        val nBytes = if (r.content == null) 0L else r.content.length.toLong
        Try {
          r.kind match {
            case "image" => decodeImage(r.content)
            case "audio" => decodeAudio(r.content)
            case _       => decodeVideo(r.content)
          }
        } match {
          case Success((dw, dh, units, mean, lanes)) =>
            MediaDecodeResult(r.media_id, r.kind, nBytes, ok = true, null,
              units, dw, dh, mean, lanes)
          case Failure(e) =>
            MediaDecodeResult(r.media_id, r.kind, nBytes, ok = false,
              s"${e.getClass.getSimpleName}: ${e.getMessage}",
              0L, 0, 0, 0.0, new Array[Double](0))
        }
      }
    }
  }

  /**
   * Windowed audio energy (the frame-level audio feature extractor — the
   * audio twin of image lane means): REAL WAV decode via javax.sound, then
   * per-window integer energy Σ(sample−128)² over consecutive `win`-sample
   * windows (trailing partial window dropped). Emits one row per clip:
   * window count, total energy, and the FIRST peak window (strict-greater
   * replacement keeps the earliest maximum — deterministic under duplicate
   * energies, which the 16-byte digest cycle guarantees plenty of). All
   * integer arithmetic end to end, so the oracle replays it from md5(text)
   * without touching a codec. Decode batches per partition like
   * [[decodeResults]]; the PCM loop is O(samples) per row, no allocation.
   * Corrupt or undecodable clips contribute no row (the [[frameSample]]
   * error-row-skip posture — one bad blob must cost one row, never the
   * job; callers needing the explicit error channel pre-screen with
   * [[decodeResults]]).
   */
  def audioWindowEnergy(media: Dataset[MediaRow], win: Int): DataFrame = {
    require(win > 0, s"window must be positive: $win")
    import media.sparkSession.implicits._
    // Column-form filter (like resizeFeatures/frameSample): a typed lambda
    // would deserialize every image/video row — including their blobs, the
    // table's largest bytes — just to test `kind`, and blocks pushdown.
    media.filter(col("kind") === "audio").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        Try {
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.content))
        val pcm = try ais.readAllBytes() finally ais.close()
        val nw = pcm.length / win
        var wdx = 0
        var total = 0L
        var peakIdx = -1L
        var peak = Long.MinValue
        while (wdx < nw) {
          var e = 0L
          var i = wdx * win
          val end = i + win
          while (i < end) {
            val v = (pcm(i) & 0xff) - 128
            e += v.toLong * v
            i += 1
          }
          if (e > peak) { peak = e; peakIdx = wdx.toLong }
          total += e
          wdx += 1
        }
        (r.media_id, nw.toLong, total, peakIdx, if (nw == 0) 0L else peak)
        }.toOption
      }
    }.toDF("media_id", "n_windows", "energy_total", "peak_window", "peak_energy")
  }

  /** Successfully decoded features only (error rows dropped; see [[decodeResults]]
    * for the variant that keeps the failure reason per row). */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    decodeResults(media).filter(_.ok).map(r =>
      MediaFeatures(r.media_id, r.kind, r.n_bytes, r.n_units, r.dec_w, r.dec_h,
        r.mean_val, r.feature))
  }

  /**
   * Nearest-neighbor image resize: decode -> integer-sampled raster
   * (`ix = ox*w div ow`) -> re-encode BMP. Nearest-neighbor (not bilinear)
   * because the sampling is pure integer arithmetic — deterministic across
   * JVMs and exactly replayable by the oracle, which re-derives every sampled
   * pixel from the planted digest cycle. An interpolating kernel drops in here
   * unchanged; what the operator pins is the decode -> raster transform ->
   * encode plumbing.
   */
  def resizeImage(bytes: Array[Byte], ow: Int, oh: Int): Array[Byte] = {
    require(ow > 0 && oh > 0, s"resize dims must be positive: ${ow}x$oh")
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image container (${bytes.length} bytes)")
    val out = new BufferedImage(ow, oh, BufferedImage.TYPE_3BYTE_BGR)
    // Long sampling math: `x * w` overflows Int around 46k x 46k (a real
    // panorama), wrapping negative and crashing getRGB — which the callers'
    // Try would then misreport as a corrupt input.
    var y = 0
    while (y < oh) {
      val iy = (y.toLong * img.getHeight / oh).toInt
      var x = 0
      while (x < ow) {
        out.setRGB(x, y, img.getRGB((x.toLong * img.getWidth / ow).toInt, iy))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "bmp", bos)
    bos.toByteArray
  }

  /**
   * Resize features: resize every image blob and decode the RE-ENCODED output
   * (round-trips the encoder, so a raster or header bug in either direction
   * breaks the stats). Corrupt inputs are skipped, not thrown (A19 semantics).
   */
  def resizeFeatures(media: Dataset[MediaRow], ow: Int, oh: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "image").as[MediaRow]
      .flatMap { r =>
        Try {
          val (w, h, units, mean, _) = decodeImage(resizeImage(r.content, ow, oh))
          (r.media_id, w.toLong, h.toLong, units, mean)
        }.toOption
      }.toDF("media_id", "rs_w", "rs_h", "n_px", "mean_px")
  }

  /**
   * Video frame-sampling: parse the container, keep every `everyK`-th decoded frame;
   * returns (media_id, frame_idx, frame) with `frame` the raw BMP blob. Corrupt
   * containers contribute no frames (error-row-skip, not a throw).
   */
  def frameSample(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    require(everyK > 0, s"everyK must be positive: $everyK")
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video").as[MediaRow]
      .flatMap { r =>
        Try(videoFrames(r.content)).getOrElse(Nil).zipWithIndex.collect {
          case (fb, idx) if idx % everyK == 0 => (r.media_id, idx, fb)
        }
      }.toDF("media_id", "frame_idx", "frame")
  }

  /**
   * Frame-level features over sampled frames: container parse + per-frame BMP decode
   * for every `everyK`-th frame; one output row per decodable sampled frame
   * (media_id, frame_idx, fr_w, fr_h, n_px, mean_px). Corrupt containers and corrupt
   * individual frames are skipped, so one bad frame costs one row, not the blob.
   * All integral columns are BIGINT for cross-engine schema stability.
   */
  def frameFeatures(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    require(everyK > 0, s"everyK must be positive: $everyK")
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video").as[MediaRow]
      .flatMap { r =>
        Try(videoFrames(r.content)).getOrElse(Nil).zipWithIndex.collect {
          case (fb, idx) if idx % everyK == 0 =>
            Try {
              val (w, h, units, mean, _) = decodeImage(fb)
              (r.media_id, idx.toLong, w.toLong, h.toLong, units, mean)
            }.toOption
        }.flatten
      }.toDF("media_id", "frame_idx", "fr_w", "fr_h", "n_px", "mean_px")
  }

  /**
   * End-to-end: derive -> real decode -> per-kind feature aggregate
   * (oracle-checked). Feature statistics aggregate ok-rows only; `n_decode_errors`
   * counts the dropped rows, so the error channel is itself part of the
   * hash-verified contract (the oracle pins 0 for the clean synthetic corpus).
   */
  def featurePipeline(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media = deriveMediaTable(docs).as[MediaRow]
    decodeResults(media)
      .groupBy(col("kind"))
      .agg(count(when(col("ok"), lit(1))).as("n"),
        count(when(!col("ok"), lit(1))).as("n_decode_errors"),
        sum(when(col("ok"), col("n_units"))).as("total_units"),
        sum(when(col("ok"), col("dec_w").cast("long"))).as("sum_dec_w"),
        round(avg(when(col("ok"), col("mean_val"))), 4).as("avg_mean"),
        round(avg(when(col("ok"), element_at(col("feature"), 1))), 4).as("avg_lane0"))
      .orderBy(col("kind"))
  }
}
