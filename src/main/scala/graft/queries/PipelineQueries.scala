package graft.queries

import graft.Tables
import graft.operators.NutritionPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Reference-semantics pipeline queries (SURVEY.md §2 Part A, end to end): a raw keyed
 * store is derived *deterministically* from the `part` table — p_name as the item key
 * (it has real duplicates, exercising last-write-wins), integer-only JSON payloads (no
 * float formatting, so Spark and DuckDB build byte-identical strings), planted edge
 * rows (empty `[]` tombstones per A22, malformed JSON per A19/A14) — then pushed
 * through parse -> flatten -> defaults -> enrich -> upsert -> 17-col schema.
 */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  /**
   * Derived items_raw: (item_name, ingestion_ts, data).
   *  - ingestion_ts = 2024-01-01 + p_partkey seconds (unique -> total upsert order)
   *  - data: JSON array with name/calories/protein_g/serving_size_g keys only
   *    (missing nutrient keys exercise the coalesce-0 defaults)
   *  - p_partkey % 97 == 0 -> '[]'   (processed tombstone, A22 filter shape)
   *  - p_partkey % 89 == 0 -> 'not json' (malformed, dropped like A14/A19)
   */
  def itemsRaw(s: SparkSession, d: String): DataFrame = {
    val cal = round(col("p_retailprice")).cast("long")
    Tables.part(s, d).select(
      col("p_name").as("item_name"),
      expr("timestampadd(SECOND, p_partkey, timestamp'2024-01-01 00:00:00')")
        .as("ingestion_ts"),
      when(col("p_partkey") % 97 === 0, "[]")
        .when(col("p_partkey") % 89 === 0, "not json")
        .otherwise(concat(
          lit("[{\"name\":\""), col("p_name"),
          lit("\",\"calories\":"), cal,
          lit(",\"protein_g\":"), col("p_size"),
          lit(",\"serving_size_g\":100}]")))
        .as("data"))
  }

  private val duckItemsRaw =
    """items_raw AS (
      |  SELECT p_name AS item_name,
      |   TIMESTAMP '2024-01-01 00:00:00' + p_partkey * INTERVAL 1 SECOND AS ingestion_ts,
      |   CASE WHEN p_partkey % 97 = 0 THEN '[]'
      |        WHEN p_partkey % 89 = 0 THEN 'not json'
      |        ELSE concat('[{"name":"', p_name, '","calories":', CAST(round(p_retailprice) AS BIGINT),
      |                    ',"protein_g":', p_size, ',"serving_size_g":100}]')
      |   END AS data
      |  FROM part)""".stripMargin

  private val duckEnriched =
    s"""$duckItemsRaw,
       |valid AS (
       |  SELECT item_name, ingestion_ts, data,
       |   CAST(json_extract(data, '$$[0].calories') AS BIGINT) AS cal,
       |   coalesce(CAST(json_extract(data, '$$[0].calories') AS DOUBLE), 0.0) AS calories,
       |   coalesce(CAST(json_extract(data, '$$[0].protein_g') AS DOUBLE), 0.0) AS protein_g,
       |   coalesce(CAST(json_extract(data, '$$[0].serving_size_g') AS DOUBLE), 0.0) AS serving_size_g,
       |   CAST(0.0 AS DOUBLE) AS sodium_mg, CAST(0.0 AS DOUBLE) AS fiber_g
       |  FROM items_raw
       |  WHERE json_valid(data) AND json_array_length(data) > 0),
       |latest AS (
       |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY item_name
       |    ORDER BY ingestion_ts DESC, data DESC) AS rn FROM valid) WHERE rn = 1),
       |enriched AS (
       |  SELECT item_name, CAST(ingestion_ts AS VARCHAR) AS ingestion_ts,
       |   calories, protein_g, serving_size_g, sodium_mg, fiber_g,
       |   concat('Description of ', item_name, ' (', cal, ' kcal): a distinctive dish.') AS openai_description,
       |   concat('Best pairings for ', item_name, ': ',
       |     CASE WHEN cal % 5 = 0 THEN 'Polenta' WHEN cal % 5 = 1 THEN 'Salad'
       |          WHEN cal % 5 = 2 THEN 'Pasta' WHEN cal % 5 = 3 THEN 'Rice'
       |          ELSE 'Bread' END, '.') AS openai_best_pairings,
       |   concat('Health impact of ', item_name, ': balanced at ', cal, ' kcal.') AS openai_health_impact,
       |   concat('Preparation tips for ', item_name, ': cook gently.') AS openai_preparation_tips
       |  FROM latest)""".stripMargin

  val queries: Map[String, Q] = Map(
    // A12-A21 end to end; output the varying columns of the 17-col schema.
    "q_pipeline_enrich" -> { (s, d) =>
      NutritionPipeline.enrichmentPipeline(itemsRaw(s, d))
        .select(col("item_name"), col("ingestion_ts"), col("calories"),
          col("protein_g"), col("serving_size_g"), col("sodium_mg"), col("fiber_g"),
          col("openai_description"), col("openai_best_pairings"),
          col("openai_health_impact"), col("openai_preparation_tips"))
        .orderBy(col("item_name"))
    },

    // A28 chained on the pipeline output: word-cloud term frequency of pairings.
    "q_pipeline_wordcloud" -> { (s, d) =>
      NutritionPipeline.enrichmentPipeline(itemsRaw(s, d))
        .select(explode(split(lower(col("openai_best_pairings")), "[^a-z]+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).limit(30)
    },

    // A26+A29 dashboard twin: sodium/calorie ranking with the Superset row cap.
    "q_pipeline_dashboard" -> { (s, d) =>
      NutritionPipeline.enrichmentPipeline(itemsRaw(s, d))
        .select(col("item_name"), col("calories"), col("protein_g"))
        .orderBy(col("calories").desc, col("item_name"))
        .limit(5000)
    },

    // Multimodal plumbing end-to-end (north-star): binary media column + typed
    // metadata -> partition-batched real decode -> per-kind feature aggregate,
    // including the (zero-on-clean-data) decode-error count.
    "q_multimodal_features" -> { (s, d) =>
      graft.multimodal.Multimodal.featurePipeline(s, Tables.documents(s, d))
    },

    // Video frame-sampling promoted to the oracle surface: container parse +
    // per-frame BMP decode of every 2nd frame; the oracle independently predicts
    // each sampled frame's pixel mean from the planted md5-cycle, so a container
    // offset or per-frame raster bug breaks the hash.
    "q_multimodal_frames" -> { (s, d) =>
      import s.implicits._
      val media = graft.multimodal.Multimodal
        .deriveMediaTable(Tables.documents(s, d)).as[graft.multimodal.MediaRow]
      graft.multimodal.Multimodal.frameFeatures(media, 2)
        .select(col("media_id"), col("frame_idx"), col("fr_w"), col("fr_h"),
          col("n_px"), round(col("mean_px"), 4).as("mean_px"))
        .orderBy(col("media_id"), col("frame_idx"))
    },

    // Image resize (the remaining multimodal primitive): nearest-neighbor to
    // 12x8 with an encode round-trip; the oracle re-derives every sampled
    // pixel from the digest cycle with the same integer sampling arithmetic,
    // so a one-pixel offset in the resampler breaks the per-image mean.
    "q_multimodal_resize" -> { (s, d) =>
      import s.implicits._
      val media = graft.multimodal.Multimodal
        .deriveMediaTable(Tables.documents(s, d)).as[graft.multimodal.MediaRow]
      graft.multimodal.Multimodal.resizeFeatures(media, 12, 8)
        .select(col("media_id"), col("rs_w"), col("rs_h"), col("n_px"),
          round(col("mean_px"), 4).as("mean_px"))
        .orderBy(col("media_id"))
    },

    // SCD2 history over the keyed change stream (the temporal complement of the
    // A9 last-write-wins store): per-key version chains with validity intervals;
    // the driver-verified epoch-us encoding keeps timestamps cross-engine-stable.
    "q_scd2_history" -> { (s, d) =>
      graft.operators.Relational.scd2(itemsRaw(s, d), Seq("item_name"), "ingestion_ts")
        .select(col("item_name"), col("version"),
          unix_micros(col("valid_from")).as("vf_us"),
          unix_micros(col("valid_to")).as("vt_us"),
          col("is_current"))
        .orderBy(col("item_name"), col("version"))
    },

    // B223: POINT-IN-TIME snapshot over the SCD2 history (the bitemporal
    // "AS OF" read every feature store and audit trail needs): one interval
    // predicate — vf ≤ pivot < vt — selects each key's version valid at the
    // pivot instant; keys whose first version postdates the pivot drop out.
    // The pivot bisects the observed validity range ((min+max) div 2 µs — a
    // 2-long scalar probe, SF-stable by construction), so the query always
    // exercises both "superseded" and "still current" branches. Interval
    // filtering is map-side over the history — no window, no join.
    "q_scd2_asof" -> { (s, d) =>
      val hist = graft.operators.Relational
        .scd2(itemsRaw(s, d), Seq("item_name"), "ingestion_ts")
        .select(col("item_name"), col("version"),
          unix_micros(col("valid_from")).as("vf_us"),
          unix_micros(col("valid_to")).as("vt_us"))
      val pivot = hist.agg(expr("(min(vf_us) + max(vf_us)) div 2"))
        .head().getLong(0)
      hist.filter(col("vf_us") <= pivot &&
          (col("vt_us").isNull || col("vt_us") > pivot))
        .withColumn("pivot_us", lit(pivot))
        .orderBy(col("item_name"))
    },

    // B224: windowed audio energy — REAL WAV decode (javax.sound) into
    // 10-sample integer energy windows; per clip the window count, total
    // energy, and first peak window ship to the oracle, which re-derives
    // every sample from the planted md5 cycle (a codec offset, sign, or
    // window-boundary bug breaks the hash). Window 10 is deliberately
    // coprime to the 16-byte digest cycle so window energies VARY (period
    // lcm(10,16) = 80 samples -> 8 distinct window shapes per clip).
    "q_multimodal_audio" -> { (s, d) =>
      import s.implicits._
      val media = graft.multimodal.Multimodal
        .deriveMediaTable(Tables.documents(s, d)).as[graft.multimodal.MediaRow]
      graft.multimodal.Multimodal.audioWindowEnergy(media, 10)
        .orderBy(col("media_id"))
    },

    // A22 idempotence as a query: tombstoned/malformed keys never reach the output,
    // and re-deriving from the same source yields zero new keys (anti-join is empty
    // -> count by reason).
    "q_pipeline_incremental" -> { (s, d) =>
      val raw = itemsRaw(s, d)
      raw.withColumn("reason",
          when(col("data") === "[]", "tombstone")
            .when(col("data") === "not json", "malformed")
            .otherwise("valid"))
        .groupBy(col("reason")).agg(count(lit(1)).as("n"),
          countDistinct(col("item_name")).as("n_keys"))
        .orderBy(col("reason"))
    },

    // Source-format coverage: the `binaryFile` source — the ingestion path an
    // object-store multimodal corpus actually lands through (one opaque blob
    // per object plus path/length metadata; Spark parallelizes the listing and
    // assigns whole files to tasks). A deterministic document slice is sharded
    // to one .bin file per doc by a DISTRIBUTED per-partition writer (Hadoop
    // FS API resolved on the executors — no driver loop, the same code path
    // works against file:// here and hdfs://-or-s3a:// on a cluster), read
    // back whole-file through binaryFile, and reduced to a per-doc
    // (byte-length, md5) signature the oracle predicts from the parquet table
    // alone — path mangling, truncation, or UTF-8 drift in either direction
    // breaks the hash. Many-small-files is the known cost of this layout at
    // scale; that is exactly what the compaction operator (B72) exists for.
    "q_source_binaryfile" -> { (s, d) =>
      val dir = Tables.scratchDir(s, "blobshard", d)
      val hPath = new org.apache.hadoop.fs.Path(dir)
      val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(hPath)) fs.delete(hPath, true)
      fs.mkdirs(hPath)
      // Slice sized for the drive (1 doc in 29), and repartitioned so file
      // CREATION parallelizes — the per-file Hadoop FS round-trip (~5 ms
      // create+write+close on LocalFileSystem) is the cost of this layout,
      // and it serializes if the cached table sits in one partition. The
      // shuffle moves a few hundred tiny rows; sink parallelism is what
      // Spark's own file committers buy the same way.
      // Ship the SESSION Hadoop conf to the tasks — a fresh Configuration()
      // would drop spark.hadoop.* settings (s3a credentials, nameservices)
      // and break exactly the hdfs://-or-s3a:// posture claimed above.
      val shipConf = new graft.SerializableHadoopConf(s.sparkContext.hadoopConfiguration)
      Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(29)) === 0 && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
        .repartition(8)
        .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
          val pfs = new org.apache.hadoop.fs.Path(dir).getFileSystem(shipConf.value)
          it.foreach { r =>
            val out = pfs.create(
              new org.apache.hadoop.fs.Path(dir, s"doc_${r.getLong(0)}.bin"), true)
            try out.write(r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally out.close()
          }
        }
      s.read.format("binaryFile").load(dir)
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
          col("length").as("n_bytes"),
          md5(col("content")).as("content_md5"))
        .orderBy(col("doc_id"))
    },

    // Custom DataSource V2 (graft.sources.SynthProvider): deterministic corpus
    // synthesis from pure id arithmetic — the reference's generator posture as
    // a first-class Spark source with real column pruning, id-range partition
    // pruning, and reported statistics (all pinned in PlanSpec). Ignores sfDir
    // by design: a synthesis source has zero input IO and scales to any
    // requested size by splitting the id range. The doc_id range predicate
    // below drops 4 of 16 splits at PLANNING time; the oracle recomputes the
    // whole content from DuckDB's range() — engine-independent proof the
    // generated table is what the arithmetic says.
    "q_source_synth" -> { (s, _) =>
      s.read.format("graft-synth")
        .option("rows", "200000").option("parts", "16").load()
        .filter(col("doc_id") >= 25000 && col("doc_id") < 175000)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_tokens")).as("tok_sum"),
          sum(col("doc_id")).as("id_sum"),
          countDistinct(col("week")).as("n_weeks"))
        .orderBy(col("lang"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q_pipeline_enrich" ->
      s"""WITH $duckEnriched
         |SELECT item_name, ingestion_ts, calories, protein_g, serving_size_g,
         | sodium_mg, fiber_g, openai_description, openai_best_pairings,
         | openai_health_impact, openai_preparation_tips
         |FROM enriched ORDER BY item_name""".stripMargin,

    "q_pipeline_wordcloud" ->
      s"""WITH $duckEnriched
         |SELECT word, count(*) AS n FROM (
         |  SELECT unnest(list_filter(string_split_regex(lower(openai_best_pairings), '[^a-z]+'),
         |    w -> w <> '')) AS word
         |  FROM enriched)
         |GROUP BY word ORDER BY n DESC, word LIMIT 30""".stripMargin,

    "q_pipeline_dashboard" ->
      s"""WITH $duckEnriched
         |SELECT item_name, calories, protein_g FROM enriched
         |ORDER BY calories DESC, item_name LIMIT 5000""".stripMargin,

    // The oracle predicts what a CORRECT decoder must recover: pixel/sample values
    // are md5(text)-cycles whose counts are multiples of 16, so every decoded mean
    // reduces exactly to a mean over digest-byte positions (see Multimodal scaladoc).
    "q_multimodal_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |   CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |   (16 + (doc_id % 4) * 8) AS w, (16 + (doc_id % 2) * 16) AS h, text
        |  FROM documents),
        |digests AS (
        |  SELECT media_id, kind, w, h, md5(text) AS hx FROM m WHERE kind <> 'video'
        |  UNION ALL
        |  SELECT media_id, kind, w, h, md5(text || ':' || f) AS hx
        |  FROM m CROSS JOIN (SELECT unnest(range(3)) AS f) ff WHERE kind = 'video'),
        |b AS (
        |  SELECT media_id, kind, w, h, i,
        |   CAST(concat('0x', substr(hx, 2*i+1, 2)) AS INT) AS v
        |  FROM digests CROSS JOIN (SELECT unnest(range(16)) AS i) ii),
        |f AS (
        |  SELECT media_id, kind, avg(v) AS mean_val,
        |   avg(CASE WHEN i % 4 = 0 THEN v END) AS lane0,
        |   CASE kind WHEN 'image' THEN w*h WHEN 'audio' THEN 256 ELSE 3*w*h END AS n_units,
        |   CASE kind WHEN 'audio' THEN 16000 ELSE w END AS dec_w
        |  FROM b GROUP BY media_id, kind, w, h)
        |SELECT kind, count(*) AS n, CAST(0 AS BIGINT) AS n_decode_errors,
        | CAST(sum(n_units) AS BIGINT) AS total_units,
        | CAST(sum(dec_w) AS BIGINT) AS sum_dec_w,
        | round(avg(mean_val),4) AS avg_mean, round(avg(lane0),4) AS avg_lane0
        |FROM f GROUP BY kind ORDER BY kind""".stripMargin,

    // Sampled frames (idx 0 and 2 of 3-frame containers): each frame's pixels cycle
    // the 16 bytes of md5(text:idx) exactly w*h/16 times, so the frame mean reduces
    // to the digest-byte mean and the oracle predicts it without decoding anything.
    "q_multimodal_frames" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |   (16 + (doc_id % 4) * 8) AS w, (16 + (doc_id % 2) * 16) AS h, text
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (
        |  SELECT media_id, w, h, f AS frame_idx, md5(text || ':' || f) AS hx
        |  FROM m CROSS JOIN (SELECT unnest([0, 2]) AS f) ff),
        |b AS (
        |  SELECT media_id, frame_idx, w, h,
        |   CAST(concat('0x', substr(hx, 2*i+1, 2)) AS INT) AS v
        |  FROM fr CROSS JOIN (SELECT unnest(range(16)) AS i) ii)
        |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        | CAST(w AS BIGINT) AS fr_w, CAST(h AS BIGINT) AS fr_h,
        | CAST(w*h AS BIGINT) AS n_px, round(avg(v), 4) AS mean_px
        |FROM b GROUP BY media_id, frame_idx, w, h
        |ORDER BY media_id, frame_idx""".stripMargin,

    // Resized pixel (ox, oy) samples source linear index (oy*h//8)*w + ox*w//12,
    // whose value is digest byte ((..) % 16) — the exact nearest-neighbor
    // arithmetic of Multimodal.resizeImage replayed per output pixel.
    "q_multimodal_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |   (16 + (doc_id % 4) * 8) AS w, (16 + (doc_id % 2) * 16) AS h, md5(text) AS hx
        |  FROM documents WHERE doc_id % 3 = 0),
        |px AS (
        |  SELECT media_id,
        |   CAST(concat('0x',
        |     substr(hx, 2 * ((((oy.y * h) // 8) * w + ((ox.x * w) // 12)) % 16) + 1, 2))
        |    AS INT) AS v
        |  FROM m
        |  CROSS JOIN (SELECT unnest(range(12)) AS x) ox
        |  CROSS JOIN (SELECT unnest(range(8)) AS y) oy)
        |SELECT media_id, CAST(12 AS BIGINT) AS rs_w, CAST(8 AS BIGINT) AS rs_h,
        | CAST(count(*) AS BIGINT) AS n_px, round(avg(v), 4) AS mean_px
        |FROM px GROUP BY media_id ORDER BY media_id""".stripMargin,

    "q_scd2_history" ->
      s"""WITH $duckItemsRaw
         |SELECT item_name, version, vf_us, vt_us, vt_us IS NULL AS is_current FROM (
         |  SELECT item_name,
         |   CAST(row_number() OVER (PARTITION BY item_name ORDER BY ingestion_ts) AS BIGINT) AS version,
         |   epoch_us(ingestion_ts) AS vf_us,
         |   epoch_us(lead(ingestion_ts) OVER (PARTITION BY item_name ORDER BY ingestion_ts)) AS vt_us
         |  FROM items_raw)
         |ORDER BY item_name, version""".stripMargin,

    // B223: identical history CTE, interval predicate at the same integer
    // mid-range pivot.
    "q_scd2_asof" ->
      s"""WITH $duckItemsRaw,
         |h AS (
         |  SELECT item_name,
         |   CAST(row_number() OVER w AS BIGINT) AS version,
         |   epoch_us(ingestion_ts) AS vf_us,
         |   epoch_us(lead(ingestion_ts) OVER w) AS vt_us
         |  FROM items_raw
         |  WINDOW w AS (PARTITION BY item_name ORDER BY ingestion_ts)),
         |p AS (SELECT (min(vf_us) + max(vf_us)) // 2 AS pv FROM h)
         |SELECT item_name, version, vf_us, vt_us, CAST(pv AS BIGINT) AS pivot_us
         |FROM h CROSS JOIN p
         |WHERE vf_us <= pv AND (vt_us IS NULL OR vt_us > pv)
         |ORDER BY item_name""".stripMargin,

    // B224: every PCM sample is digest byte i%16; 10-sample windows over the
    // 256-sample clip -> 25 full windows; first peak via the rank-1 pick
    // over (energy DESC, window ASC).
    "q_multimodal_audio" ->
      """WITH a AS (SELECT doc_id AS media_id, md5(text) AS hx
        |  FROM documents WHERE doc_id % 3 = 1),
        |s AS (SELECT media_id, CAST(i AS BIGINT) AS i,
        |    CAST(concat('0x', substr(hx, 2 * (CAST(i AS INT) % 16) + 1, 2)) AS INT) - 128 AS v
        |  FROM a CROSS JOIN (SELECT unnest(range(250)) AS i) ii),
        |w AS (SELECT media_id, i // 10 AS wdx, sum(v * v) AS e
        |  FROM s GROUP BY 1, 2),
        |pk AS (SELECT media_id, wdx, e,
        |    row_number() OVER (PARTITION BY media_id ORDER BY e DESC, wdx) AS r
        |  FROM w)
        |SELECT media_id, CAST(25 AS BIGINT) AS n_windows,
        |  CAST(sum(e) AS BIGINT) AS energy_total,
        |  CAST(max(CASE WHEN r = 1 THEN wdx END) AS BIGINT) AS peak_window,
        |  CAST(max(CASE WHEN r = 1 THEN e END) AS BIGINT) AS peak_energy
        |FROM pk GROUP BY media_id ORDER BY media_id""".stripMargin,

    "q_pipeline_incremental" ->
      s"""WITH $duckItemsRaw
         |SELECT CASE WHEN data = '[]' THEN 'tombstone'
         |            WHEN data = 'not json' THEN 'malformed'
         |            ELSE 'valid' END AS reason,
         | count(*) AS n, count(DISTINCT item_name) AS n_keys
         |FROM items_raw GROUP BY 1 ORDER BY reason""".stripMargin,

    // Predicts the binaryFile round-trip from the parquet table alone:
    // octet_length(encode(..)) is the UTF-8 byte count Spark's writer produces,
    // and DuckDB's md5(VARCHAR) hashes the same UTF-8 bytes as Spark's
    // md5(BINARY) over the file content.
    "q_source_binaryfile" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS content_md5
        |FROM documents
        |WHERE doc_id % 29 = 0 AND text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // Recomputes the synthesized table from range(): % and * are left-assoc
    // same-precedence in both engines, so (id % 1000003) * 31 needs no parens;
    // // is DuckDB integer division, matching Spark's LongType /.
    "q_source_synth" ->
      """SELECT CASE WHEN id % 5 = 0 THEN 'en' WHEN id % 5 = 1 THEN 'fr'
        |            WHEN id % 5 = 2 THEN 'de' WHEN id % 5 = 3 THEN 'es'
        |            ELSE 'pt' END AS lang,
        | count(*) AS n,
        | CAST(sum((id % 1000003 * 31 + 7) % 997) AS BIGINT) AS tok_sum,
        | CAST(sum(id) AS BIGINT) AS id_sum,
        | CAST(count(DISTINCT id // 7000) AS BIGINT) AS n_weeks
        |FROM range(200000) t(id)
        |WHERE id >= 25000 AND id < 175000
        |GROUP BY 1 ORDER BY lang""".stripMargin
  )
}
