package graft.streaming

import graft.operators.Relational
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/**
 * Structured Streaming replication of the reference's ingest topology (SURVEY.md
 * §3.1): producer -> Kafka -> consumer -> keyed upsert store becomes one incremental
 * query: source -> stateful dedup -> stream-static enrichment join -> validity filter
 * -> foreachBatch keyed upsert. The reference's offset-commit protocol
 * (consume_items.py:83-119) is subsumed by checkpointing (exactly-once to
 * idempotent sinks — strictly stronger than its at-least-once manual commits).
 *
 * Scale posture: dedup state is bounded via `dropDuplicatesWithinWatermark` when a
 * watermark column is present; at cluster scale you would additionally configure the
 * RocksDB state store provider (config-only, no code change). The enrichment lookup
 * is a broadcastable static table — the deterministic stand-in for the reference's
 * per-record HTTP call (consume_items.py:66-80), which would not survive any scale.
 */
object StreamingPipeline {

  /**
   * A4: subscribe to the file-channel topic written by [[Producer.toFileChannel]].
   * Schema is declared (never inferred) and matches the Kafka wire value column, so
   * `fromWire` applies unchanged over this source, a Kafka source, or a
   * MemoryStream — the consumer pipeline is source-agnostic over the wire schema.
   * Checkpointing gives the `startingOffsets`/group-id semantics: each run consumes
   * exactly the files not yet committed, like a consumer group resuming from its
   * committed offset (consume_items.py:24-30 of the reference).
   */
  def fileChannel(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
      .json(dir)

  /** A5: Kafka's consumer-side deserialization — wire records back to item names
    * (`value.cast(string)`, the declarative form of the reference's JSON decode). */
  def fromWire(wire: DataFrame): DataFrame =
    wire.select(col("value").cast("string").as("item_name"))

  /**
   * A2+A5+A6+A7: dedup incoming item names, enrich via stream-static left join
   * against `lookup(item_name, data)`, drop null/empty payloads.
   * If `watermarkTs` is set (col, delay), dedup state is watermark-bounded.
   */
  def ingest(names: DataFrame, lookup: DataFrame,
             watermarkTs: Option[(String, String)] = None): DataFrame = {
    val deduped = watermarkTs match {
      case Some((tsCol, delay)) =>
        names.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark("item_name")
      case None => names.dropDuplicates("item_name")
    }
    deduped
      .join(lookup, Seq("item_name"), "left")
      .filter(col("data").isNotNull && col("data") =!= "[]")
  }

  /** Number of hash buckets the upsert store is directory-partitioned into. */
  val DefaultStoreBuckets = 16

  /**
   * A9: last-write-wins keyed upsert of one micro-batch into a parquet store — the
   * Cassandra PK insert semantics (consume_items.py:50-58 of the reference).
   *
   * The store is directory-partitioned by `__bucket = pmod(hash(keys), numBuckets)`,
   * so a micro-batch merges ONLY the buckets its keys land in: read touched bucket
   * dirs, union the batch, re-rank latest-per-key, dynamic-partition-overwrite the
   * touched buckets. Cost is O(batch × bucket-size) per batch — the per-key cost
   * model of the reference's Cassandra PK store — instead of O(store) per batch.
   * Untouched buckets are never read or written.
   *
   * Durability: dynamic partition overwrite stages all new files under the output
   * path and swaps each partition directory at job commit (delete + rename per
   * touched bucket), so there is no window where the store exists only in executor
   * memory (the previous `localCheckpoint` + full overwrite had one). The residual
   * non-transactionality is a crash between a partition's delete and rename — the
   * same window every non-transactional table format has; a Delta/Iceberg store
   * closes it with a metadata swap, with this same bucketed layout underneath.
   */
  def upsertBatch(batch: DataFrame, path: String, keys: Seq[String],
                  ordering: Seq[Column], numBuckets: Int = DefaultStoreBuckets): Unit = {
    val spark = batch.sparkSession
    val bucketed = batch.withColumn("__bucket",
      pmod(hash(keys.map(col): _*), lit(numBuckets)))
    // Partition pruning metadata, not data: at most `numBuckets` small integers.
    val touched = bucketed.select("__bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existingDirs = touched.map(b => new org.apache.hadoop.fs.Path(path, s"__bucket=$b"))
      .filter(fs.exists(_)).map(_.toString)
    val merged =
      if (existingDirs.isEmpty) Relational.latestPerKey(bucketed, keys, ordering)
      else {
        // basePath keeps the __bucket partition column; root paths are the bucket
        // subdirectories, so the overwrite below never targets a path being read.
        val old = spark.read.option("basePath", path).parquet(existingDirs: _*)
        Relational.latestPerKey(old.unionByName(bucketed), keys, ordering)
      }
    merged
      .repartition(col("__bucket"))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket")
      .mode("overwrite")
      .parquet(path)
  }

  /** Read the upsert store back without its internal bucketing column. */
  def readStore(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("__bucket")

  /** A9 as a streaming sink: foreachBatch keyed upsert. */
  def upsertSink(stream: DataFrame, path: String, keys: Seq[String],
                 ordering: Seq[Column],
                 numBuckets: Int = DefaultStoreBuckets): DataStreamWriter[Row] =
    stream.writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatch(batch, path, keys, ordering, numBuckets)
      }

  /** B10: watermarked tumbling-window aggregation over an event stream. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** B11: watermarked session windows (30-min gap) per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /**
   * A22+A24 batch-cadence parity: run a streaming query over a file source with
   * Trigger.AvailableNow — processes exactly the unseen input (checkpoint-tracked),
   * replacing the reference's cron + tombstone-UPDATE incremental consumption with
   * an idempotent, atomic contract.
   */
  def availableNowTrigger: Trigger = Trigger.AvailableNow()
}
