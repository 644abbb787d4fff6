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

  /**
   * A9: last-write-wins keyed upsert of one micro-batch into a parquet store — the
   * Cassandra PK insert semantics. `localCheckpoint` materializes the merge before
   * the overwrite so the plan never reads the files it is replacing (a transactional
   * table format does this natively at cluster scale).
   */
  def upsertBatch(batch: DataFrame, path: String, keys: Seq[String],
                  ordering: Seq[Column]): Unit = {
    val spark = batch.sparkSession
    // Only a missing store path means "first batch". Any other read failure
    // (corrupt footer, transient FS error) must propagate — treating it as an empty
    // store would silently overwrite and lose every previously upserted key.
    val existing =
      try Some(spark.read.parquet(path)) catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PATH_NOT_FOUND") ||
              e.getMessage.contains("Path does not exist") => None
      }
    val merged = existing match {
      case Some(old) => Relational.latestPerKey(old.unionByName(batch), keys, ordering)
      case None      => Relational.latestPerKey(batch, keys, ordering)
    }
    merged.localCheckpoint(true).write.mode("overwrite").parquet(path)
  }

  /** A9 as a streaming sink: foreachBatch keyed upsert. */
  def upsertSink(stream: DataFrame, path: String, keys: Seq[String],
                 ordering: Seq[Column]): DataStreamWriter[Row] =
    stream.writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatch(batch, path, keys, ordering)
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
