package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/**
 * The reference's producer side (SURVEY.md A1-A3): an LLM-generated item-name stream
 * at a fixed tick, deduplicated, published to a topic. Re-expressed as: `rate` source
 * (one row per tick, same cadence contract as produce_items.py's sleep loop) -> a
 * deterministic seeded name generator standing in for the LLM call -> stateful dedup
 * (A2's in-process `produced_items` set, but distributed and restart-safe) -> sink.
 *
 * The Kafka publish (A3) is a writeStream format swap (`toKafka`); tests use the
 * memory sink — no broker in this environment, and the sink choice does not change
 * the plan upstream.
 */
object Producer {

  private val adjectives = Seq(
    "roasted", "braised", "pickled", "smoked", "grilled", "candied", "spiced",
    "stuffed", "glazed", "fermented")
  private val nouns = Seq(
    "artichoke", "brisket", "couscous", "dumpling", "eggplant", "flatbread",
    "gnocchi", "halibut", "jackfruit", "kimchi", "lentil", "mackerel")

  /**
   * Deterministic name generator (the seeded stand-in for A1's LLM call): tick value
   * -> "adjective noun #collision". Collisions across ticks are intended — they feed
   * the dedup stage, mirroring the reference's retry-on-duplicate loop.
   */
  def nameFor(tick: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val a = element_at(array(adjectives.map(lit): _*), (tick % adjectives.size + 1).cast("int"))
    val n = element_at(array(nouns.map(lit): _*), ((tick / 7) % nouns.size + 1).cast("int"))
    concat(a, lit(" "), n)
  }

  /** A1: one generated item name per tick at `rowsPerSecond`. */
  def nameStream(spark: SparkSession, rowsPerSecond: Int = 1): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(col("timestamp").as("ts"), nameFor(col("value")).as("item_name"))

  /** A2: drop already-produced names (state-backed; watermark-bounded if
    * provided). The ONE watermark-or-not dedup policy — StreamingPipeline's
    * ingest delegates here rather than restating it. */
  def dedupNames(names: DataFrame, watermarkDelay: Option[String] = None,
                 tsCol: String = "ts"): DataFrame =
    watermarkDelay match {
      case Some(d) =>
        names.withWatermark(tsCol, d).dropDuplicatesWithinWatermark("item_name")
      case None => names.dropDuplicates("item_name")
    }

  /**
   * A3's wire projection, shared by every transport: the Kafka record shape
   * (value-serialized item name, the reference's `producer.send(value=...)` in
   * produce_items.py). Both `toKafka` and `toFileChannel` publish exactly this
   * projection, so the upstream plan is transport-independent by construction —
   * the sink `format(...)` is the only difference.
   */
  def toWire(names: DataFrame): DataFrame =
    names.select(col("item_name").cast("string").as("value"))

  /** A3: publish to Kafka (value-serialized), the reference's per-message flush
    * becoming micro-batch atomicity. Requires a reachable broker at runtime. */
  def toKafka(names: DataFrame, bootstrapServers: String, topic: String): DataStreamWriter[Row] =
    toWire(names)
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)

  /** A3 without a broker: the identical wire rows to a JSON file channel — a
    * durable, replayable, offset-tracked (file-listing) topic stand-in that the
    * consumer subscribes to via [[StreamingPipeline.fileChannel]]. Used for the
    * end-to-end topology test in this environment (no Kafka jars on the
    * classpath) and useful generally as a zero-infra local channel. */
  def toFileChannel(names: DataFrame, dir: String): DataStreamWriter[Row] =
    toWire(names).writeStream.format("json").option("path", dir)
}
