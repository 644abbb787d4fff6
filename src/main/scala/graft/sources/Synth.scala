package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * `graft-synth`: a DataSource V2 batch source that SYNTHESIZES a deterministic
 * document-metadata table from pure id arithmetic — the reference's generator
 * posture (producer/produce_items.py:15-27 invents items from nothing) re-expressed
 * as a first-class Spark source instead of a driver loop.
 *
 * Why this matters at 100 TB: a synthesis source has ZERO input IO and scales to any
 * requested size by splitting the id range — each of the `parts` input partitions
 * generates independently on its executor, so cluster width is the only limit.
 * It is also the honest way to benchmark downstream operators without a storage
 * bottleneck in front of them.
 *
 * Spark-native integration, all three contracts real and pinned in PlanSpec:
 *   - column pruning (`SupportsPushDownRequiredColumns`): only requested columns
 *     are computed per row;
 *   - partition pruning via filter pushdown (`SupportsPushDownFilters`): doc_id
 *     range predicates drop whole id-range splits at planning time. All filters
 *     are returned as residuals (Spark re-applies them row-level), so pruning is
 *     purely an optimization and can never change results;
 *   - statistics (`SupportsReportStatistics`): row count + byte size AFTER
 *     pruning, so the optimizer can e.g. pick a broadcast join when a tight id
 *     range makes the synthesized side small.
 *
 * Every column is integer arithmetic or a small CASE over id — no RNG, no floats —
 * so an external engine (the DuckDB oracle) can predict the full content from
 * `range(rows)`.
 */
class SynthProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Synth.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "100000").toLong,
      properties.getOrDefault("parts", "16").toInt)
}

object Synth {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("week", LongType, nullable = false)))

  private val langs = Array("en", "fr", "de", "es", "pt")

  /** Per-column generator, resolved ONCE per reader — the name dispatch must not
    * run per row in the generation hot loop. Values are overflow-free (id < 2^31
    * in practice, constants small) so DuckDB's widened integer arithmetic
    * computes the identical result. */
  def gen(name: String): Long => Any = name match {
    case "doc_id"   => id => id
    case "lang"     => id => UTF8String.fromString(langs((id % 5).toInt))
    case "source"   => id => UTF8String.fromString("src_" + id % 7)
    case "n_tokens" => id => ((id % 1000003L) * 31 + 7) % 997
    case "week"     => id => id / 7000
  }
}

class SynthTable(rows: Long, parts: Int) extends Table with SupportsRead {
  // Validate at table resolution, not deep in split math: parts <= 0 would
  // otherwise yield an EMPTY scan (0 until -4 — silent wrong result) or a
  // raw division-by-zero; negative rows likewise reads as empty silently.
  require(parts > 0, s"graft-synth: parts must be positive, got $parts")
  require(rows >= 0, s"graft-synth: rows must be non-negative, got $rows")
  override def name(): String = s"graft-synth($rows rows, $parts parts)"
  override def schema(): StructType = Synth.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, parts)
}

class SynthScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = Synth.schema
  private var pushed: Array[Filter] = Array.empty
  // Tight id bounds accumulated from every doc_id range predicate; [lo, hi).
  private var lo = 0L
  private var hi = Long.MaxValue

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Values arrive boxed (java.lang.Long after the LongType cast, but be
    // liberal: any integral Number works — a missed match only costs pruning).
    // Saturating +1: `doc_id <= Long.MaxValue` would otherwise wrap hi to
    // Long.MinValue and prune EVERY split — the one way the "pruning can never
    // change results" invariant could break, since residual re-apply cannot
    // resurrect a dropped split.
    def inc(v: Long): Long = if (v == Long.MaxValue) Long.MaxValue else v + 1
    pushed = filters.filter {
      case GreaterThanOrEqual("doc_id", v: Number) => lo = math.max(lo, v.longValue); true
      case GreaterThan("doc_id", v: Number)        => lo = math.max(lo, inc(v.longValue)); true
      case LessThan("doc_id", v: Number)           => hi = math.min(hi, v.longValue); true
      case LessThanOrEqual("doc_id", v: Number)    => hi = math.min(hi, inc(v.longValue)); true
      case EqualTo("doc_id", v: Number)            =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, inc(v.longValue)); true
      case _ => false
    }
    // Return EVERYTHING as residual: the bounds only prune whole splits; Spark
    // re-applies each predicate row-level, so a bound bug can cost rows only if
    // it drops a split that intersects [lo, hi) — and splits are dropped strictly
    // by emptiness of intersection.
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new SynthScan(rows, parts, required, lo, hi)
}

class SynthScan(rows: Long, parts: Int, required: StructType, lo: Long, hi: Long)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String):
      streaming.MicroBatchStream = new SynthMicroBatchStream(rows, parts, required)
  // Shows up in .explain as the scan description — PlanSpec greps it.
  override def description(): String =
    s"graft-synth rows=$rows parts=$parts cols=${required.fieldNames.mkString(",")} " +
      s"bounds=[${math.max(0, lo)},${math.min(rows, hi)})"

  private def splits: Seq[(Long, Long)] = {
    val per = math.max(1L, rows / parts)
    (0 until parts).map { i =>
      val s = i * per
      val e = if (i == parts - 1) rows else math.min(rows, s + per)
      (s, e)
    }.filter { case (s, e) => s < e }
      // Partition pruning: a split wholly outside the pushed id bounds never runs.
      .filter { case (s, e) => e > lo && s < hi }
  }

  override def planInputPartitions(): Array[InputPartition] =
    splits.map { case (s, e) => SynthRange(s, e): InputPartition }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)

  override def estimateStatistics(): Statistics = new Statistics {
    private val n = splits.map { case (s, e) =>
      math.min(e, hi) - math.max(s, lo) }.map(math.max(0L, _)).sum
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(n * (required.size.toLong * 8 + 8))
    override def numRows(): util.OptionalLong = util.OptionalLong.of(n)
  }
}

case class SynthRange(start: Long, end: Long) extends InputPartition

/**
 * Streaming read path: the id sequence as an offset-tracked micro-batch source —
 * the reference's rate-limited producer (produce_items.py:48-66) with REAL
 * recovery semantics: the committed offset (a plain id high-watermark, serialized
 * as JSON) fully determines the next batch, so a restart from the checkpoint
 * re-synthesizes exactly the uncommitted suffix and nothing else. Each micro-batch
 * emits up to `rows/parts` ids (one split's worth) until the configured `rows` are
 * exhausted — with AvailableNow the stream drains in ~`parts` batches and the
 * union of all batches is EXACTLY the batch-mode table (pinned in SourcesSpec).
 */
class SynthMicroBatchStream(rows: Long, parts: Int, required: StructType)
    extends streaming.MicroBatchStream with streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}
  case class SynthOffset(id: Long) extends Offset {
    override def json(): String = s"""{"id":$id}"""
  }
  private val batchSize = math.max(1L, rows / parts)
  // Captured once when an AvailableNow run starts (the SupportsTriggerAvailableNow
  // contract): the drain target is frozen so the run terminates even if `rows`
  // were a moving head. For synthesis the head is already static.
  private var drainEnd: Long = rows

  override def initialOffset(): Offset = SynthOffset(0L)
  override def latestOffset(): Offset = SynthOffset(rows)
  override def reportLatestOffset(): Offset = SynthOffset(rows)
  override def prepareForTriggerAvailableNow(): Unit = { drainEnd = rows }
  // Admission control IS the producer's rate limit (A10): each micro-batch
  // admits at most one split's worth of ids, so AvailableNow drains the table
  // in ~`parts` paced batches instead of one monolith.
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchSize)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SynthOffset].id
    // Honor the limit Spark actually passes: Trigger.Once hands
    // ReadLimit.allAvailable() (NOT this source's default maxRows limit) and
    // runs exactly ONE batch — stepping by batchSize there would silently
    // truncate the stream to rows/parts ids and report success. All-available
    // means "to the head, in this batch"; planInputPartitions still splits
    // the range into per-split units, so parallelism is unchanged.
    val step = limit match {
      case m: ReadMaxRows => math.max(1L, m.maxRows())
      case _: org.apache.spark.sql.connector.read.streaming.ReadAllAvailable =>
        math.max(1L, drainEnd - s)
      case _ => batchSize
    }
    SynthOffset(math.min(drainEnd, s + step))
  }
  override def deserializeOffset(json: String): Offset =
    SynthOffset(json.replaceAll("[^0-9]", "").toLong)
  // Synthesis is pure arithmetic: nothing to clean up or retain per offset.
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SynthOffset].id
    val e = end.asInstanceOf[SynthOffset].id
    // One id-range split per micro-batch unit, same generation code as batch.
    (s until e by batchSize)
      .map(b => SynthRange(b, math.min(e, b + batchSize)): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)
}

class SynthReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val SynthRange(start, end) = partition
    new PartitionReader[InternalRow] {
      // Column dispatch resolved once; get() does one array fill per row.
      // (A fresh array per row — Spark may buffer rows, so no backing reuse.)
      private val gens = cols.map(Synth.gen)
      private var id = start - 1
      override def next(): Boolean = { id += 1; id < end }
      override def get(): InternalRow = {
        val arr = new Array[Any](gens.length)
        var i = 0
        while (i < gens.length) { arr(i) = gens(i)(id); i += 1 }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(arr)
      }
      override def close(): Unit = ()
    }
  }
}
