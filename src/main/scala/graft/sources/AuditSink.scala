package graft.sources

import java.nio.charset.StandardCharsets
import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * `graft-audit`: a DataSource V2 batch SINK that exercises Spark's transactional
 * write protocol end to end — per-task `DataWriter`s emit `WriterCommitMessage`s,
 * and only the driver's `commit(...)` publishes a manifest, atomically
 * (temp file + rename), so a failed or speculative task can never leave a
 * half-written result visible. This is the commit discipline every real sink
 * (parquet committer, Delta, Iceberg) is built on, reduced to its observable core.
 *
 * What it writes: not the rows (that is parquet's job) but a content MANIFEST —
 * row count plus an ORDER- AND PARTITIONING-INVARIANT signature (a per-row 64-bit
 * FNV-1a hash of the canonical field rendering, SUMMED across rows, so any
 * repartitioning of the same multiset commits byte-identical metadata). The
 * pipeline use at 100 TB: a free data-integrity fingerprint on every materialized
 * stage, the same idea as q_table_checksum (B58) but attached to the WRITE path,
 * where it catches row loss between stages instead of after the fact.
 *
 * Reference anchor: the at-least-once commit posture of consumer/consume_items.py:83-87
 * (offsets committed only after processing) — here strengthened to atomic
 * all-or-nothing visibility.
 */
class AuditSinkProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-audit"
  // Write-only source: schema comes from the DataFrame being written.
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AuditTable(schema, properties.get("path"))
}

class AuditTable(writeSchema: StructType, path: String) extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "graft-audit requires option(\"path\", ...)")
  override def name(): String = s"graft-audit($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // Append and truncate-then-write commit the same manifest: the sink holds
      // one manifest per path, and publishing is atomic either way.
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        // Capture the SESSION Hadoop conf here (driver, active session): a
        // fresh Configuration() in commit() would drop spark.hadoop.* settings
        // (s3a credentials, nameservices) and publish to the wrong/unreachable
        // filesystem on a real cluster.
        override def toBatch: BatchWrite = new AuditBatchWrite(info.schema(), path,
          org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
      }
    }
}

case class AuditMessage(rows: Long, hashSum: Long) extends WriterCommitMessage

object AuditBatchWrite {
  /** Canonical-rendering scheme version stamped into every manifest. Bump
    * whenever the per-row rendering changes so committed fingerprints from
    * different schemes are never compared as if one dataset diverged. */
  val FingerprintVersion = 2
}

class AuditBatchWrite(schema: StructType, path: String,
    conf: org.apache.hadoop.conf.Configuration) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory(schema)

  // Driver-side commit: the ONLY place the manifest becomes visible, and it does
  // so via temp-file + rename — the atomic-publish idiom (rename is atomic on
  // HDFS and posix; object stores substitute a metadata PUT).
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.map { case AuditMessage(r, _) => r }.sum
    val hash = messages.map { case AuditMessage(_, h) => h }.sum
    // fingerprint_v VERSIONS the canonical-rendering scheme (v2 = length-
    // prefixed nested elements, 'N' null token; v1 manifests carry no field).
    // A cross-version comparison of content_hash on data with nulls/arrays/
    // maps/structs legitimately differs — readers check the version first so
    // a rendering-scheme change is distinguishable from real data corruption.
    val manifest =
      s"""{"rows":$rows,"content_hash":$hash,"n_tasks":${messages.length},""" +
        s""""fingerprint_v":${AuditBatchWrite.FingerprintVersion}}"""
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val tmp = new Path(dir, "_manifest.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(manifest.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val fin = new Path(dir, "manifest.json")
    // Atomic REPLACE, not delete-then-rename: a crash (or a concurrent
    // reader) between a delete and a rename would observe NO manifest at all
    // — the previously committed one destroyed, the new one unpublished,
    // breaking the sink's own all-or-nothing contract. FileContext.rename
    // with OVERWRITE is the atomic-replace primitive on HDFS and posix.
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(fin),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // Nothing was published (tasks only returned messages), so abort is a no-op
    // beyond dropping any stale temp file.
    val fs = new Path(path).getFileSystem(conf)
    fs.delete(new Path(path, "_manifest.json.tmp"), false)
  }
}

class AuditWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var hashSum = 0L
      private val types = schema.fields.map(_.dataType)

      // Canonical rendering per type: String.valueOf on raw catalyst values
      // is IDENTITY-based for Array[Byte]/ArrayData/MapData/InternalRow
      // ("[B@1a2b3c" differs per JVM run for equal bytes), which would make
      // the "run-invariant fingerprint" spuriously differ across reruns of
      // identical data. Binary renders as base64, arrays/structs recurse
      // element-wise, maps sort by rendered key (catalyst map order is
      // build-dependent). Every nested element is LENGTH-PREFIXED and NULL
      // renders as a distinct unprefixed token: bare delimiter-joining is
      // ambiguous — ["a,b"] and ["a","b"] would render identically, and a
      // NULL field would collide with a string equal to the null marker —
      // letting genuinely different datasets commit byte-identical
      // fingerprints, the exact corruption class the sink exists to catch.
      private def pfx(s: String): String = s.length + ":" + s
      private def render(v: Any, dt: org.apache.spark.sql.types.DataType): String = dt match {
        case org.apache.spark.sql.types.BinaryType =>
          java.util.Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]])
        case org.apache.spark.sql.types.ArrayType(et, _) =>
          val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          (0 until a.numElements()).map(i =>
            if (a.isNullAt(i)) "N" else pfx(render(a.get(i, et), et)))
            .mkString("[", ",", "]")
        case org.apache.spark.sql.types.MapType(kt, vt, _) =>
          val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
          val ks = m.keyArray(); val vs = m.valueArray()
          (0 until m.numElements()).map { i =>
            pfx(render(ks.get(i, kt), kt)) + "->" +
              (if (vs.isNullAt(i)) "N" else pfx(render(vs.get(i, vt), vt)))
          }.sorted.mkString("{", ",", "}")
        case st: StructType =>
          val r = v.asInstanceOf[InternalRow]
          st.fields.zipWithIndex.map { case (f, i) =>
            if (r.isNullAt(i)) "N" else pfx(render(r.get(i, f.dataType), f.dataType))
          }.mkString("(", ",", ")")
        case _ => String.valueOf(v)
      }

      // 64-bit FNV-1a over the canonical rendering of each field (length-
      // prefixed, NULL as a distinct token); summed across rows so the total
      // is invariant to row order and partitioning.
      override def write(row: InternalRow): Unit = {
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < types.length) {
          val s = if (row.isNullAt(i)) "N"
            else pfx(render(row.get(i, types(i)), types(i)))
          var j = 0
          while (j < s.length) { h ^= s.charAt(j); h *= 0x100000001b3L; j += 1 }
          h ^= 0x1f; h *= 0x100000001b3L // field separator
          i += 1
        }
        hashSum += h
        rows += 1
      }
      override def commit(): WriterCommitMessage = AuditMessage(rows, hashSum)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
