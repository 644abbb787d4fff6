package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout operators: Z-order (Morton) clustering for multi-dimensional file
 * pruning — the OPTIMIZE ZORDER BY of Delta/Iceberg, as a pure column expression
 * plus a write composition.
 *
 * Why it matters at 100 TB: a table range-clustered on ONE key prunes scans on
 * that key only; queries filtering the second dimension read everything. The
 * Morton key interleaves the bits of two dimensions, so any contiguous key range
 * is a quadtree tile — bounded in BOTH dimensions — and parquet min/max stats
 * prune files for filters on either column. The key is a handful of codegen'd
 * bitwise ops per row; the layout cost is one range shuffle at write time.
 */
object Layout {

  /** (shift, mask) ladder spreading a 16-bit value's bits to even positions:
    * classic magic-number bit spreading — x = (x | x<<8) & 0x00FF00FF, etc. */
  private val SpreadLadder = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Low 16 bits of `c` spread to the even bit positions of a 32-bit value.
    * Values wider than 16 bits are masked first (document the truncation at the
    * call site if the domain can exceed 65535 — for layout purposes a wrapped
    * high key only costs locality, never correctness). */
  def spread16(c: Column): Column =
    SpreadLadder.foldLeft(c.cast("long").bitwiseAND(lit(65535L))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton key interleaving x (even bits) and y (odd bits): bit i of x
    * lands at position 2i, bit i of y at 2i+1. Pure codegen'd expression. */
  def zorderKey(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Z-order clustered write: range-partition + sort on the Morton key so each
    * file owns a quadtree tile of (x, y) space and parquet stats prune on both
    * columns. The key is layout-only and DROPPED before write (as in Delta's
    * OPTIMIZE ZORDER, the table schema is unchanged); dropping after the sort
    * is a projection, so the partitioning and in-file order survive. */
  def zorderWrite(df: DataFrame, path: String, x: Column, y: Column,
                  numFiles: Option[Int] = None): Unit = {
    // withColumn would silently REPLACE a pre-existing user column of the
    // working name, and the final drop would then delete the user's data
    // from the written output — refuse loudly instead.
    require(!df.columns.contains("__zkey"),
      "input already carries a __zkey column — rename it before zorderWrite")
    val keyed = df.withColumn("__zkey", zorderKey(x, y))
    val repart = numFiles match {
      case Some(n) => keyed.repartitionByRange(n, col("__zkey"))
      case None    => keyed.repartitionByRange(col("__zkey"))
    }
    repart.sortWithinPartitions(col("__zkey")).drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }

  /**
   * Small-file compaction (the OPTIMIZE of Delta/Iceberg, minus the table format):
   * rewrite a parquet directory into `ceil(totalBytes / targetBytes)` files.
   * Small files are the silent 100 TB killer — a 1 M-file table spends more time
   * in scheduler/namenode round trips than in I/O, and every downstream scan pays
   * it again. Compaction here is a shuffle-free `coalesce` (pack existing
   * partitions; no reordering needed — layout-preserving), written to a fresh
   * directory the caller swaps in: compaction must never rewrite in place, or a
   * mid-job failure destroys the only copy.
   *
   * Returns (filesBefore, filesAfter, bytesBefore) for the caller's audit log.
   */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, targetBytes: Long): (Int, Int, Long) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val hconf = spark.sparkContext.hadoopConfiguration
    val in = new org.apache.hadoop.fs.Path(inPath)
    val fs = in.getFileSystem(hconf)
    // Enforce the never-in-place contract on QUALIFIED paths (trailing slashes,
    // relative paths, and scheme aliases must not slip past it): overwrite mode
    // deletes outPath before the read job runs.
    val inQ = fs.makeQualified(in)
    val outQ = fs.makeQualified(new org.apache.hadoop.fs.Path(outPath))
    require(inQ != outQ, s"compact must never rewrite in place: $inQ")
    // Ancestry is in-place too: an output NESTED inside the input pollutes
    // the source table with a duplicate copy (double-counted reads), and an
    // input nested inside the output would be deleted by overwrite mode.
    def isAncestor(a: org.apache.hadoop.fs.Path,
        b: org.apache.hadoop.fs.Path): Boolean =
      Iterator.iterate(b)(_.getParent).takeWhile(_ != null).contains(a)
    require(!isAncestor(inQ, outQ),
      s"compact output $outQ is inside the input $inQ — reads of the input " +
        "would double-count the compacted copy")
    require(!isAncestor(outQ, inQ),
      s"compact input $inQ is inside the output $outQ — overwrite mode " +
        "would delete the source before reading it")
    // Recursive listing: partitioned tables keep their files under key=val/
    // subdirectories; a top-level listing would size them at zero.
    def parquetFiles(root: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet")) out += s
      }
      out.result()
    }
    val parts = parquetFiles(in)
    // FLAT directories only: spark.read.parquet discovers key=val/
    // subdirectories as (type-INFERRED) partition columns and the rewrite
    // would emit an unpartitioned directory — silently flattening the
    // layout (downstream pruning gone) and potentially coercing partition
    // values ('00123' -> 123). Compact each partition directory separately;
    // this helper refuses rather than destroy a layout it cannot preserve.
    val nested = parts.exists(p => fs.makeQualified(p.getPath.getParent) != inQ)
    require(!nested,
      s"compact supports FLAT parquet directories only; $inQ holds files in " +
        "subdirectories (a partitioned layout) — compact per partition " +
        "directory instead, or the partitioning would be silently flattened")
    val bytes = parts.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath).coalesce(nOut)
      .write.mode("overwrite").parquet(outPath)
    val outFiles = parquetFiles(outQ).length
    (parts.length, outFiles, bytes)
  }
}
