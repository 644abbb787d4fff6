package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Relational

/**
 * Planted-skew measurement for DESIGN.md §6 (not part of the driver bench): one
 * hot key owns 50% of a 10M-row fact side (every 2nd row) joined (shuffle join —
 * broadcast disabled) against a 100k-key dim. Compares:
 *   1. plain sort-merge join, AQE off       — one straggler reducer gets 1M rows
 *   2. `Relational.saltedJoin` (8), AQE off — the hot key spreads over 8 reducers
 *   3. plain join, AQE skew-split on        — runtime re-plan splits the partition
 * Prints one line per variant plus a checksum proving all three compute the
 * same join. Run: `sbt "runMain graft.SkewBench"`.
 */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 10000000L
    val hotShare = 2L // every 2nd row -> key 0 (50%)
    val keySpace = 100000L
    val large = spark.range(n).select(
      when(pmod(col("id"), lit(hotShare)) === 0, lit(0L))
        .otherwise(pmod(col("id"), lit(keySpace)) + 1).as("k"),
      col("id").as("payload"))
    val right = spark.range(keySpace + 1).select(
      col("id").as("k"), (col("id") * 7).as("v"))

    // The cluster-relevant metric is the LONGEST TASK (the straggler sets the
    // stage's wall-clock on a real cluster; local[8] wall-clock dilutes it by
    // running other tasks concurrently on free cores).
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        maxTaskMs.updateAndGet(m => math.max(m, t.taskInfo.duration))
    })

    def run(label: String, aqe: Boolean)(join: => org.apache.spark.sql.DataFrame): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      // Local-scale data: lower the skew thresholds so AQE's detector sees the
      // planted 1M-row partition the way it would see a multi-GB one at 100 TB.
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
      maxTaskMs.set(0)
      val t0 = System.nanoTime()
      val checksum = join.agg(sum(col("payload") + col("v"))).head.getLong(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[skewbench] $label%-32s checksum=$checksum dt=$dt%6.2f s " +
        f"maxTask=${maxTaskMs.get()}%5d ms")
    }

    // Warm-up (JIT + range codegen), not reported.
    large.join(right, "k").agg(count(lit(1))).head

    run("plain join, AQE off", aqe = false)(large.join(right, "k"))
    run("saltedJoin(8), AQE off", aqe = false)(
      Relational.saltedJoin(large, right, Seq("k"), 8))
    run("plain join, AQE skew-split on", aqe = true)(large.join(right, "k"))

    spark.stop()
  }
}
