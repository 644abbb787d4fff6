package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Relational

/**
 * Planted measurement for the binned range join (DESIGN §4; not part of the
 * driver bench). Two stages:
 *
 *   1. CONTRAST (100k points × 10k intervals — small enough that the naive
 *      plan still terminates): bare theta join = BroadcastNestedLoopJoin doing
 *      1e9 predicate evaluations, vs `Relational.rangeJoinBinned` doing one
 *      equi shuffle. Checksum proves identical results.
 *   2. SCALE (20M points × 2M intervals): binned only — the naive plan is 2e11
 *      pairs and does not terminate in useful time; the binned join's work is
 *      linear in input + output (~40M matches here) and completes in seconds.
 *
 * Run: `sbt "runMain graft.RangeJoinBench"`.
 */
object RangeJoinBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val axis = 1000000000L // value axis [0, 1e9)

    // Deterministic pseudo-uniform points and ~1000-wide intervals.
    def points(n: Long) = spark.range(n).select(
        col("id").as("pid"),
        pmod(col("id") * 2654435761L, lit(axis)).cast("double").as("x"))
      .repartition(32).persist()
    def intervals(m: Long) = spark.range(m).select(
        col("id").as("iid"),
        pmod(col("id") * 40503L + 7L, lit(axis)).cast("double").as("lo"))
      .withColumn("hi", col("lo") + 500.0 + pmod(col("iid") * 97L, lit(1000L)).cast("double"))
      .repartition(32).persist()

    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) =
      df.agg(count(lit(1)), sum(col("pid")), sum(col("iid")))
        .as[(Long, Long, Long)].first()

    // Stage 1: contrast at BNLJ-survivable size (override via args: nPoints mIntervals).
    val (n1, m1) =
      if (args.length >= 2) (args(0).toLong, args(1).toLong) else (100000L, 10000L)
    val p1 = points(n1);   p1.count()
    val i1 = intervals(m1); i1.count()
    val naive = time(f"naive theta join (BNLJ, ${(n1 * m1).toDouble}%.1e cmp)") {
      checksum(p1.join(i1, col("x") >= col("lo") && col("x") < col("hi")))
    }
    val binned = time("rangeJoinBinned (equi shuffle)") {
      checksum(Relational.rangeJoinBinned(p1, "x", i1, "lo", "hi", binWidth = 1000.0))
    }
    println(s"checksums naive=$naive binned=$binned equal=${naive == binned}")
    require(naive == binned, "variants disagree")

    // Stage 2: big-big scale the naive plan cannot touch (2e11 pairs).
    val p2 = points(20000000L);  p2.count()
    val i2 = intervals(2000000L); i2.count()
    val big = time("rangeJoinBinned 20M x 2M") {
      checksum(Relational.rangeJoinBinned(p2, "x", i2, "lo", "hi", binWidth = 1000.0))
    }
    println(s"big-binned matches=${big._1}")
    spark.stop()
  }
}
