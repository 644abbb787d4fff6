package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Relational

/**
 * Planted measurement for the custom TopKPerKey operator (DESIGN §4; not part of
 * the driver bench): top-10 per key over a 20M-row frame with 8 keys — the
 * "top-k per event type / tenant / country" dashboard shape. Compares:
 *   1. window row_number() <= k   — must shuffle all 20M rows to rank them
 *   2. Relational.topKPerGroupNative — map-side partial caps the exchange at
 *      keys*k*partitions rows (here <= 8*10*32 = 2,560)
 * Prints one line per variant plus a checksum proving both compute the same
 * top-k set. Run: `sbt "runMain graft.TopKBench"`.
 */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = 20000000L
    val df = spark.range(n).select(
        col("id"),
        (col("id") % 8).cast("string").as("k"),
        // deterministic pseudo-random score; unique (score, id) total order
        pmod(col("id") * 2654435761L, lit(1000000007L)).as("score"))
      .repartition(32)
      .persist()
    df.count() // materialize input so neither variant pays the generation

    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val winSum = time("window row_number <= 10") {
      Relational.topKPerGroup(df, Seq("k"),
          Seq(col("score").desc, col("id")), 10)
        .agg(sum(col("id")), sum(col("score"))).as[(Long, Long)].first()
    }
    val natSum = time("custom TopKPerKey operator") {
      Relational.topKPerGroupNative(df, Seq(col("k")),
          Seq(col("score").desc, col("id")), 10)
        .agg(sum(col("id")), sum(col("score"))).as[(Long, Long)].first()
    }
    println(s"checksums window=$winSum native=$natSum equal=${winSum == natSum}")
    require(winSum == natSum, "variants disagree")
    spark.stop()
  }
}
