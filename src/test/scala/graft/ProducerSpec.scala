package graft

import graft.streaming.Producer
import org.apache.spark.sql.functions._

/** Producer path (A1-A3): deterministic name generation + stateful dedup. */
class ProducerSpec extends GraftSuite {
  import spark.implicits._

  test("nameFor is deterministic and collides across ticks (feeding dedup)") {
    val names = spark.range(0, 200).select(Producer.nameFor(col("id")).as("n"))
    val distinct = names.distinct().count()
    assert(distinct > 10 && distinct < 200) // collisions exist, variety exists
    val again = spark.range(0, 200).select(Producer.nameFor(col("id")).as("n"))
    assert(names.except(again).count() === 0)
  }

  test("dedupNames drops repeats across micro-batches") {
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String)]
    val q = Producer.dedupNames(in.toDF.toDF("ts", "item_name"))
      .writeStream.format("memory").queryName("prod_t").outputMode("append").start()
    try {
      in.addData((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "roasted kimchi"))
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), "roasted kimchi"),
        (java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), "braised lentil"))
      q.processAllAvailable()
      val out = spark.table("prod_t").select("item_name").as[String].collect().sorted
      assert(out.toSeq === Seq("braised lentil", "roasted kimchi"))
    } finally q.stop()
  }

  test("rate-source plan wires generator onto the stream (A1 shape)") {
    val df = Producer.nameStream(spark, 5)
    assert(df.isStreaming)
    assert(df.columns.toSeq === Seq("ts", "item_name"))
  }
}
