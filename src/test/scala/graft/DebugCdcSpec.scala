package graft

import org.apache.spark.sql.functions._

class DebugCdcSpec extends GraftSuite {
  test("cdc apply phase timing") {
    val s = spark; val d = "/root/testdata/sf0.01"
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"PHASE $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // run twice: first pays fixture build
    (1 to 2).foreach { round =>
      println(s"=== ROUND $round ===")
      t("total") {
        val fn = SparkEntry.queries("q_catalog_cdc_apply")
        fn(s, d).count()
      }
    }
  }
}
