package graft

import graft.operators.{NutritionPipeline, Relational}
import org.apache.spark.sql.functions._

/**
 * Part-A pipeline semantics on edge fixtures mirroring the reference's failure modes
 * (malformed JSON, empty array tombstones, missing nutrient keys, duplicate keys).
 */
class NutritionPipelineSpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val raw = Seq(
    // valid, all keys
    ("apple", ts("2024-01-01 00:00:00"),
      """[{"name":"apple","calories":52,"protein_g":0.3,"serving_size_g":100,"sodium_mg":1,"sugar_g":10.4}]"""),
    // valid, missing most keys -> defaults 0
    ("banana", ts("2024-01-01 00:00:01"), """[{"name":"banana","calories":89}]"""),
    // duplicate key, later ts -> must win
    ("apple", ts("2024-01-02 00:00:00"),
      """[{"name":"apple","calories":60,"protein_g":0.4,"serving_size_g":100}]"""),
    // tombstone (A22 processed marker)
    ("cherry", ts("2024-01-01 00:00:02"), "[]"),
    // malformed (A19 error-row skip)
    ("durian", ts("2024-01-01 00:00:03"), "{not json"),
    // null payload (A7 filter)
    ("elderberry", ts("2024-01-01 00:00:04"), null)
  ).toDF("item_name", "ingestion_ts", "data")

  test("parse drops tombstones, malformed, and null payloads") {
    val parsed = NutritionPipeline.parseValid(raw)
    assert(parsed.select("item_name").as[String].collect().toSet ===
      Set("apple", "banana"))
  }

  test("missing nutrient keys default to 0.0; present keys survive") {
    val flat = NutritionPipeline.flattenWithDefaults(NutritionPipeline.parseValid(raw))
    val banana = flat.filter(col("item_name") === "banana").collect().head
    assert(banana.getAs[Double]("calories") === 89.0)
    assert(banana.getAs[Double]("sodium_mg") === 0.0)
    assert(banana.getAs[Double]("protein_g") === 0.0)
  }

  test("upsert keeps last write per key (Cassandra PK semantics)") {
    val out = NutritionPipeline.enrichmentPipeline(raw)
    assert(out.count() === 2)
    val apple = out.filter(col("item_name") === "apple").collect().head
    assert(apple.getAs[Double]("calories") === 60.0) // the 2024-01-02 write
    assert(apple.getAs[String]("ingestion_ts") === "2024-01-02 00:00:00")
  }

  test("enrichment templates are deterministic functions of (name, calories)") {
    val out = NutritionPipeline.enrichmentPipeline(raw)
    val apple = out.filter(col("item_name") === "apple").collect().head
    assert(apple.getAs[String]("openai_description") ===
      "Description of apple (60 kcal): a distinctive dish.")
    assert(apple.getAs[String]("openai_best_pairings") ===
      "Best pairings for apple: Polenta.") // 60 % 5 == 0
  }

  test("17-column enriched schema with stringified ingestion_ts") {
    val out = NutritionPipeline.enrichmentPipeline(raw)
    assert(out.columns.length === 17)
    assert(out.schema("ingestion_ts").dataType.typeName === "string")
    assert(NutritionPipeline.nutrientFields.forall(
      f => out.schema(f).dataType.typeName === "double"))
  }

  test("property: JSON build -> parse -> flatten roundtrips every nutrient value") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val extraFields = NutritionPipeline.nutrientFields
      .filterNot(Set("calories", "protein_g", "serving_size_g"))
    val genRec = for {
      name <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(12))
      cal <- Gen.chooseNum(0, 900)
      protein <- Gen.chooseNum(0, 80)
      keep <- Gen.someOf(extraFields)
    } yield (name, cal, protein, keep.toSet)
    val prop = Prop.forAllNoShrink(Gen.listOfN(5, genRec)) { recs =>
      val rows = recs.zipWithIndex.map { case ((name, cal, protein, keep), i) =>
        val extras = keep.map(f => s""","$f":$i""").mkString
        (s"$name$i", ts(f"2024-01-01 00:00:${i % 60}%02d"),
          s"""[{"name":"$name","calories":$cal,"protein_g":$protein$extras}]""")
      }
      val flat = NutritionPipeline.flattenWithDefaults(
        NutritionPipeline.parseValid(rows.toDF("item_name", "ingestion_ts", "data")))
        .collect().map(r => r.getAs[String]("item_name") -> r).toMap
      recs.zipWithIndex.forall { case ((name, cal, protein, keep), i) =>
        val r = flat(s"$name$i")
        r.getAs[Double]("calories") == cal.toDouble &&
          r.getAs[Double]("protein_g") == protein.toDouble &&
          extraFields.forall { f =>
            r.getAs[Double](f) == (if (keep(f)) i.toDouble else 0.0)
          }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("incremental anti-join is idempotent: re-run consumes zero rows") {
    val processed = raw.select(col("item_name")).distinct()
    val rerun = Relational.incrementalAntiJoin(raw, processed, Seq("item_name"))
    assert(rerun.count() === 0)
    // and a partial processed set consumes exactly the complement
    val partial = Seq("apple").toDF("item_name")
    val rest = Relational.incrementalAntiJoin(raw, partial, Seq("item_name"))
    assert(rest.select("item_name").distinct().count() === 4)
  }
}
