package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The reference's batch enrichment pipeline (SURVEY.md §2 Part A, A12-A21) as
 * composable DataFrame transforms: raw keyed store -> JSON parse + validity filter ->
 * array-head flatten -> per-key defaults -> deterministic text enrichment ->
 * last-write-wins upsert view -> 17-column analytics schema.
 *
 * Reference anchors: items_raw DDL consumer/consume_items.py:50-58; JSON
 * parse/flatten/defaults dagster_project/pipeline.py:26-39,49-58,115-125; LLM prompt
 * templates dagster_project/pipeline.py:60-63 (replaced by deterministic templating —
 * same inputs: item_name + calories); items_enriched DDL + stringified ingestion_ts
 * dagster_project/pipeline.py:86-114.
 *
 * Everything is schema-declared (`from_json` with an explicit schema, never
 * inference) and row-parallel: the reference's driver-memory list-of-dicts becomes a
 * streaming-friendly columnar plan.
 */
object NutritionPipeline {

  /** The Nutrition-API payload: a JSON *array* of objects; only the head is used. */
  val nutrientFields: Seq[String] = Seq(
    "calories", "serving_size_g", "fat_total_g", "fat_saturated_g", "protein_g",
    "sodium_mg", "potassium_mg", "cholesterol_mg", "carbohydrates_total_g",
    "fiber_g", "sugar_g")

  val payloadSchema: ArrayType = ArrayType(StructType(
    StructField("name", StringType) +: nutrientFields.map(f => StructField(f, DoubleType))))

  /**
   * A14+A15: parse the opaque `data` text column, drop nulls / empties / malformed
   * rows (from_json yields null on malformed — the same client-side drop the
   * reference does in Python), keep the array head.
   */
  def parseValid(raw: DataFrame): DataFrame = {
    val parsed = raw.withColumn("__parsed", from_json(col("data"), payloadSchema))
    parsed
      .filter(col("__parsed").isNotNull && size(col("__parsed")) > 0)
      .withColumn("__head", element_at(col("__parsed"), 1))
      .drop("__parsed")
  }

  /**
   * A16+A17: flatten the head struct onto the row (skipping `name`, as the reference
   * does) with `coalesce(col, 0.0)` defaults for missing nutrient keys.
   */
  def flattenWithDefaults(parsed: DataFrame): DataFrame =
    nutrientFields.foldLeft(parsed) { (df, f) =>
      df.withColumn(f, coalesce(col(s"__head.$f"), lit(0.0)))
    }.drop("__head")

  /**
   * A18: deterministic text enrichment. The reference issues 4 LLM prompts per row
   * keyed on (item_name, calories); here the same inputs feed pure string templates —
   * codegen'd columns, no UDF, trivially parallel. `pairingsPick` varies by calories
   * so downstream term-frequency analytics (A28) stay meaningful.
   */
  def enrich(df: DataFrame): DataFrame = {
    val cal = col("calories").cast("long")
    val pairing = when(cal % 5 === 0, "Polenta")
      .when(cal % 5 === 1, "Salad")
      .when(cal % 5 === 2, "Pasta")
      .when(cal % 5 === 3, "Rice")
      .otherwise("Bread")
    df.withColumn("openai_description",
        concat(lit("Description of "), col("item_name"), lit(" ("), cal, lit(" kcal): a distinctive dish.")))
      .withColumn("openai_best_pairings",
        concat(lit("Best pairings for "), col("item_name"), lit(": "), pairing, lit(".")))
      .withColumn("openai_health_impact",
        concat(lit("Health impact of "), col("item_name"), lit(": balanced at "), cal, lit(" kcal.")))
      .withColumn("openai_preparation_tips",
        concat(lit("Preparation tips for "), col("item_name"), lit(": cook gently.")))
  }

  /**
   * A20+A21 load shape: the 17-column items_enriched schema, replicating the
   * reference's deliberate ingestion_ts stringification (pipeline.py:114).
   */
  def toEnrichedSchema(df: DataFrame): DataFrame =
    df.select(
      (Seq(col("item_name"), col("ingestion_ts").cast("string").as("ingestion_ts")) ++
        nutrientFields.map(f => col(f).cast("double").as(f)) ++
        Seq(col("openai_description"), col("openai_best_pairings"),
          col("openai_health_impact"), col("openai_preparation_tips"))): _*)

  /**
   * Full batch path A12-A21 over a raw keyed store (item_name, ingestion_ts, data):
   * parse -> flatten -> enrich -> upsert view (last write wins per item_name — the
   * Cassandra PK semantics) -> enriched schema.
   */
  def enrichmentPipeline(itemsRaw: DataFrame): DataFrame = {
    // NOT spread (r16, measured): repartitioning the single-partition raw
    // store to parallelize from_json shuffles the JSON payload strings to
    // save ~0.2 thread-s of linear parsing — the isolated best-of-10 A/B
    // read every pipeline query +0.17..0.29 s (exchange + sort-before-
    // repartition + 32-task dispatch exceed the parse). Unlike the kept
    // spreads (entropy's split-heavy agg, edit-distance's quadratic verify),
    // a linear parse does not pay for moving its own input.
    val flat = flattenWithDefaults(parseValid(itemsRaw))
    val enriched = enrich(flat)
    val latest = Relational.latestPerKey(enriched, Seq("item_name"),
      Seq(col("ingestion_ts").desc, col("data").desc))
    toEnrichedSchema(latest)
  }
}
