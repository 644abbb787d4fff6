package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/**
 * Driver contract (see SURVEY.md §7): `entry` is the smoke-checked flagship query;
 * `queries` maps one name per implemented operator family (SURVEY.md §2) to a
 * DataFrame-producing function; `oracleSql` carries the DuckDB-equivalent ANSI SQL for
 * every hash-verified query (entries absent here get a weaker rows-only check).
 */
object SparkEntry {

  /** Flagship (SURVEY §7 M0 shape): events JSON parse (A14/B15) -> validity filter
    * (A7) -> dimension join (B1) -> grouped agg (A25/B4) -> order+limit (A26/B7).
    * Delegates to the hash-verified q_flagship; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EventQueries.queries("q_flagship")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    StarQueries.queries ++ EventQueries.queries ++ TextQueries.queries ++
      VectorQueries.queries ++ PipelineQueries.queries

  def oracleSql: Map[String, String] =
    StarQueries.oracle ++ EventQueries.oracle ++ TextQueries.oracle ++
      VectorQueries.oracle ++ PipelineQueries.oracle
}
