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

  /** Flagship: the reference's dashboard path (A25/A26) on the star schema — 5-way
    * join, broadcast dims, grouped agg, total order. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StarQueries.queries("q_join_star")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    StarQueries.queries ++ EventQueries.queries ++ TextQueries.queries ++
      VectorQueries.queries ++ PipelineQueries.queries

  def oracleSql: Map[String, String] =
    StarQueries.oracle ++ EventQueries.oracle ++ TextQueries.oracle ++
      VectorQueries.oracle ++ PipelineQueries.oracle
}
