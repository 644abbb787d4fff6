package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into Spark's `private[sql]` Column <-> Expression converters, the
 * standard pattern for extension libraries that contribute native Catalyst
 * expressions (Spark 4 split Column off to a ColumnNode API; classic conversions live
 * behind `private[sql]`). Kept to exactly two forwarders — everything else in graft
 * uses only the public API.
 */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a custom logical node as a DataFrame (the `Dataset.ofRows` every
    * extension library with whole-operator plans needs; `private[sql]`). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Analyzed logical plan of a frame (attribute-resolved, safe to embed as a
    * child of a custom node). */
  def analyzed(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Catalyst predicate -> V1 `Filter` translation (`protected[sql]` on
    * DataSourceStrategy) — what lets maintenance ops reuse the scan's
    * manifest-pruning layers on a user-supplied SQL predicate. */
  def translateFilter(e: Expression): Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)

  /** Idempotently add a planner strategy to a running session — the runtime
    * twin of `SparkSessionExtensions.injectPlannerStrategy` for sessions built
    * without `spark.sql.extensions`. */
  def addStrategy(spark: SparkSession, s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cls = spark.asInstanceOf[classic.SparkSession]
    if (!cls.experimental.extraStrategies.contains(s))
      cls.experimental.extraStrategies = s +: cls.experimental.extraStrategies
  }

  /** Idempotently add an optimizer rule to a running session — the runtime
    * twin of `SparkSessionExtensions.injectOptimizerRule`. NOTE the batch
    * placement differs: extension-injected rules run inside the operator
    * optimization fixpoint (pre scan pushdown, seeing `DataSourceV2Relation`),
    * while `extraOptimizations` run in the terminal "User Provided Optimizers"
    * batch (post pushdown, seeing `DataSourceV2ScanRelation`) — rules attached
    * here must handle both node vintages. */
  def addOptimization(spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val cls = spark.asInstanceOf[classic.SparkSession]
    if (!cls.experimental.extraOptimizations.contains(r))
      cls.experimental.extraOptimizations = r +: cls.experimental.extraOptimizations
  }
}
