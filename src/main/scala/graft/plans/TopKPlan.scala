package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/**
 * Whole-operator custom plan: top-k rows per key with a MAP-SIDE PARTIAL phase —
 * the rung of the extension ladder above custom expressions (logical node +
 * planner strategy + physical operators, registered via SparkSessionExtensions
 * or `experimental.extraStrategies`).
 *
 * Why Spark's built-ins can't express this: `row_number() OVER (PARTITION BY k
 * ORDER BY o) <= n` must shuffle EVERY row to its key's reducer before any row
 * can be discarded, and `TakeOrderedAndProject` is global-only. For top-k *per
 * key* the algebra admits a partial aggregate — each map partition can keep at
 * most k rows per key it sees, because a row outside its partition-local top-k
 * can never enter the global top-k. With g distinct keys, the exchange carries
 * at most `g * k * numPartitions` rows instead of the full input: for the
 * dashboard shape (g small — "top 10 per event type / per country / per
 * tenant") that is the difference between shuffling 100 TB and shuffling
 * megabytes.
 *
 * Plan shape: `TopKPerKeyFinal(ClusteredDistribution) <- [Exchange inserted by
 * EnsureRequirements] <- TopKPerKeyPartial <- child`. Both phases run the same
 * bounded-heap algorithm (one `Ordering[InternalRow]` compiled by
 * `GenerateOrdering`, one UnsafeRow max-heap of size <= k per key), so memory is
 * O(keys-per-partition * k) regardless of input size. `ordering` must be a
 * total order (unique tiebreaker) for deterministic output.
 */
case class TopKPerKey(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
                      k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Shared bounded-heap kernel for both phases. */
private[plans] object TopKPerKeyExec {
  def partitionTopK(iter: Iterator[InternalRow], groupExprs: Seq[Expression],
                    ordering: Seq[SortOrder], k: Int,
                    inputAttrs: Seq[Attribute]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(groupExprs, inputAttrs)
    val ord: Ordering[InternalRow] = GenerateOrdering.generate(ordering, inputAttrs)
    // Max-heap per key (head = worst row kept): insert iff better than the
    // worst once full. Rows and keys are buffer-backed and reused by the
    // upstream iterator — copy on retention, never on rejection.
    val groups = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    iter.foreach { row =>
      val key = keyProj(row)
      groups.get(key) match {
        case None =>
          val heap = mutable.PriorityQueue.empty[InternalRow](ord)
          heap.enqueue(row.copy())
          groups.put(key.copy(), heap)
        case Some(heap) =>
          if (heap.size < k) heap.enqueue(row.copy())
          else if (ord.compare(row, heap.head) < 0) {
            heap.dequeue(); heap.enqueue(row.copy())
          }
      }
    }
    groups.valuesIterator.flatMap(_.iterator)
  }
}

/**
 * Physical top-k-per-key. `partial = true` runs on whatever partitioning the
 * child has (map-side); `partial = false` demands co-location by key and
 * produces the exact per-key top-k.
 */
case class TopKPerKeyExec(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
                          k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    // Empty group list = GLOBAL top-k: every partition's partial heap must
    // gather on one node for the final heap. ClusteredDistribution(Nil)
    // violates Spark's own require and would die deep inside
    // EnsureRequirements; AllTuples is both the correct semantics and what
    // makes the global case actually plan (partial bounding still runs
    // map-side, so the gathered input is <= k rows per upstream partition).
    else if (groupExprs.isEmpty)
      org.apache.spark.sql.catalyst.plans.physical.AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val (ge, so, kk, attrs) = (groupExprs, ordering, k, child.output)
    val numOut = longMetric("numOutputRows")
    child.execute().mapPartitions { iter =>
      TopKPerKeyExec.partitionTopK(iter, ge, so, kk, attrs).map { r =>
        numOut += 1; r
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans the logical node as final-over-partial; EnsureRequirements inserts the
  * key exchange between them (carrying only each partition's survivors). */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, ordering, k, child) =>
      TopKPerKeyExec(keys, ordering, k, partial = false,
        TopKPerKeyExec(keys, ordering, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
