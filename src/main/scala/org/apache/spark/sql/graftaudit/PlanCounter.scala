package org.apache.spark.sql.graftaudit

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.Dataset

/** The repo's single `private[sql]` touch, used ONLY by the
  * [[graft.BroadcastAudit]] tool (never on a query path): count the
  * rows of a logical subtree lifted out of a larger plan.
  *
  * Why it must exist: the audit pulls the BUILD SIDE of a statically
  * planned broadcast join out of `queryExecution.sparkPlan` — a
  * pre-EnsureRequirements physical tree, so executing the subtree
  * directly would count unmerged partial aggregates. The correct count
  * re-plans the subtree's `logicalLink` from scratch (paying its own
  * exchanges), and Spark's only door from a `LogicalPlan` back to a
  * runnable `DataFrame` is `Dataset.ofRows`, which is `private[sql]`.
  * This object lives in an `org.apache.spark.sql` subpackage solely to
  * reach it, type-checked instead of via runtime reflection. */
object PlanCounter {
  def countRows(spark: SparkSession, plan: LogicalPlan): Long =
    Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
      .count()
}
