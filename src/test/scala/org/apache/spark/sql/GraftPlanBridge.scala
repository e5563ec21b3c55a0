package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-only bridge into `private[sql] Dataset.ofRows`: materialize a
  * logical subtree picked out of an optimized plan back into a
  * DataFrame, so the suite's plan invariants can MEASURE grouping-key
  * cardinality on the fixture instead of trusting column names (a
  * renamed entity key dodges any name heuristic; a measured
  * distinct-groups / input-rows ratio does not). */
object GraftPlanBridge {
  def ofRows(s: SparkSession, p: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], p)
}
