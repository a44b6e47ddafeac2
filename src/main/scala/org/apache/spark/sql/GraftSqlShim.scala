package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to `Dataset.ofRows`, which is `private[sql]` — the one internal
  * call a library needs to hand a custom [[LogicalPlan]] node (here:
  * graft.plans.AsOfJoinPlan) back to the public Dataset API. Placing this
  * object inside the `org.apache.spark.sql` package is the standard
  * extension-library technique (table formats and query accelerators that
  * add operators all ship an equivalent shim); everything else in graft
  * uses only public seams (`SparkSessionExtensions`,
  * `experimental.extraStrategies` / `extraOptimizations`).
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
