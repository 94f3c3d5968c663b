package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` DataFrame-from-LogicalPlan constructor
  * (the standard extension-library trick over the public Spark source:
  * the whole-operator path — custom LogicalPlan + Rule — needs to wrap
  * a child plan back into a DataFrame to build its expansion with the
  * public DataFrame API, and `Dataset.ofRows` is the only door). */
object GraftBridge {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)
}
