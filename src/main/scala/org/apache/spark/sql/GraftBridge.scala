package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` access bridge for graft's custom logical plans.
  *
  * Spark deliberately exposes no public "DataFrame from LogicalPlan"
  * constructor, yet `SparkSessionExtensions` explicitly supports custom
  * logical nodes + planner strategies — every extension library (including
  * Spark's own connectors) uses exactly this one-hop bridge. Only the two
  * calls graft needs are exposed; nothing else of the internal API leaks.
  */
object GraftBridge {

  /** Wrap an (analyzed-children) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (stable attribute ids). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
