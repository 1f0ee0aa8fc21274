package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** LogicalPlan ⇄ DataFrame bridge for custom logical operators.
  *
  * `Dataset.ofRows` — the constructor every internal operator uses to
  * wrap a LogicalPlan back into a user-facing DataFrame — is
  * `private[sql]` in Spark 4; a custom whole-operator node (e.g.
  * [[graft.plans.AsOfJoin]]) needs exactly that wrap after splicing
  * its children's analyzed plans. Same pattern and rationale as
  * [[ColumnBridge]]: a one-file re-export in the sql package, no Spark
  * internals modified or shadowed. */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** The analyzed logical plan of a frame — resolved attributes, the
    * form a custom node's children must be in so its `output` can
    * reference them by identity. */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
