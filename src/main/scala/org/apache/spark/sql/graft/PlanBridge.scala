package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** Bridge into `private[sql]` plan plumbing (Spark 4 classic backend):
  * building a DataFrame from a custom LogicalPlan and extracting the
  * analyzed plan. Lives in the org.apache.spark.sql package solely for
  * access; same pattern as [[ColumnBridge]].
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[Dataset[_]].queryExecution.analyzed
}
