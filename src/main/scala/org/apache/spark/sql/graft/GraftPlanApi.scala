package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** The one `private[sql]` doorway graft's custom logical plans need:
  * wrapping a [[LogicalPlan]] back into a public [[DataFrame]].
  * `Dataset.ofRows` is how every operator inside Spark does it; the
  * standard extension-project practice (Delta, Iceberg, Sedona all
  * ship the same shim) is a file in the `org.apache.spark.sql`
  * namespace rather than reflection. Nothing else in graft lives
  * outside the `graft` namespace. */
object GraftPlanApi {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
