package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.sources.BaseRelation

/** Third `private[sql]` doorway (posture documented on ColumnExpr):
  * two constructions the catalog's SQL routing needs that Spark keeps
  * behind `private[sql]`.
  *
  *  - `apply`: materialize a resolved LogicalPlan as a DataFrame
  *    (`Dataset.ofRows`) — how GraftMergeCommand turns the MERGE
  *    source plan back into the public API Snapshot.mergeInto takes.
  *  - `fileRelation`: wrap a BaseRelation as a LogicalRelation UNDER
  *    GIVEN OUTPUT ATTRIBUTES — how GraftReadRule swaps a
  *    DataSourceV2Relation for the native manifest-backed file scan
  *    without re-binding parent operators (Delta's relation-rewrite
  *    move).
  */
object PlanFrame {

  def apply(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def fileRelation(relation: BaseRelation,
      output: Seq[AttributeReference]): LogicalPlan =
    LogicalRelation(relation, output, None, isStreaming = false, None)
}
