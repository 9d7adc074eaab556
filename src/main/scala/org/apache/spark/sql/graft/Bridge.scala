package org.apache.spark.sql.graft

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to `private[sql]` Column↔Expression plumbing (Spark 4
  * moved Column onto ColumnNode for Connect; `classic.ExpressionUtils` is
  * the sanctioned conversion for engine-side extensions). Keeping this one
  * file inside the spark namespace confines the privileged access.
  */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a hand-constructed logical plan (custom
    * operator entry point — same door `Dataset.ofRows` opens for Spark's
    * own DSL).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (for feeding custom nodes). */
  def logicalPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]].logicalPlan

  /** Partitions a file scan actually selected after partition pruning
    * (`selectedPartitions` is private[sql]) — used by tests proving a
    * predicate pruned the file listing, not just filtered rows.
    */
  def selectedPartitionCount(scan: org.apache.spark.sql.execution.FileSourceScanExec): Int =
    scan.selectedPartitions.partitionCount
}
