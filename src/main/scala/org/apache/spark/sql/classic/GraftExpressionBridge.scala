package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the `Column` ↔ Catalyst `Expression` conversion
  * (`ExpressionUtils`) `private[sql]`. Custom native expressions (see
  * `graft.plans`) still need to surface as `Column`s without a per-session
  * registry round-trip, so this one-liner lives in the `sql.classic`
  * package to re-export the two conversions — the same technique Spark
  * extension libraries (e.g. connectors providing typed column helpers)
  * use. No Spark internals are modified.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a hand-built logical plan as a DataFrame (`Dataset.ofRows` is
    * likewise `private[sql]`). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** The persisted RDDs behind a (local)checkpointed frame's `LogicalRDD`
    * leaves. `Dataset.unpersist` only uncaches CATALOG-cached plans (the
    * CacheManager path) and silently leaves RDD-level checkpoint blocks
    * pinned for the session — actually dropping them requires
    * `RDD.unpersist` on these. */
  def checkpointRdds(df: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
}
