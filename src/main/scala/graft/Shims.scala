package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4.x moved `Column` onto `ColumnNode` (Spark Connect refactor); the
  * classic conversion lives in `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is `private[sql]` — hence this shim lives under
  * `org.apache.spark.sql`. This is the only place the library reaches into
  * Spark internals.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame over a custom logical plan (Dataset.ofRows is
    * `private[sql]`). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Clone a session: same SparkContext, COPIED session state (confs,
    * registered functions, temp views). `cloneSession` is `private[sql]` —
    * the library uses it to scope legacy reader confs to a dedicated
    * reader session instead of mutating the caller's global conf
    * (Tables.eventsNanos). */
  def cloneSession(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Register a SQL function on an already-built session (sessionState is
    * `private[sql]`; new sessions should prefer `withExtensions`). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
}
