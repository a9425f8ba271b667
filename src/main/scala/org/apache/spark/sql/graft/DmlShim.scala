package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The two Spark-internal bridges the SQL DML rule
  * ([[graft.sql.GraftDmlRule]]) needs, kept in this `org.apache.spark.sql`
  * subpackage like [[StreamShim]] (the established out-of-tree connector
  * pattern — Delta and Iceberg carry the same two calls):
  *
  *  - a resolved Catalyst `Expression` lifted back into the public
  *    `Column` API (`ExpressionUtils.column`, `private[sql]`), so an
  *    UPDATE's assignments / a DELETE's predicate re-enter the library's
  *    transactional operators as ordinary Columns;
  *  - an analyzed `LogicalPlan` lifted into a `DataFrame`
  *    (`Dataset.ofRows`, `private[sql]`), so a MERGE's USING source —
  *    view, subquery, join — becomes the updates frame
  *    [[graft.io.Snapshots.mergeInto]] consumes.
  */
object DmlShim {

  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Parse an expression string to its catalyst tree EAGERLY —
    * `functions.expr` wraps the text in a lazy `SqlExpression` node, so a
    * caller that must TRANSFORM the tree (e.g. substituting a GENERATED
    * column's source references with their post-update values) parses
    * through the session parser instead. */
  def parseExpression(spark: SparkSession, sql: String): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser.parseExpression(sql)
}
