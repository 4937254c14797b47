package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`), which Spark 4 hides
  * behind the ColumnNode indirection. Custom native expressions
  * ([[graft.functions.VecDot]]) need exactly these two calls; a
  * one-object file in a `org.apache.spark.sql` subpackage is the standard
  * extension-library move (the alternative — per-session FunctionRegistry
  * injection via SparkSessionExtensions — forces every helper to resolve
  * an active session and go through SQL-string plumbing for what is a
  * plain expression-tree construction).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
