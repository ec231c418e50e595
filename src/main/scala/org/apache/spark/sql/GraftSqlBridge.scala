package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for Spark internals that are `private[sql]` at the Scala
  * level but stable public bytecode: Column ⇄ Expression conversion for
  * graft's native Catalyst expressions. Scoped to exactly these two
  * calls.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
