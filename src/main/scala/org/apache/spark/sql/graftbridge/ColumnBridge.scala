package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnConversions, ExpressionColumnNode}

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  *
  * Spark 4 moved the Expression↔Column conversions behind `private[sql]`
  * (`org.apache.spark.sql.classic.columnNodeSupport`); custom Catalyst
  * expressions still need them to surface as `Column`s. This object lives
  * under `org.apache.spark.sql` solely to regain that access — no Spark
  * internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ColumnConversions.expression(c)
}
