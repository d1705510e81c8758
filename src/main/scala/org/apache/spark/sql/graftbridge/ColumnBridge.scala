package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the classic-API Column ↔ Expression converters,
  * which are `private[sql]` in Spark 4 (the Column facade no longer
  * exposes a constructor from a catalyst Expression). Living under
  * `org.apache.spark.sql` grants the access — the standard extension
  * trick for libraries that build custom Expressions carrying reference
  * objects too large to round-trip through function-registry literals
  * (graft's Bloom filters). Column-building through the function
  * registry (`call_function`) remains the path for everything
  * literal-sized; this bridge exists ONLY for big reference payloads.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
