package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge. Spark 4 scopes ExpressionUtils
  * `private[sql]`, so this one-file shim lives under the spark.sql package
  * namespace — the standard technique third-party Catalyst extensions use
  * to lift custom expressions into the public Column API.
  */
object ColumnBridge {
  def column(e: Expression): Column   = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
