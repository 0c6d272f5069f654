package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Interop shim: a few Spark internals needed to build a function library
  * (Column <-> Expression bridging, the input-type ADT) are `private[sql]`
  * in Spark 4. Aliasing them from inside the package is the standard way
  * third-party Catalyst extensions (connectors, Sedona-style libs) bind.
  */
object GraftInterop {
  type AbsType = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
