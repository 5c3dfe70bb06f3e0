package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Same-package access shim for [[CollectTopK]] (declared private[aggregate]
  * in Spark 4): the standard extension-library pattern, like the
  * `org.apache.spark.sql.graftbridge` package object for Column/Expression
  * bridging. One construction call, no behavior of its own. */
object GraftTopKShim {
  def collectTopK(child: Expression, num: Int, reverse: Boolean): Expression =
    CollectTopK(child, num, reverse).toAggregateExpression()
}
