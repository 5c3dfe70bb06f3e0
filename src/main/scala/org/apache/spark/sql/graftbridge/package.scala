package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for custom Catalyst expressions.
  * Spark 4 wraps Column around ColumnNode and made the direct constructors
  * private[sql]; this is the standard extension-library pattern for exposing
  * a native Expression as a user-facing Column without a UDF.
  */
package object graftbridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** True when no Dataset.persist cache entries remain (CacheManager state;
    * unlike `sc.getPersistentRDDs` it ignores localCheckpoint blocks).
    * Test-support seam for cache-hygiene assertions. */
  def noCachedPlans(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
