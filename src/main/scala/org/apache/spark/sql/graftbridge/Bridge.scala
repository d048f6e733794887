package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode Column <-> Expression bridge. Spark 4 made the conversion
  * `private[sql]` (columnNodeSupport.scala); extension libraries shipping
  * custom Catalyst expressions conventionally expose it from a package
  * under org.apache.spark.sql. Used only to lift custom `Expression`s
  * (e.g. graft.ext.SimHash64) into user-facing Columns.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** True when the session's CacheManager holds no cached plans —
    * `sharedState` is private[sql]; exposed for the eager-lifecycle spec
    * (no persist may outlive an `eager = true` pipeline call). */
  def cacheEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
