package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression converters — the standard
  * pattern for Spark extension libraries shipping custom Catalyst
  * expressions (Spark 4 wraps Column around ColumnNode, so `new
  * Column(expr)` / `col.expr` are no longer public).
  */
object graftbridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a custom expression as a SQL-callable temp function on an
    * existing session (`sessionState` is private[sql]).
    */
  def registerFunction(spark: SparkSession, name: String, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
}
