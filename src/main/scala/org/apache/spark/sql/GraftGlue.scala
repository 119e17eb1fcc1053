package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column⇄Expression converters so graft's
  * native Catalyst expressions (graft.functions) can surface as Columns.
  * Lives in org.apache.spark.sql purely for access; no Spark internals
  * are modified.
  */
object GraftGlue {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a SQL function into a LIVE session's registry (extensions
    * passed to builder() only apply to newly created sessions). */
  def registerFunction(spark: SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    classic.ClassicConversions.castToImpl(spark).sessionState.functionRegistry
      .registerFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
