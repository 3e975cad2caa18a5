package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column ↔ catalyst-Expression
  * converters (`classic.ExpressionUtils`) for the engine's optimizer
  * rules: [[graft.plans.Rules.InjectDeterministicBloom]] needs to embed
  * an Aggregator-backed column (built through the public `functions.udaf`
  * route) inside a LogicalPlan it constructs by hand. The underlying
  * methods are public in bytecode and stable within a Spark line; this
  * is the established extension idiom for code injected via
  * SparkSessionExtensions (which already runs inside Spark's own
  * sessions). Nothing else in the engine bypasses the public API.
  */
object GraftColumnBridge {
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Wrap an existing (resolved) LogicalPlan as a DataFrame — lets an
    * optimizer rule run a constructed sub-plan through the analyzer
    * (e.g. to resolve a udaf invocation) before embedding it in a
    * ScalarSubquery.
    */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
