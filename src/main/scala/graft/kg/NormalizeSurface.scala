package graft.kg

import graft.text.TextCore
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for surface normalization (lowercase + NFD
  * accent strip + trim) — the hot scalar of the entity-linking join.
  *
  * Preference-order rationale (builder contract): the exact semantics
  * (NFD + Mn-category strip, tokenization.py:236-245) are not expressible
  * with builtin functions (`lower`+`translate` is lossy), and a Scala UDF
  * would break whole-stage codegen on the mention side of the join — so
  * a codegen'd `UnaryExpression` is the right rung: `doGenCode` emits a
  * static call that stays inside the generated stage (no iterator
  * boundary, no row-at-a-time encoder).
  */
case class NormalizeSurfaceExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      TextCore.normalizeSurface(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.text.TextCore.normalizeSurface($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeSurfaceExpr =
    copy(child = newChild)
}

object NormalizeSurface {
  val fnName = "normalize_surface"

  /** Register for SQL + Column use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => NormalizeSurfaceExpr(exprs.head), "built-in")

  /** Column form (requires register() once per session). */
  def apply(c: Column): Column =
    org.apache.spark.sql.functions.call_function(fnName, c)
}
