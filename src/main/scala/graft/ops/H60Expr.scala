package graft.ops

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 60-bit md5 hash: `H60Expr(s)` ≡
  * `conv(substring(md5(s),1,15),16,10)::long` ([[TextOps.hexInt]]) but
  * ~4× cheaper per row — no MessageDigest allocation (thread-local), no
  * hex-string materialization, no base-16 string parse. This is the hash
  * the Bloom membership probes evaluate per scanned row; at 100 TB the
  * per-row hash cost IS the prune's cost, which is exactly the
  * "custom codegen Expression beats composed builtins" rung of the
  * extension ladder. Value-identical to the hexInt column form and the
  * DuckDB `('0x'||substr(md5(s),1,15))::BIGINT` oracle (asserted in
  * tests), so every existing oracle replays unchanged.
  */
case class H60Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"h60 requires a string argument, got ${child.dataType}")
  }

  protected override def nullSafeEval(input: Any): Any =
    TextOps.h60Tl(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.TextOps.h60Tl($c)")

  override protected def withNewChildInternal(newChild: Expression): H60Expr =
    copy(child = newChild)
}

/** Native codegen'd word n-gram shingling: `ShinglesNExpr(text, n)` ≡
  * the HOF form `when(size(w) >= n, transform(sequence(0, size(w)-n),
  * i => concat_ws(" ", slice(w, i+1, n)))).otherwise(array())` with
  * `w = split(text, " ")` — byte-identical output via one
  * `UTF8String.split` + a single windowing pass. The HOF form evaluates
  * interpreted and re-evaluates the embedded `split(text)` once PER
  * output element (O(words²) per row — see [[TextOps.shinglesN]]).
  * Never null: null/short text yields the empty array, matching the
  * column form's otherwise-branch.
  */
case class ShinglesNExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shinglesN requires a string argument, got ${child.dataType}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextOps.shinglesNKernel(
      child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val javaType =
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(dataType)
    ev.copy(
      code = c.code + code"""
        $javaType ${ev.value} = graft.ops.TextOps.shinglesNKernel(
          ${c.isNull} ? null : ${c.value}, $n);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesNExpr =
    copy(child = newChild)
}
