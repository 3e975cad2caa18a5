package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native codegen'd kernels for the vector math of the ANN family.
  *
  * The `aggregate(zip_with(...))` formulation is semantically right but
  * Spark's higher-order-function lambdas evaluate INTERPRETED, one boxed
  * element at a time — on a 64-dim corpus the dot product dominates
  * every ANN query. These expressions keep the exact same FP semantics
  * (left-fold accumulation in array order, then Spark's own
  * round-half-up-via-BigDecimal) inside a tight primitive loop that
  * whole-stage codegen calls directly.
  *
  * Parity contract (oracle-checked): `cosine6(a,b)` ==
  * `round(aggregate(zip_with(a,b,*),0d,+) / (sqrt(..a..)*sqrt(..b..)), 6)`
  * and `dot6(a,b)` == `round(aggregate(zip_with(a,b,*),0d,+), 6)` for
  * EQUAL-LENGTH arrays of doubles, bit for bit. Ragged pairs fail
  * loudly (zip_with yields NULL there — neither is a similarity).
  */
object AnnKernels {

  /** Spark's Round(double, 6) semantics: BigDecimal.valueOf + HALF_UP,
    * NaN/Inf passed through.
    */
  def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def cosine6(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    // iterating to a's length unchecked would READ PAST the shorter
    // array on UnsafeArrayData — garbage doubles, silently wrong
    // similarity. A ragged embedding is data corruption: fail loudly
    // (zip_with would yield NULL; neither is a meaningful score)
    require(n == b.numElements(),
      s"cosine6: embedding length mismatch $n vs ${b.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    round6(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  def dot6(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"dot6: embedding length mismatch $n vs ${b.numElements()}")
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    round6(dot)
  }

  /** Exact integer dot product over quantized (long) vectors — the
    * codegen'd hot kernel of [[Dedup.semanticDedup]]'s within-cell
    * pair predicate (an `aggregate(zip_with(...))` fold allocates a
    * zipped array per pair; this reads both UnsafeArrayData in place).
    */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"dotLong: vector length mismatch $n vs ${b.numElements()}")
    var dot = 0L
    var i = 0
    while (i < n) { dot += a.getLong(i) * b.getLong(i); i += 1 }
    dot
  }

  private def registerOne(spark: SparkSession, name: String,
                          build: (Expression, Expression) => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => build(exprs(0), exprs(1)), "built-in")

  def register(spark: SparkSession): Unit = {
    registerOne(spark, "cosine6", Cosine6Expr(_, _))
    registerOne(spark, "dot6", Dot6Expr(_, _))
    registerOne(spark, "dot_long", DotLongExpr(_, _))
  }

  def cosine6Col(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("cosine6", a, b)
  }

  def dot6Col(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("dot6", a, b)
  }

  def dotLongCol(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("dot_long", a, b)
  }
}

case class Cosine6Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(a: Any, b: Any): Any =
    AnnKernels.cosine6(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.AnnKernels.cosine6($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Cosine6Expr =
    copy(left = newLeft, right = newRight)
}

case class Dot6Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(a: Any, b: Any): Any =
    AnnKernels.dot6(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.AnnKernels.dot6($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dot6Expr =
    copy(left = newLeft, right = newRight)
}

case class DotLongExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(a: Any, b: Any): Any =
    AnnKernels.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.AnnKernels.dotLong($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongExpr =
    copy(left = newLeft, right = newRight)
}
