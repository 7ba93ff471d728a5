package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `dot_product(a, b)` — sequential-fold dot product over two double
  * arrays as a native Catalyst expression (SURVEY.md §2.3 EX6).
  *
  * Bit-identical to the HOF form it replaces
  * (`aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,x) => acc+x)`):
  * left-to-right accumulation in index order, null when either array is
  * null, when lengths differ (zip_with pads the shorter side with null →
  * null product poisons the sum) or when any element is null. The HOF
  * tree is `CodegenFallback` — ~128 interpreted nodes per row for dim-64
  * vectors; this is a fused multiply-add loop inside whole-stage codegen.
  *
  * `ImplicitCastInputTypes` inserts the `array<float> → array<double>`
  * cast, so float embedding columns widen BEFORE multiplication exactly
  * as `VectorFns.asDouble` did (reproducible vs. the DuckDB oracle).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[GraftBridge.AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null also for NON-null inputs: length mismatch or a null element.
  // Without this override a not-null-filtered child made the expression
  // claim non-nullable and the generated `isNull = true` branch failed
  // Janino compilation, dropping the projection to interpreted mode
  // (the SimhashExpr bug, same class — see that scaladoc).
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $tmp = graft.functions.expressions.DotProductExpr.dot($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {

  /** Static entry point shared by interpreted eval and generated code.
    * Returns null (not 0) on length mismatch / null elements — matching
    * the declarative zip_with/aggregate semantics this replaces.
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Column-API form backed by the native expression. */
  def dotNative(a: Column, b: Column): Column =
    GraftBridge.column(DotProductExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[DotProductExpr].getName, null, "dot_product",
    "_FUNC_(a, b) - sequential-fold dot product of two double arrays; null on length mismatch.",
    "", "", "", "", "", "", "scala_udf")

  val identifier = org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product")

  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(a, b) => DotProductExpr(a, b)
    case _ => throw new IllegalArgumentException(
      s"dot_product expects 2 arguments, got ${children.size}")
  }
}
