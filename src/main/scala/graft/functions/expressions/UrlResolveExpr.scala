package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Urls

/** `url_resolve(base, rel)` as a native Catalyst expression (SURVEY.md
  * §4.3 / §2.1 X3) — the engine's one true semantic gap vs. built-ins,
  * promoted from a Scala UDF to a codegen'd `BinaryExpression`: the
  * generated code calls [[UrlResolveExpr.resolve]] directly, so the
  * expression participates in whole-stage codegen (no UDF serialization,
  * no Row boxing) and in null-intolerant short-circuiting.
  *
  * Deterministic and pure, so Catalyst may freely reorder/fold it —
  * exactly what the fetch kernels must avoid and this must allow.
  */
case class UrlResolveExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[GraftBridge.AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_resolve"

  override protected def nullSafeEval(base: Any, rel: Any): Any =
    UrlResolveExpr.resolve(base.asInstanceOf[UTF8String], rel.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, r) =>
      s"graft.functions.expressions.UrlResolveExpr.resolve($b, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UrlResolveExpr =
    copy(left = newLeft, right = newRight)
}

object UrlResolveExpr {
  /** Static entry point shared by interpreted eval and generated code. */
  def resolve(base: UTF8String, rel: UTF8String): UTF8String =
    UTF8String.fromString(Urls.resolve(base.toString, rel.toString))

  /** Column-API form backed by the native expression. */
  def urlResolveNative(base: Column, rel: Column): Column =
    GraftBridge.column(UrlResolveExpr(
      GraftBridge.expression(base), GraftBridge.expression(rel)))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[UrlResolveExpr].getName, null, "url_resolve",
    "_FUNC_(base, rel) - Resolves `rel` against `base` per RFC 3986 (urljoin semantics).",
    "", "", "", "", "", "", "scala_udf")

  val identifier: FunctionIdentifier = FunctionIdentifier("url_resolve")

  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(b, r) => UrlResolveExpr(b, r)
    case _ => throw new IllegalArgumentException(
      s"url_resolve expects 2 arguments, got ${children.size}")
  }
}
