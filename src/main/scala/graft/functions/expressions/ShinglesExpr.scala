package graft.functions.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text, n)` — lowercase → `[^a-z0-9]+` word split → word
  * n-gram shingles (space-joined), fused into one native expression.
  *
  * Semantics are identical to the declarative chain it replaces
  * (`TextFns.wordShingles(TextFns.tokens(text), n)`): `lower()` is
  * `UTF8String.toLowerCase` (the same call the `Lower` builtin makes),
  * the split is the same Java regex `split(..., -1)`, empty tokens are
  * dropped, and fewer than n tokens yields an empty array. The HOF chain
  * (`filter` + `transform` + per-position `concat_ws`/`element_at`) is
  * `CodegenFallback` — measured ~1.5 ms per 300-char document, which
  * dominated every dedup query; this loop is ~µs and whole-stage-codegen
  * friendly.
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def inputTypes: Seq[GraftBridge.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(text: Any): Any =
    ShinglesExpr.compute(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.ShinglesExpr.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {

  private val sep = Pattern.compile("[^a-z0-9]+")

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = sep.split(text.toLowerCase.toString, -1).filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API form backed by the native expression. */
  def shinglesNative(text: Column, n: Int): Column =
    GraftBridge.column(ShinglesExpr(GraftBridge.expression(text), n))

  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[ShinglesExpr].getName, null, "word_shingles",
    "_FUNC_(text, n) - lowercase, split on [^a-z0-9]+, space-joined word n-grams.",
    "", "", "", "", "", "", "scala_udf")

  val identifier = org.apache.spark.sql.catalyst.FunctionIdentifier("word_shingles")

  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(t, n) if n.foldable =>
      ShinglesExpr(t, n.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      "word_shingles expects (text, n) with a literal n")
  }
}
