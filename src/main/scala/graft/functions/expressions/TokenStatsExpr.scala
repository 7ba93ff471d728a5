package graft.functions.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `token_stats(text)` — the quality-gate token statistics (token count,
  * summed token length, stopword count) fused into ONE native expression
  * over one tokenization pass.
  *
  * Semantics are identical to the declarative chain it replaces in
  * `TextAnalysis.qualityMetrics`:
  *   - `n_tokens = size(tokens(text))`
  *   - `sum_len  = aggregate(tokens(text), 0L, (acc, t) -> acc + length(t))`
  *   - `n_stop   = size(filter(tokens(text), t -> t IN stopwords))`
  * with `tokens` = ShinglesExpr(n = 1) (lowercase → `[^a-z0-9]+` split →
  * drop empties). Tokens are pure `[a-z0-9]` so `length` (code points)
  * equals `String.length`.
  *
  * Why native: `aggregate` and `filter` are `CodegenFallback` in Spark 4 —
  * each an interpreted tree-walk per row that also re-derives the token
  * array outside whole-stage codegen. This is the quality gate that fronts
  * every curation run, i.e. the one pass guaranteed to see 100% of a
  * 100 TB corpus.
  */
case class TokenStatsExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[GraftBridge.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = TokenStatsExpr.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_stats"

  override protected def nullSafeEval(text: Any): Any =
    TokenStatsExpr.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TokenStatsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpr =
    copy(child = newChild)
}

object TokenStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))

  /** The quality formula's stopword marker set (fixed part of the
    * contract — the DuckDB oracle lists the same ten words).
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "is", "in", "it", "that", "for")

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  private val sep = Pattern.compile("[^a-z0-9]+")

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String): InternalRow = {
    val parts = sep.split(text.toLowerCase.toString, -1)
    var n = 0
    var sumLen = 0L
    var nStop = 0
    var i = 0
    while (i < parts.length) {
      val t = parts(i)
      if (t.nonEmpty) {
        n += 1
        sumLen += t.length
        if (stopSet.contains(t)) nStop += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, sumLen, nStop))
  }

  /** Column-API form backed by the native expression. */
  def tokenStatsNative(text: Column): Column =
    GraftBridge.column(TokenStatsExpr(GraftBridge.expression(text)))

  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[TokenStatsExpr].getName, null, "token_stats",
    "_FUNC_(text) - struct(n_tokens, sum_len, n_stop) over the standard tokenization in one pass.",
    "", "", "", "", "", "", "scala_udf")

  val identifier = org.apache.spark.sql.catalyst.FunctionIdentifier("token_stats")

  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(t) => TokenStatsExpr(t)
    case _ => throw new IllegalArgumentException("token_stats expects (text)")
  }
}
