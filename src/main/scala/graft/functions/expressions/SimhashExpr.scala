package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash16(tokens)` — the 16-bit simhash fingerprint as one native
  * expression, bit-identical to the declarative form it replaces (and to
  * the DuckDB oracle): each token votes ±1 per position p∈[1,16] by
  * whether hex digit p of md5(token) has its high bit set (`[89a-f]`);
  * the fingerprint bit is '1' iff the vote sum is ≥ 0. Returns null for
  * an empty token array (callers filter, matching the exploded form that
  * emits no row). The HOF fold (`aggregate`+`zip_with` over a 16-vector
  * per token) was `CodegenFallback`-interpreted — the hex digit's high
  * bit is just `(nibble & 8) != 0` in the loop.
  */
case class SimhashExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[GraftBridge.AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  // null also for a NON-null but empty/all-null token array — without
  // this override, a not-null child (post-filter) made the expression
  // claim non-nullable, and nullSafeCodeGen then emitted an assignment
  // to a constant-false isNull: Janino failed ("not an rvalue") and the
  // WHOLE projection fell back to interpreted mode (the r15 gate-log
  // "Expr codegen error" — dedup_simhash's hot path).
  override def nullable: Boolean = true
  override def prettyName: String = "simhash16"

  override protected def nullSafeEval(tokens: Any): Any =
    SimhashExpr.compute(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("simhashRes")
      s"""
         |UTF8String $tmp = graft.functions.expressions.SimhashExpr.compute($c);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

object SimhashExpr {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): UTF8String = {
    val n = tokens.numElements()
    if (n == 0) return null
    val votes = new Array[Int](16)
    val digest = md5.get()
    var i = 0
    var any = false
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        any = true
        digest.reset()
        val d = digest.digest(tokens.getUTF8String(i).getBytes)
        // hex digit p (p = 0..15) is the high/low nibble of byte p/2;
        // its "high bit set" test [89a-f] is (nibble & 8) != 0
        var p = 0
        while (p < 16) {
          val nibble = if (p % 2 == 0) (d(p / 2) >> 4) & 0xf else d(p / 2) & 0xf
          votes(p) += (if ((nibble & 8) != 0) 1 else -1)
          p += 1
        }
      }
      i += 1
    }
    if (!any) return null
    val bits = new Array[Char](16)
    var p = 0
    while (p < 16) {
      bits(p) = if (votes(p) >= 0) '1' else '0'
      p += 1
    }
    UTF8String.fromString(new String(bits))
  }

  /** Column-API form backed by the native expression. */
  def simhashNative(tokens: Column): Column =
    GraftBridge.column(SimhashExpr(GraftBridge.expression(tokens)))

  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[SimhashExpr].getName, null, "simhash16",
    "_FUNC_(tokens) - 16-bit simhash fingerprint over md5 nibble votes, as a '0'/'1' string.",
    "", "", "", "", "", "", "scala_udf")

  val identifier = org.apache.spark.sql.catalyst.FunctionIdentifier("simhash16")

  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(t) => SimhashExpr(t)
    case _ => throw new IllegalArgumentException(
      s"simhash16 expects 1 argument, got ${children.size}")
  }
}
