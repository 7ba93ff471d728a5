package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** `linear_score(features, dims)` — a fastText-style hashed
  * bag-of-features linear model score in ONE pass per document.
  *
  * Each feature string hashes to a bucket (`u32(md5(f)[0..3]) % dims`);
  * the bucket's weight is derived deterministically from its index
  * (`u32(md5("w|" + bucket)[0..3]) / 2^32 · 2 − 1`, i.e. a fixed pseudo-
  * random draw in [−1, 1)); the score is the mean bucket weight over the
  * document's features. The weight table therefore needs no storage, no
  * broadcast, and replays bit-identically in the DuckDB oracle via
  * `('0x' || substr(md5(...), 1, 8))::UBIGINT`.
  *
  * This is the documented STUB boundary for model inference: a real
  * deployment would map `bucket → trained weight` (a broadcast array
  * lookup with identical plumbing and cost shape); the hash-derived
  * weights keep every downstream stage — feature hashing, scoring,
  * thresholding, calibration — real and oracle-checkable without
  * shipping a model artifact.
  *
  * Why native: per-document array fold; the HOF form
  * (`aggregate(transform(...))`) is CodegenFallback-interpreted with two
  * md5 sub-trees per feature (see PLANS.md). Empty feature sets score
  * 0.0 — callers gate on non-empty features, matching the oracle's
  * inner-join shape.
  */
case class LinearScoreExpr(child: Expression, dims: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(dims >= 1, s"dims must be >= 1, got $dims")

  override def inputTypes: Seq[GraftBridge.AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "linear_score"

  override protected def nullSafeEval(features: Any): Any =
    LinearScoreExpr.compute(features.asInstanceOf[ArrayData], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.LinearScoreExpr.compute($c, $dims)")

  override protected def withNewChildInternal(newChild: Expression): LinearScoreExpr =
    copy(child = newChild)
}

object LinearScoreExpr {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private def u32(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(features: ArrayData, dims: Int): Double = {
    val n = features.numElements()
    val digest = md5.get()
    var sum = 0.0
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!features.isNullAt(i)) {
        digest.reset()
        val bucket = u32(digest.digest(features.getUTF8String(i).getBytes)) % dims
        digest.reset()
        val w = u32(digest.digest(("w|" + bucket).getBytes("UTF-8")))
        sum += w / 4294967296.0 * 2.0 - 1.0
        cnt += 1
      }
      i += 1
    }
    if (cnt == 0) 0.0 else sum / cnt
  }

  /** Column-API form backed by the native expression. */
  def linearScoreNative(features: Column, dims: Int): Column =
    GraftBridge.column(LinearScoreExpr(GraftBridge.expression(features), dims))

  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[LinearScoreExpr].getName, null, "linear_score",
    "_FUNC_(features, dims) - mean hash-derived bucket weight of the hashed features.",
    "", "", "", "", "", "", "scala_udf")

  val identifier = org.apache.spark.sql.catalyst.FunctionIdentifier("linear_score")

  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(f, d) if d.foldable =>
      LinearScoreExpr(f, d.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      "linear_score expects (features, dims) with a literal dims")
  }
}
