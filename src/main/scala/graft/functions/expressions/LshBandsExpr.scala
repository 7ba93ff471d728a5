package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `lsh_bands(shingles, k, bands)` — minhash signature + per-band hashes
  * fused into one native expression: band[b] = md5_hex of the band's
  * `rowsPerBand = k/bands` signature hex strings joined with `"|"`.
  *
  * Identical to the declarative chain it replaces
  * (`md5(concat_ws("|", element_at(sig, b*r+1) ... element_at(sig, b*r+r)))`
  * over `sig = minhash_sig(shingles, k)`) — with two deliberate
  * differences for the empty-shingle case: the declarative form's
  * `concat_ws` over all-null signature entries hashed the empty string,
  * putting every token-poor document into ONE O(m²) LSH bucket of
  * NaN-jaccard pairs (round-1 ADVICE finding); here an empty shingle set
  * yields an EMPTY band array, so such documents simply generate no
  * banded rows. Fusing also matters for plan shape: 16 separate
  * `element_at(sig, i)` references made CollapseProject inline the whole
  * minhash computation 16× (PLANS.md hazard); a single reference keeps it
  * computed once.
  */
case class LshBandsExpr(child: Expression, k: Int, bands: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k >= 1 && bands >= 1 && k % bands == 0,
    s"k ($k) must be a positive multiple of bands ($bands)")

  override def inputTypes: Seq[GraftBridge.AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_bands"

  override protected def nullSafeEval(shingles: Any): Any =
    LshBandsExpr.compute(shingles.asInstanceOf[ArrayData], k, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.LshBandsExpr.compute($c, $k, $bands)")

  override protected def withNewChildInternal(newChild: Expression): LshBandsExpr =
    copy(child = newChild)
}

object LshBandsExpr {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(shingles: ArrayData, k: Int, bands: Int): ArrayData = {
    val sig = MinhashSigExpr.compute(shingles, k)
    if (sig.isNullAt(0)) return new GenericArrayData(Array.empty[Any])
    val r = k / bands
    val digest = md5.get()
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < r) {
        if (i > 0) sb.append('|')
        sb.append(sig.getUTF8String(b * r + i).toString)
        i += 1
      }
      digest.reset()
      val d = digest.digest(sb.toString.getBytes("UTF-8"))
      val hex = new java.lang.StringBuilder(32)
      var j = 0
      while (j < d.length) {
        hex.append(Character.forDigit((d(j) >> 4) & 0xf, 16))
        hex.append(Character.forDigit(d(j) & 0xf, 16))
        j += 1
      }
      out(b) = UTF8String.fromString(hex.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API form backed by the native expression. */
  def lshBandsNative(shingles: Column, k: Int, bands: Int): Column =
    GraftBridge.column(LshBandsExpr(GraftBridge.expression(shingles), k, bands))

  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[LshBandsExpr].getName, null, "lsh_bands",
    "_FUNC_(shingles, k, bands) - per-band md5 of the k-minima minhash signature; empty input -> empty array.",
    "", "", "", "", "", "", "scala_udf")

  val identifier = org.apache.spark.sql.catalyst.FunctionIdentifier("lsh_bands")

  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(sh, k, b) if k.foldable && b.foldable =>
      LshBandsExpr(sh, k.eval().asInstanceOf[Number].intValue(),
        b.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      "lsh_bands expects (shingles, k, bands) with literal k and bands")
  }
}
