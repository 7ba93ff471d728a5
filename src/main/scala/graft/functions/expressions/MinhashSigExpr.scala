package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sig(shingles, k)` — the k-minima minhash signature as ONE
  * native Catalyst expression (SURVEY.md §2.3 EX10).
  *
  * Semantics are bit-identical to the declarative form it replaces
  * (`array_min(transform(shingles, sh => md5(concat(lit(s"$i|"), sh))))`
  * per seed i, and to the DuckDB oracle's replay of that formula):
  * `sig[i] = min over shingles of md5_hex(s"$i|$shingle")`, with all-null
  * entries for an empty/whitespace-only shingle set. Hex-string
  * lexicographic minimum equals unsigned-byte minimum of the digest, so
  * the JVM loop tracks 16-byte minima and hex-encodes once at the end.
  *
  * Why native: the HOF fold (`aggregate` + `zip_with` + `transform`) is
  * `CodegenFallback` — interpreted tree-walk per fold step with k md5
  * sub-trees and two array allocations, measured ~6-14 ms per document.
  * This expression does the same k×|shingles| digests in a tight loop
  * (µs per document) and participates in whole-stage codegen via a
  * static call.
  */
case class MinhashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k >= 1, s"signature length k must be >= 1, got $k")

  override def inputTypes: Seq[GraftBridge.AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(shingles: Any): Any =
    MinhashSigExpr.compute(shingles.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.MinhashSigExpr.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

object MinhashSigExpr {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val hex = "0123456789abcdef".toCharArray

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = new Array[Array[Byte]](k)
    val digest = md5.get()
    // seed prefixes "0|", "1|", ... hoisted out of the per-shingle loop —
    // k × |shingles| digest.update calls must not each re-encode.
    val prefixes = Array.tabulate(k)(s => (s.toString + "|").getBytes("UTF-8"))
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) { // null shingles ignored (least() skips nulls)
        val sh = shingles.getUTF8String(i).getBytes
        var s = 0
        while (s < k) {
          digest.reset()
          digest.update(prefixes(s))
          digest.update(sh)
          val d = digest.digest()
          if (mins(s) == null || unsignedLess(d, mins(s))) mins(s) = d
          s += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    var s = 0
    while (s < k) {
      out(s) = if (mins(s) == null) null else UTF8String.fromString(toHex(mins(s)))
      s += 1
    }
    new GenericArrayData(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def toHex(bytes: Array[Byte]): String = {
    val sb = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      sb(i * 2) = hex((bytes(i) >> 4) & 0xf)
      sb(i * 2 + 1) = hex(bytes(i) & 0xf)
      i += 1
    }
    new String(sb)
  }

  /** Column-API form backed by the native expression. */
  def minhashSigNative(shingles: Column, k: Int): Column =
    GraftBridge.column(MinhashSigExpr(GraftBridge.expression(shingles), k))

  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[MinhashSigExpr].getName, null, "minhash_sig",
    "_FUNC_(shingles, k) - k-minima minhash signature: sig[i] = min md5(i || '|' || shingle).",
    "", "", "", "", "", "", "scala_udf")

  val identifier = org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig")

  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(sh, k) if k.foldable =>
      MinhashSigExpr(sh, k.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      "minhash_sig expects (shingles, k) with a literal k")
  }
}
