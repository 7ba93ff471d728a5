package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `winnow(shingles, w)` — winnowing fingerprint sketch as one native
  * expression: md5 each shingle, take the minimum over every length-w
  * sliding window (windows clamp at the array end, so there are exactly
  * |shingles| of them), and return the DISTINCT window minima in
  * first-seen order. Callers derive the sketch stats (`size(...)` =
  * n_fingerprints, `array_min(...)` = min fingerprint) — both are
  * order-insensitive, and min-over-distinct equals min-over-all.
  *
  * Identical values to the declarative chain it replaces
  * (`transform(sequence(1, size(h)), i => array_min(slice(h, i, w)))`
  * over `h = transform(shingles, md5)` then `array_distinct`), which was
  * `CodegenFallback`-interpreted at O(n·w) tree-walks per document.
  * Empty shingle set → empty array.
  */
case class WinnowExpr(child: Expression, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(w >= 1, s"window size must be >= 1, got $w")

  override def inputTypes: Seq[GraftBridge.AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow"

  override protected def nullSafeEval(shingles: Any): Any =
    WinnowExpr.compute(shingles.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.WinnowExpr.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object WinnowExpr {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val hex = "0123456789abcdef".toCharArray

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(shingles: ArrayData, w: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val digest = md5.get()
    // ShinglesExpr never emits nulls (containsNull=false), but the SQL
    // surface accepts arbitrary array<string> — skip null slots like the
    // sibling expressions do instead of NPE-ing the task.
    val h = new scala.collection.mutable.ArrayBuffer[String](n)
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        digest.reset()
        val d = digest.digest(shingles.getUTF8String(i).getBytes)
        val sb = new Array[Char](32)
        var j = 0
        while (j < 16) {
          sb(j * 2) = hex((d(j) >> 4) & 0xf)
          sb(j * 2 + 1) = hex(d(j) & 0xf)
          j += 1
        }
        h += new String(sb)
      }
      i += 1
    }
    val m = h.length
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    i = 0
    while (i < m) {
      var min = h(i)
      var j = i + 1
      val end = math.min(i + w, m)
      while (j < end) {
        if (h(j).compareTo(min) < 0) min = h(j)
        j += 1
      }
      seen.add(min)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** Column-API form backed by the native expression. */
  def winnowNative(shingles: Column, w: Int): Column =
    GraftBridge.column(WinnowExpr(GraftBridge.expression(shingles), w))

  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[WinnowExpr].getName, null, "winnow",
    "_FUNC_(shingles, w) - distinct sliding-window minima of md5(shingle) (winnowing sketch).",
    "", "", "", "", "", "", "scala_udf")

  val identifier = org.apache.spark.sql.catalyst.FunctionIdentifier("winnow")

  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(sh, w) if w.foldable =>
      WinnowExpr(sh, w.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      "winnow expects (shingles, w) with a literal w")
  }
}
