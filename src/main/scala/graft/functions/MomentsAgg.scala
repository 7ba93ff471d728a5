package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator: first and second raw moments of
  * `array<float>` embedding vectors in ONE fused pass — (Σx, Σ x⊗x
  * flattened row-major, n), the sufficient statistics for a covariance
  * matrix / PCA fit.
  *
  * This is the scale-correct shape for covariance at 100 TB: the
  * alternative (explode each vector into dim² pair rows and groupBy) pays
  * dim² Catalyst rows per input vector before the partial aggregate; here
  * the outer product is a tight d² multiply-add loop inside the buffer,
  * and ONLY the (d + d² + 1)-double buffer ever moves — associative
  * merge, so Catalyst applies map-side partial aggregation like any
  * built-in. Accumulation is in doubles for cross-engine reproducibility
  * (the [[CentroidAgg]] convention).
  */
object MomentsAgg
    extends Aggregator[Seq[Float], (Seq[Double], Seq[Double], Long), (Seq[Double], Seq[Double], Long)] {

  override def zero: (Seq[Double], Seq[Double], Long) = (Seq.empty, Seq.empty, 0L)

  override def reduce(b: (Seq[Double], Seq[Double], Long),
      a: Seq[Float]): (Seq[Double], Seq[Double], Long) = {
    if (a == null) b
    else {
      val d = a.length
      val s = if (b._1.isEmpty) new Array[Double](d) else b._1.toArray
      val ss = if (b._2.isEmpty) new Array[Double](d * d) else b._2.toArray
      val x = new Array[Double](d)
      var i = 0
      while (i < d) { x(i) = a(i); s(i) += x(i); i += 1 }
      i = 0
      while (i < d) {
        val xi = x(i)
        val row = i * d
        var j = 0
        while (j < d) { ss(row + j) += xi * x(j); j += 1 }
        i += 1
      }
      (scala.collection.immutable.ArraySeq.unsafeWrapArray(s),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(ss), b._3 + 1)
    }
  }

  override def merge(x: (Seq[Double], Seq[Double], Long),
      y: (Seq[Double], Seq[Double], Long)): (Seq[Double], Seq[Double], Long) = {
    if (x._3 == 0) y
    else if (y._3 == 0) x
    else {
      val s = x._1.toArray
      val ss = x._2.toArray
      var i = 0
      while (i < s.length) { s(i) += y._1(i); i += 1 }
      i = 0
      while (i < ss.length) { ss(i) += y._2(i); i += 1 }
      (scala.collection.immutable.ArraySeq.unsafeWrapArray(s),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(ss), x._3 + y._3)
    }
  }

  override def finish(r: (Seq[Double], Seq[Double], Long)): (Seq[Double], Seq[Double], Long) = r

  override def bufferEncoder: Encoder[(Seq[Double], Seq[Double], Long)] =
    ExpressionEncoder[(Seq[Double], Seq[Double], Long)]()

  override def outputEncoder: Encoder[(Seq[Double], Seq[Double], Long)] =
    ExpressionEncoder[(Seq[Double], Seq[Double], Long)]()
}
