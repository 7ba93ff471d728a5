package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator (the Aggregator/TypedColumn tier of the
  * custom-function ladder): element-wise mean of `array<float>` embedding
  * vectors — the centroid computation an IVF coarse quantizer trains
  * with. The (sum-vector, count) buffer merge is associative, so Catalyst
  * runs it with map-side partial aggregation like any built-in agg; the
  * accumulator widens to double before summation for cross-engine
  * reproducibility.
  */
object CentroidAgg extends Aggregator[Seq[Float], (Seq[Double], Long), Seq[Double]] {

  override def zero: (Seq[Double], Long) = (Seq.empty, 0L)

  override def reduce(b: (Seq[Double], Long), a: Seq[Float]): (Seq[Double], Long) = {
    if (a == null) b
    else {
      val acc =
        if (b._1.isEmpty) a.map(_.toDouble)
        else {
          val arr = b._1.toArray
          var i = 0
          while (i < a.length) { arr(i) += a(i); i += 1 }
          scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
        }
      (acc, b._2 + 1)
    }
  }

  override def merge(x: (Seq[Double], Long), y: (Seq[Double], Long)): (Seq[Double], Long) = {
    if (x._1.isEmpty) y
    else if (y._1.isEmpty) x
    else {
      val arr = x._1.toArray
      var i = 0
      while (i < arr.length) { arr(i) += y._1(i); i += 1 }
      (scala.collection.immutable.ArraySeq.unsafeWrapArray(arr), x._2 + y._2)
    }
  }

  override def finish(r: (Seq[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2)

  override def bufferEncoder: Encoder[(Seq[Double], Long)] =
    ExpressionEncoder[(Seq[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}
