package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Dedup

/** Continuous corpus admission (Dedup.admissionStream): each micro-batch
  * probes the corpus band index, and docs admitted as new dedup LATER
  * batches — the cross-batch property the batch operator alone can't show.
  */
class AdmissionStreamSpec extends SparkSpec {

  test("admitted docs join the index and catch near-dups in later batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and then runs far away into the deep dark forest tonight"
    val novel = "structured streaming joins each arriving micro batch against a slowly growing corpus index held on the driver side"
    val corpus = Seq((1L, base)).toDF("doc_id", "text")

    val input = MemoryStream[(Long, String)]
    val verdicts = mutable.Map[Long, (Boolean, Long)]()
    val q = Dedup.admissionStream(corpus, input.toDF().toDF("doc_id", "text"))(
      (df, _) => df.collect().foreach(r =>
        verdicts(r.getLong(0)) = (r.getBoolean(1), r.getLong(2)))).start()

    // batch 1: an exact dup of corpus doc 1 and a novel doc
    input.addData((101L, base), (102L, novel))
    q.processAllAvailable()
    // batch 2: a near-dup of the doc admitted in batch 1, plus another
    // dup of the original corpus doc
    input.addData(
      (201L, novel + " here"),  // one extra token: verified band collision
      (202L, base))
    q.processAllAvailable()
    q.stop()

    assert(verdicts(101L) === ((false, 1L)))   // dup of corpus
    assert(verdicts(102L)._1)                  // admitted
    assert(verdicts(201L) === ((false, 102L)), // caught by batch-1 admission
      s"near-dup of an admitted doc must match it: $verdicts")
    assert(verdicts(202L) === ((false, 1L)))
  }
}
