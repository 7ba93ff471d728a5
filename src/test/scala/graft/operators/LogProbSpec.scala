package graft.operators

import graft.SparkSpec

/** Hand-computed LM-proxy values (the oracle proves cross-engine equality
  * at corpus scale; these prove the math is the math we claim).
  */
class LogProbSpec extends SparkSpec {

  test("unigramLogProb: corpus MLE over all token occurrences") {
    import spark.implicits._
    // corpus tokens: a ×2, b ×1 → total 3
    val docs = Seq((1L, "a a b")).toDF("doc_id", "text")
    val r = TextAnalysis.unigramLogProb(docs).collect().head
    assert(r.getLong(1) === 3L)
    val want = (2 * math.log(2.0 / 3) + math.log(1.0 / 3)) / 3
    assert(math.abs(r.getDouble(2) - want) < 1e-6)
  }

  test("bigramLogProb: conditional on the shared prefix across docs") {
    import spark.implicits._
    // d1 = "a b", d2 = "a c": prefix 'a' occurs twice, each bigram once
    // → P(b|a) = P(c|a) = 1/2 → both docs average ln(0.5)
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val rows = TextAnalysis.bigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows(1L)._1 === 1L && rows(2L)._1 === 1L)
    assert(math.abs(rows(1L)._2 - math.log(0.5)) < 1e-6)
    assert(math.abs(rows(2L)._2 - math.log(0.5)) < 1e-6)
  }

  test("bigramLogProb: single-token docs emit no row") {
    import spark.implicits._
    val docs = Seq((1L, "lonely"), (2L, "a b")).toDF("doc_id", "text")
    val ids = TextAnalysis.bigramLogProb(docs).collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L))
  }
}
