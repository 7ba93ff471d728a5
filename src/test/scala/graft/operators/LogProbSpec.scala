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

  test("sourceDivergence: zero for a lone source, symmetric for mirrored skew") {
    import spark.implicits._
    // single source: its distribution IS the corpus → KL exactly 0
    val lone = Seq((1L, "a", "x y z")).toDF("doc_id", "source", "text")
    val r0 = TextAnalysis.sourceDivergence(lone).collect().head
    assert(r0.getString(0) === "a")
    assert(r0.getLong(1) === 3L)
    assert(r0.getDouble(2) === 0.0)
    // two mirrored sources (all-x vs all-y, equal mass): symmetric KL > 0
    val skewed = Seq((1L, "a", "x x x x"), (2L, "b", "y y y y"))
      .toDF("doc_id", "source", "text")
    val rows = TextAnalysis.sourceDivergence(skewed).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows("a") === rows("b"))
    assert(rows("a") > 0.0)
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
