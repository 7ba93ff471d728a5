package graft.operators

import graft.SparkSpec

class NoveltySpec extends SparkSpec {

  private def docsDF = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta gamma delta"),       // introduces both its 3-grams
      (1L, "alpha beta gamma epsilon"),     // shares "alpha beta gamma"
      (2L, "zeta eta theta iota")           // all new
    ).toDF("doc_id", "text")
  }

  test("noveltyScores credits first occurrence by min doc_id") {
    val rows = TextAnalysis.noveltyScores(docsDF, n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // doc 0: grams {a b g, b g d} both first here → 2/2.
    // doc 1: {a b g} seen (doc 0), {b g e} new → 1/2.
    // doc 2: {z e t, e t i} both new → 2/2.
    assert(rows === Seq(
      (0L, 2L, 2L, 1.0), (1L, 2L, 1L, 0.5), (2L, 2L, 2L, 1.0)))
  }

  test("spanHotspots ranks spans by doc spread then occurrences") {
    import spark.implicits._
    val docs = Seq(
      (0L, "one two three four five six"),   // "one..five" span shared by 3 docs
      (1L, "one two three four five seven"),
      (2L, "prefix one two three four five"),
      (3L, "lonely words with no repeats at all")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.spanHotspots(docs, n = 5, minDocs = 2, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // only "one two three four five" appears in ≥2 docs (3 of them, once each)
    assert(rows === Seq(("one two three four five", 3L, 3L)))
  }

  test("spanHotspots counts within-doc repeats in n_occ but not n_docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e a b c d e"),  // span "a b c d e" occurs 2x here
      (1L, "x a b c d e y")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.spanHotspots(docs, n = 5, minDocs = 2, topN = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).head
    assert(top === (("a b c d e", 2L, 3L)))
  }

  test("vocabGrowth buckets first occurrences and accumulates") {
    import spark.implicits._
    // 10 docs, ids 0..9 → bucket = id with buckets=10. Terms: "common"
    // first in doc 0; each doc d also has unique term u<d>.
    val docs = (0L to 9L).map(d => (d, s"common u$d")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, buckets = 10)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.head === ((0L, 2L, 2L)))     // common + u0
    assert(got.last === ((9L, 1L, 11L)))    // cumulative = full vocab
    assert(got.size === 10)
  }
}
