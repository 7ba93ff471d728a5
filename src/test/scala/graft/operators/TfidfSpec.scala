package graft.operators

import graft.SparkSpec

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  test("tf-idf keywords pick distinctive terms over ubiquitous ones") {
    // "common" appears in every doc (idf = ln(1) = 0) and must never be
    // a keyword despite its high tf; each doc's rare term must rank 1.
    val docs = Seq(
      (1L, "common common common apple apple banana"),
      (2L, "common common cherry cherry cherry"),
      (3L, "common date")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.tfidfKeywords(docs, topPerDoc = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getDouble(3)))
      .toMap
    assert(rows((1L, 1))._1 == "apple")   // tf 2 · ln(3/1)
    assert(rows((2L, 1))._1 == "cherry")  // tf 3 · ln(3/1)
    assert(rows((3L, 1))._1 == "date")
    val expected = 2.0 * math.log(3.0)
    assert(math.abs(rows((1L, 1))._2 -
      math.round(expected * 1e6) / 1e6) < 1e-9)
    // "common" scores exactly 0 everywhere → can only appear by tie at
    // the bottom, never above a positive-idf term
    rows.values.filter(_._1 == "common").foreach { case (_, s) =>
      assert(s == 0.0)
    }
  }

  test("rank ties break alphabetically on the term") {
    val docs = Seq((1L, "zeta alpha"), (2L, "solo")).toDF("doc_id", "text")
    val rows = TextAnalysis.tfidfKeywords(docs, topPerDoc = 2)
      .filter("doc_id = 1").collect()
      .map(r => r.getInt(1) -> r.getString(2)).toMap
    // equal tf·idf for both terms of doc 1 → alphabetical order
    assert(rows(1) == "alpha" && rows(2) == "zeta")
  }
}
