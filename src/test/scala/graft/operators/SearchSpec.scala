package graft.operators

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("RRF fuses keyword and vector ranks; single-list docs still score") {
    val docs = Seq(
      (0L, "query terms spark vector window"),
      (1L, "spark spark spark only keyword rich document"),
      (2L, "vector vector text that also mentions spark"),
      (3L, "nothing relevant in this one at all")
    ).toDF("doc_id", "text")
    // 2-d embeddings: doc 3 is closest to the query (vec 0) despite no
    // keyword hits; doc 1 has keywords but an opposite-direction vector.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(-1.0f, 0.1f), 0),
      (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(1.0f, 0.01f), 0)
    ).toDF("vec_id", "embedding", "label")
    val rows = Search.hybridRrfTopK(docs, emb,
      Seq("spark", "vector", "window"), queryId = 0L, topK = 10)
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)),
        r.getDouble(3))).toMap

    // doc 2 is in both lists → two reciprocal terms.
    val (r2kw, r2v, rrf2) = rows(2L)
    assert(r2kw.nonEmpty && r2v.nonEmpty)
    assert(math.abs(rrf2 -
      BigDecimal(1.0 / (60 + r2kw.get.asInstanceOf[Int]) +
        1.0 / (60 + r2v.get.asInstanceOf[Int]))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // doc 3: vector-only (no keyword hit) still surfaces.
    assert(rows(3L)._1.isEmpty && rows(3L)._2.nonEmpty)
    // doc 0 appears via keywords even though it IS the query vector
    // (excluded from the vector list only).
    assert(rows(0L)._2.isEmpty && rows(0L)._1.nonEmpty)
    // both-list doc 2 outranks every single-list doc.
    assert(rrf2 > rows(3L)._3 && rrf2 > rows(1L)._3)
  }

  // Corpus: d1 "a b", d2 "a a a a a a", d3 "a b c", d4 "c c".
  // Query [a] (k=2): relevant = {1,2,3}; single-term BM25 ranks d2
  // (tf 6) > d1 > d3, so top-2 = {2,1}, recall 2/3; both hits at ranks
  // 1-2 means DCG = IDCG → nDCG 1. Query [a,zzz]: AND-relevance is
  // empty → all metrics pinned to 0, no division blow-up.
  test("evalRetrieval: recall fraction, perfect-prefix nDCG, empty truth") {
    import spark.implicits._
    val docsDF = Seq(
      (1L, "a b"), (2L, "a a a a a a"), (3L, "a b c"), (4L, "c c"))
      .toDF("doc_id", "text")
    val got = Search.evalRetrieval(docsDF,
        Seq(1 -> Seq("a"), 2 -> Seq("a", "zzz")), k = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1) === ((3L, 0.666667, 1.0, 1.0)))
    assert(got(2) === ((0L, 0.0, 0.0, 0.0)))
  }
}
