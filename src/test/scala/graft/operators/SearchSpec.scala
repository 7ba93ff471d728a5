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
}
