package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFns

class SimilaritySpec extends SparkSpec {

  private def embDF = {
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.1f, 0.0f), 0),   // close to query
      (2L, Seq(0.0f, 1.0f, 0.0f), 0),   // orthogonal
      (3L, Seq(-1.0f, 0.0f, 0.0f), 1),  // opposite
      (4L, Seq(0.7f, 0.7f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
  }

  test("cosine HOF math") {
    import spark.implicits._
    val c = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
      .select(VectorFns.cosine(col("a"), col("b"))).as[Double].collect().head
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("brute-force top-k orders by cosine") {
    val got = Similarity.topKCosine(embDF, queryId = 0L, k = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 4L, 2L))
  }

  test("LSH bucket keeps the near neighbour with the query") {
    // planes are data-independent; with 2 planes over dim 3, query (1,0,0)
    // and its near-dup (0.9,0.1,0) should share a bucket.
    val got = Similarity.lshTopK(embDF, queryId = 0L, k = 5, nPlanes = 2, dim = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.contains(1L))
    assert(!got.contains(3L))  // opposite vector can never share all signs
  }

  test("nearest within label") {
    // nCells = 1 → one cell → exact within-label NN
    val got = Similarity.nearestWithinLabel(embDF, nCells = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(0L) === 1L)
    assert(got(1L) === 0L)
  }

  test("nearest within label restricts candidates to the IVF cell") {
    // with every vector its own centroid (nCells = 5) each (label, cell)
    // block is a singleton → no candidate pairs → empty result
    assert(Similarity.nearestWithinLabel(embDF, nCells = 5).count() === 0L)
  }
}
