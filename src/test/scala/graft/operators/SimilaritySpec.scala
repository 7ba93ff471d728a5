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

  test("cellOutlierScores: prototypical member scores high, opposite low, z centered") {
    // nCells = 1 → one cell; centroid = mean (0.32, 0.36, 0). Vector 4
    // (0.7, 0.7, 0) points almost exactly along it; vector 3 (−1, 0, 0)
    // points away.
    val rows = Similarity.cellOutlierScores(embDF, nCells = 1)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Double]("centroid_cos"), r.getAs[Double]("cell_z")))).toMap
    assert(rows.keySet === Set(0L, 1L, 2L, 3L, 4L))
    val maxId = rows.maxBy(_._2._1)._1
    val minId = rows.minBy(_._2._1)._1
    assert(maxId === 4L)
    assert(minId === 3L)
    assert(rows(3L)._1 < 0)          // anti-aligned with the centroid
    assert(rows(3L)._2 < -1.0)       // the clear within-cell outlier
    // z-scores are centered by construction
    val zMean = rows.values.map(_._2).sum / rows.size
    assert(math.abs(zMean) < 1e-6)
  }

  test("knnClassify: majority vote with vote-count then lowest-label ties") {
    // nCells = 1 → exact kNN. k = 2 everywhere: each vector's two nearest
    // neighbours split 1-1 between labels 0 and 1 except vec 4 (both label
    // 0), so the lowest-label tie-break predicts 0 for all — flagging
    // label-1 rows (3, 4) as suspect labels.
    val got = Similarity.knnClassify(embDF, k = 2, nCells = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(4)))).toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L, 4L))
    got.foreach { case (id, (_, pred, nNbrs)) =>
      assert(pred === 0, s"vec $id predicted $pred")
      assert(nNbrs === 2L)
    }
    assert(got(3L)._1 === 1 && got(4L)._1 === 1) // stored ≠ predicted
  }

  test("PQ encode + ADC: hand-computed codes and asymmetric distances") {
    import spark.implicits._
    // dim 4, m=2 subspaces of 2, ksub=2 codebooks = subvectors of vecs 0,1
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.2f, 0.9f)),  // near codeword 0 in both subspaces
      (3L, Seq(0.1f, 0.8f, 0.7f, 0.1f))   // near codeword 1 in both subspaces
    ).toDF("vec_id", "embedding")
    val codes = Similarity.pqEncode(emb, m = 2, ksub = 2, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(codes === Map(0L -> "0,0", 1L -> "1,1", 2L -> "0,0", 3L -> "1,1"))

    // ADC from query 2: vec0 shares its codes → dist = d(q,cw0)+d(q,cw1)
    // = 0.02 + 0.05; vecs 1 and 3 share codes "1,1" → equal dist, tie by id
    val adc = Similarity.pqAdcTopK(emb, queryId = 2L, k = 3, m = 2, ksub = 2, dim = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(adc.map(_._1).toSeq === Seq(0L, 1L, 3L))
    assert(math.abs(adc.head._2 - 0.07) < 1e-6)
    assert(math.abs(adc(1)._2 - adc(2)._2) < 1e-12)
  }

  test("nearest within label restricts candidates to the IVF cell") {
    // with every vector its own centroid (nCells = 5) each (label, cell)
    // block is a singleton → no candidate pairs → empty result
    assert(Similarity.nearestWithinLabel(embDF, nCells = 5).count() === 0L)
  }
}
