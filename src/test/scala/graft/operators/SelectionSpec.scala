package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SelectionSpec extends SparkSpec {

  private def docsDF = {
    import spark.implicits._
    Seq(
      (1L, 100L), (2L, 200L), (3L, 50L), (4L, 400L),
      (5L, 0L),   // non-positive weight: excluded from A-Res
      (6L, -3L)
    ).toDF("doc_id", "n_chars")
  }

  test("weightedSample excludes non-positive weights and caps at k") {
    val got = Selection.weightedSample(docsDF, k = 3, weightCol = "n_chars")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.size === 3)
    assert(!got.contains(5L) && !got.contains(6L))
  }

  test("weightedSample with k >= n returns every positive-weight row, deterministically") {
    val a = Selection.weightedSample(docsDF, k = 10, weightCol = "n_chars")
      .select("doc_id", "ares_key").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Selection.weightedSample(docsDF, k = 10, weightCol = "n_chars")
      .select("doc_id", "ares_key").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a === b)
    assert(a.map(_._1).toSet === Set(1L, 2L, 3L, 4L))
  }

  private def scoredDF = {
    import spark.implicits._
    // (doc_id, score, tokens); global order is score desc, doc_id asc.
    Seq(
      (1L, 0.9, 100L), (2L, 0.9, 100L),
      (3L, 0.5, 100L), (4L, 0.5, 100L),
      (5L, 0.1, 100L)
    ).toDF("doc_id", "quality", "n_toks")
  }

  test("tokenBudgetSelect keeps the exact inclusive-cumsum prefix") {
    // Budget 250: docs 1 (100), 2 (200) fit; doc 3 would reach 300.
    val got = Selection.tokenBudgetSelect(scoredDF, 250L, "quality", "n_toks")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }

  test("tokenBudgetSelect splits a tied boundary bucket by doc_id order") {
    // Budget 300: the 0.5-score bucket holds docs 3 and 4; only doc 3 fits.
    val got = Selection.tokenBudgetSelect(scoredDF, 300L, "quality", "n_toks")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 3L))
  }

  test("tokenBudgetSelect with budget >= total keeps everything") {
    val got = Selection.tokenBudgetSelect(scoredDF, 10000L, "quality", "n_toks")
    assert(got.count() === 5)
    assert(got.columns.toSet === Set("doc_id", "quality", "n_toks"))
  }

  test("tokenBudgetSelect with budget below the first doc keeps nothing") {
    val got = Selection.tokenBudgetSelect(scoredDF, 50L, "quality", "n_toks")
    assert(got.count() === 0)
  }

  private def mmrEmbDF = {
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 0),  // query
      (1L, Seq(0.7f, 0.7f, 0.0f), 0),  // relevant
      (2L, Seq(0.7f, 0.7f, 0.0f), 0),  // exact duplicate of 1: redundant
      (3L, Seq(0.7f, -0.7f, 0.0f), 0), // equally relevant, orthogonal to 1
      (4L, Seq(0.0f, 0.0f, 1.0f), 0)   // irrelevant (rel = 0), fully diverse
    ).toDF("vec_id", "embedding", "label")
  }

  test("mmrSelect picks relevance first, then trades redundancy for diversity") {
    val got = Selection.mmrSelect(mmrEmbDF, queryId = 0L, k = 3, lambda = 0.5, m = 10)
      .orderBy("pick_order").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    // Pick 1: vecs 1/2/3 tie on relevance (0.7071) → lowest id, vec 1.
    // Pick 2: vec 2 duplicates pick 1 (max_sim = 1) so its score craters;
    // vec 3 is equally relevant but orthogonal → wins. Pick 3 at λ=0.5:
    // the duplicate's score 0.5·0.7071 − 0.5·1 < 0, so the irrelevant-
    // but-fully-diverse vec 4 (score 0) beats it.
    assert(got.map(_._1) === Seq(1, 2, 3))
    assert(got.map(_._2) === Seq(1L, 3L, 4L))
  }

  test("kCenterSelect seeds with the lowest id and walks farthest-first") {
    import spark.implicits._
    // Seed = 0 (lowest id). Farthest from 0=(1,0,0): its opposite 3.
    // Then the vector farthest from BOTH (max-min): 4=(0,0,1), dist 1.0
    // to each, beats 1/2 (near 0: min-dist ≈ 0).
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 0),
      (1L, Seq(0.99f, 0.1f, 0.0f), 0),
      (2L, Seq(0.98f, 0.2f, 0.0f), 0),
      (3L, Seq(-1.0f, 0.0f, 0.0f), 0),
      (4L, Seq(0.0f, 0.0f, 1.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Selection.kCenterSelect(embs, k = 3)
      .orderBy("pick_order").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._2) === Seq(0L, 3L, 4L))
    assert(got.head._3 === -1.0)
    assert(got(1)._3 === 2.0) // 1 - (-1) = 2: antipodal
    assert(got(2)._3 === 1.0) // orthogonal to both centers
  }

  test("oversampled k-center reproduces the exact traversal on clustered data") {
    import spark.implicits._
    // 62 vectors, 4 clusters (reps at ids 0-3 so each IVF cell IS a
    // cluster) + 2 outliers; candidates = 4 cells × (4 extremes + 1
    // medoid) + seed = non-trivially fewer rows than the corpus.
    val rows =
      Seq((0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(0.0f, 1.0f, 0.0f)),
        (2L, Seq(0.0f, 0.0f, 1.0f)), (3L, Seq(0.7f, 0.7f, 0.0f))) ++
      (4L to 19L).map(i => (i, Seq(1.0f, 0.0f, 0.0f))) ++
      (20L to 35L).map(i => (i, Seq(0.0f, 1.0f, 0.0f))) ++
      (36L to 51L).map(i => (i, Seq(0.0f, 0.0f, 1.0f))) ++
      (52L to 59L).map(i => (i, Seq(0.7f, 0.7f, 0.0f))) ++
      Seq((60L, Seq(-1.0f, 0.0f, 0.0f)), (61L, Seq(0.0f, -0.7f, -0.7f)))
    val embs = rows.toDF("vec_id", "embedding")
    val exact = Selection.kCenterSelect(embs, k = 4)
      .orderBy("pick_order").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val fast = Selection.kCenterSelectOversampled(embs, k = 4,
        oversample = 4, nCells = 4)
      .orderBy("pick_order").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    // identical picks AND identical winning distances (same rounded
    // arithmetic, not just the same ids)
    assert(fast === exact)
    assert(exact.map(_._2) === Seq(0L, 60L, 1L, 2L)) // seed, antipode, reps
  }

  test("oversampled k-center stays near the exact cover on unstructured data") {
    // Near-random embeddings have no cluster structure, so no sublinear
    // candidate set can guarantee the exact argmax chain — the contract
    // here is QUALITY: each round's winning distance stays within 10% of
    // the exact traversal's.
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Selection.kCenterSelect(embs, k = 4)
      .orderBy("pick_order").collect().map(_.getDouble(2)).toSeq
    val fast = Selection.kCenterSelectOversampled(embs, k = 4,
        oversample = 8, nCells = 16)
      .orderBy("pick_order").collect().map(_.getDouble(2)).toSeq
    exact.zip(fast).drop(1).foreach { case (e, f) =>
      assert(f >= 0.9 * e, s"fast round dist $f fell >10% under exact $e")
    }
  }
}
