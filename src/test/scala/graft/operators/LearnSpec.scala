package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LearnSpec extends SparkSpec {
  import spark.implicits._

  // Linearly separable toy corpus: positive docs speak "alpha", negative
  // docs speak "omega"; dims small enough to exercise bucket collisions
  // of the filler tokens but keep the marker buckets distinct.
  private def toy = Seq(
    (1L, "alpha alpha common filler", 1),
    (2L, "alpha common words here", 1),
    (3L, "more alpha text common", 1),
    (4L, "omega common filler", 0),
    (5L, "omega omega words here", 0),
    (6L, "text with omega common", 0)
  ).toDF("doc_id", "text", "y")

  test("training separates a linearly separable corpus") {
    val d = toy
    val w = Learn.trainLogReg(d, col("y") === 1, dims = 32, iters = 20, lr = 2.0)
    val preds = Learn.predictLogReg(d, w, col("y") === 1, dims = 32).collect()
    assert(preds.length == 6)
    assert(preds.forall(r => r.getAs[Long]("pred") == r.getAs[Long]("y")))
  }

  test("each gradient step lowers training log-loss") {
    val d = toy
    def logLoss(iters: Int): Double = {
      val w = Learn.trainLogReg(d, col("y") === 1, dims = 32, iters = iters, lr = 0.5)
      Learn.predictLogReg(d, w, col("y") === 1, dims = 32)
        .select(avg(when(col("y") === 1, -log(col("p")))
          .otherwise(-log(lit(1.0) - col("p")))).as("ll"))
        .as[Double].head()
    }
    val losses = Seq(0, 1, 2, 3).map(logLoss)
    losses.sliding(2).foreach { case Seq(a, b) => assert(b < a,
      s"loss must decrease each step: $losses") }
  }

  test("trainPredictLogReg ≡ predictLogReg ∘ trainLogReg (fused reuse)") {
    val d = toy
    val unfused = Learn.predictLogReg(d,
        Learn.trainLogReg(d, col("y") === 1, dims = 32, iters = 3, lr = 0.5),
        col("y") === 1, dims = 32)
      .orderBy("doc_id").as[(Long, Double, Long, Long)].collect()
    val fused = Learn.trainPredictLogReg(d, col("y") === 1,
        dims = 32, iters = 3, lr = 0.5)
      .orderBy("doc_id").as[(Long, Double, Long, Long)].collect()
    assert(fused.sameElements(unfused),
      s"fused=${fused.toSeq} unfused=${unfused.toSeq}")
  }

  test("zero iterations returns the zero vector; weights are deterministic") {
    val d = toy
    val w0 = Learn.trainLogReg(d, col("y") === 1, dims = 16, iters = 0)
    assert(w0.count() == 16)
    assert(w0.agg(sum(abs(col("w")))).as[Double].head() == 0.0)
    val a = Learn.trainLogReg(d, col("y") === 1, dims = 16, iters = 3)
      .orderBy("bucket").as[(Long, Double)].collect()
    val b = Learn.trainLogReg(d, col("y") === 1, dims = 16, iters = 3)
      .orderBy("bucket").as[(Long, Double)].collect()
    assert(a.sameElements(b))
  }

  test("naive Bayes separates the toy corpus in one pass") {
    val d = toy
    val m = Learn.trainNaiveBayes(d, col("y") === 1, dims = 32)
    assert(m.count() == 32)
    val preds = Learn.predictNaiveBayes(d, m, col("y") === 1, dims = 32).collect()
    assert(preds.length == 6)
    assert(preds.forall(r => r.getAs[Long]("pred") == r.getAs[Long]("y")))
  }

  test("chi2 ranks the class-marker buckets above neutral fillers") {
    // "common" in EVERY doc (zero information); markers perfectly split.
    val d = Seq(
      (1L, "alpha common filler", 1),
      (2L, "alpha common words", 1),
      (3L, "alpha common text", 1),
      (4L, "omega common filler", 0),
      (5L, "omega common words", 0),
      (6L, "omega common text", 0)
    ).toDF("doc_id", "text", "y")
    val scored = Learn.chi2Features(d, col("y") === 1, dims = 32)
      .orderBy(col("chi2").desc).collect()
    val markerBuckets = Learn.hashedCounts(
        Seq((1L, "alpha"), (2L, "omega")).toDF("doc_id", "text"), dims = 32)
      .select("bucket").as[Long].collect().toSet
    // The two perfectly class-correlated marker buckets must rank top-2.
    assert(scored.take(2).map(_.getAs[Long]("bucket")).toSet == markerBuckets)
    // "common" appears in every doc → pinned to zero information.
    val commonBucket = Learn.hashedCounts(
        Seq((1L, "common")).toDF("doc_id", "text"), dims = 32)
      .select("bucket").as[Long].head()
    val commonChi2 = scored.find(_.getAs[Long]("bucket") == commonBucket).get
      .getAs[Double]("chi2")
    assert(commonChi2 == 0.0)
  }

  test("evalMetrics computes a known confusion matrix and rates") {
    val preds = Seq((1L, 1L, 1L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 0L, 0L),
      (5L, 1L, 1L)).toDF("doc_id", "pred", "y")
    val m = Learn.evalMetrics(preds).head()
    assert((m.getAs[Long]("tp"), m.getAs[Long]("fp"),
      m.getAs[Long]("fn"), m.getAs[Long]("tn")) == ((2L, 1L, 1L, 1L)))
    assert(m.getAs[Double]("precision") == 0.666667)
    assert(m.getAs[Double]("recall") == 0.666667)
    assert(m.getAs[Double]("f1") == 0.666667)
    assert(m.getAs[Double]("accuracy") == 0.6)
    // degenerate: no predicted positives → precision pinned to 0
    val deg = Learn.evalMetrics(
      Seq((1L, 0L, 1L), (2L, 0L, 0L)).toDF("doc_id", "pred", "y")).head()
    assert(deg.getAs[Double]("precision") == 0.0 && deg.getAs[Double]("f1") == 0.0)
  }

  test("modelAgreement: kappa is 1 on identical, 0 on constant predictions") {
    def preds(ps: Seq[(Long, Long)]) = ps.toDF("doc_id", "pred")
    val a = preds(Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L)))
    val same = Learn.modelAgreement(a, a).head()
    assert(same.getAs[Double]("agree") == 1.0 && same.getAs[Double]("kappa") == 1.0)
    val const = preds(Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
    val degen = Learn.modelAgreement(const, const).head()
    assert(degen.getAs[Double]("pe") == 1.0 && degen.getAs[Double]("kappa") == 0.0)
    val inv = preds(Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 1L)))
    assert(Learn.modelAgreement(a, inv).head().getAs[Double]("kappa") == -1.0)
  }

  test("pcaTopComponent finds the dominant axis; projections are centered") {
    // Variance overwhelmingly along dim 0.
    val vecs = Seq(
      (1L, Seq(10.0f, 0.1f, 0.0f)),
      (2L, Seq(-10.0f, 0.0f, 0.1f)),
      (3L, Seq(6.0f, -0.1f, 0.0f)),
      (4L, Seq(-6.0f, 0.0f, -0.1f)),
      (5L, Seq(2.0f, 0.1f, 0.1f))
    ).toDF("vec_id", "embedding")
    val comp = Learn.pcaTopComponent(vecs, dim = 3, iters = 12)
    val loadings = comp.orderBy("i").select("loading").as[Double].collect()
    assert(math.abs(math.abs(loadings(0)) - 1.0) < 1e-3,
      s"dominant-axis loading: ${loadings.toSeq}")
    assert(math.abs(loadings(1)) < 0.05 && math.abs(loadings(2)) < 0.05)
    val norm = math.sqrt(loadings.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9)
    val scores = Learn.pcaProject(vecs, comp).select("pc1").as[Double].collect()
    assert(math.abs(scores.sum) < 1e-9, "centered scores must sum to 0")
    assert(scores.map(math.abs).max > 5.0, "dominant spread must survive projection")
  }

  test("pcaComponents: deflated second component is orthogonal and unit-norm") {
    val vecs = Seq(
      (1L, Seq(10.0f, 1.0f, 0.0f)),
      (2L, Seq(-10.0f, -1.1f, 0.1f)),
      (3L, Seq(6.0f, -2.0f, 0.0f)),
      (4L, Seq(-6.0f, 2.1f, -0.1f)),
      (5L, Seq(2.0f, 0.5f, 0.1f))
    ).toDF("vec_id", "embedding")
    val comps = Learn.pcaComponents(vecs, dim = 3, k = 2, iters = 24)
      .orderBy("comp", "i").collect()
      .groupBy(_.getAs[Long]("comp"))
      .map { case (c, rows) => c -> rows.map(_.getAs[Double]("loading")) }
    val v1 = comps(1L)
    val v2 = comps(2L)
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm(v1) - 1.0) < 1e-9 && math.abs(norm(v2) - 1.0) < 1e-9)
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-6, s"components must be orthogonal, dot=$dot")
    assert(math.abs(v1(0)) > 0.9, "first component tracks the dominant axis")
  }

  test("token-less documents drop out of training and inference") {
    val d = toy.union(Seq((7L, "", 1), (8L, "!!!", 0)).toDF("doc_id", "text", "y"))
    val w = Learn.trainLogReg(d, col("y") === 1, dims = 32, iters = 2)
    assert(w.count() == 32)
    val preds = Learn.predictLogReg(d, w, col("y") === 1, dims = 32)
    assert(preds.count() == 6)
  }

  test("aucQuantized: separation = 1, anti-separation = 0, all-tied = 0.5, hand U") {
    import spark.implicits._
    def auc(rows: Seq[(Double, Long)]): Double =
      Learn.aucQuantized(rows.toDF("score", "y")).head().getDouble(2)
    // perfect separation: every positive above every negative
    assert(auc(Seq((0.9, 1L), (0.8, 1L), (0.2, 0L), (0.1, 0L))) === 1.0)
    assert(auc(Seq((0.9, 0L), (0.8, 0L), (0.2, 1L), (0.1, 1L))) === 0.0)
    // one shared score: all pairs tied → 0.5 each
    assert(auc(Seq((0.5, 1L), (0.5, 0L), (0.5, 1L), (0.5, 0L))) === 0.5)
    // hand-computed mixed case: pos {0.8, 0.4}, neg {0.6, 0.2}
    // pairs: (.8>.6)=1 (.8>.2)=1 (.4<.6)=0 (.4>.2)=1 → U=3, AUC=3/4
    assert(auc(Seq((0.8, 1L), (0.4, 1L), (0.6, 0L), (0.2, 0L))) === 0.75)
    // quantization merges 0.1001/0.1004 into a tie at 3 decimals — the
    // pair counts half, by the U convention
    assert(auc(Seq((0.1001, 1L), (0.1004, 0L))) === 0.5)
  }

  test("aucQuantized: single-class input yields null auc, not a division error") {
    import spark.implicits._
    val r = Learn.aucQuantized(Seq((0.5, 1L), (0.9, 1L)).toDF("score", "y")).head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 0L)
    assert(r.isNullAt(2))
  }
}
