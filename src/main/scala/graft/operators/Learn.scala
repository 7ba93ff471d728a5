package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{MomentsAgg, TextFns}
import graft.operators.Iterate.MaterializeOps

/** Distributed model training over hashed text features — the "train the
  * quality/language classifier ON the cluster" step of a curation
  * pipeline (fastText-style: hashed bag-of-words, mean pooling, linear
  * model). Closes the loop left open by `linear_score`'s documented
  * hash-derived weight stub: these weights are LEARNED from the corpus
  * with full-batch gradient descent, each iteration one distributed pass.
  *
  * Fixed iteration count + deterministic feature hashing (no RNG, no
  * partition-order dependence) make the trained weights a pure function
  * of the corpus, so a SQL oracle replays training by unrolling the same
  * iterations CTE-by-CTE — the PageRank/BPE oracle strategy applied to
  * model fitting.
  */
object Learn {

  /** Per-group simple OLS fit, y = a·x + b, from the closed-form normal
    * equations over EXACT integer sums (x and y are integer columns, so
    * Σx, Σy, Σx², Σy², Σxy accumulate as BIGINTs — no float summation
    * order anywhere; the only doubles are the final three divisions,
    * bit-identical across engines). Emits per group:
    * (slope, intercept, r2, n) — the workhorse trend/calibration fit a
    * profiling pass runs per segment before anything iterative.
    *
    * Scale shape: ONE partial+final hash agg to a |groups|-row frame;
    * everything after is per-row arithmetic on that bounded frame.
    * Groups with n < 2 or zero x-variance yield null slope (no line).
    */
  def olsFit(df: DataFrame, xCol: Column, yCol: Column,
      groupCol: String): DataFrame = {
    val x = xCol.cast("long")
    val y = yCol.cast("long")
    val sums = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
    val dx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val dy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val cov = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val slope = when(col("n") >= 2 && dx > 0.0, cov / dx)
    val intercept = (col("sy").cast("double") - slope * col("sx")) / col("n")
    val r2 = when(dx > 0.0 && dy > 0.0, cov * cov / (dx * dy))
    sums.select(col(groupCol), (floor((slope) * 1e6 + 0.5) / 1e6).as("slope"),
      (floor((intercept) * 1e6 + 0.5) / 1e6).as("intercept"), (floor((r2) * 1e6 + 0.5) / 1e6).as("r2"),
      col("n"))
  }

  /** Raw hashed term counts: (doc_id, bucket, cnt) — the un-normalized
    * sibling of [[hashedFeatures]], the form count-based models
    * (multinomial Naive Bayes, chi², DF statistics) consume. */
  def hashedCounts(docs: DataFrame, dims: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextFns.tokens(col(textCol))).as("term"))
      .select(col("doc_id"), TextAnalysis.hashBucket(col("term"), dims).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).cast("double").as("cnt"))

  /** Sparse hashed design matrix in COO form: (doc_id, bucket, x) with
    * x = (tokens of the doc hashing to `bucket`) / (tokens in the doc) —
    * mean-pooled bag of words over `dims` hash buckets, the fastText
    * input representation. Token-less documents emit no rows and drop
    * out of training, matching the oracle's inner-join shape.
    *
    * Scale shape: one tokenize+explode pass, then two partial-aggregable
    * groupBys; the COO frame is ≤ min(dims, doc_len) rows per document —
    * corpus-sized but NARROW (three scalar columns), the representation
    * a 100 TB design matrix has to take. `dims` bounds every model-side
    * structure regardless of vocabulary growth.
    */
  def hashedFeatures(docs: DataFrame, dims: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val tf = hashedCounts(docs, dims, textCol, idCol)
    // per-doc total as an unbounded window over the doc's rows instead
    // of a groupBy + self-join (r19): one exchange fewer, and the output
    // comes out hash-partitioned by doc_id — which the training loop's
    // per-iteration margin window then reuses without re-shuffling. The
    // counts are integral doubles, so the summation-order difference is
    // exact-in-fp and x is bit-identical to the join form.
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
    tf.select(col("doc_id"), col("bucket"),
      (col("cnt") / sum(col("cnt")).over(byDoc)).as("x"))
  }

  /** Full-batch logistic regression: `iters` gradient-descent steps of
    * w ← w − lr · (1/N) Σ_d (σ(w·x_d) − y_d) x_d, weights seeded 0 —
    * the Spark MLlib GD shape: gradients aggregated on the cluster, the
    * dims-bounded model held and updated on the driver.
    *
    * Each iteration is ONE action over the checkpointed COO design
    * matrix: per-document margins via an `element_at` lookup into the
    * weight-array literal (no join — the model ships inside the
    * expression), then a partial-aggregable per-bucket gradient sum
    * collected as ≤dims rows. Both shuffles key on values that scale
    * (documents, hash buckets); nothing corpus-sized is ever broadcast or
    * collected (contrast the unbounded-vocabulary hazard `unigramLogProb`
    * documents).
    *
    * `labelCol` is evaluated against `docs` (e.g. `col("lang") === "en"`
    * trains a language detector; a quality-gate boolean trains a quality
    * classifier).
    */
  def trainLogRegWeights(docs: DataFrame, labelCol: Column, dims: Int = 64,
      iters: Int = 3, lr: Double = 0.5, textCol: String = "text",
      idCol: String = "doc_id"): Array[Double] =
    logRegFit(docs, labelCol, dims, iters, lr, textCol, idCol)._1

  /** [[trainLogRegWeights]] body, ALSO returning the materialized
    * labelled design matrix (doc_id, bucket, x, y) it trained on — the
    * train-then-predict compositions ([[trainPredictLogReg]]) reuse the
    * checkpointed frame instead of re-deriving tokenize+hash+window for
    * inference (r20, guide §5/§1.2: the design matrix was computed twice
    * per predict-shaped query).
    */
  private def logRegFit(docs: DataFrame, labelCol: Column, dims: Int,
      iters: Int, lr: Double, textCol: String,
      idCol: String): (Array[Double], DataFrame) = {
    require(dims >= 1 && iters >= 0, s"need dims >= 1, iters >= 0")
    // Design matrix pre-joined with its labels ONCE; every iteration then
    // reads only this checkpointed frame (no per-step parquet re-scan).
    val fl = hashedFeatures(docs, dims, textCol, idCol)
      .join(docs.select(col(idCol).as("doc_id"),
        labelCol.cast("double").as("y")), "doc_id")
      .materialized
    val n = fl.select(countDistinct(col("doc_id"))).head().getLong(0).toDouble
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val w = new Array[Double](dims)
    for (it <- 1 to iters) {
      val wLit = array(w.toIndexedSeq.map(lit): _*)
      // One pass: the margin is an unbounded-frame window sum over the
      // doc's rows (co-partitioned with the rows the gradient needs, so
      // no join), the gradient a partial-aggregable per-bucket sum.
      // Iteration 1's margin is EXACTLY 0 (weights seeded 0: every term
      // is x·0, summing to +0.0 in fp) — skip the window evaluation
      // outright (r20, §4: the sort+window over the whole design matrix
      // bought nothing on the first pass).
      val margin =
        if (it == 1) lit(0.0)
        else sum(col("x") *
          element_at(wLit, col("bucket").cast("int") + 1)).over(byDoc)
      val g = fl
        .withColumn("err",
          lit(1.0) / (lit(1.0) + exp(-margin)) - col("y"))
        .groupBy(col("bucket")).agg(sum(col("err") * col("x")).as("g"))
        .collect()
      val gArr = new Array[Double](dims)
      g.foreach(r => gArr(r.getAs[Long]("bucket").toInt) = r.getAs[Double]("g"))
      var b = 0
      while (b < dims) { w(b) = w(b) - lr * gArr(b) / n; b += 1 }
    }
    (w, fl)
  }

  /** Train + predict FUSED over one materialized design matrix: output
    * ≡ `predictLogReg(docs, trainLogReg(docs, …), …)` — same (doc_id,
    * p, pred, y) rows — but inference reads the checkpointed design
    * matrix the training loop already built (the margin re-uses its
    * doc_id partitioning: zero extra exchanges) instead of re-running
    * tokenize → hash-count → per-doc window over the corpus, and the
    * dims-bounded weight join becomes the same in-expression
    * `element_at` lookup the trainer uses. The label rides the frame:
    * `y` is constant per doc_id by construction (one doc = one label),
    * so `first(y)` in the per-doc aggregate is deterministic.
    */
  def trainPredictLogReg(docs: DataFrame, labelCol: Column, dims: Int = 64,
      iters: Int = 3, lr: Double = 0.5, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val (w, fl) = logRegFit(docs, labelCol, dims, iters, lr, textCol, idCol)
    val wLit = array(w.toIndexedSeq.map(lit): _*)
    fl.groupBy(col("doc_id"))
      .agg(sum(col("x") *
        element_at(wLit, col("bucket").cast("int") + 1)).as("m"),
        first(col("y")).as("_y"))
      .select(col("doc_id"),
        (floor((lit(1.0) / (lit(1.0) + exp(-col("m")))) * 1e6 + 0.5) / 1e6)
          .as("p"),
        col("_y"))
      .withColumn("pred", when(col("p") >= 0.5, 1L).otherwise(0L))
      .select(col("doc_id"), col("p"), col("pred"),
        col("_y").cast("long").as("y"))
  }

  /** Full-batch logistic regression as a (bucket, w) frame — see
    * [[trainLogRegWeights]] for the iteration shape. */
  def trainLogReg(docs: DataFrame, labelCol: Column, dims: Int = 64,
      iters: Int = 3, lr: Double = 0.5, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = trainLogRegWeights(docs, labelCol, dims, iters, lr, textCol, idCol)
    w.toIndexedSeq.zipWithIndex.map { case (x, b) => (b.toLong, x) }
      .toDF("bucket", "w")
  }

  /** Inference under a trained weight table: per-document probability and
    * hard prediction, joined with the true label for evaluation. The
    * weight table is `dims` rows — a bounded broadcast, the exact
    * deployment shape `LinearScoreExpr`'s Scaladoc promises. Predictions
    * threshold the ROUNDED probability so the hard label is
    * engine-independent at 6 decimal places.
    *
    * @return (doc_id, p, pred, y) one row per document with ≥1 token.
    */
  def predictLogReg(docs: DataFrame, weights: DataFrame, labelCol: Column,
      dims: Int = 64, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val feat = hashedFeatures(docs, dims, textCol, idCol)
    val lab = docs.select(col(idCol).as("doc_id"),
      labelCol.cast("long").as("y"))
    feat.join(broadcast(weights), "bucket")
      .groupBy(col("doc_id")).agg(sum(col("x") * col("w")).as("m"))
      .select(col("doc_id"),
        (floor((lit(1.0) / (lit(1.0) + exp(-col("m")))) * 1e6 + 0.5) / 1e6).as("p"))
      .withColumn("pred", when(col("p") >= 0.5, 1L).otherwise(0L))
      .join(lab, "doc_id")
  }

  /** Reliability table for a probabilistic classifier: bucket predictions
    * into `nBins` equal-width probability bins and compare mean predicted
    * probability against the empirical positive rate per bin — the data
    * behind a calibration curve / ECE, the standard check before using a
    * quality classifier's scores as sampling weights (miscalibrated
    * scores silently skew the mixture).
    *
    * One partial-aggregable groupBy over the prediction frame; output is
    * ≤ `nBins` rows regardless of corpus size.
    *
    * @param preds output of [[predictLogReg]]: (doc_id, p, pred, y).
    * @return (bin, n, avg_p, frac_pos) ordered by bin; bins with no
    *         predictions emit no row.
    */
  def calibrationTable(preds: DataFrame, nBins: Int = 10): DataFrame =
    preds
      .withColumn("bin",
        least(floor(col("p") * nBins).cast("long"), lit(nBins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        // avg of doubles floor-snaps (BASELINE.md); frac_pos is a ratio
        // of exact integer sums — deterministic without snapping
        (floor(avg(col("p")) * 1e6 + 0.5) / 1e6).as("avg_p"),
        (sum(col("y")).cast("double") / count(col("y"))).as("frac_pos"))
      .orderBy("bin")

  /** Covariance matrix of an `array<float>` embedding column as a COO
    * frame (i, j, c), dim² rows. Sufficient statistics come from
    * [[MomentsAgg]] — ONE fused pass, only a (d + d² + 1)-double buffer
    * on the wire — then the matrix materializes by exploding the single
    * moment row. cov[i,j] = Σxᵢxⱼ/n − (Σxᵢ/n)·(Σxⱼ/n), parenthesized
    * exactly as the SQL oracle renders it so both engines run the same
    * IEEE operation sequence.
    */
  /** One-row raw-moment frame (s, ss, n) from a single [[MomentsAgg]]
    * corpus pass — THE corpus-touching step of a PCA fit; everything
    * downstream ([[covarianceMatrix]], the mean vector, the power
    * iterations) derives from this model-sized artifact. */
  def rawMoments(embeddings: DataFrame, embCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings.select(col(embCol).cast("array<float>").as("e"))
      .as[Seq[Float]]
      .select(MomentsAgg.toColumn.name("m"))
      .select(col("_1").as("s"), col("_2").as("ss"),
        col("_3").cast("double").as("n"))
  }

  private def covFromMoments(mom: DataFrame, dim: Int): DataFrame = {
    val iIdx = (col("k") / lit(dim)).cast("long")
    val jIdx = col("k") % lit(dim)
    mom
      .select(col("s"), col("n"), posexplode(col("ss")).as(Seq("k", "sxy")))
      .select(iIdx.as("i"), jIdx.as("j"),
        (col("sxy") / col("n") -
          (element_at(col("s"), iIdx.cast("int") + 1) / col("n")) *
            (element_at(col("s"), jIdx.cast("int") + 1) / col("n"))).as("c"))
  }

  def covarianceMatrix(embeddings: DataFrame, dim: Int,
      embCol: String = "embedding"): DataFrame =
    covFromMoments(rawMoments(embeddings, embCol), dim)

  /** Top principal component by `iters` fixed power iterations over the
    * covariance matrix: v ← C·v / ‖C·v‖, seeded uniform 1/√dim. Fixed
    * iteration count (the PageRank convention) keeps the result a pure
    * function of the data so a SQL oracle replays it CTE-by-CTE.
    *
    * Scale shape: the corpus is touched ONCE (the [[MomentsAgg]] pass);
    * every iteration thereafter is dim² flops on the driver-resident
    * statistic — model-sized, independent of corpus size. The mean
    * vector rides along so [[pcaProject]] can center without a second
    * corpus pass.
    *
    * @return (i, loading, mu) — dim rows, unrounded.
    */
  def pcaTopComponent(embeddings: DataFrame, dim: Int, iters: Int = 8,
      embCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // ONE distributed corpus pass (MomentsAgg); the dim²-bounded
    // sufficient statistic then comes to the driver and the eigensolve
    // runs locally — the MLlib RowMatrix.computePrincipalComponents
    // shape (distributed Gramian, driver-side eigendecomposition). A
    // DataFrame-resident power iteration works too but pays an exchange
    // per step for a model-sized frame; the statistic is dim² doubles no
    // matter the corpus, so driver math is the right tier.
    val row = rawMoments(embeddings, embCol).head()
    val s = row.getSeq[Double](0).toArray
    val ss = row.getSeq[Double](1).toArray
    val n = row.getDouble(2)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      ss(i * dim + j) / n - (s(i) / n) * (s(j) / n))
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val cv = Array.tabulate(dim) { i =>
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += cov(i)(j) * v(j); j += 1 }
        acc
      }
      val nrm = math.sqrt(cv.map(x => x * x).sum)
      v = cv.map(_ / nrm)
    }
    v.toIndexedSeq.zipWithIndex.map { case (x, i) => (i.toLong, x, s(i) / n) }
      .toDF("i", "loading", "mu")
  }

  /** Top-k principal components by power iteration with Hotelling
    * deflation: after each converged component, C ← C − λ·v vᵀ with
    * λ = vᵀCv, then re-iterate from the uniform seed. Same corpus cost
    * as [[pcaTopComponent]] — ONE MomentsAgg pass; deflation is dim²
    * driver flops per component. Components come out orthogonal (up to
    * iteration convergence), eigenvalue-descending.
    *
    * @return (comp, i, loading) — comp ∈ [1, k], dim rows each.
    */
  def pcaComponents(embeddings: DataFrame, dim: Int, k: Int = 2,
      iters: Int = 8, embCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val row = rawMoments(embeddings, embCol).head()
    val s = row.getSeq[Double](0).toArray
    val ss = row.getSeq[Double](1).toArray
    val n = row.getDouble(2)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      ss(i * dim + j) / n - (s(i) / n) * (s(j) / n))
    val out = Seq.newBuilder[(Long, Long, Double)]
    for (comp <- 1 to k) {
      var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
      for (_ <- 1 to iters) {
        val cv = Array.tabulate(dim) { i =>
          var acc = 0.0
          var j = 0
          while (j < dim) { acc += cov(i)(j) * v(j); j += 1 }
          acc
        }
        val nrm = math.sqrt(cv.map(x => x * x).sum)
        v = cv.map(_ / nrm)
      }
      var lam = 0.0
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { lam += v(i) * cov(i)(j) * v(j); j += 1 }
        i += 1
      }
      i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { cov(i)(j) = cov(i)(j) - lam * (v(i) * v(j)); j += 1 }
        i += 1
      }
      v.zipWithIndex.foreach { case (x, d) => out += ((comp.toLong, d.toLong, x)) }
    }
    out.result().toDF("comp", "i", "loading")
  }

  /** Multinomial Naive Bayes over hashed term counts — the closed-form,
    * ONE-PASS trainer (contrast [[trainLogReg]]'s iterated GD): per-bucket
    * class-conditional counts in a single partial-aggregable aggregation,
    * then Laplace-smoothed log-likelihood-ratio weights
    * w_b = ln((c1_b+α)/(t1+α·dims)) − ln((c0_b+α)/(t0+α·dims)) on the
    * dims-bounded result. At 100 TB this is strictly an aggregation
    * query — no iteration, no driver sync per step, the shuffle carries
    * dims-row partials. Every bucket in [0, dims) gets a (smoothed)
    * weight, absent ones included.
    *
    * @return (bucket, w, prior) — dims rows; `prior` = ln(n1/n0) is the
    *         same on every row (carried so scorers need no second frame).
    */
  def trainNaiveBayes(docs: DataFrame, labelCol: Column, dims: Int = 64,
      alpha: Double = 1.0, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val fc = hashedCounts(docs, dims, textCol, idCol)
      .join(docs.select(col(idCol).as("doc_id"),
        labelCol.cast("double").as("y")), "doc_id")
    val perBucket = fc.groupBy(col("bucket")).agg(
      sum(when(col("y") === 1.0, col("cnt")).otherwise(0.0)).as("c1"),
      sum(when(col("y") === 0.0, col("cnt")).otherwise(0.0)).as("c0"))
    val tot = fc.agg(
      sum(when(col("y") === 1.0, col("cnt")).otherwise(0.0)).as("t1"),
      sum(when(col("y") === 0.0, col("cnt")).otherwise(0.0)).as("t0"),
      countDistinct(when(col("y") === 1.0, col("doc_id"))).cast("double").as("n1"),
      countDistinct(when(col("y") === 0.0, col("doc_id"))).cast("double").as("n0"))
    spark.range(dims).select(col("id").as("bucket"))
      .join(perBucket, Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"),
        (log((coalesce(col("c1"), lit(0.0)) + lit(alpha)) /
            (col("t1") + lit(alpha * dims))) -
          log((coalesce(col("c0"), lit(0.0)) + lit(alpha)) /
            (col("t0") + lit(alpha * dims)))).as("w"),
        log(col("n1") / col("n0")).as("prior"))
  }

  /** Score documents under a Naive Bayes model: decision score
    * = prior + Σ_b cnt_b · w_b, predict positive iff score ≥ 0. The model
    * is dims rows — a bounded broadcast — and scoring is one
    * partial-aggregable pass, the same deployment shape as
    * [[predictLogReg]]. Prediction thresholds the ROUNDED score so the
    * hard label is engine-independent.
    *
    * @return (doc_id, score, pred, y) one row per document with ≥1 token.
    */
  def predictNaiveBayes(docs: DataFrame, model: DataFrame, labelCol: Column,
      dims: Int = 64, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    hashedCounts(docs, dims, textCol, idCol)
      .join(broadcast(model), "bucket")
      .groupBy(col("doc_id"))
      .agg((floor((max(col("prior")) + sum(col("cnt") * col("w"))) * 1e6 + 0.5) / 1e6).as("score"))
      .withColumn("pred", when(col("score") >= 0.0, 1L).otherwise(0L))
      .join(docs.select(col(idCol).as("doc_id"),
        labelCol.cast("long").as("y")), "doc_id")

  /** Collect a trained Naive Bayes frame into its (weights, prior)
    * arrays — dims-bounded model artifacts for [[nbScoreColumn]]. */
  def nbModelArrays(model: DataFrame, dims: Int): (Array[Double], Double) = {
    val rows = model.select(col("bucket"), col("w"), col("prior")).collect()
    val w = new Array[Double](dims)
    rows.foreach(r => w(r.getAs[Long]("bucket").toInt) = r.getAs[Double]("w"))
    (w, rows.head.getAs[Double]("prior"))
  }

  /** The trained model compiled into ONE narrow column expression:
    * score = prior + Σ_tokens w[bucket(t)] — a per-row HOF fold with the
    * weight table as an array literal. No join, no shuffle, no state, so
    * the SAME expression scores a batch frame or a structured stream in
    * append mode (the quality-gate deployment shape: score each arriving
    * document and route on the result). Algebraically identical to
    * [[predictNaiveBayes]]'s per-bucket form (Σ_t w[bucket(t)] =
    * Σ_b cnt_b·w_b).
    */
  def nbScoreColumn(weights: Array[Double], prior: Double, dims: Int,
      textCol: Column): Column = {
    val wLit = array(weights.toIndexedSeq.map(lit): _*)
    lit(prior) + aggregate(TextFns.tokens(textCol), lit(0.0),
      (acc, t) => acc +
        element_at(wLit, TextAnalysis.hashBucket(t, dims).cast("int") + 1))
  }

  /** Binary-classification evaluation: confusion counts and the derived
    * precision/recall/F1/accuracy in one groupless aggregate (single
    * row out regardless of corpus size). Degenerate denominators (no
    * predicted/actual positives) pin the affected rate to 0 rather than
    * NULL, the common reporting convention.
    *
    * @param preds any frame with hard `pred` and true `y` columns.
    * @return (n, tp, fp, fn, tn, precision, recall, f1, accuracy).
    */
  def evalMetrics(preds: DataFrame): DataFrame =
    confusionFinalize(preds.agg(
      count(lit(1)).as("n"),
      sum(when(col("pred") === 1 && col("y") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred") === 1 && col("y") === 0, 1L).otherwise(0L)).as("fp"),
      sum(when(col("pred") === 0 && col("y") === 1, 1L).otherwise(0L)).as("fn"),
      sum(when(col("pred") === 0 && col("y") === 0, 1L).otherwise(0L)).as("tn")),
      keyCols = Nil)

  /** The precision/recall/F1/accuracy finalization shared by
    * [[evalMetrics]] and [[thresholdSweep]] — one definition so the two
    * paired oracles can never drift apart. Zero-denominator cases pin
    * the rate to 0.
    */
  private def confusionFinalize(counted: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val prec = when(col("tp") + col("fp") === 0, lit(0.0))
      .otherwise(col("tp") / (col("tp") + col("fp")))
    val rec = when(col("tp") + col("fn") === 0, lit(0.0))
      .otherwise(col("tp") / (col("tp") + col("fn")))
    counted.select(keyCols.map(col) ++ Seq(
      col("n"), col("tp"), col("fp"), col("fn"), col("tn"),
      (floor((prec) * 1e6 + 0.5) / 1e6).as("precision"), (floor((rec) * 1e6 + 0.5) / 1e6).as("recall"),
      (floor((when(prec + rec === 0.0, lit(0.0))
        .otherwise(lit(2.0) * prec * rec / (prec + rec))) * 1e6 + 0.5) / 1e6).as("f1"),
      (floor(((col("tp") + col("tn")) / col("n")) * 1e6 + 0.5) / 1e6).as("accuracy")): _*)
  }

  /** k-fold cross-validated Naive Bayes: deterministic md5 fold
    * assignment, one closed-form model per fold-complement, confusion
    * metrics on each held-out fold — the model-selection loop that tells
    * you whether a single split's metrics were luck.
    *
    * Scale shape — NOT `folds` independent train/score pipelines (the
    * r≤9 form: 15 corpus passes and 75 shuffles at folds=5): Naive Bayes
    * sufficient statistics are ADDITIVE, so ONE per-(fold, bucket)
    * aggregation yields every fold's statistics, and each complement
    * model is just totals − fold on a folds×dims frame. All statistics
    * are exact integer-valued sums (token counts, distinct doc counts),
    * so complement-by-subtraction is bit-identical to training on the
    * complement rows directly — the weights, scores and metrics are
    * unchanged. The whole CV is now 3 corpus passes (per-fold-bucket
    * counts, per-fold totals, scoring) and its cost no longer grows with
    * `folds` — the property that makes CV affordable at 100 TB.
    *
    * @return one finalized metrics row per fold, ordered by fold.
    */
  def crossValNB(docs: DataFrame, labelCol: Column, dims: Int = 64,
      folds: Int = 5, alpha: Double = 1.0): DataFrame = {
    require(folds >= 2, s"need >= 2 folds, got $folds")
    val spark = docs.sparkSession
    val lab = docs.select(col("doc_id"), labelCol.cast("double").as("y"),
      TextAnalysis.hashBucket(col("doc_id"), folds).as("fold"))
    val fc = hashedCounts(docs, dims).join(lab, "doc_id")
    // one corpus aggregation → every fold's per-bucket class counts
    val pfb = fc.groupBy(col("fold"), col("bucket")).agg(
      sum(when(col("y") === 1.0, col("cnt")).otherwise(0.0)).as("c1"),
      sum(when(col("y") === 0.0, col("cnt")).otherwise(0.0)).as("c0"))
    // one corpus aggregation → every fold's totals and doc counts
    val pft = fc.groupBy(col("fold")).agg(
      sum(when(col("y") === 1.0, col("cnt")).otherwise(0.0)).as("t1"),
      sum(when(col("y") === 0.0, col("cnt")).otherwise(0.0)).as("t0"),
      countDistinct(when(col("y") === 1.0, col("doc_id")))
        .cast("double").as("n1"),
      countDistinct(when(col("y") === 0.0, col("doc_id")))
        .cast("double").as("n0"))
    // complement statistics on tiny frames: totals − fold (exact ints)
    val totB = pfb.groupBy(col("bucket"))
      .agg(sum(col("c1")).as("tc1"), sum(col("c0")).as("tc0"))
    val totF = pft.agg(sum(col("t1")).as("tt1"), sum(col("t0")).as("tt0"),
      sum(col("n1")).as("tn1"), sum(col("n0")).as("tn0"))
    val grid = spark.range(dims.toLong * folds).select(
      (col("id") % dims).as("bucket"),
      floor(col("id") / dims).cast("long").as("fold"))
    val compB = grid
      .join(pfb, Seq("fold", "bucket"), "left")
      .join(totB, Seq("bucket"), "left")
      .select(col("fold"), col("bucket"),
        (coalesce(col("tc1"), lit(0.0)) - coalesce(col("c1"), lit(0.0))).as("c1c"),
        (coalesce(col("tc0"), lit(0.0)) - coalesce(col("c0"), lit(0.0))).as("c0c"))
    val compF = pft.crossJoin(broadcast(totF))
      .select(col("fold"),
        (col("tt1") - col("t1")).as("t1c"), (col("tt0") - col("t0")).as("t0c"),
        (col("tn1") - col("n1")).as("n1c"), (col("tn0") - col("n0")).as("n0c"))
    // same weight/prior expressions as trainNaiveBayes, per fold
    val model = compB.join(compF, "fold").select(
      col("fold"), col("bucket"),
      (log((col("c1c") + lit(alpha)) / (col("t1c") + lit(alpha * dims))) -
        log((col("c0c") + lit(alpha)) / (col("t0c") + lit(alpha * dims))))
        .as("w"),
      log(col("n1c") / col("n0c")).as("prior"))
    // one scoring pass: each doc scored by ITS fold's complement model
    val preds = fc.join(broadcast(model), Seq("fold", "bucket"))
      .groupBy(col("doc_id"), col("fold"), col("y").cast("long").as("y"))
      .agg((floor((max(col("prior")) + sum(col("cnt") * col("w"))) * 1e6 + 0.5) / 1e6).as("score"))
      .withColumn("pred", when(col("score") >= 0.0, 1L).otherwise(0L))
    confusionFinalize(preds.groupBy(col("fold")).agg(
      count(lit(1)).as("n"),
      sum(when(col("pred") === 1 && col("y") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred") === 1 && col("y") === 0, 1L).otherwise(0L)).as("fp"),
      sum(when(col("pred") === 0 && col("y") === 1, 1L).otherwise(0L)).as("fn"),
      sum(when(col("pred") === 0 && col("y") === 0, 1L).otherwise(0L)).as("tn")),
      keyCols = Seq("fold")).orderBy("fold")
  }

  /** Exact ROC AUC via the Mann-Whitney U statistic over a QUANTIZED
    * score grid — the scale-correct AUC: the corpus reduces to one
    * (score, n_pos, n_neg) row per distinct quantized score (bounded by
    * value-range/10^-decimals, independent of corpus size), so the
    * "global sort" every AUC needs runs over that bounded frame, never
    * the corpus. Quantization ties are handled exactly (tied pairs count
    * ½, the U convention), so this IS the AUC of the quantized scores,
    * not an approximation of it; 2U stays integral, the single division
    * at the end is the only float.
    *
    * @return one row: (n_pos, n_neg, auc) — auc null if a class is empty.
    */
  def aucQuantized(preds: DataFrame, decimals: Int = 3): DataFrame = {
    // floor-snap, not round(): the quantizer must match the oracle's
    // tie-break bit-for-bit (BASELINE.md hash rule)
    val scale = math.pow(10.0, decimals)
    val s = floor(col("score") * scale + 0.5) / scale
    val cnt = preds.groupBy(s.as("s"))
      .agg(sum(col("y")).as("np"), sum(lit(1L) - col("y")).as("nn"))
    // bounded frame (see above) — the single-partition window is over
    // |distinct quantized scores| rows, not the corpus
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    cnt.withColumn("nn_below", coalesce(sum(col("nn")).over(w), lit(0L)))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (lit(2L) * col("nn_below") + col("nn"))).as("u2"))
      .select(col("n_pos"), col("n_neg"),
        (floor((when(col("n_pos") > 0 && col("n_neg") > 0,
          col("u2") / (lit(2.0) * col("n_pos") * col("n_neg")))) * 1e6 + 0.5) / 1e6).as("auc"))
  }

  /** Operating-point sweep: confusion metrics of `score ≥ t` for every
    * threshold in a FIXED grid — the precision/recall trade a score-gate
    * deployment actually consults when picking its cut. A full ROC/AUC
    * needs a corpus-wide rank (a global sort the engine avoids); the
    * bounded grid gives the same decision table with one corpus pass ×
    * |grid| conditional partial aggregates and a |grid|-row output at
    * any scale.
    *
    * @param scored any frame with a `score` and true `y` column.
    * @return one row per threshold: (threshold, n, tp, fp, fn, tn,
    *         precision, recall, f1, accuracy), ordered by threshold.
    */
  def thresholdSweep(scored: DataFrame, thresholds: Seq[Double]): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val grid = thresholds.toDF("threshold")
    val pos = col("score") >= col("threshold")
    val counted = scored.crossJoin(broadcast(grid))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("n"),
        sum(when(pos && col("y") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(pos && col("y") === 0, 1L).otherwise(0L)).as("fp"),
        sum(when(!pos && col("y") === 1, 1L).otherwise(0L)).as("fn"),
        sum(when(!pos && col("y") === 0, 1L).otherwise(0L)).as("tn"))
    confusionFinalize(counted, keyCols = Seq("threshold"))
      .orderBy("threshold")
  }

  /** Inter-model agreement between two hard-prediction frames: observed
    * agreement, chance agreement, and Cohen's kappa — the ensemble sanity
    * check before trusting either classifier's labels for selection (two
    * models that agree only at chance add no signal to each other).
    *
    * One join on the id + one groupless aggregate; output is a single
    * row regardless of corpus size. Degenerate case: if chance agreement
    * is exactly 1 (both models constant), kappa is pinned to 0.
    *
    * @return (n, agree, pe, kappa) — one row, rates rounded.
    */
  def modelAgreement(predsA: DataFrame, predsB: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val joined = predsA.select(col(idCol), col("pred").as("pred_a"))
      .join(predsB.select(col(idCol), col("pred").as("pred_b")), idCol)
      .agg(count(lit(1)).as("n"),
        avg((col("pred_a") === col("pred_b")).cast("double")).as("po"),
        avg(col("pred_a").cast("double")).as("ra"),
        avg(col("pred_b").cast("double")).as("rb"))
    val pe = col("ra") * col("rb") + (lit(1.0) - col("ra")) * (lit(1.0) - col("rb"))
    joined.select(col("n"), (floor((col("po")) * 1e6 + 0.5) / 1e6).as("agree"),
      (floor((pe) * 1e6 + 0.5) / 1e6).as("pe"),
      (floor((when(pe === 1.0, lit(0.0))
        .otherwise((col("po") - pe) / (lit(1.0) - pe))) * 1e6 + 0.5) / 1e6).as("kappa"))
  }

  /** Chi-squared feature scoring over the (class × bucket-presence) 2×2
    * contingency table — the classic pre-training feature-selection
    * statistic. Document-level presence (not counts): a = positive docs
    * containing the bucket, b = negative docs containing it; with class
    * totals n1/n0 the 2×2 chi² closed form is
    * n·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)). One partial-aggregable pass
    * over distinct (doc, bucket) rows; output is ≤dims rows.
    *
    * @return (bucket, chi2) — buckets present in ≥1 doc, rounded.
    */
  def chi2Features(docs: DataFrame, labelCol: Column, dims: Int = 64,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val fc = hashedCounts(docs, dims, textCol, idCol)
      .join(docs.select(col(idCol).as("doc_id"),
        labelCol.cast("double").as("y")), "doc_id")
    val tot = docs.select(col(idCol).as("doc_id"),
        labelCol.cast("double").as("y"))
      .agg(sum(col("y")).as("n1"),
        sum(lit(1.0) - col("y")).as("n0"))
    fc.groupBy(col("bucket")).agg(
        sum(col("y")).as("a"),
        sum(lit(1.0) - col("y")).as("b"))
      .crossJoin(broadcast(tot))
      .select(col("bucket"),
        (floor((chi2Expr(col("a"), col("b"), col("n1"), col("n0"))) * 1e6 + 0.5) / 1e6)
          .as("chi2"))
  }

  /** n·(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) with c = n1−a, d = n0−b —
    * factored out so the operator and any caller share one rendering. */
  private def chi2Expr(a: Column, b: Column, n1: Column, n0: Column): Column = {
    val c = n1 - a
    val d = n0 - b
    val n = n1 + n0
    // A bucket present in EVERY document has an empty absent-row
    // (c+d = 0): zero information, pinned to 0 rather than 0/0.
    when(c + d === 0.0, lit(0.0)).otherwise(
      (n * (a * d - b * c) * (a * d - b * c)) /
        ((a + b) * (c + d) * n1 * n0))
  }

  /** Centered projection of every vector onto a fitted component:
    * score = x·v − μ·v. The component frame is dim rows — a bounded
    * broadcast — and the corpus pass is one explode + partial-aggregable
    * sum; the centering term is a one-row cross join.
    *
    * @param component output of [[pcaTopComponent]]: (i, loading, mu).
    * @return (vec_id, pc1) one row per vector, unrounded.
    */
  def pcaProject(embeddings: DataFrame, component: DataFrame,
      embCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val muDot = component
      .agg(sum(col("mu") * col("loading")).as("mu_dot"))
    embeddings
      .select(col(idCol), posexplode(col(embCol).cast("array<double>"))
        .as(Seq("i", "x")))
      .join(broadcast(component.select(col("i").cast("int").as("i"),
        col("loading"))), "i")
      .groupBy(col(idCol))
      .agg(sum(col("x") * col("loading")).as("x_dot"))
      .crossJoin(broadcast(muDot))
      .select(col(idCol), (col("x_dot") - col("mu_dot")).as("pc1"))
  }
}
