package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Learn

/** Distributed-training registrations: logistic-regression language
  * detector fit with full-batch GD over hashed bag-of-words features.
  * The oracle unrolls the gradient steps CTE-by-CTE (the PageRank/BPE
  * strategy), replaying the same feature hashing, sigmoid, and learning
  * rate, so the trained weights themselves are hash-compared.
  */
object LearnQueries extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.read(s, s"$dir/documents.parquet")
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  private val DIMS = 64
  private val ITERS = 5
  private val LR = 150.0
  private val ALPHA = 1.0
  // NB decision scores on the driver corpora concentrate in ≈ ±5, so the
  // grid samples that band (±4 capture the near-degenerate ends).
  private val THRESHOLDS = Seq(-4.0, -2.0, -1.0, 0.0, 1.0, 2.0, 4.0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The trained weight vector (64 hash buckets) of an is-English
    // classifier after the fixed full-batch GD steps.
    "learn_logreg_weights" -> ((s, dir) =>
      Learn.trainLogReg(docs(s, dir), col("lang") === "en", DIMS, ITERS, LR)
        .select(col("bucket"), (floor((col("w")) * 1e6 + 0.5) / 1e6).as("weight"))
        .orderBy("bucket")),

    // Train-set inference under those weights: per-doc probability, hard
    // prediction, true label — train → deploy in one lazy composite.
    "learn_logreg_predict" -> ((s, dir) =>
      // fused train+predict (r20): inference reuses the training loop's
      // materialized design matrix — output ≡ predictLogReg∘trainLogReg
      Learn.trainPredictLogReg(docs(s, dir), col("lang") === "en",
          DIMS, ITERS, LR)
        .orderBy("doc_id")),

    // Reliability table over those train-set predictions: mean predicted
    // probability vs empirical positive rate per probability bin — the
    // calibration check before scores become sampling weights.
    "learn_calibration" -> ((s, dir) =>
      Learn.calibrationTable(
        Learn.trainPredictLogReg(docs(s, dir), col("lang") === "en",
          DIMS, ITERS, LR), nBins = 10)),

    // Closed-form per-segment OLS: token count regressed on character
    // count per language — slope ≈ chars-per-token⁻¹, the trend fit a
    // profiling pass runs per segment. Exact BIGINT sums; the only
    // doubles are three final divisions (operators/Learn.olsFit).
    "learn_ols_fit" -> ((s, dir) =>
      Learn.olsFit(
          docs(s, dir).select(col("lang"), col("n_chars"),
            size(graft.functions.TextFns.tokens(col("text"))).as("n_toks")),
          xCol = col("n_chars"), yCol = col("n_toks"), groupCol = "lang")
        .orderBy("lang")),

    // Closed-form one-pass trainer: multinomial Naive Bayes log-ratio
    // weights (the aggregation-only counterpart of the GD loop).
    "learn_nb_model" -> ((s, dir) =>
      Learn.trainNaiveBayes(docs(s, dir), col("lang") === "en", DIMS)
        .select(col("bucket"), (floor((col("w")) * 1e6 + 0.5) / 1e6).as("w"),
          (floor((col("prior")) * 1e6 + 0.5) / 1e6).as("prior"))
        .orderBy("bucket")),

    // NB inference: decision score = prior + Σ cnt·w per document.
    "learn_nb_predict" -> ((s, dir) => {
      val d = docs(s, dir)
      Learn.predictNaiveBayes(d,
          Learn.trainNaiveBayes(d, col("lang") === "en", DIMS),
          col("lang") === "en", DIMS)
        .orderBy("doc_id")
    }),

    // Chi-squared feature selection over the (class × bucket-presence)
    // contingency table — which hash buckets carry label signal.
    "learn_chi2_features" -> ((s, dir) =>
      Learn.chi2Features(docs(s, dir), col("lang") === "en", DIMS)
        .orderBy("bucket")),

    // Train → predict → evaluate: confusion counts + precision/recall/
    // F1/accuracy of the NB classifier in one groupless aggregate.
    "learn_eval_metrics" -> ((s, dir) => {
      val d = docs(s, dir)
      Learn.evalMetrics(Learn.predictNaiveBayes(d,
        Learn.trainNaiveBayes(d, col("lang") === "en", DIMS),
        col("lang") === "en", DIMS))
    }),

    // Operating-point sweep over the NB decision scores: confusion +
    // precision/recall/F1 at each fixed threshold — the PR trade table
    // without any corpus-wide rank.
    "learn_threshold_sweep" -> ((s, dir) => {
      val d = docs(s, dir)
      Learn.thresholdSweep(
        Learn.predictNaiveBayes(d,
          Learn.trainNaiveBayes(d, col("lang") === "en", DIMS),
          col("lang") === "en", DIMS),
        THRESHOLDS)
    }),

    // Proper held-out evaluation — the train/serve hygiene every corpus
    // classifier needs: NB trains ONLY on the deterministic hash-split
    // train partition, confusion metrics come ONLY from the unseen eval
    // partition (same split rule as text_train_split).
    "learn_holdout_eval" -> ((s, dir) => {
      val d = graft.operators.TextAnalysis.hashSplit(docs(s, dir))
      val model = Learn.trainNaiveBayes(
        d.filter(col("split") === "train"), col("lang") === "en", DIMS)
      Learn.evalMetrics(Learn.predictNaiveBayes(
        d.filter(col("split") === "eval"), model, col("lang") === "en", DIMS))
    }),

    // k-fold cross-validation: 5 deterministic md5 folds, one
    // closed-form NB per fold-complement, held-out confusion metrics
    // per fold (operators/Learn.crossValNB).
    "learn_kfold_cv" -> ((s, dir) =>
      Learn.crossValNB(docs(s, dir), col("lang") === "en", DIMS, folds = 5)),

    // Exact ROC AUC (Mann-Whitney U over the quantized NB score grid) —
    // the rank metric the threshold sweep deliberately avoids computing
    // corpus-wide; quantization bounds the rank frame, tied pairs count
    // half per the U convention (operators/Learn.aucQuantized).
    "learn_auc" -> ((s, dir) => {
      val d = docs(s, dir)
      Learn.aucQuantized(
        Learn.predictNaiveBayes(d,
          Learn.trainNaiveBayes(d, col("lang") === "en", DIMS),
          col("lang") === "en", DIMS),
        decimals = 3)
    }),

    // Ensemble sanity check: Cohen's kappa between the GD and NB
    // classifiers' hard labels (trained on the same corpus).
    "learn_model_agreement" -> ((s, dir) => {
      val d = docs(s, dir)
      val lr = Learn.trainPredictLogReg(d, col("lang") === "en",
        DIMS, ITERS, LR)
      val nb = Learn.predictNaiveBayes(d,
        Learn.trainNaiveBayes(d, col("lang") === "en", DIMS),
        col("lang") === "en", DIMS)
      Learn.modelAgreement(lr, nb)
    })
  )

  private val toksSql = DuckSql.tokens("text")

  /** Shared base: hashed counts + labels — every Learn oracle composes on
    * these two, so the agreement oracle can chain BOTH model replays in
    * one WITH without CTE-name collisions. */
  private def baseCtes: String =
    s"""tf AS MATERIALIZED (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(t), 1, 8))::UBIGINT % $DIMS AS bucket,
       |    CAST(count(*) AS DOUBLE) AS cnt
       |  FROM (SELECT doc_id, unnest($toksSql) AS t FROM documents)
       |  GROUP BY 1, 2),
       |lab AS MATERIALIZED (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
       |  FROM documents)""".stripMargin

  /** Normalized design matrix + `ITERS` unrolled gradient steps
    * w0 → w$ITERS mirroring Learn.trainLogReg exactly. */
  private def logRegSteps: String = {
    val head =
      s"""nd AS (SELECT doc_id, sum(cnt) AS n FROM tf GROUP BY 1),
         |feat AS MATERIALIZED (SELECT doc_id, bucket, cnt / n AS x
         |         FROM tf JOIN nd USING (doc_id)),
         |nn AS MATERIALIZED (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM feat),
         |w0 AS (SELECT range AS bucket, 0.0 AS w FROM range($DIMS))""".stripMargin
    val steps = (1 to ITERS).map { i =>
      s"""m$i AS (SELECT doc_id, sum(x * w) AS m
         |        FROM feat JOIN w${i - 1} USING (bucket) GROUP BY 1),
         |e$i AS (SELECT doc_id, 1 / (1 + exp(-m)) - y AS err
         |        FROM m$i JOIN lab USING (doc_id)),
         |g$i AS (SELECT bucket, sum(err * x) AS g
         |        FROM feat JOIN e$i USING (doc_id) GROUP BY 1),
         |w$i AS MATERIALIZED (SELECT w${i - 1}.bucket,
         |          w - $LR * coalesce(g, 0) / nn.n_docs AS w
         |        FROM w${i - 1} LEFT JOIN g$i USING (bucket) CROSS JOIN nn)"""
        .stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  private def logRegCtes: String = s"$baseCtes,\n$logRegSteps"

  /** Logreg hard predictions under w$ITERS (composable tail). */
  private def logRegPredCtes: String =
    s"""mp AS (SELECT doc_id, sum(x * w) AS m
       |       FROM feat JOIN w$ITERS USING (bucket) GROUP BY 1),
       |pp AS (SELECT doc_id, (floor((1 / (1 + exp(-m))) * 1e6 + 0.5) / 1e6) AS p FROM mp)"""
      .stripMargin

  /** Naive Bayes body: joined design rows, class-conditional totals, and
    * the smoothed log-ratio model — the operator's parenthesization. */
  /** NB closed-form model CTEs over arbitrary tf/lab relation names (and
    * an optional CTE-name suffix for multi-model chains), so the
    * hold-out and k-fold oracles can train on FILTERED design matrices
    * with the same arithmetic. */
  private def nbBodyOn(tf: String, lab: String, sfx: String = ""): String =
    s"""fc$sfx AS MATERIALIZED (SELECT doc_id, bucket, cnt, y
       |                    FROM $tf JOIN $lab USING (doc_id)),
       |pb$sfx AS (SELECT bucket,
       |         sum(CASE WHEN y = 1.0 THEN cnt ELSE 0 END) AS c1,
       |         sum(CASE WHEN y = 0.0 THEN cnt ELSE 0 END) AS c0
       |       FROM fc$sfx GROUP BY 1),
       |tt$sfx AS MATERIALIZED (SELECT
       |         sum(CASE WHEN y = 1.0 THEN cnt ELSE 0 END) AS t1,
       |         sum(CASE WHEN y = 0.0 THEN cnt ELSE 0 END) AS t0,
       |         CAST(count(DISTINCT CASE WHEN y = 1.0 THEN doc_id END) AS DOUBLE) AS n1,
       |         CAST(count(DISTINCT CASE WHEN y = 0.0 THEN doc_id END) AS DOUBLE) AS n0
       |       FROM fc$sfx),
       |model$sfx AS MATERIALIZED (SELECT r.range AS bucket,
       |         ln((coalesce(c1, 0) + $ALPHA) / (t1 + ${ALPHA * DIMS})) -
       |         ln((coalesce(c0, 0) + $ALPHA) / (t0 + ${ALPHA * DIMS})) AS w,
       |         ln(n1 / n0) AS prior
       |       FROM range($DIMS) r LEFT JOIN pb$sfx ON r.range = pb$sfx.bucket
       |       CROSS JOIN tt$sfx)""".stripMargin

  private def nbBody: String = nbBodyOn("tf", "lab")

  private def nbCtes: String = s"$baseCtes,\n$nbBody"

  /** NB hard predictions under the closed-form model (composable tail). */
  private def nbPredCtes: String =
    s"""sc AS (SELECT doc_id, (floor((max(prior) + sum(cnt * w)) * 1e6 + 0.5) / 1e6) AS score
       |       FROM tf JOIN model USING (bucket) GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(

    // Exact-integer normal-equation sums; the three final divisions are
    // the only floats, so round-6 compare is bit-stable.
    "learn_ols_fit" ->
      s"""WITH d AS (
         |  SELECT lang, n_chars::BIGINT AS x,
         |    len(${DuckSql.tokens("text")})::BIGINT AS y
         |  FROM documents),
         |s AS (SELECT lang, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
         |  FROM d GROUP BY lang),
         |f AS (SELECT lang, n, sx, sy,
         |    (n * sxx - sx * sx)::DOUBLE AS dx,
         |    (n * syy - sy * sy)::DOUBLE AS dy,
         |    (n * sxy - sx * sy)::DOUBLE AS cov
         |  FROM s),
         |g AS (SELECT lang, n, sx, sy, dx, dy, cov,
         |    CASE WHEN n >= 2 AND dx > 0.0 THEN cov / dx END AS slope
         |  FROM f)
         |SELECT lang, (floor((slope) * 1e6 + 0.5) / 1e6) AS slope,
         |  (floor(((sy::DOUBLE - slope * sx) / n) * 1e6 + 0.5) / 1e6) AS intercept,
         |  (floor((CASE WHEN dx > 0.0 AND dy > 0.0
         |    THEN cov * cov / (dx * dy) END) * 1e6 + 0.5) / 1e6) AS r2,
         |  n
         |FROM g ORDER BY lang""".stripMargin,

    "learn_logreg_weights" ->
      s"""WITH $logRegCtes
         |SELECT bucket, (floor((w) * 1e6 + 0.5) / 1e6) AS weight FROM w$ITERS
         |ORDER BY bucket""".stripMargin,

    "learn_logreg_predict" ->
      s"""WITH $logRegCtes,
         |$logRegPredCtes
         |SELECT doc_id, p,
         |  CASE WHEN p >= 0.5 THEN 1 ELSE 0 END::BIGINT AS pred,
         |  CAST(y AS BIGINT) AS y
         |FROM pp JOIN lab USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "learn_calibration" ->
      s"""WITH $logRegCtes,
         |$logRegPredCtes
         |SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
         |  count(*) AS n,
         |  floor(avg(p) * 1e6 + 0.5) / 1e6 AS avg_p,
         |  CAST(sum(y) AS DOUBLE) / count(y) AS frac_pos
         |FROM pp JOIN lab USING (doc_id)
         |GROUP BY 1 ORDER BY bin""".stripMargin,

    "learn_nb_model" ->
      s"""WITH $nbCtes
         |SELECT bucket, (floor((w) * 1e6 + 0.5) / 1e6) AS w, (floor((prior) * 1e6 + 0.5) / 1e6) AS prior
         |FROM model ORDER BY bucket""".stripMargin,

    "learn_nb_predict" ->
      s"""WITH $nbCtes,
         |$nbPredCtes
         |SELECT doc_id, score,
         |  CASE WHEN score >= 0 THEN 1 ELSE 0 END::BIGINT AS pred,
         |  CAST(y AS BIGINT) AS y
         |FROM sc JOIN lab USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // same quantized-grid U arithmetic: integer 2U, one final division
    "learn_auc" ->
      s"""WITH $nbCtes,
         |$nbPredCtes,
         |px AS (SELECT (floor((score) * 1e3 + 0.5) / 1e3) AS s, CAST(y AS BIGINT) AS y
         |       FROM sc JOIN lab USING (doc_id)),
         |cnt AS (SELECT s, sum(y) AS np, sum(1 - y) AS nn
         |        FROM px GROUP BY s),
         |acc AS (SELECT s, np, nn,
         |    coalesce(sum(nn) OVER (ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS nn_below
         |  FROM cnt)
         |SELECT sum(np)::BIGINT AS n_pos, sum(nn)::BIGINT AS n_neg,
         |  (floor((CASE WHEN sum(np) > 0 AND sum(nn) > 0 THEN
         |    sum(np * (2 * nn_below + nn)) /
         |      (2.0 * sum(np) * sum(nn)) END) * 1e6 + 0.5) / 1e6) AS auc
         |FROM acc""".stripMargin,

    "learn_chi2_features" ->
      s"""WITH $nbCtes,
         |pr AS (SELECT bucket, sum(y) AS a, sum(1.0 - y) AS b
         |       FROM fc GROUP BY 1),
         |t2 AS (SELECT sum(y) AS n1, sum(1.0 - y) AS n0 FROM lab)
         |SELECT bucket,
         |  (floor((CASE WHEN (n1 - a) + (n0 - b) = 0 THEN 0.0
         |    ELSE ((n1 + n0) * (a * (n0 - b) - b * (n1 - a)) *
         |            (a * (n0 - b) - b * (n1 - a))) /
         |         ((a + b) * ((n1 - a) + (n0 - b)) * n1 * n0) END) * 1e6 + 0.5) / 1e6)
         |    AS chi2
         |FROM pr CROSS JOIN t2 ORDER BY bucket""".stripMargin,

    "learn_eval_metrics" ->
      s"""WITH $nbCtes,
         |$nbPredCtes,
         |px AS (SELECT sc.doc_id,
         |         CASE WHEN score >= 0 THEN 1 ELSE 0 END AS pred,
         |         CAST(y AS BIGINT) AS y
         |       FROM sc JOIN lab USING (doc_id)),
         |cm AS (SELECT count(*) AS n,
         |         CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |         CAST(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |         CAST(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |         CAST(sum(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |       FROM px)
         |SELECT n, tp, fp, fn, tn,
         |  (floor((CASE WHEN tp + fp = 0 THEN 0.0
         |    ELSE tp / CAST(tp + fp AS DOUBLE) END) * 1e6 + 0.5) / 1e6) AS precision,
         |  (floor((CASE WHEN tp + fn = 0 THEN 0.0
         |    ELSE tp / CAST(tp + fn AS DOUBLE) END) * 1e6 + 0.5) / 1e6) AS recall,
         |  (floor((CASE WHEN (CASE WHEN tp + fp = 0 THEN 0.0
         |      ELSE tp / CAST(tp + fp AS DOUBLE) END) +
         |      (CASE WHEN tp + fn = 0 THEN 0.0
         |      ELSE tp / CAST(tp + fn AS DOUBLE) END) = 0 THEN 0.0
         |    ELSE 2.0 * (tp / CAST(tp + fp AS DOUBLE)) *
         |      (tp / CAST(tp + fn AS DOUBLE)) /
         |      ((tp / CAST(tp + fp AS DOUBLE)) +
         |       (tp / CAST(tp + fn AS DOUBLE))) END) * 1e6 + 0.5) / 1e6) AS f1,
         |  (floor(((tp + tn) / CAST(n AS DOUBLE)) * 1e6 + 0.5) / 1e6) AS accuracy
         |FROM cm""".stripMargin,

    // five suffixed NB chains (nbBodyOn per fold-complement), each
    // scored on its held-out fold; one shared finalization over the
    // unioned confusion rows
    "learn_kfold_cv" -> {
      val folds = 5
      val foldCtes = (0 until folds).map { f =>
        s"""tft_$f AS MATERIALIZED (SELECT tf.* FROM tf JOIN fld USING (doc_id)
           |  WHERE fold <> $f),
           |labt_$f AS (SELECT lab.* FROM lab JOIN fld USING (doc_id)
           |  WHERE fold <> $f),
           |${nbBodyOn(s"tft_$f", s"labt_$f", s"_$f")},
           |tfe_$f AS (SELECT tf.* FROM tf JOIN fld USING (doc_id)
           |  WHERE fold = $f),
           |sce_$f AS (SELECT doc_id, (floor((max(prior) + sum(cnt * w)) * 1e6 + 0.5) / 1e6) AS score
           |        FROM tfe_$f JOIN model_$f USING (bucket) GROUP BY 1),
           |cm_$f AS (SELECT CAST($f AS BIGINT) AS fold, count(*) AS n,
           |  CAST(sum(CASE WHEN score >= 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |  CAST(sum(CASE WHEN score >= 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |  CAST(sum(CASE WHEN score < 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           |  CAST(sum(CASE WHEN score < 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
           |  FROM (SELECT score, CAST(y AS BIGINT) AS y
           |        FROM sce_$f JOIN lab USING (doc_id)))""".stripMargin
      }.mkString(",\n")
      val cmUnion = (0 until folds).map(f => s"SELECT * FROM cm_$f")
        .mkString(" UNION ALL ")
      s"""WITH $baseCtes,
         |fld AS MATERIALIZED (SELECT doc_id,
         |    ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT
         |      % $folds AS fold
         |  FROM documents),
         |$foldCtes,
         |cm AS ($cmUnion)
         |SELECT fold, n, tp, fp, fn, tn,
         |  (floor((CASE WHEN tp + fp = 0 THEN 0.0
         |    ELSE tp / CAST(tp + fp AS DOUBLE) END) * 1e6 + 0.5) / 1e6) AS precision,
         |  (floor((CASE WHEN tp + fn = 0 THEN 0.0
         |    ELSE tp / CAST(tp + fn AS DOUBLE) END) * 1e6 + 0.5) / 1e6) AS recall,
         |  (floor((CASE WHEN (CASE WHEN tp + fp = 0 THEN 0.0
         |      ELSE tp / CAST(tp + fp AS DOUBLE) END) +
         |      (CASE WHEN tp + fn = 0 THEN 0.0
         |      ELSE tp / CAST(tp + fn AS DOUBLE) END) = 0 THEN 0.0
         |    ELSE 2.0 * (tp / CAST(tp + fp AS DOUBLE)) *
         |      (tp / CAST(tp + fn AS DOUBLE)) /
         |      ((tp / CAST(tp + fp AS DOUBLE)) +
         |       (tp / CAST(tp + fn AS DOUBLE))) END) * 1e6 + 0.5) / 1e6) AS f1,
         |  (floor(((tp + tn) / CAST(n AS DOUBLE)) * 1e6 + 0.5) / 1e6) AS accuracy
         |FROM cm ORDER BY fold""".stripMargin
    },

    // train-partition model (nbBodyOn over the filtered design matrix),
    // eval-partition confusion — same split rule, same finalization
    "learn_holdout_eval" ->
      s"""WITH $baseCtes,
         |spl AS MATERIALIZED (SELECT doc_id,
         |    CASE WHEN ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT
         |      % 100 < 90 THEN 'train' ELSE 'eval' END AS split
         |  FROM documents),
         |tft AS MATERIALIZED (SELECT tf.* FROM tf JOIN spl USING (doc_id)
         |  WHERE split = 'train'),
         |labt AS MATERIALIZED (SELECT lab.* FROM lab JOIN spl USING (doc_id)
         |  WHERE split = 'train'),
         |${nbBodyOn("tft", "labt")},
         |tfe AS (SELECT tf.* FROM tf JOIN spl USING (doc_id)
         |  WHERE split = 'eval'),
         |sce AS (SELECT doc_id, (floor((max(prior) + sum(cnt * w)) * 1e6 + 0.5) / 1e6) AS score
         |        FROM tfe JOIN model USING (bucket) GROUP BY 1),
         |px AS (SELECT sce.doc_id,
         |         CASE WHEN score >= 0 THEN 1 ELSE 0 END AS pred,
         |         CAST(y AS BIGINT) AS y
         |       FROM sce JOIN lab USING (doc_id)),
         |cm AS (SELECT count(*) AS n,
         |         CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |         CAST(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |         CAST(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |         CAST(sum(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |       FROM px)
         |SELECT n, tp, fp, fn, tn,
         |  (floor((CASE WHEN tp + fp = 0 THEN 0.0
         |    ELSE tp / CAST(tp + fp AS DOUBLE) END) * 1e6 + 0.5) / 1e6) AS precision,
         |  (floor((CASE WHEN tp + fn = 0 THEN 0.0
         |    ELSE tp / CAST(tp + fn AS DOUBLE) END) * 1e6 + 0.5) / 1e6) AS recall,
         |  (floor((CASE WHEN (CASE WHEN tp + fp = 0 THEN 0.0
         |      ELSE tp / CAST(tp + fp AS DOUBLE) END) +
         |      (CASE WHEN tp + fn = 0 THEN 0.0
         |      ELSE tp / CAST(tp + fn AS DOUBLE) END) = 0 THEN 0.0
         |    ELSE 2.0 * (tp / CAST(tp + fp AS DOUBLE)) *
         |      (tp / CAST(tp + fn AS DOUBLE)) /
         |      ((tp / CAST(tp + fp AS DOUBLE)) +
         |       (tp / CAST(tp + fn AS DOUBLE))) END) * 1e6 + 0.5) / 1e6) AS f1,
         |  (floor(((tp + tn) / CAST(n AS DOUBLE)) * 1e6 + 0.5) / 1e6) AS accuracy
         |FROM cm""".stripMargin,

    "learn_threshold_sweep" -> {
      val thLit = THRESHOLDS.map(_.toString).mkString(", ")
      s"""WITH $nbCtes,
         |$nbPredCtes,
         |th AS (SELECT unnest([$thLit])::DOUBLE AS threshold),
         |px AS (SELECT sc.doc_id, score, CAST(y AS BIGINT) AS y
         |       FROM sc JOIN lab USING (doc_id)),
         |cm AS (SELECT t.threshold, count(*) AS n,
         |  CAST(sum(CASE WHEN score >= t.threshold AND y = 1
         |    THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(sum(CASE WHEN score >= t.threshold AND y = 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(sum(CASE WHEN score < t.threshold AND y = 1
         |    THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  CAST(sum(CASE WHEN score < t.threshold AND y = 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM px CROSS JOIN th t GROUP BY t.threshold)
         |SELECT threshold, n, tp, fp, fn, tn,
         |  (floor((CASE WHEN tp + fp = 0 THEN 0.0
         |    ELSE tp / CAST(tp + fp AS DOUBLE) END) * 1e6 + 0.5) / 1e6) AS precision,
         |  (floor((CASE WHEN tp + fn = 0 THEN 0.0
         |    ELSE tp / CAST(tp + fn AS DOUBLE) END) * 1e6 + 0.5) / 1e6) AS recall,
         |  (floor((CASE WHEN (CASE WHEN tp + fp = 0 THEN 0.0
         |      ELSE tp / CAST(tp + fp AS DOUBLE) END) +
         |      (CASE WHEN tp + fn = 0 THEN 0.0
         |      ELSE tp / CAST(tp + fn AS DOUBLE) END) = 0 THEN 0.0
         |    ELSE 2.0 * (tp / CAST(tp + fp AS DOUBLE)) *
         |      (tp / CAST(tp + fn AS DOUBLE)) /
         |      ((tp / CAST(tp + fp AS DOUBLE)) +
         |       (tp / CAST(tp + fn AS DOUBLE))) END) * 1e6 + 0.5) / 1e6) AS f1,
         |  (floor(((tp + tn) / CAST(n AS DOUBLE)) * 1e6 + 0.5) / 1e6) AS accuracy
         |FROM cm ORDER BY threshold""".stripMargin
    },

    // Both model replays chained in one WITH (shared tf/lab base), then
    // the kappa closed form with the operator's parenthesization.
    "learn_model_agreement" ->
      s"""WITH $baseCtes,
         |$logRegSteps,
         |$logRegPredCtes,
         |$nbBody,
         |$nbPredCtes,
         |pa AS (SELECT doc_id,
         |         CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS pred_a FROM pp),
         |pb2 AS (SELECT doc_id,
         |         CASE WHEN score >= 0 THEN 1 ELSE 0 END AS pred_b FROM sc),
         |ag AS (SELECT count(*) AS n,
         |         avg(CASE WHEN pred_a = pred_b THEN 1.0 ELSE 0.0 END) AS po,
         |         avg(CAST(pred_a AS DOUBLE)) AS ra,
         |         avg(CAST(pred_b AS DOUBLE)) AS rb
         |       FROM pa JOIN pb2 USING (doc_id))
         |SELECT n, (floor((po) * 1e6 + 0.5) / 1e6) AS agree,
         |  (floor((ra * rb + (1 - ra) * (1 - rb)) * 1e6 + 0.5) / 1e6) AS pe,
         |  (floor((CASE WHEN ra * rb + (1 - ra) * (1 - rb) = 1 THEN 0.0
         |    ELSE (po - (ra * rb + (1 - ra) * (1 - rb))) /
         |         (1 - (ra * rb + (1 - ra) * (1 - rb))) END) * 1e6 + 0.5) / 1e6) AS kappa
         |FROM ag""".stripMargin
  )
}
