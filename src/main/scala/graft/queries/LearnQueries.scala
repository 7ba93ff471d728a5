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
    s.read.parquet(s"$dir/documents.parquet")
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  private val DIMS = 64
  private val ITERS = 5
  private val LR = 150.0

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The trained weight vector (64 hash buckets) of an is-English
    // classifier after the fixed full-batch GD steps.
    "learn_logreg_weights" -> ((s, dir) =>
      Learn.trainLogReg(docs(s, dir), col("lang") === "en", DIMS, ITERS, LR)
        .select(col("bucket"), round(col("w"), 6).as("weight"))
        .orderBy("bucket")),

    // Train-set inference under those weights: per-doc probability, hard
    // prediction, true label — train → deploy in one lazy composite.
    "learn_logreg_predict" -> ((s, dir) => {
      val d = docs(s, dir)
      val w = Learn.trainLogReg(d, col("lang") === "en", DIMS, ITERS, LR)
      Learn.predictLogReg(d, w, col("lang") === "en", DIMS)
        .orderBy("doc_id")
    }),

    // Reliability table over those train-set predictions: mean predicted
    // probability vs empirical positive rate per probability bin — the
    // calibration check before scores become sampling weights.
    "learn_calibration" -> ((s, dir) => {
      val d = docs(s, dir)
      val w = Learn.trainLogReg(d, col("lang") === "en", DIMS, ITERS, LR)
      Learn.calibrationTable(
        Learn.predictLogReg(d, w, col("lang") === "en", DIMS), nBins = 10)
    })
  )

  private val toksSql = DuckSql.tokens("text")

  /** Shared CTE chain: COO design matrix, labels, then `ITERS` unrolled
    * gradient steps w0 → w$ITERS mirroring Learn.trainLogReg exactly. */
  private def logRegCtes: String = {
    val base =
      s"""tf AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5(t), 1, 8))::UBIGINT % $DIMS AS bucket,
         |    CAST(count(*) AS DOUBLE) AS cnt
         |  FROM (SELECT doc_id, unnest($toksSql) AS t FROM documents)
         |  GROUP BY 1, 2),
         |nd AS (SELECT doc_id, sum(cnt) AS n FROM tf GROUP BY 1),
         |feat AS MATERIALIZED (SELECT doc_id, bucket, cnt / n AS x
         |         FROM tf JOIN nd USING (doc_id)),
         |lab AS MATERIALIZED (SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
         |        FROM documents),
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
    (base +: steps).mkString(",\n")
  }

  val oracles: Map[String, String] = Map(

    "learn_logreg_weights" ->
      s"""WITH $logRegCtes
         |SELECT bucket, round(w, 6) AS weight FROM w$ITERS
         |ORDER BY bucket""".stripMargin,

    "learn_logreg_predict" ->
      s"""WITH $logRegCtes,
         |mp AS (SELECT doc_id, sum(x * w) AS m
         |       FROM feat JOIN w$ITERS USING (bucket) GROUP BY 1),
         |pp AS (SELECT doc_id, round(1 / (1 + exp(-m)), 6) AS p FROM mp)
         |SELECT doc_id, p,
         |  CASE WHEN p >= 0.5 THEN 1 ELSE 0 END::BIGINT AS pred,
         |  CAST(y AS BIGINT) AS y
         |FROM pp JOIN lab USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "learn_calibration" ->
      s"""WITH $logRegCtes,
         |mp AS (SELECT doc_id, sum(x * w) AS m
         |       FROM feat JOIN w$ITERS USING (bucket) GROUP BY 1),
         |pp AS (SELECT doc_id, round(1 / (1 + exp(-m)), 6) AS p FROM mp)
         |SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
         |  count(*) AS n,
         |  round(avg(p), 6) AS avg_p,
         |  round(avg(y), 6) AS frac_pos
         |FROM pp JOIN lab USING (doc_id)
         |GROUP BY 1 ORDER BY bin""".stripMargin
  )
}
