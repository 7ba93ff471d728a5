package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

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
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFns.tokens(col(textCol))).as("term"))
      .select(col("doc_id"), TextAnalysis.hashBucket(col("term"), dims).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val nd = tf.groupBy(col("doc_id")).agg(sum(col("cnt")).as("n"))
    tf.join(nd, "doc_id")
      .select(col("doc_id"), col("bucket"), (col("cnt") / col("n")).as("x"))
  }

  /** Full-batch logistic regression: `iters` gradient-descent steps of
    * w ← w − lr · (1/N) Σ_d (σ(w·x_d) − y_d) x_d, weights seeded 0.
    *
    * Each iteration is two shuffles over the checkpointed COO design
    * matrix: margins groupBy(doc_id), gradient groupBy(bucket) — both
    * partial-aggregable, both on keys that scale (documents, hash
    * buckets). The ONLY broadcast is the weight vector itself — `dims`
    * rows, bounded by construction no matter the corpus size (contrast
    * the unbounded-vocabulary hazard `unigramLogProb` documents). Lineage
    * is truncated every step like the PageRank loop.
    *
    * `labelCol` is evaluated against `docs` (e.g. `col("lang") === "en"`
    * trains a language detector; a quality-gate boolean trains a quality
    * classifier).
    *
    * @return (bucket, w) — `dims` rows, the final unrounded weights.
    */
  def trainLogReg(docs: DataFrame, labelCol: Column, dims: Int = 64,
      iters: Int = 3, lr: Double = 0.5, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(dims >= 1 && iters >= 0, s"need dims >= 1, iters >= 0")
    val spark = docs.sparkSession
    val feat = hashedFeatures(docs, dims, textCol, idCol).localCheckpoint()
    val lab = docs.select(col(idCol).as("doc_id"),
      labelCol.cast("double").as("y"))
    // One-row N (docs that produced features): carried as a broadcast
    // frame, not a driver action, so training stays a single lazy plan
    // per step.
    val nDocs = feat.select(countDistinct(col("doc_id")).cast("double")
      .as("n_docs")).localCheckpoint()
    var w = spark.range(dims)
      .select(col("id").as("bucket"), lit(0.0).as("w"))
    for (_ <- 1 to iters) {
      val margins = feat.join(broadcast(w), "bucket")
        .groupBy(col("doc_id")).agg(sum(col("x") * col("w")).as("m"))
      val errs = margins.join(lab, "doc_id")
        .select(col("doc_id"),
          (lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("y")).as("err"))
      val grad = feat.join(errs, "doc_id")
        .groupBy(col("bucket")).agg(sum(col("err") * col("x")).as("g"))
      w = w.join(grad, Seq("bucket"), "left")
        .crossJoin(broadcast(nDocs))
        .select(col("bucket"),
          (col("w") - lit(lr) * coalesce(col("g"), lit(0.0)) / col("n_docs"))
            .as("w"))
        .localCheckpoint()
    }
    w
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
        round(lit(1.0) / (lit(1.0) + exp(-col("m"))), 6).as("p"))
      .withColumn("pred", when(col("p") >= 0.5, 1L).otherwise(0L))
      .join(lab, "doc_id")
  }
}
