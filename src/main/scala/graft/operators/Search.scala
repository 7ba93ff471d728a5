package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Keyword-search ranking over a document corpus (Okapi BM25).
  *
  * Scale posture (100 TB): the probe-term filter is applied inside the
  * single tokenize projection, so only postings of the query's terms are
  * ever shuffled (|docs containing a probe term| rows, not the corpus
  * token stream). Corpus-level statistics (N, avgdl) are a one-row
  * aggregate broadcast to every task; per-term document frequencies are
  * a |terms|-row aggregate, also broadcast. The only full-corpus pass is
  * the narrow tokenize+length+prune projection, which runs exactly once
  * (materialized snapshot). Final ranking is top-k
  * (TakeOrderedAndProject), never a global sort.
  */
object Search {

  /** BM25 score of every document containing ≥1 probe term; top-k.
    *
    * score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the standard Okapi
    * form; dl = token count of d, avgdl its corpus mean.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // ONE tokenize pass over the corpus: per-doc length and the
    // probe-pruned token list come out of the same projection (`toks` is
    // referenced twice, so CollapseProject cannot inline the tokenizer
    // into each consumer), and the result — (doc_id, dl, ptoks), a few
    // bytes per document — is materialized once (localCheckpoint
    // in-session; a parquet interchange at scale). stats, postings and
    // docFreq all derive from that snapshot, so the corpus is never
    // re-tokenized: the old form ran the tokenizer three times.
    val perDoc = docs
      .select(col(idCol).as("doc_id"), TextFns.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("double").as("dl"),
        filter(col("toks"), t => t.isin(terms: _*)).as("ptoks"))
      .localCheckpoint()
    val stats = perDoc.agg(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))

    // dl rides along as a grouping column (functionally dependent on
    // doc_id) so no join against a per-doc length table is ever needed —
    // that table would be corpus-sized, i.e. not broadcastable.
    val postings = perDoc
      .select(col("doc_id"), col("dl"), explode(col("ptoks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val docFreq = postings.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))

    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    postings
      .join(broadcast(docFreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("score", idf * col("tf") * (k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("score")), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }
}
