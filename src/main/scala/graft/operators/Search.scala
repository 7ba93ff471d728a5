package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Iterate.MaterializeOps

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
      .materialized
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
      // floor-snap (never round() on a double sum): same IEEE ops in
      // every engine, so the snapped score can't hash-split (BASELINE.md)
      .agg((floor(sum(col("score")) * 1e6 + 0.5) / 1e6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** Hybrid retrieval: BM25 keyword ranking fused with embedding-cosine
    * ranking by reciprocal-rank fusion,
    * rrf(d) = Σ_lists 1/(kRrf + rank_list(d)) — rank-based fusion needs
    * no score normalization across the two heterogeneous scales, which is
    * why it's the default hybrid in Elasticsearch/Vespa-style engines.
    * Documents missing from one list contribute only the other term.
    *
    * Scale shape: both candidate lists come out of distributed top-k
    * (TakeOrderedAndProject — never a global sort of the corpus), so the
    * fusion operates on two ≤`candN`-row frames; their rank windows and
    * the full-outer merge are bounded by construction, and `candN` is the
    * recall/cost dial exactly as in production hybrid search. Ranks fuse
    * on scores pre-rounded to 6 places (ties → lowest id), so the
    * fused ordering is engine-independent.
    */
  def hybridRrfTopK(docs: DataFrame, embeddings: DataFrame,
      terms: Seq[String], queryId: Long, topK: Int, candN: Int = 50,
      kRrf: Int = 60): DataFrame = {
    val kw = bm25TopK(docs, terms, candN)
    val vec = Similarity.topKCosine(embeddings, queryId, candN)
      .select(col("vec_id").as("doc_id"), col("cosine"))
    val rkw = kw.select(col("doc_id"), row_number()
      .over(Window.orderBy(col("bm25").desc, col("doc_id"))).as("r_kw"))
    val rvec = vec.select(col("doc_id"), row_number()
      .over(Window.orderBy(col("cosine").desc, col("doc_id"))).as("r_vec"))
    rkw.join(rvec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("r_kw"), col("r_vec"),
        (floor((coalesce(lit(1.0) / (lit(kRrf) + col("r_kw")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(kRrf) + col("r_vec")), lit(0.0))) * 1e6 + 0.5) / 1e6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topK)
  }

  /** Retrieval-quality evaluation — the search family's answer to the
    * ANN/LSH recall contracts: measure the ranker against an EXACT,
    * replayable ground truth instead of asserting it. Relevance is
    * boolean-AND term containment (a document is relevant to a query iff
    * it contains every query term), so the truth set is a deterministic
    * corpus property any engine can recompute; the ranker under test is
    * [[bm25TopK]].
    *
    * Per query: recall@k (|relevant ∩ top-k| / |relevant|), MRR@k
    * (1/rank of the first relevant hit; 0 if none), and binary-gain
    * nDCG@k (DCG = Σ_hits 1/log2(rank+1), ideal = the same sum over
    * ranks 1..min(|relevant|, k)).
    *
    * Scale shape — the whole eval suite in ONE shared pipeline, not a
    * bm25TopK per query (the r≤9 form: |queries| tokenize/postings/rank
    * pipelines, 27 shuffles for 3 queries): postings and document
    * frequencies are per-TERM statistics independent of which query asks,
    * so one tokenize pass (pruned to the union of all eval terms) and one
    * postings aggregation feed every query via a |query,term|-row
    * LocalRelation join; scoring, per-query ranking (a partitioned
    * window, never a global sort), relevance (a doc is relevant iff its
    * matched-term count equals the query's term count — containment
    * re-derived from the same postings) and the metric aggregates are
    * each ONE pass over the |queries|×|matching docs| frame. Cost no
    * longer grows with the size of the eval suite — the property a
    * production retrieval-eval harness needs.
    */
  def evalRetrieval(docs: DataFrame, querySet: Seq[(Int, Seq[String])],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val allTerms = querySet.flatMap(_._2).distinct
    val qt = querySet.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    val nTerms = querySet.map { case (q, ts) => (q, ts.size.toLong) }
      .toDF("query_id", "n_terms")
    val qids = querySet.map(_._1).toDF("query_id")
    // ONE tokenize pass, pruned to the union of every query's terms
    val perDoc = docs
      .select(col(idCol).as("doc_id"), TextFns.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("double").as("dl"),
        filter(col("toks"), t => t.isin(allTerms: _*)).as("ptoks"))
      .materialized
    val stats = perDoc.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val postings = perDoc
      .select(col("doc_id"), col("dl"), explode(col("ptoks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val docFreq = postings.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    // per-(query, doc): BM25 over the query's matched terms + containment
    val perQD = postings
      .join(broadcast(qt), "term")
      .join(broadcast(docFreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("score", idf * col("tf") * (k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg((floor(sum(col("score")) * 1e6 + 0.5) / 1e6).as("bm25"),
        count(lit(1)).as("n_match"))
      .join(broadcast(nTerms), "query_id")
      .withColumn("rel", col("n_match") === col("n_terms"))
    val ranked = perQD.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("bm25").desc, col("doc_id"))))
      .filter(col("rank") <= k)
    val relAgg = perQD.filter(col("rel"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val hitAgg = ranked.filter(col("rel"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).cast("double").as("n_hits"),
        min(col("rank")).as("first_rank"),
        sum(lit(1.0) / log(2.0, col("rank") + lit(1.0))).as("dcg"))
    val nRel = coalesce(col("n_rel"), lit(0L))
    val idcg = aggregate(
      sequence(lit(1), greatest(least(nRel, lit(k.toLong)), lit(0L)).cast("int")),
      lit(0.0), (acc, i) => acc + lit(1.0) / log(2.0, i.cast("double") + 1.0))
    qids.join(relAgg, Seq("query_id"), "left")
      .join(hitAgg, Seq("query_id"), "left")
      .select(
        col("query_id").cast("int").as("query_id"),
        nRel.as("n_rel"),
        (floor((when(nRel > 0, coalesce(col("n_hits"), lit(0.0)) / nRel)
          .otherwise(0.0)) * 1e6 + 0.5) / 1e6).as("recall_at_k"),
        (floor((coalesce(lit(1.0) / col("first_rank"), lit(0.0))) * 1e6 + 0.5) / 1e6).as("mrr_at_k"),
        (floor((when(nRel > 0, coalesce(col("dcg"), lit(0.0)) / idcg)
          .otherwise(0.0)) * 1e6 + 0.5) / 1e6).as("ndcg_at_k"))
  }
}
