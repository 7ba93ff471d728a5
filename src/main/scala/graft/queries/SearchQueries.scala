package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Search, Sketch}

/** Search / sketch registrations over the `documents` table: BM25 keyword
  * ranking (inverted-index scoring, probe-term filter pushed below the
  * shuffle) and related corpus-query operators.
  */
object SearchQueries extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.read(s, s"$dir/documents.parquet")
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  private val Terms = Seq("spark", "vector", "window")
  private val TermsSql = Terms.map(t => s"'$t'").mkString(", ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Okapi BM25 top-15 for a fixed probe query. Only probe-term postings
    // shuffle; df and corpus stats broadcast (operators/Search.scala).
    "search_bm25" -> ((s, dir) =>
      Search.bm25TopK(docs(s, dir), Terms, topK = 15)),

    // Count-min-sketch heavy hitters with the accuracy contract asserted
    // in-engine: sketch cells are a bounded (row, bucket, cnt) relation,
    // estimates are min-over-depth; the oracle recomputes the exact side
    // and asserts the contract boolean (operators/Sketch.scala).
    "sketch_heavy_hitters" -> ((s, dir) => {
      val tokens = docs(s, dir).select(
        explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
      Sketch.heavyHittersChecked(tokens, topN = 10)
    }),

    // CBO primitive: |orders ⋈ customer| estimated from the two key
    // sketches' inner product — no join executed; accuracy-contract
    // boolean derived in-engine (and re-derived by the oracle).
    "sketch_join_size" -> ((s, dir) =>
      Sketch.joinSizeChecked(
        graft.Tables.load(s, dir, "orders"), "o_custkey",
        graft.Tables.load(s, dir, "customer"), "c_custkey")),

    // Mergeable HLL rollup: daily user sketches unioned to per-type
    // totals without rescanning rows; accuracy-contract readout
    // (operators/Sketch.scala — estimate not replayable cross-engine).
    "sketch_hll_rollup" -> ((s, dir) =>
      Sketch.hllMergedDistinct(graft.Tables.load(s, dir, "events"),
        keyCol = "user_id", groupCol = "event_type",
        slice = to_date(col("ts"))).orderBy("event_type")),

    // KMV distinct sketch: per-type k-minimum md5 hash sets + the
    // merged '(all)' scope, estimate (k−1)·2⁶⁰/h₍ₖ₎ — the mergeable
    // sketch whose estimate IS cross-engine replayable, complementing
    // the HLL rollup's contract-only readout (operators/Sketch.scala).
    "sketch_kmv_distinct" -> ((s, dir) =>
      Sketch.kmvDistinct(graft.Tables.load(s, dir, "events"),
        keyCol = "user_id", groupCol = "event_type", k = 64)
        .orderBy("scope")),

    // Hybrid retrieval: BM25 top-50 ∪ cosine top-50 fused by
    // reciprocal-rank fusion (k=60), top-15 (operators/Search.scala).
    "search_hybrid_rrf" -> ((s, dir) =>
      Search.hybridRrfTopK(docs(s, dir),
        graft.Tables.read(s, s"$dir/embeddings.parquet"),
        Terms, queryId = 0L, topK = 15)),

    // Retrieval-quality eval: recall@10 / MRR@10 / nDCG@10 of the BM25
    // ranker against exact boolean-AND relevance, per eval query — the
    // search family's measured-recall contract (operators/Search.scala).
    "search_eval_ndcg" -> ((s, dir) =>
      Search.evalRetrieval(docs(s, dir), EvalQueries, EVAL_K)
        .orderBy("query_id"))
  )

  private val EvalQueries = Seq(
    1 -> Seq("spark"),
    2 -> Seq("spark", "vector"),
    3 -> Seq("vector", "window"))
  private val EVAL_K = 10

  /** Per-eval-query CTE chain: relevance set (AND-containment), BM25
    * top-k with rank, and the one-row metric aggregate. */
  private def evalQCtes(qid: Int, terms: Seq[String]): String = {
    val termsSql = terms.map(t => s"'$t'").mkString(", ")
    val contains = terms.map(t => s"list_contains(toks, '$t')").mkString(" AND ")
    s"""q${qid}rel AS (SELECT doc_id FROM toks WHERE $contains),
       |q${qid}posts AS (
       |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
       |  WHERE term IN ($termsSql) GROUP BY doc_id, term),
       |q${qid}dfreq AS (
       |  SELECT term, CAST(count(*) AS DOUBLE) AS df
       |  FROM q${qid}posts GROUP BY term),
       |q${qid}top AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
       |  FROM (
       |    SELECT p.doc_id,
       |      floor(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
       |        * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))
       |        * 1e6 + 0.5) / 1e6 AS bm25
       |    FROM q${qid}posts p JOIN q${qid}dfreq USING (term)
       |    JOIN lens USING (doc_id) CROSS JOIN stats
       |    GROUP BY p.doc_id ORDER BY bm25 DESC, doc_id LIMIT $EVAL_K)),
       |q${qid}m AS (
       |  SELECT $qid AS query_id,
       |    CAST((SELECT count(*) FROM q${qid}rel) AS BIGINT) AS n_rel,
       |    CAST(count(*) AS DOUBLE) AS n_hits, min(rank) AS fr,
       |    sum(1 / log2(rank + 1.0)) AS dcg
       |  FROM q${qid}top JOIN q${qid}rel USING (doc_id))""".stripMargin
  }

  val oracles: Map[String, String] = Map(

    "search_eval_ndcg" -> {
      val chains = EvalQueries.map { case (q, ts) => evalQCtes(q, ts) }
      val union = EvalQueries.map { case (q, _) => s"SELECT * FROM q${q}m" }
        .mkString(" UNION ALL ")
      s"""WITH toks AS MATERIALIZED (
         |  SELECT doc_id, ${DuckSql.tokens("text")} AS toks FROM documents),
         |lens AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM toks),
         |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM lens),
         |${chains.mkString(",\n")},
         |steps AS (SELECT i.range AS i, 1 / log2(i.range + 1.0) AS g
         |  FROM range(1, ${EVAL_K + 1}) i),
         |prefix AS (
         |  SELECT n.range AS n, sum(CASE WHEN s.i <= n.range THEN s.g END) AS idcg
         |  FROM range(0, ${EVAL_K + 1}) n CROSS JOIN steps s GROUP BY n.range)
         |SELECT query_id, n_rel,
         |  (floor((CASE WHEN n_rel > 0 THEN coalesce(n_hits, 0) / n_rel
         |    ELSE 0 END) * 1e6 + 0.5) / 1e6) AS recall_at_k,
         |  (floor((coalesce(1.0 / fr, 0)) * 1e6 + 0.5) / 1e6) AS mrr_at_k,
         |  (floor((CASE WHEN n_rel > 0 THEN coalesce(dcg, 0) / p.idcg
         |    ELSE 0 END) * 1e6 + 0.5) / 1e6) AS ndcg_at_k
         |FROM ($union) m JOIN prefix p ON p.n = least(m.n_rel, $EVAL_K)
         |ORDER BY query_id""".stripMargin
    },

    "search_bm25" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${DuckSql.tokens("text")} AS toks FROM documents),
         |lens AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM toks),
         |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM lens),
         |posts AS (
         |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
         |  WHERE term IN ($TermsSql)
         |  GROUP BY doc_id, term),
         |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM posts GROUP BY term)
         |SELECT p.doc_id,
         |  floor(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
         |    * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))
         |    * 1e6 + 0.5) / 1e6 AS bm25
         |FROM posts p
         |JOIN dfreq USING (term) JOIN lens USING (doc_id) CROSS JOIN stats
         |GROUP BY p.doc_id
         |ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin,

    // The oracle REPLAYS the sketch (the depth rows are the four 8-hex
    // chunks of one md5 per term — the shared replayable hash family) and
    // derives the contract boolean from its own estimates, so a data
    // refresh or width change that legitimately flips the probabilistic
    // bound still compares green.
    "sketch_heavy_hitters" ->
      s"""WITH tokens AS (
         |  SELECT unnest(${DuckSql.tokens("text")}) AS term FROM documents),
         |exact AS (SELECT term, count(*) AS exact_cnt FROM tokens GROUP BY term),
         |top AS (SELECT term, exact_cnt FROM exact
         |  ORDER BY exact_cnt DESC, term LIMIT 10),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM tokens),
         |cells AS (
         |  SELECT r.range AS row,
         |    ('0x' || substr(md5(term), CAST(1 + 8 * r.range AS INTEGER), 8))::UBIGINT % 512 AS bucket,
         |    count(*) AS cnt
         |  FROM tokens CROSS JOIN range(0, 4) r
         |  GROUP BY 1, 2),
         |probe AS (
         |  SELECT t.term, r.range AS row,
         |    ('0x' || substr(md5(t.term), CAST(1 + 8 * r.range AS INTEGER), 8))::UBIGINT % 512 AS bucket
         |  FROM top t CROSS JOIN range(0, 4) r),
         |est AS (
         |  SELECT p.term, min(c.cnt) AS est
         |  FROM probe p JOIN cells c ON c.row = p.row AND c.bucket = p.bucket
         |  GROUP BY p.term)
         |SELECT t.term, t.exact_cnt,
         |  (e.est >= t.exact_cnt AND e.est <= t.exact_cnt + 4.0 * n_total / 512) AS within_contract
         |FROM top t JOIN est e USING (term) CROSS JOIN tot
         |ORDER BY exact_cnt DESC, term""".stripMargin,

    // HLL internals aren't replayable cross-engine, so the oracle checks
    // the exact counts and the (5%-tolerance, ~1.6%-error) contract
    // boolean — the agg_approx_distinct pattern.
    "sketch_hll_rollup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |  true AS merge_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Full estimate replay: same 60-bit md5 hash, same k-minimum cut,
    // same (k−1)·2⁶⁰/h₍ₖ₎ arithmetic — unlike HLL, every intermediate
    // is engine-independent.
    "sketch_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type AS scope,
        |    (('0x' || substring(md5(user_id::VARCHAR), 1, 15))::UBIGINT)::BIGINT AS h
        |  FROM events),
        |ha AS (SELECT scope, h FROM h
        |  UNION SELECT DISTINCT '(all)' AS scope, h FROM h),
        |mins AS (SELECT scope, count(*) AS n_kept, max(h) AS hk FROM (
        |    SELECT scope, h,
        |      row_number() OVER (PARTITION BY scope ORDER BY h) AS rn
        |    FROM ha) WHERE rn <= 64 GROUP BY scope),
        |est AS (SELECT scope, n_kept, hk,
        |    CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
        |      ELSE 63 * 1152921504606846976.0 / hk END AS e
        |  FROM mins),
        |ex AS (SELECT event_type AS scope,
        |    count(DISTINCT user_id) AS n_exact FROM events GROUP BY event_type
        |  UNION ALL
        |  SELECT '(all)', count(DISTINCT user_id) FROM events)
        |SELECT scope, n_exact, (floor((e) * 1e2 + 0.5) / 1e2) AS est_kmv,
        |  (floor((abs(e - n_exact) / n_exact) * 1e4 + 0.5) / 1e4) AS rel_err
        |FROM est JOIN ex USING (scope) ORDER BY scope""".stripMargin,

    // Both candidate rankings replayed end-to-end (BM25 chain + cosine
    // chain), fused with the same 1/(60+rank) arithmetic.
    "search_hybrid_rrf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${DuckSql.tokens("text")} AS toks FROM documents),
         |lens AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM toks),
         |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM lens),
         |posts AS (
         |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
         |  WHERE term IN ($TermsSql)
         |  GROUP BY doc_id, term),
         |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM posts GROUP BY term),
         |bmtop AS (
         |  SELECT p.doc_id,
         |    floor(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
         |      * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))
         |      * 1e6 + 0.5) / 1e6 AS bm25
         |  FROM posts p
         |  JOIN dfreq USING (term) JOIN lens USING (doc_id) CROSS JOIN stats
         |  GROUP BY p.doc_id
         |  ORDER BY bm25 DESC, doc_id LIMIT 50),
         |rkw AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_kw FROM bmtop),
         |embs AS (SELECT vec_id, ${DuckSql.vecDouble("embedding")} AS de FROM embeddings),
         |q AS (SELECT de AS qe FROM embs WHERE vec_id = 0),
         |vtop AS (
         |  SELECT vec_id AS doc_id, (floor((${DuckSql.cosine("de", "qe")}) * 1e6 + 0.5) / 1e6) AS cosine
         |  FROM embs, q WHERE vec_id <> 0
         |  ORDER BY cosine DESC, vec_id LIMIT 50),
         |rv AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY cosine DESC, doc_id) AS r_vec FROM vtop),
         |j AS (
         |  SELECT coalesce(rkw.doc_id, rv.doc_id) AS doc_id, r_kw, r_vec
         |  FROM rkw FULL OUTER JOIN rv ON rkw.doc_id = rv.doc_id)
         |SELECT doc_id, r_kw, r_vec,
         |  (floor((coalesce(1.0 / (60 + r_kw), 0) + coalesce(1.0 / (60 + r_vec), 0)) * 1e6 + 0.5) / 1e6) AS rrf
         |FROM j ORDER BY rrf DESC, doc_id LIMIT 15""".stripMargin,

    // Same replayable md5-chunk sketch family over both key columns; the
    // estimate is integral arithmetic (bit-identical), the contract
    // re-derived from the oracle's own inner products.
    "sketch_join_size" ->
      s"""WITH ka AS (SELECT CAST(o_custkey AS VARCHAR) AS term FROM orders),
         |kb AS (SELECT CAST(c_custkey AS VARCHAR) AS term FROM customer),
         |ca AS (SELECT r.range AS row,
         |    ('0x' || substr(md5(term), CAST(1 + 8 * r.range AS INTEGER), 8))::UBIGINT % 512 AS bucket,
         |    count(*) AS cnt_a
         |  FROM ka CROSS JOIN range(0, 4) r GROUP BY 1, 2),
         |cb AS (SELECT r.range AS row,
         |    ('0x' || substr(md5(term), CAST(1 + 8 * r.range AS INTEGER), 8))::UBIGINT % 512 AS bucket,
         |    count(*) AS cnt_b
         |  FROM kb CROSS JOIN range(0, 4) r GROUP BY 1, 2),
         |ip AS (SELECT ca.row, sum(cnt_a * cnt_b) AS ip
         |       FROM ca JOIN cb ON ca.row = cb.row AND ca.bucket = cb.bucket
         |       GROUP BY 1),
         |es AS (SELECT CASE WHEN count(*) < 4 THEN 0
         |              ELSE min(ip) END AS est FROM ip),
         |ex AS (SELECT coalesce(sum(x.c * y.c), 0) AS exact_size FROM
         |        (SELECT term, count(*) AS c FROM ka GROUP BY 1) x
         |        JOIN (SELECT term, count(*) AS c FROM kb GROUP BY 1) y
         |        USING (term)),
         |sz AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM ka) AS na,
         |              (SELECT CAST(count(*) AS DOUBLE) FROM kb) AS nb)
         |SELECT CAST(est AS BIGINT) AS est, CAST(exact_size AS BIGINT) AS exact_size,
         |  (est >= exact_size AND
         |   est <= exact_size + 4.0 * na * nb / 512) AS within_contract
         |FROM es CROSS JOIN ex CROSS JOIN sz""".stripMargin
  )
}
