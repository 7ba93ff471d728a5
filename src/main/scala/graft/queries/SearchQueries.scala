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
    s.read.parquet(s"$dir/documents.parquet")
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

    // Hybrid retrieval: BM25 top-50 ∪ cosine top-50 fused by
    // reciprocal-rank fusion (k=60), top-15 (operators/Search.scala).
    "search_hybrid_rrf" -> ((s, dir) =>
      Search.hybridRrfTopK(docs(s, dir),
        s.read.parquet(s"$dir/embeddings.parquet"),
        Terms, queryId = 0L, topK = 15))
  )

  val oracles: Map[String, String] = Map(
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
         |  round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
         |    * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS bm25
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
         |    round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
         |      * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS bm25
         |  FROM posts p
         |  JOIN dfreq USING (term) JOIN lens USING (doc_id) CROSS JOIN stats
         |  GROUP BY p.doc_id
         |  ORDER BY bm25 DESC, doc_id LIMIT 50),
         |rkw AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_kw FROM bmtop),
         |embs AS (SELECT vec_id, ${DuckSql.vecDouble("embedding")} AS de FROM embeddings),
         |q AS (SELECT de AS qe FROM embs WHERE vec_id = 0),
         |vtop AS (
         |  SELECT vec_id AS doc_id, round(${DuckSql.cosine("de", "qe")}, 6) AS cosine
         |  FROM embs, q WHERE vec_id <> 0
         |  ORDER BY cosine DESC, vec_id LIMIT 50),
         |rv AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY cosine DESC, doc_id) AS r_vec FROM vtop),
         |j AS (
         |  SELECT coalesce(rkw.doc_id, rv.doc_id) AS doc_id, r_kw, r_vec
         |  FROM rkw FULL OUTER JOIN rv ON rkw.doc_id = rv.doc_id)
         |SELECT doc_id, r_kw, r_vec,
         |  round(coalesce(1.0 / (60 + r_kw), 0) + coalesce(1.0 / (60 + r_vec), 0), 6) AS rrf
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
