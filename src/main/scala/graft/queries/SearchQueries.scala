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
        graft.Tables.load(s, dir, "customer"), "c_custkey"))
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
