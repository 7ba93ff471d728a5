package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Selection, TextAnalysis}
import graft.operators.Iterate.MaterializeOps

/** Budgeted corpus-selection registrations: weighted sampling, token-
  * budget truncation and MMR diverse top-k ([[graft.operators.Selection]]).
  * The MMR oracle unrolls the greedy pick sequence CTE-by-CTE, the same
  * way the PageRank oracle unrolls its power iterations.
  */
object SelectionQueries extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.read(s, s"$dir/documents.parquet")
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  private def emb(s: SparkSession, dir: String): DataFrame =
    graft.Tables.read(s, s"$dir/embeddings.parquet")
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  private val SAMPLE_K = 25
  private val MMR_K = 4
  private val MMR_M = 64
  private val LAMBDA = 0.7
  private val QUERY_ID = 0L
  private val OVERSAMPLE = 8
  private val KC_CELLS = 16

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Quality-weighted corpus sample: 25 docs, inclusion odds ∝ n_chars,
    // via deterministic A-Res keys (TakeOrderedAndProject top-k).
    "select_weighted_sample" -> ((s, dir) =>
      Selection.weightedSample(docs(s, dir), SAMPLE_K, weightCol = "n_chars")
        .select(col("doc_id"), col("n_chars"), col("ares_key"))
        .orderBy("doc_id")),

    // Token-budget truncation: best-quality docs until 10% of the corpus
    // token mass — exact global-cumsum semantics via the two-phase
    // histogram threshold (no unbounded window).
    "select_token_budget" -> ((s, dir) => {
      // Materialize the graded frame once: three actions consume it (the
      // budget total, the histogram, the final filter) and quality
      // scoring re-tokenizes the corpus on every recompute.
      val g = TextAnalysis.qualityMetrics(docs(s, dir))
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("quality_score"))
        .materialized
      val budget = g.agg(floor(sum(col("n_tokens")) * lit(0.1)).cast("long"))
        .head().getLong(0)
      Selection.tokenBudgetSelect(g, budget, "quality_score", "n_tokens")
        .orderBy("doc_id")
    }),

    // MMR diverse top-k vs the vec_id=0 query: greedy picks over the
    // 64-strong relevance shortlist, λ = 0.7.
    "select_mmr_diverse" -> ((s, dir) =>
      Selection.mmrSelect(emb(s, dir), QUERY_ID, MMR_K, LAMBDA, MMR_M)),

    // Greedy k-center coreset: 4 maximally-spread exemplars — the EXACT
    // farthest-point traversal (k − 1 sequential corpus passes, k
    // require-capped at 64 in the operator: a bounded number of driver-
    // sequenced jobs, not corpus-wide iteration). The oversampled
    // single-pass scale form is the sibling query below; at sf0.01 its
    // candidate cut misses one exact pick, so the two stay SEPARATE
    // queries rather than one routed through the other — the pair green
    // together documents exactly how closely the scale form tracks the
    // exact one.
    "select_kcenter" -> ((s, dir) =>
      Selection.kCenterSelect(emb(s, dir), MMR_K)),

    // The 100 TB form: one cell-assign pass → bounded extremes+medoid
    // candidate frame → driver greedy over ≤ nCells·(oversample+1)+1
    // rows. The oracle replays the SAME candidate selection and greedy,
    // so the hash compare covers the whole oversampled algorithm.
    "select_kcenter_oversampled" -> ((s, dir) =>
      Selection.kCenterSelectOversampled(emb(s, dir), MMR_K,
        oversample = OVERSAMPLE, nCells = KC_CELLS))
  )

  // ---- oracles ----

  private def mmrOracle: String = {
    val emb = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    // λ and (1−λ) as exact double literals (Scala toString round-trips),
    // so the oracle multiplies by the SAME doubles Spark does.
    val lam = LAMBDA.toString
    val oneMinus = (1 - LAMBDA).toString
    def cos(a: String, b: String) = DuckSql.cosine(a, b)
    val picks = (2 to MMR_K).map { i =>
      val prev = (1 until i).map(j => s"SELECT * FROM p$j").mkString(" UNION ALL ")
      s"""p$i AS (
         |  SELECT s.vec_id, s.emb, (floor((s.rel * $lam - ms.max_sim * $oneMinus) * 1e6 + 0.5) / 1e6) AS score
         |  FROM short s JOIN (
         |    SELECT s2.vec_id, max((floor((${cos("s2.emb", "p.emb")}) * 1e6 + 0.5) / 1e6)) AS max_sim
         |    FROM short s2, ($prev) p
         |    WHERE s2.vec_id NOT IN (SELECT vec_id FROM ($prev))
         |    GROUP BY s2.vec_id) ms ON s.vec_id = ms.vec_id
         |  ORDER BY score DESC, s.vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to MMR_K)
      .map(i => s"SELECT $i AS pick_order, vec_id, score AS mmr_score FROM p$i")
      .mkString("\nUNION ALL ")
    s"""WITH q AS (
       |  SELECT $emb AS emb FROM embeddings WHERE vec_id = $QUERY_ID),
       |cand AS (
       |  SELECT e.vec_id, $emb AS emb,
       |    (floor((${cos(s"($emb)", "q.emb")}) * 1e6 + 0.5) / 1e6) AS rel
       |  FROM embeddings e, q WHERE e.vec_id <> $QUERY_ID),
       |short AS (SELECT * FROM cand ORDER BY rel DESC, vec_id LIMIT $MMR_M),
       |p1 AS (
       |  SELECT vec_id, emb, (floor((rel * $lam) * 1e6 + 0.5) / 1e6) AS score
       |  FROM short ORDER BY score DESC, vec_id LIMIT 1),
       |$picks
       |$out
       |ORDER BY pick_order""".stripMargin
  }

  private def kCenterOracle: String = {
    def cos(a: String, b: String) = DuckSql.cosine(a, b)
    val picks = (2 to MMR_K).map { i =>
      val prev = (1 until i).map(j => s"SELECT * FROM p$j").mkString(" UNION ALL ")
      s"""p$i AS (
         |  SELECT c.vec_id, c.emb, md.d FROM base c JOIN (
         |    SELECT c2.vec_id, min((floor((1 - ${cos("c2.emb", "p.emb")}) * 1e6 + 0.5) / 1e6)) AS d
         |    FROM base c2, ($prev) p
         |    WHERE c2.vec_id NOT IN (SELECT vec_id FROM ($prev))
         |    GROUP BY c2.vec_id) md ON c.vec_id = md.vec_id
         |  ORDER BY md.d DESC, c.vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to MMR_K)
      .map(i => s"SELECT $i AS pick_order, vec_id, d AS min_dist FROM p$i")
      .mkString("\nUNION ALL ")
    s"""WITH base AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |p1 AS (SELECT vec_id, emb, -1.0 AS d FROM base ORDER BY vec_id LIMIT 1),
       |$picks
       |$out
       |ORDER BY pick_order""".stripMargin
  }

  /** Oracle twin of Selection.kCenterSelectOversampled: the cell-assign
    * argmax, the per-cell extremes+medoid candidate rule, and the greedy
    * unrolled over the candidate relation instead of the corpus.
    */
  private def kCenterOversampledOracle: String = {
    def cos(a: String, b: String) = DuckSql.cosine(a, b)
    val picks = (2 to MMR_K).map { i =>
      val prev = (1 until i).map(j => s"SELECT * FROM p$j").mkString(" UNION ALL ")
      s"""p$i AS (
         |  SELECT c.vec_id, c.emb, md.d FROM cand c JOIN (
         |    SELECT c2.vec_id, min((floor((1 - ${cos("c2.emb", "p.emb")}) * 1e6 + 0.5) / 1e6)) AS d
         |    FROM cand c2, ($prev) p
         |    WHERE c2.vec_id NOT IN (SELECT vec_id FROM ($prev))
         |    GROUP BY c2.vec_id) md ON c.vec_id = md.vec_id
         |  ORDER BY md.d DESC, c.vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to MMR_K)
      .map(i => s"SELECT $i AS pick_order, vec_id, d AS min_dist FROM p$i")
      .mkString("\nUNION ALL ")
    s"""WITH base AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |pc AS (SELECT vec_id AS cell, emb AS cemb FROM base
       |  WHERE vec_id < $KC_CELLS),
       |asg AS (
       |  SELECT vec_id, emb, cell, sim FROM (
       |    SELECT b.vec_id, b.emb, c.cell,
       |      (floor((${cos("b.emb", "c.cemb")}) * 1e6 + 0.5) / 1e6) AS sim
       |    FROM base b CROSS JOIN pc c)
       |  QUALIFY row_number() OVER (PARTITION BY vec_id
       |    ORDER BY sim DESC, cell) = 1),
       |cand AS (
       |  SELECT vec_id, emb FROM (
       |    SELECT vec_id, emb, sim,
       |      row_number() OVER (PARTITION BY cell ORDER BY sim ASC, vec_id)
       |        AS rk_out,
       |      row_number() OVER (PARTITION BY cell ORDER BY sim DESC, vec_id)
       |        AS rk_med
       |    FROM asg)
       |  WHERE rk_out <= $OVERSAMPLE OR rk_med = 1
       |     OR vec_id = (SELECT min(vec_id) FROM base)),
       |p1 AS (SELECT vec_id, emb, -1.0 AS d FROM cand ORDER BY vec_id LIMIT 1),
       |$picks
       |$out
       |ORDER BY pick_order""".stripMargin
  }

  val oracles: Map[String, String] = Map(

    "select_kcenter" -> kCenterOracle,

    "select_kcenter_oversampled" -> kCenterOversampledOracle,

    "select_weighted_sample" ->
      s"""SELECT doc_id, n_chars, ares_key FROM (
         |  SELECT doc_id, n_chars,
         |    (floor((ln((('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::DOUBLE
         |      + 0.5) / 4294967296.0) / n_chars) * 1e9 + 0.5) / 1e9) AS ares_key
         |  FROM documents WHERE n_chars > 0)
         |ORDER BY ares_key DESC, doc_id LIMIT $SAMPLE_K""".stripMargin,

    "select_token_budget" ->
      s"""WITH q AS (${TextQueries.qualityBodySql}),
         |b AS (SELECT CAST(floor(sum(n_tokens) * 0.1) AS BIGINT) AS budget FROM q)
         |SELECT doc_id, n_tokens, quality_score FROM q, b
         |QUALIFY sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= budget
         |ORDER BY doc_id""".stripMargin,

    "select_mmr_diverse" -> mmrOracle
  )
}
