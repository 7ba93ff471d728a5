package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** The flagship LLM-pipeline composition: quality gate → exact dedup →
  * near-dup cluster removal → deterministic split, end-to-end as ONE
  * oracle-checked query — the DuckDB twin rebuilds the whole chain
  * (quality formula, digest QUALIFY, LSH CTEs, recursive components,
  * anti-join, hash split) over the same table.
  */
object CurationQueries extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.read(s, s"$dir/documents.parquet")
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  private val K = 16
  private val BANDS = 4

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curate_corpus" -> ((s, dir) =>
      Curation.curate(docs(s, dir), minTokens = 10, minQuality = 0.5,
        n = 3, k = K, bands = BANDS, threshold = 0.5, trainPct = 90)
        .select(col("doc_id"), col("lang"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("quality_score"), col("bucket"), col("split"))
        .orderBy("doc_id")),

    // The full "prepare one training epoch" composite: quality gate →
    // exact dedup → seeded shard assignment → greedy in-shard sequence
    // packing (512-token budget) → per-shard manifest. Every stage is
    // the already-audited operator; the manifest is what a trainer's
    // data loader actually consumes.
    "curate_epoch_plan" -> ((s, dir) => {
      val deduped = graft.operators.Dedup.exact(
        Curation.qualityGate(docs(s, dir)))
      val sharded = Curation.shardAssign(deduped, nShards = 8, seed = 42L)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      sharded.select(col("shard"), col("doc_id"),
          col("n_tokens").cast("long").as("nt"))
        .withColumn("start_tok", coalesce(sum(col("nt")).over(w), lit(0L)))
        .withColumn("seq_id", floor(col("start_tok") / 512))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("total_tokens"),
          countDistinct(col("seq_id")).as("n_packs"))
        .orderBy("shard")
    }),

    // Seeded shard assignment (the training-run "global shuffle"):
    // per-shard balance rollup for epoch seed 42, plus how many docs
    // re-deal to a different shard under the next epoch's seed — zero
    // corpus shuffles (narrow hash projection + one 16-row agg).
    "shard_assign" -> ((s, dir) => {
      val a = Curation.shardAssign(docs(s, dir), nShards = 16, seed = 42L)
      val b = Curation.shardAssign(a.withColumnRenamed("shard", "shard_e1"),
        nShards = 16, seed = 43L)
      b.groupBy(col("shard_e1").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(when(col("shard") =!= col("shard_e1"), 1L).otherwise(0L))
            .as("n_redealt"))
        .orderBy("shard")
    })
  )

  private val toksSql = DuckSql.tokens("text")

  /** The quality-grade → gate → exact-dedup CTE chain shared by the
    * curate_corpus and curate_epoch_plan oracles. */
  private def gradedKeptCtes: String =
    s"""graded AS (
       |  SELECT doc_id, lang, text, len(toks) AS n_tokens,
       |    (floor((CASE WHEN len(toks) = 0 THEN 0.0 ELSE
       |      1.0 - least(CAST(punct AS DOUBLE) / greatest(n_chars_s, 1) * 2.0, 0.5)
       |          - CASE WHEN len(toks) < 10 THEN 0.3 ELSE 0.0 END
       |          - CASE WHEN CAST(stop AS DOUBLE) / greatest(len(toks), 1) < 0.01
       |              THEN 0.2 ELSE 0.0 END
       |      END) * 1e6 + 0.5) / 1e6) AS quality_score
       |  FROM (
       |    SELECT doc_id, lang, text, $toksSql AS toks,
       |      length(text) AS n_chars_s,
       |      len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS punct,
       |      len(list_filter($toksSql, t -> t IN
       |        ('the','a','of','and','to','is','in','it','that','for'))) AS stop
       |    FROM documents)),
       |kept AS (
       |  SELECT * FROM graded WHERE n_tokens >= 10 AND quality_score >= 0.5),
       |exact_kept AS (
       |  SELECT * FROM kept
       |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "curate_corpus" -> {
      val bucketExpr =
        "(('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100)::BIGINT"
      s"""WITH RECURSIVE $gradedKeptCtes,
         |${DuckSql.lshChain("exact_kept", 3, K, BANDS)},
         |${DuckSql.componentCtes(0.5)}
         |SELECT e.doc_id, e.lang, e.n_tokens, e.quality_score,
         |  $bucketExpr AS bucket,
         |  CASE WHEN $bucketExpr < 90 THEN 'train' ELSE 'eval' END AS split
         |FROM exact_kept e
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM comp c
         |  WHERE c.doc_id = e.doc_id AND c.doc_id <> c.cluster_rep)
         |ORDER BY e.doc_id""".stripMargin
    },

    // same gate/dedup chain, same shard hash, same prefix-sum packing
    "curate_epoch_plan" ->
      s"""WITH $gradedKeptCtes,
         |sh AS (SELECT doc_id, n_tokens::BIGINT AS nt,
         |    (('0x' || substring(md5('42:' || doc_id::VARCHAR), 1, 8))::UBIGINT
         |      % 8)::BIGINT AS shard
         |  FROM exact_kept),
         |pk AS (SELECT shard, doc_id, nt,
         |    coalesce(sum(nt) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
         |  FROM sh)
         |SELECT shard, count(*) AS n_docs, sum(nt)::BIGINT AS total_tokens,
         |  count(DISTINCT start_tok // 512) AS n_packs
         |FROM pk GROUP BY shard ORDER BY shard""".stripMargin,

    "shard_assign" ->
      """WITH s AS (
        |  SELECT n_chars,
        |    (('0x' || substring(md5('42:' || doc_id::VARCHAR), 1, 8))::UBIGINT
        |      % 16)::BIGINT AS shard,
        |    (('0x' || substring(md5('43:' || doc_id::VARCHAR), 1, 8))::UBIGINT
        |      % 16)::BIGINT AS shard_next
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs,
        |  sum(n_chars)::BIGINT AS total_chars,
        |  sum(CASE WHEN shard <> shard_next THEN 1 ELSE 0 END)::BIGINT
        |    AS n_redealt
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin
  )
}
