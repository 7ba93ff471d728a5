package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.operators.Iterate.MaterializeOps

/** Text-analysis registrations (EX8 + north-star text ops) over the
  * `documents` table: language breakdown, heuristic lang-ID, quality
  * metrics, token counts, winnowing fingerprints, top terms.
  */
object TextQueries extends QueryPack {

  // Single-file parquet tables scan as ONE partition; repartition so the
  // narrow per-document work parallelizes (at real scale the table is
  // many files and this is a no-op cost).
  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.read(s, s"$dir/documents.parquet")
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // EX8: language/source breakdown.
    "text_lang_breakdown" -> ((s, dir) =>
      docs(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("n_chars")).cast("double") / count(col("n_chars")))
            .as("avg_chars"))
        .orderBy("lang")),

    // Heuristic language-ID (marker stopwords + CJK detection).
    "text_lang_id" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id")),

    // Multiclass confusion matrix of the language-ID heuristic against
    // the table's ground-truth labels — the per-pair error structure a
    // router/filter needs before trusting the classifier (which langs
    // leak into which). |langs|² bounded output, one hash agg.
    "text_langid_confusion" -> ((s, dir) =>
      docs(s, dir)
        .select(col("lang").as("actual_lang"),
          TextAnalysis.langId(col("text")).as("pred_lang"))
        .groupBy("actual_lang", "pred_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("actual_lang", "pred_lang")),

    // Quality scoring (length/punct/stopword ratio composite).
    "text_quality" -> ((s, dir) =>
      TextAnalysis.qualityMetrics(docs(s, dir))
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"), col("avg_token_len"),
          col("punct_ratio"), col("stopword_ratio"), col("quality_score"))
        .orderBy("doc_id")),

    // Unpivot/melt (pivot's inverse): quality metrics to long-format
    // (doc_id, metric, value) rows — Spark plans it as a single Expand
    // (one pass, rows × |metrics|), not a self-union of 4 scans.
    "text_metrics_unpivot" -> ((s, dir) =>
      TextAnalysis.qualityMetrics(docs(s, dir))
        .select(col("doc_id"), col("avg_token_len"), col("punct_ratio"),
          col("stopword_ratio"), col("quality_score"))
        .unpivot(Array(col("doc_id")),
          Array(col("avg_token_len"), col("punct_ratio"),
            col("stopword_ratio"), col("quality_score")),
          "metric", "value")
        .orderBy("doc_id", "metric")),

    // Token counting: whitespace + alnum + BPE-ish subword counts.
    "text_token_counts" -> ((s, dir) =>
      TextAnalysis.tokenCounts(docs(s, dir))
        .withColumn("raw_ws_tokens", size(split(trim(col("text")), "\\s+")))
        .select(col("doc_id"), col("raw_ws_tokens").cast("long").as("raw_ws_tokens"),
          col("ws_tokens").cast("long").as("ws_tokens"),
          col("bpeish_tokens").cast("long").as("bpeish_tokens"))
        .orderBy("doc_id")),

    // Winnowing fingerprint sketch (md5 shingles, window minima).
    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprintSketch(docs(s, dir), windowSize = 4)
        .orderBy("doc_id")),

    // Deterministic train/eval split (hash-bucket, not randomSplit —
    // stable across runs/engines/partitionings).
    "text_train_split" -> ((s, dir) =>
      TextAnalysis.hashSplit(docs(s, dir), trainPct = 90)
        .select(col("doc_id"), col("bucket"), col("split"))
        .orderBy("doc_id")),

    // Gopher-style repetition quality rule: top bigram share per doc.
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionMetrics(docs(s, dir), n = 2)
        .orderBy("doc_id")),

    // Ingest normalization: URL/email strip, control-char removal,
    // whitespace collapse — verified per doc by digest of the result.
    "text_normalize" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          length(TextAnalysis.normalizeText(col("text"))).cast("long").as("norm_len"),
          md5(TextAnalysis.normalizeText(col("text"))).as("norm_md5"))
        .orderBy("doc_id")),

    // Eval-set decontamination: distinct 4-grams each corpus doc shares
    // with the probe set (doc_id < 20 stands in for a benchmark suite).
    "text_contamination" -> ((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.contamination(
          d.filter(col("doc_id") >= 20), d.filter(col("doc_id") < 20), n = 4)
        .orderBy("doc_id")
    }),

    // Deterministic data-mixture weights: en upsampled 2.5×, fr
    // downsampled to 25%, es dropped, others kept — per-doc copy counts
    // (hash-bucket fractional selection, no RNG).
    "text_mixture" -> ((s, dir) =>
      TextAnalysis.mixtureCopies(docs(s, dir),
        weights = Map("en" -> 2.5, "fr" -> 0.25, "es" -> 0.0))
        .select(col("doc_id"), col("lang"), col("copies"))
        .orderBy("doc_id")),

    // Collocation mining: top token pairs by document-level PMI
    // (narrow pair fan-out from each doc's sorted distinct tokens).
    "text_collocations" -> ((s, dir) =>
      TextAnalysis.collocations(docs(s, dir), minSupport = 10, topN = 20)),

    // EX8b: corpus top-20 terms.
    // Per-doc TF-IDF keywords (top-3): tf⋈df SHUFFLE join (vocabulary is
    // corpus-sized, never broadcast), WindowGroupLimit per-doc top-k.
    "text_tfidf_keywords" -> ((s, dir) =>
      graft.operators.TextAnalysis.tfidfKeywords(docs(s, dir), topPerDoc = 3)
        .orderBy("doc_id", "rank")),

    "text_top_terms" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term"))
        .limit(20)),

    // PII redaction pass: per-doc match counts + digest of the masked
    // text (replacement chain verified exactly; branch coverage on
    // PII-bearing literals lives in PiiSpec — the driver corpus is clean).
    "text_pii" -> ((s, dir) =>
      TextAnalysis.piiRedact(docs(s, dir))
        .orderBy("doc_id")),

    // Concat-and-chunk sequence packing: 512-token budget, 32 hash
    // buckets packed independently (no global sort — see Scaladoc).
    "pack_sequences" -> ((s, dir) =>
      TextAnalysis.packSequences(docs(s, dir), budgetTokens = 512)
        .orderBy("bucket", "seq_id")),

    // Pivot (wide-format corpus report): documents per source × language.
    // The value list is EXPLICIT — deterministic output schema, single
    // pass (Catalyst plans pivot-with-values as one aggregate, no
    // distinct-values pre-query); absent combinations surface as 0.
    "agg_pivot_lang_source" -> ((s, dir) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      docs(s, dir)
        .groupBy(col("source"))
        .pivot("lang", langs)
        .agg(count(lit(1)))
        .select(col("source") +: langs.map(l =>
          coalesce(col(l), lit(0L)).as(s"n_$l")): _*)
        .orderBy("source")
    }),

    // Relative quality gate: keep documents at-or-above their language's
    // median quality score — the per-group-threshold form of curation
    // filtering. The per-lang median is a tiny aggregate that BROADCASTS
    // back onto the corpus (never a window over the full table: a
    // per-lang percentile window would sort 100 TB inside ≤ |langs|
    // partitions).
    "text_quality_median_gate" -> ((s, dir) => {
      // cut ONCE (r20): the median build side and the gate probe both
      // consume this frame — uncut, the plan scanned the corpus and ran
      // the quality CPU twice (2 parquet scans in the before plan)
      val scored = TextAnalysis.qualityMetrics(docs(s, dir))
        .select(col("doc_id"), col("lang"), col("quality_score"))
        .materialized
      val med = scored.groupBy(col("lang"))
        .agg(expr("percentile(quality_score, 0.5)").as("med"))
      scored.join(broadcast(med), "lang")
        .filter(col("quality_score") >= col("med"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          (floor((min(col("quality_score"))) * 1e6 + 0.5) / 1e6).as("min_kept_score"))
        .orderBy("lang")
    }),

    // fastText-style hashed bag-of-features linear classifier: unigram +
    // bigram features, hash-derived weights (the documented model-stub
    // boundary — see expressions/LinearScoreExpr.scala), sigmoid
    // calibration. One native-expression pass per document, no shuffle.
    "text_classifier" -> ((s, dir) => {
      import graft.functions.TextFns
      import graft.functions.expressions.LinearScoreExpr
      docs(s, dir)
        .select(col("doc_id"),
          concat(TextFns.textShingles(col("text"), 1),
            TextFns.textShingles(col("text"), 2)).as("features"))
        .filter(size(col("features")) > 0)
        .select(col("doc_id"),
          (floor((lit(1.0) / (lit(1.0) +
            exp(lit(-4.0) * LinearScoreExpr.linearScoreNative(col("features"), 4096)))) * 1e6 + 0.5) / 1e6)
            .as("quality_prob"))
        .orderBy("doc_id")
    }),

    // CCNet-style unigram log-probability quality proxy: corpus-frequency
    // table shuffle-joined onto the token stream (the vocabulary is
    // unbounded at scale, so no broadcast hint — AQE picks), per-doc mean.
    "text_unigram_logprob" -> ((s, dir) =>
      TextAnalysis.unigramLogProb(docs(s, dir))
        .orderBy("doc_id")),

    // Temperature-scaled source mixing weights (share ∝ n^0.3): the
    // per-source up/down-sampling rate a mixture resampler consumes.
    "text_temperature_mix" -> ((s, dir) =>
      TextAnalysis.temperatureWeights(docs(s, dir), alpha = 0.3)
        .orderBy("source")),

    // Per-source corpus datacard: volume, language spread, dup rate.
    "text_datacard" -> ((s, dir) =>
      TextAnalysis.datacard(docs(s, dir))
        .orderBy("source")),

    // N-gram novelty: each doc's share of 3-grams it introduced to the
    // corpus — redundancy-aware contribution scoring beyond pairwise
    // dedup.
    "text_novelty" -> ((s, dir) =>
      TextAnalysis.noveltyScores(docs(s, dir), n = 3)
        .orderBy("doc_id")),

    // Cross-document repeated-span hotspots: the 20 5-gram spans shared
    // by the most documents (then total occurrences) — the
    // memorization-risk / boilerplate report behind sentence-dedup rules.
    "text_span_hotspots" -> ((s, dir) =>
      TextAnalysis.spanHotspots(docs(s, dir), n = 5, minDocs = 2, topN = 20)),

    // Zipf-law exponent + fit quality over the top-100 term frequencies
    // (datacard stat: natural text slope ~ -1; the regression runs over
    // the bounded top-N frame only).
    "text_zipf_fit" -> ((s, dir) =>
      TextAnalysis.zipfFit(docs(s, dir), topN = 100)),

    // Heaps-law vocabulary growth over 10 doc_id-range buckets.
    "text_vocab_growth" -> ((s, dir) =>
      TextAnalysis.vocabGrowth(docs(s, dir), buckets = 10)
        .orderBy("bucket")),

    // Bigram conditional LM quality proxy: per-doc mean ln P(w|prev)
    // under the corpus MLE — one explode pass, shuffle-joined counts.
    "text_bigram_logprob" -> ((s, dir) =>
      TextAnalysis.bigramLogProb(docs(s, dir))
        .orderBy("doc_id")),

    // DSIR-style importance weights: hashed unigram+bigram distribution
    // of the src0 "target domain" vs the whole corpus, per-doc mean
    // log-ratio (positive = looks like the target).
    "text_importance_weights" -> ((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.importanceWeights(d, d.filter(col("source") === "src0"))
        .orderBy("doc_id")
    }),

    // End-to-end DSIR data selection: importance weights vs the src0
    // target domain → tier by weight → deterministic resample (high 1.5×,
    // mid 1×, low dropped) → train/eval hash split. One green composite
    // oracle over the whole score → resample → split chain.
    "curate_selected" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.Curation.curateSelected(
          d, d.filter(col("source") === "src0"),
          hiWeight = CurHi, loWeight = CurLo)
        .select(col("doc_id"), col("tier"), col("copy_idx"), col("split"))
        .orderBy("doc_id", "copy_idx")
    }),

    // End-to-end decontamination: flag corpus docs sharing any distinct
    // 4-gram with the probe set (doc_id < 20) → drop them → re-stat the
    // surviving corpus per source (docs seen / dropped / kept + kept
    // token mass). One green composite oracle over the whole chain.
    "curate_decontaminated" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.Curation.curateDecontaminated(
          d.filter(col("doc_id") >= 20), d.filter(col("doc_id") < 20),
          maxShared = 0, n = 4)
        .orderBy("source")
    }),

    // Per-source drift monitor: KL(source ‖ corpus) over the hashed
    // 1024-bucket unigram distribution — bounded sketch, no vocab table.
    "text_source_divergence" -> ((s, dir) =>
      TextAnalysis.sourceDivergence(docs(s, dir))
        .orderBy("source")),

    // Sliding-window chunking (RAG/context prep): 32-token chunks,
    // stride 24, tail-anchored final chunk — narrow fan-out, no shuffle.
    "text_chunks" -> ((s, dir) =>
      TextAnalysis.chunkOverlap(docs(s, dir), window = 32, stride = 24)
        .orderBy("doc_id", "chunk_idx")),

    // Corpus-level boilerplate scrub: tokens covered by any 5-gram span
    // shared across >= 2 docs are removed, doc rebuilt from survivors —
    // the rewrite form of text_span_hotspots (hot table shuffle-joined,
    // coverage + rebuild narrow HOFs).
    "text_span_scrub" -> ((s, dir) =>
      TextAnalysis.scrubHotSpans(docs(s, dir), n = 5, minDocs = 2)
        .orderBy("doc_id")),

    // Within-doc duplicate-sentence removal (doc-local boilerplate strip):
    // narrow per-row op — sentences array materialized as a column first
    // so the filter lambda sees an attribute, not a re-evaluated split.
    "text_span_dedup" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          split(col("text"), java.util.regex.Pattern.quote(". ")).as("sents"))
        .select(col("doc_id"), size(col("sents")).as("n_sents"),
          TextAnalysis.dedupSentencesInDoc(col("sents")).as("cleaned"))
        .select(col("doc_id"), col("n_sents"),
          (col("n_sents") - size(split(col("cleaned"),
            java.util.regex.Pattern.quote(". ")))).as("n_removed"),
          md5(col("cleaned")).as("cleaned_md5"))
        .orderBy("doc_id")),

    // Trigram stupid-backoff LM scored against the src0 reference corpus
    // (the CCNet/KenLM quality-filter shape): seen trigram → MLE, else
    // backoff to bigram, else smoothed unigram. Count joins carry
    // DISTINCT trigrams per doc, weighted by occurrence.
    "text_trigram_backoff" -> ((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.trigramBackoffScore(d, d.filter(col("source") === "src0"),
          alpha = TriAlpha)
        .orderBy("doc_id")
    }),

    // Perplexity admission gate at ppl <= 75 over the trigram LM: the
    // per-source keep-rate report a corpus split publishes.
    "text_perplexity_gate" -> ((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.perplexityGate(d, d.filter(col("source") === "src0"),
          maxPpl = GatePpl, alpha = TriAlpha)
        .orderBy("source")
    })
  )

  private val TriAlpha = 0.4
  private val GatePpl = 75.0

  private val toksSql = DuckSql.tokens("text")

  // DSIR tier thresholds shared by the curate_selected query and oracle:
  // inside the observed weight range at every driver SF (quartiles ≈
  // −0.18 / −0.15 / −0.12 at sf0.01) so all three tiers stay populated.
  private val CurHi = -0.11
  private val CurLo = -0.19

  /** Shared DSIR replay (oracle twin of TextAnalysis.importanceWeights):
    * hashed unigram+bigram buckets for corpus and the src0 target domain,
    * smoothed per-bucket log-ratios.
    */
  private lazy val dsirCtes: String =
    s"""feats AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(unnest(list_concat(toks, ${DuckSql.shingles("toks", 2)}))), 1, 8))::UBIGINT % 1024 AS bucket
       |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
       |tfeats AS (
       |  SELECT ('0x' || substr(md5(unnest(list_concat(toks, ${DuckSql.shingles("toks", 2)}))), 1, 8))::UBIGINT % 1024 AS bucket
       |  FROM (SELECT $toksSql AS toks FROM documents WHERE source = 'src0')),
       |cc AS (SELECT bucket, count(*) AS c_cnt FROM feats GROUP BY bucket),
       |tc AS (SELECT bucket, count(*) AS t_cnt FROM tfeats GROUP BY bucket),
       |tot AS (SELECT (SELECT CAST(sum(c_cnt) AS DOUBLE) FROM cc) AS c_total,
       |               (SELECT CAST(sum(t_cnt) AS DOUBLE) FROM tc) AS t_total),
       |ratios AS (
       |  SELECT cc.bucket,
       |    ln(((coalesce(t_cnt, 0) + 0.5) / (t_total + 512.0)) /
       |       ((c_cnt + 0.5) / (c_total + 512.0))) AS logratio
       |  FROM cc LEFT JOIN tc ON cc.bucket = tc.bucket CROSS JOIN tot)""".stripMargin

  /** Oracle twin of TextAnalysis.langId. */
  private val langIdSql: String = {
    val counts = TextAnalysis.langMarkers.map { case (lang, ms) =>
      val c =
        if (ms.isEmpty) "0"
        else s"len(list_filter(toks, t -> t IN (${ms.map(m => s"'$m'").mkString(",")})))"
      lang -> c
    }
    val best = s"greatest(${counts.map(_._2).mkString(", ")})"
    val cases = counts.map { case (lang, c) =>
      s"WHEN $c = best AND best > 0 THEN '$lang'"
    }.mkString("\n    ")
    s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |scored AS (SELECT doc_id, text, toks, $best AS best FROM t)
       |SELECT doc_id,
       |  CASE WHEN len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) > 0 THEN 'zh'
       |    ELSE CASE $cases ELSE 'und' END END AS pred_lang
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  /** The full quality-metric projection (no ordering) — shared by the
    * text_quality oracle and the unpivot/melt oracle.
    */
  private[queries] lazy val qualityBodySql: String =
    s"""WITH t AS (
       |  SELECT doc_id, text, $toksSql AS toks,
       |    length(text) AS n_chars_s,
       |    len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS punct,
       |    len(list_filter($toksSql, t -> t IN
       |      ('the','a','of','and','to','is','in','it','that','for'))) AS stop
       |  FROM documents)
       |SELECT doc_id, len(toks) AS n_tokens,
       |  (floor((CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
       |    / greatest(len(toks), 1)) * 1e4 + 0.5) / 1e4) AS avg_token_len,
       |  (floor((CAST(punct AS DOUBLE) / greatest(n_chars_s, 1)) * 1e6 + 0.5) / 1e6) AS punct_ratio,
       |  (floor((CAST(stop AS DOUBLE) / greatest(len(toks), 1)) * 1e6 + 0.5) / 1e6) AS stopword_ratio,
       |  (floor((CASE WHEN len(toks) = 0 THEN 0.0 ELSE
       |    1.0 - least(CAST(punct AS DOUBLE) / greatest(n_chars_s, 1) * 2.0, 0.5)
       |        - CASE WHEN len(toks) < 10 THEN 0.3 ELSE 0.0 END
       |        - CASE WHEN CAST(stop AS DOUBLE) / greatest(len(toks), 1) < 0.01
       |            THEN 0.2 ELSE 0.0 END
       |    END) * 1e6 + 0.5) / 1e6) AS quality_score
       |FROM t""".stripMargin

  /** Oracle twin of LinearScoreExpr: bucket = u32(md5(f)[0..3]) % dims,
    * weight = u32(md5('w|' || bucket)[0..3]) / 2^32 * 2 - 1, score = mean
    * weight; list_sum keeps per-document summation order deterministic.
    */
  private val classifierSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, list_concat(toks, ${DuckSql.shingles("toks", 2)}) AS features
       |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
       |scored AS (
       |  SELECT doc_id,
       |    list_sum(list_transform(features, x ->
       |      ('0x' || substr(md5('w|' || CAST(('0x' || substr(md5(x), 1, 8))::UBIGINT % 4096 AS VARCHAR)), 1, 8))::UBIGINT
       |        / 4294967296.0 * 2 - 1)) / len(features) AS score
       |  FROM f WHERE len(features) > 0)
       |SELECT doc_id, (floor((1.0 / (1.0 + exp(-4.0 * score))) * 1e6 + 0.5) / 1e6) AS quality_prob
       |FROM scored ORDER BY doc_id""".stripMargin

  /** Oracle twin of TextAnalysis.trigramBackoffScore at alpha=0.4 over
    * the src0 reference: per-doc (n_trigrams, avg_logscore, ppl). The
    * alpha² terminal multiplies the two literals exactly as the engine
    * does (lit(alpha * alpha)) so the doubles agree bit-for-bit.
    */
  private val trigramScoredSql: String =
    s"""WITH ref AS (SELECT $toksSql AS toks FROM documents WHERE source = 'src0'),
       |rt AS (SELECT unnest(toks) AS term FROM ref),
       |uni AS (SELECT term, count(*) AS uni_cnt FROM rt GROUP BY term),
       |bi AS (SELECT bigram, count(*) AS bi_cnt FROM
       |  (SELECT unnest(${DuckSql.shingles("toks", 2)}) AS bigram FROM ref) GROUP BY bigram),
       |tg AS (SELECT trigram, count(*) AS tri_cnt FROM
       |  (SELECT unnest(${DuckSql.shingles("toks", 3)}) AS trigram FROM ref) GROUP BY trigram),
       |tot AS (SELECT CAST(sum(uni_cnt) AS DOUBLE) AS n_total,
       |  CAST(count(*) AS DOUBLE) AS vocab FROM uni),
       |dt AS (SELECT doc_id, unnest(${DuckSql.shingles("toks", 3)}) AS dtri FROM
       |  (SELECT doc_id, $toksSql AS toks FROM documents)),
       |dtc AS (SELECT doc_id, dtri, count(*) AS n_occ FROM dt GROUP BY 1, 2),
       |parts AS (SELECT doc_id, dtri, n_occ, string_split(dtri, ' ') AS p FROM dtc),
       |j AS (SELECT doc_id, n_occ,
       |    CASE WHEN t.tri_cnt IS NOT NULL THEN CAST(t.tri_cnt AS DOUBLE) / b12.bi_cnt
       |         WHEN b23.bi_cnt IS NOT NULL THEN $TriAlpha::DOUBLE * CAST(b23.bi_cnt AS DOUBLE) / u2.uni_cnt
       |         ELSE $TriAlpha::DOUBLE * $TriAlpha::DOUBLE * (CAST(coalesce(u3.uni_cnt, 0) AS DOUBLE) + 1.0)
       |           / (n_total + vocab + 1.0) END AS s
       |  FROM parts
       |  LEFT JOIN tg t ON parts.dtri = t.trigram
       |  LEFT JOIN bi b12 ON (p[1] || ' ' || p[2]) = b12.bigram
       |  LEFT JOIN bi b23 ON (p[2] || ' ' || p[3]) = b23.bigram
       |  LEFT JOIN uni u2 ON p[2] = u2.term
       |  LEFT JOIN uni u3 ON p[3] = u3.term
       |  CROSS JOIN tot),
       |scored AS (SELECT doc_id, CAST(sum(n_occ) AS BIGINT) AS n_trigrams,
       |  floor(sum(ln(s) * n_occ) / sum(n_occ) * 1e6 + 0.5) / 1e6 AS avg_logscore,
       |  floor(exp(-sum(ln(s) * n_occ) / sum(n_occ)) * 1e6 + 0.5) / 1e6 AS ppl
       |FROM j GROUP BY doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(

    "text_trigram_backoff" ->
      s"""$trigramScoredSql
         |SELECT doc_id, n_trigrams, avg_logscore, ppl
         |FROM scored ORDER BY doc_id""".stripMargin,

    "text_perplexity_gate" ->
      s"""$trigramScoredSql
         |SELECT d.source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN s.ppl <= $GatePpl THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  floor(avg(s.ppl) * 1e6 + 0.5) / 1e6 AS mean_ppl,
         |  (floor((CAST(sum(CASE WHEN s.ppl <= $GatePpl THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*)) * 1e6 + 0.5) / 1e6) AS keep_share
         |FROM scored s JOIN documents d USING (doc_id)
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "text_classifier" -> classifierSql,

    "text_unigram_logprob" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |freq AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
         |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total FROM freq)
         |SELECT doc_id, count(*) AS n_tokens,
         |  floor(avg(ln(cnt / n_total)) * 1e6 + 0.5) / 1e6 AS avg_logprob
         |FROM toks JOIN freq USING (term) CROSS JOIN tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_temperature_mix" ->
      """WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
        |SELECT source, n_docs,
        |  (floor((CAST(n_docs AS DOUBLE) / sum(n_docs) OVER ()) * 1e6 + 0.5) / 1e6) AS raw_share,
        |  (floor((pow(n_docs, 0.3) / sum(pow(n_docs, 0.3)) OVER ()) * 1e6 + 0.5) / 1e6) AS temp_share,
        |  (floor(((pow(n_docs, 0.3) / sum(pow(n_docs, 0.3)) OVER ())
        |    / (CAST(n_docs AS DOUBLE) / sum(n_docs) OVER ())) * 1e6 + 0.5) / 1e6) AS rate
        |FROM s ORDER BY source""".stripMargin,

    "text_datacard" ->
      s"""SELECT source,
         |  count(*) AS n_docs,
         |  CAST(sum(len($toksSql)) AS BIGINT) AS total_tokens,
         |  count(DISTINCT lang) AS n_langs,
         |  count(DISTINCT md5(text)) AS n_unique,
         |  min(n_chars) AS min_chars,
         |  max(n_chars) AS max_chars,
         |  CAST(sum(n_chars) AS DOUBLE) / count(n_chars) AS avg_chars,
         |  (floor((1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6) AS dup_rate
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "text_novelty" ->
      s"""WITH g AS (
         |  SELECT doc_id, unnest(list_distinct(${DuckSql.shingles("toks", 3)})) AS gram
         |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
         |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
         |SELECT g.doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_novel,
         |  (floor((CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*)) * 1e6 + 0.5) / 1e6) AS novelty
         |FROM g JOIN f USING (gram)
         |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin,

    "text_span_hotspots" ->
      s"""WITH sp AS (
         |  SELECT doc_id, unnest(${DuckSql.shingles("toks", 5)}) AS span
         |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
         |pd AS (SELECT span, doc_id, count(*) AS c FROM sp GROUP BY 1, 2)
         |SELECT span, count(*) AS n_docs, CAST(sum(c) AS BIGINT) AS n_occ
         |FROM pd GROUP BY span
         |HAVING count(*) >= 2
         |ORDER BY n_docs DESC, n_occ DESC, span
         |LIMIT 20""".stripMargin,

    "text_span_scrub" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |toksx AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS j,
         |    unnest(toks) AS tok FROM t),
         |spans AS (SELECT doc_id, generate_subscripts(sp, 1) - 1 AS s,
         |    unnest(sp) AS span
         |  FROM (SELECT doc_id, ${DuckSql.shingles("toks", 5)} AS sp FROM t)),
         |hot AS (SELECT span FROM spans
         |  GROUP BY span HAVING count(DISTINCT doc_id) >= 2),
         |flag AS (SELECT DISTINCT doc_id, s FROM spans
         |  WHERE span IN (SELECT span FROM hot)),
         |scrub AS (SELECT DISTINCT tx.doc_id, tx.j FROM toksx tx
         |  JOIN flag f ON f.doc_id = tx.doc_id
         |   AND tx.j BETWEEN f.s AND f.s + 4),
         |kept AS (SELECT tx.doc_id, tx.j, tx.tok FROM toksx tx
         |  WHERE NOT EXISTS (SELECT 1 FROM scrub sc
         |    WHERE sc.doc_id = tx.doc_id AND sc.j = tx.j)),
         |ka AS (SELECT doc_id, count(*) AS n_kept,
         |    md5(string_agg(tok, ' ' ORDER BY j)) AS k_md5
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |  CAST(len(t.toks) - coalesce(ka.n_kept, 0) AS BIGINT) AS n_scrubbed,
         |  coalesce(ka.k_md5, md5('')) AS scrub_md5
         |FROM t LEFT JOIN ka USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "text_zipf_fit" ->
      s"""WITH tc AS (
         |  SELECT term, count(*) AS cnt FROM (
         |    SELECT unnest($toksSql) AS term FROM documents)
         |  GROUP BY term ORDER BY cnt DESC, term LIMIT 100),
         |rk AS (SELECT
         |    ln(CAST(row_number() OVER (ORDER BY cnt DESC, term) AS DOUBLE)) AS x,
         |    ln(CAST(cnt AS DOUBLE)) AS y
         |  FROM tc),
         |m AS (SELECT count(*) AS n, avg(x) AS mx, avg(y) AS my,
         |    avg(x * y) AS mxy, avg(x * x) AS mxx, avg(y * y) AS myy
         |  FROM rk),
         |v AS (SELECT n, mx, my, mxy,
         |    mxx - mx * mx AS vx, myy - my * my AS vy FROM m)
         |SELECT n AS n_terms,
         |  CASE WHEN n >= 2 AND vx > 0
         |    THEN (floor(((mxy - mx * my) / vx) * 1e6 + 0.5) / 1e6) END AS slope,
         |  CASE WHEN n >= 2 AND vx > 0
         |    THEN (floor((my - (mxy - mx * my) / vx * mx) * 1e6 + 0.5) / 1e6) END AS intercept,
         |  CASE WHEN n >= 2 AND vx > 0 AND vy > 0
         |    THEN (floor((pow(mxy - mx * my, 2) / (vx * vy)) * 1e6 + 0.5) / 1e6) END AS r2
         |FROM v""".stripMargin,

    "text_vocab_growth" ->
      s"""WITH f AS (
         |  SELECT term, min(doc_id) AS first_doc FROM (
         |    SELECT doc_id, unnest(list_distinct($toksSql)) AS term FROM documents)
         |  GROUP BY term),
         |b AS (
         |  SELECT least(CAST(floor(first_doc * 10 /
         |    ((SELECT max(doc_id) FROM documents) + 1)) AS BIGINT), 9) AS bucket
         |  FROM f)
         |SELECT bucket, count(*) AS new_terms,
         |  CAST(sum(count(*)) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "text_bigram_logprob" ->
      s"""WITH bip AS (
         |  SELECT doc_id, bigram, string_split(bigram, ' ')[1] AS prefix
         |  FROM (SELECT doc_id, unnest(${DuckSql.shingles("toks", 2)}) AS bigram
         |        FROM (SELECT doc_id, $toksSql AS toks FROM documents))),
         |bc AS (SELECT bigram, count(*) AS bi_cnt FROM bip GROUP BY bigram),
         |pc AS (SELECT prefix, count(*) AS pre_cnt FROM bip GROUP BY prefix)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  floor(avg(ln(CAST(bi_cnt AS DOUBLE) / pre_cnt)) * 1e6 + 0.5) / 1e6 AS avg_logprob
         |FROM bip JOIN bc USING (bigram) JOIN pc USING (prefix)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Same hashed-bucket formula as dsirCtes (unigrams only); smoothed KL
    // over the (source × corpus-support-bucket) grid plus the closed-form
    // term for the (1024 − support) buckets nothing hit — mirroring the
    // operator's full-space sum exactly.
    "text_source_divergence" ->
      s"""WITH f AS (
         |  SELECT source,
         |    ('0x' || substr(md5(unnest(toks)), 1, 8))::UBIGINT % 1024 AS bucket
         |  FROM (SELECT source, $toksSql AS toks FROM documents)),
         |sb AS (SELECT source, bucket, count(*) AS s_cnt FROM f GROUP BY 1, 2),
         |st AS (SELECT source, CAST(sum(s_cnt) AS DOUBLE) AS s_total
         |       FROM sb GROUP BY 1),
         |cb AS (SELECT bucket, sum(s_cnt) AS c_cnt FROM sb GROUP BY 1),
         |ct AS (SELECT CAST(sum(c_cnt) AS DOUBLE) AS c_total FROM cb),
         |sup AS (
         |  SELECT st.source, s_total, c_total,
         |    sum(((coalesce(s_cnt, 0) + 0.5) / (s_total + 512.0)) *
         |      ln(((coalesce(s_cnt, 0) + 0.5) / (s_total + 512.0)) /
         |         ((c_cnt + 0.5) / (c_total + 512.0)))) AS kl_sup,
         |    count(*) AS n_sup
         |  FROM st CROSS JOIN cb CROSS JOIN ct
         |  LEFT JOIN sb ON sb.source = st.source AND sb.bucket = cb.bucket
         |  GROUP BY st.source, s_total, c_total)
         |SELECT source, CAST(s_total AS BIGINT) AS n_tokens,
         |  (floor((kl_sup + (1024 - n_sup) * (0.5 / (s_total + 512.0)) *
         |    ln((0.5 / (s_total + 512.0)) / (0.5 / (c_total + 512.0)))) * 1e6 + 0.5) / 1e6)
         |    AS kl_divergence
         |FROM sup ORDER BY source""".stripMargin,

    "text_importance_weights" ->
      s"""WITH $dsirCtes
         |SELECT doc_id, count(*) AS n_feats,
         |  floor(avg(logratio) * 1e6 + 0.5) / 1e6 AS dsir_weight
         |FROM feats JOIN ratios USING (bucket)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Composite selection pipeline: the same DSIR weight replay, then the
    // tier CASE, the mixtureCopies hash-bucket resample and the hashSplit
    // bucket — each stage verbatim from its standalone oracle.
    "curate_selected" ->
      s"""WITH $dsirCtes,
         |wts AS (
         |  SELECT doc_id, floor(avg(logratio) * 1e6 + 0.5) / 1e6 AS dsir_weight
         |  FROM feats JOIN ratios USING (bucket) GROUP BY doc_id),
         |tiered AS (
         |  SELECT w.doc_id,
         |    CASE WHEN dsir_weight >= $CurHi THEN 'high'
         |         WHEN dsir_weight >= $CurLo THEN 'mid' ELSE 'low' END AS tier,
         |    ('0x' || substring(md5(w.doc_id::VARCHAR), 1, 8))::UBIGINT % 100 AS bucket
         |  FROM wts w),
         |expanded AS (
         |  SELECT doc_id, tier, bucket,
         |    CAST(floor(wt) + CASE WHEN bucket < (floor(((wt - floor(wt)) * 100) + 0.5))
         |      THEN 1 ELSE 0 END AS INTEGER) AS copies
         |  FROM (SELECT *, CASE tier WHEN 'high' THEN 1.5 WHEN 'mid' THEN 1.0
         |    ELSE 0.0 END AS wt FROM tiered))
         |SELECT doc_id, tier,
         |  CAST(unnest(range(1, copies + 1)) AS INTEGER) AS copy_idx,
         |  CASE WHEN bucket < 90 THEN 'train' ELSE 'eval' END AS split
         |FROM expanded ORDER BY doc_id, copy_idx""".stripMargin,

    "text_chunks" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS toks FROM documents),
         |n AS (SELECT doc_id, toks, len(toks) AS n_tokens FROM t WHERE len(toks) > 0),
         |st AS (SELECT doc_id, toks,
         |  CASE WHEN greatest(n_tokens - 32, 0) % 24 = 0
         |    THEN range(0, greatest(n_tokens - 32, 0) + 1, 24)
         |    ELSE list_append(range(0, greatest(n_tokens - 32, 0) + 1, 24),
         |                     greatest(n_tokens - 32, 0)) END AS starts FROM n),
         |s AS (SELECT doc_id, toks,
         |  unnest(starts) AS chunk_start,
         |  unnest(range(0, len(starts))) AS chunk_idx FROM st)
         |SELECT doc_id, chunk_idx, chunk_start,
         |  len(toks[chunk_start + 1 : chunk_start + 32]) AS n_chunk_tokens,
         |  array_to_string(toks[chunk_start + 1 : chunk_start + 32], ' ') AS chunk_text
         |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    "text_span_dedup" ->
      """WITH s AS (SELECT doc_id, string_split(text, '. ') AS sents FROM documents),
        |k AS (SELECT doc_id, len(sents) AS n_sents,
        |  array_to_string(list_filter(sents, (x, i) -> list_position(sents, x) = i), '. ') AS cleaned
        |  FROM s)
        |SELECT doc_id, n_sents,
        |  n_sents - len(string_split(cleaned, '. ')) AS n_removed,
        |  md5(cleaned) AS cleaned_md5
        |FROM k ORDER BY doc_id""".stripMargin,

    "text_lang_breakdown" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS DOUBLE) / count(n_chars) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "text_lang_id" -> langIdSql,

    // the lang-id replay joined back to ground truth, counted per pair
    "text_langid_confusion" ->
      s"""SELECT d.lang AS actual_lang, p.pred_lang, count(*) AS n
         |FROM ($langIdSql) p JOIN documents d USING (doc_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "text_quality" -> s"$qualityBodySql\nORDER BY doc_id",

    "text_metrics_unpivot" ->
      s"""WITH q AS ($qualityBodySql)
         |SELECT doc_id, metric, value FROM (
         |  SELECT doc_id, 'avg_token_len' AS metric, avg_token_len AS value FROM q
         |  UNION ALL SELECT doc_id, 'punct_ratio', punct_ratio FROM q
         |  UNION ALL SELECT doc_id, 'stopword_ratio', stopword_ratio FROM q
         |  UNION ALL SELECT doc_id, 'quality_score', quality_score FROM q)
         |ORDER BY doc_id, metric""".stripMargin,

    "text_token_counts" ->
      s"""SELECT doc_id,
         |  len(string_split_regex(trim(text), '\\s+')) AS raw_ws_tokens,
         |  len($toksSql) AS ws_tokens,
         |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpeish_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      s"""WITH sh AS (
         |  SELECT doc_id, generate_subscripts(s, 1) AS pos, md5(unnest(s)) AS h
         |  FROM (SELECT doc_id, ${DuckSql.shingles3("toks")} AS s
         |        FROM (SELECT doc_id, $toksSql AS toks FROM documents))),
         |wins AS (
         |  SELECT doc_id, min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS win_min
         |  FROM sh)
         |SELECT doc_id, count(DISTINCT win_min) AS n_fingerprints,
         |  min(win_min) AS min_fingerprint
         |FROM wins GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_repetition" -> {
      val sh2 = DuckSql.shingles("toks", 2)
      s"""WITH g AS (
         |  SELECT doc_id, unnest($sh2) AS gram
         |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
         |c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram)
         |SELECT doc_id, sum(cnt)::BIGINT AS n_grams, max(cnt) AS top_gram_n,
         |  (floor((CAST(max(cnt) AS DOUBLE) / sum(cnt)) * 1e6 + 0.5) / 1e6) AS top_gram_frac
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "text_normalize" ->
      """SELECT doc_id,
        |  length(trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |    'https?://[^ \t\n\x0B\f\r]+|www\.[^ \t\n\x0B\f\r]+', ' ', 'g'),
        |    '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+', ' ', 'g'),
        |    '[\x00-\x1F\x7F]', ' ', 'g'),
        |    '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS norm_len,
        |  md5(trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |    'https?://[^ \t\n\x0B\f\r]+|www\.[^ \t\n\x0B\f\r]+', ' ', 'g'),
        |    '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+', ' ', 'g'),
        |    '[\x00-\x1F\x7F]', ' ', 'g'),
        |    '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS norm_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_contamination" -> {
      val sh4 = DuckSql.shingles("toks", 4)
      s"""WITH d AS (
         |  SELECT doc_id, list_distinct($sh4) AS sh
         |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
         |probe AS (SELECT DISTINCT unnest(sh) AS gram FROM d WHERE doc_id < 20),
         |cg AS (SELECT doc_id, unnest(sh) AS gram FROM d WHERE doc_id >= 20)
         |SELECT doc_id, count(DISTINCT gram) AS n_contaminated_grams
         |FROM cg WHERE gram IN (SELECT gram FROM probe)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "curate_decontaminated" -> {
      val sh4 = DuckSql.shingles("toks", 4)
      s"""WITH d AS (
         |  SELECT doc_id, list_distinct($sh4) AS sh
         |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
         |probe AS (SELECT DISTINCT unnest(sh) AS gram FROM d WHERE doc_id < 20),
         |flags AS (
         |  SELECT doc_id, count(DISTINCT gram) AS n_shared
         |  FROM (SELECT doc_id, unnest(sh) AS gram FROM d WHERE doc_id >= 20) cg
         |  WHERE gram IN (SELECT gram FROM probe) GROUP BY doc_id),
         |fl AS (
         |  SELECT c.source, len($toksSql) AS n_toks,
         |    coalesce(f.n_shared, 0) AS n_shared
         |  FROM documents c LEFT JOIN flags f USING (doc_id)
         |  WHERE c.doc_id >= 20)
         |SELECT source,
         |  count(*) AS n_docs,
         |  CAST(sum(CASE WHEN n_shared > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST(sum(CASE WHEN n_shared = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN n_shared = 0 THEN n_toks ELSE 0 END) AS BIGINT) AS n_tokens_kept
         |FROM fl GROUP BY source ORDER BY source""".stripMargin
    },

    "text_mixture" ->
      """WITH w AS (
        |  SELECT doc_id, lang,
        |    CASE lang WHEN 'en' THEN 2.5 WHEN 'fr' THEN 0.25
        |      WHEN 'es' THEN 0.0 ELSE 1.0 END AS wt,
        |    ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, lang,
        |  (floor(wt) + CASE WHEN bucket < (floor(((wt - floor(wt)) * 100) + 0.5)) THEN 1 ELSE 0 END)::INTEGER AS copies
        |FROM w ORDER BY doc_id""".stripMargin,

    "text_train_split" ->
      """SELECT doc_id,
        |  (('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100)::BIGINT AS bucket,
        |  CASE WHEN ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100 < 90
        |    THEN 'train' ELSE 'eval' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_top_terms" ->
      s"""SELECT term, count(*) AS n
         |FROM (SELECT unnest($toksSql) AS term FROM documents)
         |GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin,

    "text_tfidf_keywords" ->
      s"""WITH tf AS (
         |  SELECT doc_id, term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest($toksSql) AS term FROM documents)
         |  GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
         |sel AS (
         |  SELECT doc_id, term, (floor((tf * ln(n_docs / df)) * 1e6 + 0.5) / 1e6) AS tfidf
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
         |SELECT doc_id, rank, term, tfidf FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY tfidf DESC, term) AS rank FROM sel)
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // Pair generation replayed as a list comprehension over the same
    // sorted distinct-token lists; PMI with the operator's arithmetic.
    "text_collocations" ->
      s"""WITH tl AS MATERIALIZED (
         |  SELECT list_sort(list_distinct($toksSql)) AS ts FROM documents),
         |pr AS (SELECT unnest(flatten(list_transform(range(1, len(ts)),
         |           i -> list_transform(ts[i+1:], y -> ts[i] || ' ' || y))))
         |         AS pair
         |       FROM tl),
         |cab AS (SELECT pair, count(*) AS c_ab FROM pr GROUP BY 1
         |        HAVING count(*) >= 10),
         |ct AS MATERIALIZED (SELECT t, count(*) AS c_t
         |      FROM (SELECT unnest(ts) AS t FROM tl) GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
         |SELECT pair, c_ab,
         |  (floor((ln(n_docs * c_ab / (ca.c_t * cb.c_t))) * 1e6 + 0.5) / 1e6) AS pmi
         |FROM cab
         |JOIN ct ca ON split_part(pair, ' ', 1) = ca.t
         |JOIN ct cb ON split_part(pair, ' ', 2) = cb.t
         |CROSS JOIN nn
         |ORDER BY pmi DESC, pair LIMIT 20""".stripMargin,

    "text_pii" -> {
      import TextAnalysis.{piiEmailRe, piiIpv4Re, piiPhoneRe}
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text, '$piiEmailRe')) AS n_emails,
         |  len(regexp_extract_all(text, '$piiIpv4Re')) AS n_ipv4,
         |  len(regexp_extract_all(text, '$piiPhoneRe')) AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '$piiEmailRe', '<EMAIL>', 'g'),
         |    '$piiIpv4Re', '<IP>', 'g'),
         |    '$piiPhoneRe', '<PHONE>', 'g')) AS redacted_md5
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "agg_pivot_lang_source" ->
      """SELECT source,
        |  sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::BIGINT AS n_de,
        |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en,
        |  sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END)::BIGINT AS n_es,
        |  sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END)::BIGINT AS n_fr,
        |  sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END)::BIGINT AS n_zh
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "text_quality_median_gate" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, $toksSql AS toks,
         |    length(text) AS n_chars_s,
         |    len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS punct,
         |    len(list_filter($toksSql, t -> t IN
         |      ('the','a','of','and','to','is','in','it','that','for'))) AS stop
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, lang,
         |    (floor((CASE WHEN len(toks) = 0 THEN 0.0 ELSE
         |      1.0 - least(CAST(punct AS DOUBLE) / greatest(n_chars_s, 1) * 2.0, 0.5)
         |          - CASE WHEN len(toks) < 10 THEN 0.3 ELSE 0.0 END
         |          - CASE WHEN CAST(stop AS DOUBLE) / greatest(len(toks), 1) < 0.01
         |              THEN 0.2 ELSE 0.0 END
         |      END) * 1e6 + 0.5) / 1e6) AS quality_score
         |  FROM t),
         |med AS (SELECT lang, quantile_cont(quality_score, 0.5) AS med
         |  FROM scored GROUP BY lang)
         |SELECT s.lang, count(*) AS n_kept,
         |  (floor((min(s.quality_score)) * 1e6 + 0.5) / 1e6) AS min_kept_score
         |FROM scored s JOIN med m ON s.lang = m.lang
         |WHERE s.quality_score >= m.med
         |GROUP BY s.lang ORDER BY s.lang""".stripMargin,

    "pack_sequences" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    len($toksSql) AS n_tokens,
         |    (('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 32)::BIGINT AS bucket
         |  FROM documents),
         |seq AS (
         |  SELECT bucket, doc_id, n_tokens,
         |    coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
         |  FROM toks)
         |SELECT bucket, CAST(floor(start_tok / 512.0) AS BIGINT) AS seq_id,
         |  count(*) AS n_docs, sum(n_tokens)::BIGINT AS seq_tokens
         |FROM seq GROUP BY bucket, seq_id ORDER BY bucket, seq_id""".stripMargin
  )
}
