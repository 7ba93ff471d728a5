package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Iterate.MaterializeOps

/** Text analysis for the LLM-data-pipeline surface: language-ID heuristic,
  * quality scoring, token counting, document fingerprinting. All per-row
  * narrow transforms (no shuffle) except fingerprint windows — exactly the
  * shape that scans 100 TB at parquet speed.
  */
object TextAnalysis {

  /** Deterministic train/eval split — the standard training-data-pipeline
    * op: each row gets a stable bucket in [0, 100) from the md5 of its id
    * (first 8 hex digits as an integer, mod 100), then `bucket < trainPct
    * → train`. Reproducible across runs, engines and cluster sizes (no
    * RNG state, no sampling seed coupling to partition layout), and a
    * row's assignment never changes as the corpus grows — unlike
    * `randomSplit`, whose per-partition seeding reshuffles assignments
    * when the input layout changes.
    */
  /** The one layout-independent hash-bucket formula (md5 of the id, first
    * 8 hex digits as an integer, mod nBuckets) — shared by [[hashSplit]]
    * and [[packSequences]] so their documented equivalence can't drift.
    */
  def hashBucket(idCol: Column, nBuckets: Int): Column =
    conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10)
      .cast("long") % nBuckets

  def hashSplit(docs: DataFrame, idCol: String = "doc_id",
      trainPct: Int = 90): DataFrame =
    docs.withColumn("bucket", hashBucket(col(idCol), 100))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train")).otherwise(lit("eval")))

  /** Text normalization for ingest cleanup: drop URLs and e-mail
    * addresses, strip control characters, collapse whitespace runs, trim.
    * Whitespace is an EXPLICIT class, never `\s`: Java's `\s` includes
    * vertical tab (\x0B) but RE2's (DuckDB's) does not, so `\s`-based
    * patterns silently diverge cross-engine. Only RE2-and-Java-common
    * syntax (explicit classes, no lookarounds) appears here so the
    * oracle replays the patterns verbatim; NormalizeSpec pins the
    * behavior on inputs that exercise every branch (the driver corpus
    * contains none of them).
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
      "https?://[^ \\t\\n\\x0B\\f\\r]+|www\\.[^ \\t\\n\\x0B\\f\\r]+", " "),
      "[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\\.[A-Za-z0-9.-]+", " "),
      "[\\x00-\\x1F\\x7F]", " "),
      "[ \\t\\n\\x0B\\f\\r]+", " "))

  /** CCNet-style language-model quality proxy: mean unigram log-probability
    * per document, scored against the corpus's own unigram distribution
    * (MLE — every scored token is in-vocabulary by construction). Low
    * scores flag gibberish / rare-token soup exactly like the KenLM
    * perplexity gate in CCNet, at a unigram's scan cost.
    *
    * Scale shape: the frequency table is |vocab| rows — UNBOUNDED in
    * corpus size (URLs, typos, numerals), so it is NOT broadcast; the
    * term join is a plain shuffle join whose zipfian key skew AQE splits
    * at runtime (and which AQE may still broadcast when the vocab is
    * actually small — the adaptive choice, not a forced hint that dies at
    * the broadcast limit). The per-doc mean is a partial-aggregable
    * groupBy whose shuffle is one row per document; the only broadcast is
    * the one-row total. Documents with no tokens emit no row (nothing to
    * score).
    */
  def unigramLogProb(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextFns.tokens(col(textCol))).as("term"))
    val freq = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).cast("double").as("n_total"))
    toks
      .join(freq, "term")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (floor(avg(log(col("cnt") / col("n_total"))) * 1e6 + 0.5) / 1e6)
          .as("avg_logprob"))
  }

  /** Per-source corpus datacard — the summary table a curation pipeline
    * publishes alongside a training-data release: volume (docs, tokens,
    * chars), language spread, and exact-duplication rate, one row per
    * source. One scan: the token count is a narrow native expression,
    * then a single groupBy(source) whose distinct aggregates Spark plans
    * as one Expand (×3) with partial aggregation — at 100 TB the shuffle
    * carries per-source partials, never documents.
    */
  def datacard(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_toks", size(TextFns.tokens(col(textCol))))
      .withColumn("content_md5", md5(col(textCol)))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("content_md5")).as("n_unique"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        (sum(col("n_chars")).cast("double") / count(col("n_chars")))
          .as("avg_chars"))
      .withColumn("dup_rate",
        (floor((lit(1.0) - col("n_unique").cast("double") / col("n_docs")) * 1e6 + 0.5) / 1e6))

  /** Bigram conditional log-probability quality proxy — the next step up
    * from [[unigramLogProb]] toward a KenLM-style LM filter: per-document
    * mean of ln P(wᵢ | wᵢ₋₁) under the corpus MLE, where the history
    * count is the prefix's occurrence count in the bigram stream itself
    * (so the conditional distribution sums to 1 and only ONE tokenize +
    * explode pass feeds both count tables — the BM25 lesson).
    *
    * Scale shape: the bigram vocabulary is even less bounded than the
    * unigram one, so neither count table is ever broadcast — both joins
    * shuffle on the (zipfian, AQE-skew-split) term keys, exactly the
    * [[unigramLogProb]] posture. Docs with < 2 tokens emit no bigrams and
    * drop out, matching the oracle.
    */
  def bigramLogProb(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val bi = docs.select(col(idCol).as("doc_id"),
      explode(TextFns.textShingles(col(textCol), 2)).as("bigram"))
      .withColumn("prefix", substring_index(col("bigram"), " ", 1))
    val biCnt = bi.groupBy(col("bigram")).agg(count(lit(1)).as("bi_cnt"))
    val preCnt = bi.groupBy(col("prefix")).agg(count(lit(1)).as("pre_cnt"))
    bi
      .join(biCnt, "bigram")
      .join(preCnt, "prefix")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (floor(avg(log(col("bi_cnt").cast("double") / col("pre_cnt")))
          * 1e6 + 0.5) / 1e6).as("avg_logprob"))
  }

  /** Trigram stupid-backoff LM score + perplexity per document — the
    * KenLM-shaped quality filter (CCNet posture): an n-gram LM is built
    * from a REFERENCE corpus and every document is scored against it, so
    * out-of-reference trigrams genuinely back off (scoring a corpus
    * against its own counts never would). Stupid backoff (Brants et al.
    * 2007, "Large Language Models in Machine Translation"):
    *
    *   S(w3|w1w2) = tri/bi12                 if the trigram was seen
    *              = α · bi23/uni2            else if the bigram was seen
    *              = α² · (uni3+1)/(N+V+1)    else (add-one unigram; +1
    *                                         slot reserves UNK mass)
    *
    * Scale shape: the reference count tables are term-keyed aggregates
    * (partial-aggregable, never broadcast — the trigram vocabulary is
    * unbounded); the document side first reduces to DISTINCT trigrams per
    * doc with occurrence counts, so the five count joins shuffle
    * O(distinct trigrams/doc), not O(tokens), and the final score is the
    * occurrence-weighted mean. Every join is an equi-join on a zipfian
    * string key — the AQE-skew-split posture of [[bigramLogProb]].
    *
    * @return (doc_id, n_trigrams, avg_logscore, ppl) for docs with >= 1
    *         trigram; avg_logscore/ppl rounded to 6.
    */
  def trigramBackoffScore(docs: DataFrame, reference: DataFrame,
      alpha: Double = 0.4, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val refToks = reference
      .select(explode(TextFns.tokens(col(textCol))).as("term"))
    val uniCnt = refToks.groupBy(col("term")).agg(count(lit(1)).as("uni_cnt"))
    val biCnt = reference
      .select(explode(TextFns.textShingles(col(textCol), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("bi_cnt"))
    val triCnt = reference
      .select(explode(TextFns.textShingles(col(textCol), 3)).as("trigram"))
      .groupBy(col("trigram")).agg(count(lit(1)).as("tri_cnt"))
    val totals = uniCnt.agg(sum(col("uni_cnt")).cast("double").as("n_total"),
      count(lit(1)).cast("double").as("vocab"))

    val tri = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFns.textShingles(col(textCol), 3)).as("tri"))
      .groupBy(col("doc_id"), col("tri")).agg(count(lit(1)).as("n_occ"))
      .withColumn("w12", substring_index(col("tri"), " ", 2))
      .withColumn("w23", substring_index(col("tri"), " ", -2))
      .withColumn("w2", substring_index(substring_index(col("tri"), " ", -2), " ", 1))
      .withColumn("w3", substring_index(col("tri"), " ", -1))

    val score = when(col("tri_cnt").isNotNull,
        col("tri_cnt").cast("double") / col("bi12_cnt"))
      .when(col("bi23_cnt").isNotNull,
        lit(alpha) * col("bi23_cnt").cast("double") / col("uni2_cnt"))
      .otherwise(lit(alpha * alpha) *
        (coalesce(col("uni3_cnt"), lit(0L)).cast("double") + 1.0) /
        (col("n_total") + col("vocab") + 1.0))

    tri
      .join(triCnt, tri("tri") === triCnt("trigram"), "left")
      .join(biCnt.withColumnRenamed("bi_cnt", "bi12_cnt").as("b12"),
        col("w12") === col("b12.bigram"), "left")
      .join(biCnt.withColumnRenamed("bi_cnt", "bi23_cnt").as("b23"),
        col("w23") === col("b23.bigram"), "left")
      .join(uniCnt.withColumnRenamed("uni_cnt", "uni2_cnt")
        .withColumnRenamed("term", "t2"), col("w2") === col("t2"), "left")
      .join(uniCnt.withColumnRenamed("uni_cnt", "uni3_cnt")
        .withColumnRenamed("term", "t3"), col("w3") === col("t3"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("lns", log(score))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_occ")).as("n_trigrams"),
        (floor(sum(col("lns") * col("n_occ")) / sum(col("n_occ"))
          * 1e6 + 0.5) / 1e6).as("avg_logscore"),
        (floor(exp(-sum(col("lns") * col("n_occ")) / sum(col("n_occ")))
          * 1e6 + 0.5) / 1e6).as("ppl"))
  }

  /** Perplexity admission gate over [[trigramBackoffScore]] — the
    * CCNet-style corpus split: docs at or under the ppl threshold are
    * "kept"; report per-source volume, keep share, and mean perplexity.
    * Docs with < 3 tokens produce no trigrams and are excluded (they are
    * the length gate's job, not the LM's).
    */
  def perplexityGate(docs: DataFrame, reference: DataFrame,
      maxPpl: Double, alpha: Double = 0.4): DataFrame = {
    val scored = trigramBackoffScore(docs, reference, alpha)
    docs.select(col("doc_id"), col("source"))
      .join(scored, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ppl") <= maxPpl, 1L).otherwise(0L)).as("n_kept"),
        (floor(avg(col("ppl")) * 1e6 + 0.5) / 1e6).as("mean_ppl"))
      .withColumn("keep_share",
        (floor((col("n_kept").cast("double") / col("n_docs")) * 1e6 + 0.5) / 1e6))
  }

  /** DSIR-style data-selection importance weight: per-document mean
    * log-ratio of a TARGET domain's hashed-feature distribution over the
    * CORPUS distribution (Xie et al., "Data Selection for Language Models
    * via Importance Resampling" — the hashed-ngram variant). Documents
    * that look like the target domain score > 0 and get up-sampled by a
    * downstream resampler ([[resampleMixture]] composes directly).
    *
    * Features are unigrams+bigrams hashed to `dims` buckets with the same
    * md5-bucket formula as LinearScoreExpr (oracle-replayable); both
    * distributions are `dims`-row aggregates with +0.5 smoothing, built
    * once and BROADCAST onto the exploded corpus stream — no per-doc
    * state, one shuffle row per document for the final mean.
    */
  def importanceWeights(corpus: DataFrame, target: DataFrame, dims: Int = 1024,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    def hashedFeats(df: DataFrame) = df
      .select(col(idCol).as("doc_id"),
        explode(concat(TextFns.textShingles(col(textCol), 1),
          TextFns.textShingles(col(textCol), 2))).as("f"))
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("f").cast("binary")), 1, 8), 16, 10)
          .cast("long"), lit(dims)).as("bucket"))
    val corpusFeats = hashedFeats(corpus)
    val cCounts = corpusFeats.groupBy(col("bucket")).agg(count(lit(1)).as("c_cnt"))
    val tCounts = hashedFeats(target).groupBy(col("bucket")).agg(count(lit(1)).as("t_cnt"))
    val totals = cCounts.agg(sum(col("c_cnt")).cast("double").as("c_total"))
      .crossJoin(tCounts.agg(sum(col("t_cnt")).cast("double").as("t_total")))
    val halfDims = lit(0.5 * dims)
    val ratios = cCounts
      .join(tCounts, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        log(((coalesce(col("t_cnt"), lit(0L)) + 0.5) / (col("t_total") + halfDims)) /
          ((col("c_cnt") + 0.5) / (col("c_total") + halfDims))).as("logratio"))
    corpusFeats
      .join(broadcast(ratios), "bucket")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        (floor(avg(col("logratio")) * 1e6 + 0.5) / 1e6).as("dsir_weight"))
  }

  /** Per-source distributional drift monitor: KL(source ‖ corpus) over
    * the feature-hashed unigram distribution (`dims` buckets, add-half
    * smoothing) — flags a source whose token mix diverges from the blend
    * (encoding faults, spam bursts, language drift) before it pollutes a
    * training mixture. Hashing bounds both distributions exactly as
    * [[importanceWeights]]: after the one corpus-sized partial-aggregable
    * groupBy, everything is ≤ |sources|·`dims` rows regardless of corpus
    * size — no vocabulary table is ever built or broadcast.
    *
    * The sum covers the FULL `dims`-bucket space — the smoothed
    * distributions only sum to 1 (and KL is only guaranteed ≥ 0, Gibbs)
    * over the whole space. Buckets with corpus support come from a
    * bounded (|sources| × support) grid; the (`dims` − support) buckets
    * nothing hit all share one closed-form term per source
    * (p₀·ln(p₀/q₀)), added analytically instead of materializing them.
    *
    * @return (source, n_tokens, kl_divergence) — nats, rounded to 6.
    */
  def sourceDivergence(docs: DataFrame, dims: Int = 1024,
      textCol: String = "text", srcCol: String = "source"): DataFrame =
    divergenceFromCounts(unigramBucketCounts(docs, dims, textCol, srcCol), dims)

  /** The corpus pass of [[sourceDivergence]]: hashed per-(source, bucket)
    * unigram counts — a mergeable monoid (union + sum re-aggregates), so
    * the streaming monitor maintains this table incrementally per batch
    * ([[graft.streaming.Monitors.divergenceMonitor]]) and replays the
    * closed-form KL over the merged state.
    */
  def unigramBucketCounts(docs: DataFrame, dims: Int = 1024,
      textCol: String = "text", srcCol: String = "source"): DataFrame =
    docs.select(col(srcCol).as("source"),
        explode(TextFns.textShingles(col(textCol), 1)).as("f"))
      .select(col("source"),
        pmod(conv(substring(md5(col("f").cast("binary")), 1, 8), 16, 10)
          .cast("long"), lit(dims)).as("bucket"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("s_cnt"))

  /** KL finalization over a (source, bucket, s_cnt) count table — all
    * inputs are ≤ |sources|·`dims` rows, so every frame here is bounded
    * regardless of how much corpus fed the counts.
    */
  def divergenceFromCounts(sb: DataFrame, dims: Int = 1024): DataFrame = {
    val sTot = sb.groupBy(col("source"))
      .agg(sum(col("s_cnt")).cast("double").as("s_total"))
    val cb = sb.groupBy(col("bucket")).agg(sum(col("s_cnt")).as("c_cnt"))
    val cTot = cb.agg(sum(col("c_cnt")).cast("double").as("c_total"))
    val halfDims = lit(0.5 * dims)
    val p = (coalesce(col("s_cnt"), lit(0L)) + 0.5) / (col("s_total") + halfDims)
    val q = (col("c_cnt") + 0.5) / (col("c_total") + halfDims)
    val p0 = lit(0.5) / (col("s_total") + halfDims)
    val q0 = lit(0.5) / (col("c_total") + halfDims)
    sTot.crossJoin(broadcast(cb.crossJoin(broadcast(cTot))))
      .join(sb, Seq("source", "bucket"), "left")
      .groupBy(col("source"), col("s_total"), col("c_total"))
      .agg(sum(p * log(p / q)).as("kl_sup"), count(lit(1)).as("n_sup"))
      .select(col("source"), col("s_total").cast("long").as("n_tokens"),
        (floor((col("kl_sup") +
          (lit(dims) - col("n_sup")) * p0 * log(p0 / q0)) * 1e6 + 0.5) / 1e6).as("kl_divergence"))
  }

  /** Sliding-window chunking with overlap — the RAG / context-prep
    * primitive: each document becomes `window`-token chunks whose starts
    * advance by `stride` (overlap = window − stride), plus one final
    * chunk anchored at `n − window` so the tail is always covered and no
    * chunk ever pads past the document. Every token lands in at least one
    * chunk; empty documents emit nothing.
    *
    * Scale shape: narrow per-row fan-out (tokenize → start-sequence →
    * posexplode → slice), all codegen built-ins, no shuffle at all — the
    * output inherits the input partitioning, and output size is bounded
    * by `ceil(n/stride)` chunks per doc.
    */
  def chunkOverlap(docs: DataFrame, window: Int = 32, stride: Int = 24,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(stride > 0 && window >= stride,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = docs
      .select(col(idCol).as("doc_id"), TextFns.tokens(col(textCol)).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .filter(col("n_tokens") > 0)
    // Starts: 0, stride, 2·stride, … up to n−window, then n−window itself
    // appended when it is off the stride grid (a conditional append, NOT
    // array_distinct — DuckDB's list_distinct reorders, so the oracle
    // could not mirror a distinct-based form positionally). Ascending by
    // construction, so pos is the chunk index.
    val lastStart = greatest(col("n_tokens") - window, lit(0))
    val gridStarts = sequence(lit(0), lastStart, lit(stride))
    toks
      .withColumn("starts", when(pmod(lastStart, lit(stride)) === 0, gridStarts)
        .otherwise(concat(gridStarts, array(lastStart))))
      .select(col("doc_id"), col("n_tokens"), col("toks"),
        posexplode(col("starts")).as(Seq("chunk_idx", "chunk_start")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_start").cast("long").as("chunk_start"),
        size(slice(col("toks"), col("chunk_start") + 1, lit(window)))
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("toks"), col("chunk_start") + 1, lit(window)), " ")
          .as("chunk_text"))
  }

  /** Within-document duplicate-sentence removal: each sentence survives
    * only at its FIRST position inside its own document (the doc-local
    * complement of [[Dedup.dedupSentences]]'s corpus-wide rule — strips
    * per-page boilerplate repeats without any cross-document state).
    * Fully narrow: no explode, no shuffle; O(|sentences|²) equality scans
    * per document, fine for real sentence counts. IMPORTANT: callers must
    * pass a materialized sentence-array COLUMN (not an inline split
    * expression) — the lambda references the array per element, and an
    * inline subtree would be re-evaluated per element (the CollapseProject
    * multiplication hazard, PLANS.md #2).
    */
  def dedupSentencesInDoc(sents: Column, sep: String = ". "): Column =
    array_join(
      filter(sents, (s, i) => array_position(sents, s) === i + lit(1)), sep)

  /** Eval-set decontamination signal: for each corpus document, the
    * number of distinct word n-grams it shares with ANY probe (benchmark/
    * eval) document. Inverted-index join on the n-gram — probe grams are
    * deduplicated and the shuffle key is the gram, so the corpus is
    * scanned once and zero-overlap documents never materialize a pair
    * (same scale shape as the ngram-jaccard join). Downstream: drop or
    * flag docs with n_contaminated_grams above a threshold.
    */
  def contamination(corpus: DataFrame, probes: DataFrame, n: Int = 4,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val cg = corpus.select(col(idCol),
      explode(array_distinct(TextFns.textShingles(col(textCol), n))).as("gram"))
    val pg = probes.select(
      explode(array_distinct(TextFns.textShingles(col(textCol), n))).as("gram"))
      .distinct()
    cg.join(pg, "gram")
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram")).as("n_contaminated_grams"))
  }

  /** Deterministic data-mixture resampling — the corpus-mixing step of a
    * training-data pipeline: each stratum (source, language, ...) gets a
    * weight w; every row is emitted floor(w) times, plus once more for
    * the stable hash-bucket fraction of rows selected by the fractional
    * part (1% granularity via the same md5 bucket as [[hashSplit]]).
    * w = 2.5 → every row twice, half the rows (by stable bucket) a third
    * time; w = 0.25 → a quarter of the rows, once. No RNG: re-runs,
    * engines and partitionings agree row-for-row.
    */
  def mixtureCopies(docs: DataFrame, weights: Map[String, Double],
      stratumCol: String = "lang", idCol: String = "doc_id",
      defaultWeight: Double = 1.0): DataFrame = {
    val w = coalesce(
      element_at(typedLit(weights), col(stratumCol)), lit(defaultWeight))
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    docs.withColumn("copies",
      (floor(w) + when(bucket < (floor(((w - floor(w)) * 100) + 0.5)), 1).otherwise(0))
        .cast("int"))
  }

  /** Temperature-scaled mixture weights (the T5/mC4 multilingual-mixing
    * rule): stratum s samples with share ∝ n_s^α — α < 1 flattens the
    * size distribution so small sources aren't drowned. Emits, per
    * stratum: size, raw share, temperature share, and `rate` =
    * temp_share/raw_share — exactly the per-stratum weight to hand to
    * [[resampleMixture]]. One corpus scan into a partial-agg count; the
    * window normalization runs over the per-stratum relation, which is
    * bounded (sources/langs, not documents) at any corpus size.
    */
  def temperatureWeights(docs: DataFrame, alpha: Double = 0.3,
      stratumCol: String = "source"): DataFrame = {
    val w = Window.partitionBy(lit(1))
    val pw = pow(col("n_docs"), lit(alpha))
    val rawShare = col("n_docs").cast("double") / sum(col("n_docs")).over(w)
    val tempShare = pw / sum(pw).over(w)
    docs.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"))
      .select(col(stratumCol), col("n_docs"),
        (floor((rawShare) * 1e6 + 0.5) / 1e6).as("raw_share"),
        (floor((tempShare) * 1e6 + 0.5) / 1e6).as("temp_share"),
        (floor((tempShare / rawShare) * 1e6 + 0.5) / 1e6).as("rate"))
  }

  /** The resampled corpus: one output row per copy (copy_idx 1..copies);
    * zero-weight rows drop out. */
  def resampleMixture(docs: DataFrame, weights: Map[String, Double],
      stratumCol: String = "lang", idCol: String = "doc_id",
      defaultWeight: Double = 1.0): DataFrame =
    mixtureCopies(docs, weights, stratumCol, idCol, defaultWeight)
      .filter(col("copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(1), col("copies"))))
      .drop("copies")

  /** Marker stopwords per language for the n-gram/stopword lang-ID
    * heuristic. Order = tie-break priority.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "es" -> Seq("el", "la", "de", "que", "en", "y", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans"),
    "zh" -> Seq())

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    if (markers.isEmpty) lit(0)
    else size(filter(toks, t => t.isInCollection(markers)))

  /** Heuristic language ID: CJK codepoints dominate → zh; otherwise the
    * language with the highest marker-stopword count (priority order on
    * ties); no markers at all → "und".
    */
  def langId(text: Column): Column = {
    val toks = TextFns.tokens(text)
    val counts = langMarkers.map { case (lang, ms) => lang -> markerCount(toks, ms) }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    val cjk = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val pick = counts.foldLeft(when(lit(false), lit("")): Column) {
      case (acc, (lang, c)) => acc.when(c === best && best > 0, lit(lang))
    }.otherwise(lit("und"))
    when(cjk > 0, lit("zh")).otherwise(pick)
  }

  /** Quality metrics + composite score (length, punctuation, stopword and
    * alphabetic ratios — the classic cheap filters).
    *
    * Token statistics come from the fused native
    * [[graft.functions.expressions.TokenStatsExpr]] (one tokenization
    * pass, whole-stage codegen) instead of the `aggregate`/`filter` HOF
    * chain, which was CodegenFallback-interpreted per row — this is the
    * gate that scans 100% of the corpus. The identical-formula parity is
    * pinned in TextVectorNativeSpec. The stats struct is referenced
    * several times in one projection; the inlined copies are identical
    * trees, which whole-stage codegen's subexpression elimination
    * evaluates once (unlike HOFs, which fall out of codegen entirely).
    */
  def qualityMetrics(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val txt = col(textCol)
    val stats = graft.functions.expressions.TokenStatsExpr.tokenStatsNative(txt)
    val nChars = length(txt)
    val nTokens = stats.getField("n_tokens")
    val punct = size(regexp_extract_all(txt, lit("[^a-zA-Z0-9\\s]"), lit(0)))
    val stop = stats.getField("n_stop")
    docs
      .withColumn("n_tokens", nTokens)
      .withColumn("avg_token_len",
        (floor((stats.getField("sum_len").cast("double") /
          greatest(nTokens, lit(1))) * 1e4 + 0.5) / 1e4))
      .withColumn("punct_ratio", (floor((punct.cast("double") / greatest(nChars, lit(1))) * 1e6 + 0.5) / 1e6))
      .withColumn("stopword_ratio", (floor((stop.cast("double") / greatest(nTokens, lit(1))) * 1e6 + 0.5) / 1e6))
      .withColumn("quality_score", (floor((when(nTokens === 0, 0.0).otherwise(
          lit(1.0)
            - least(punct.cast("double") / greatest(nChars, lit(1)) * 2.0, lit(0.5))
            - when(nTokens < 10, 0.3).otherwise(0.0)
            - when(stop.cast("double") / greatest(nTokens, lit(1)) < 0.01, 0.2).otherwise(0.0))) * 1e6 + 0.5) / 1e6))
  }

  /** Repetition metrics (Gopher-style quality rule): the most frequent
    * word n-gram's share of all n-grams — templated/spammy text scores
    * high. Exact integer counts (explode → two-level agg, partial
    * map-side combine), so the ratio is the same rational in every
    * engine. Docs with fewer than n tokens emit no row.
    */
  def repetitionMetrics(docs: DataFrame, n: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), explode(TextFns.textShingles(col(textCol), n)).as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_grams"), max(col("cnt")).as("top_gram_n"))
      .withColumn("top_gram_frac",
        (floor((col("top_gram_n").cast("double") / col("n_grams")) * 1e6 + 0.5) / 1e6))

  /** Token counting: whitespace tokens + BPE-ish sub-word count. */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("ws_tokens", size(TextFns.tokens(col(textCol))))
      .withColumn("bpeish_tokens", size(TextFns.bpeishTokens(col(textCol))))

  /** Winnowing-style fingerprints: md5 over word 3-gram shingles, then the
    * minimum hash in every sliding window of `windowSize` consecutive
    * shingles; the distinct set of window-minima is the fingerprint sketch
    * (robust to local edits). Returns per-doc sketch size + extremes.
    */
  def fingerprintSketch(docs: DataFrame, windowSize: Int = 4,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // Entirely narrow: ONE native expression per doc (no explode, no
    // window shuffle+sort — the exploded/windowed form benched ~10×
    // slower; the declarative array-expression form was interpreted,
    // see PLANS.md). wins[i] = min(md5(sh[i..i+w-1])); the sketch is the
    // distinct win set, from which both emitted stats derive.
    //
    // PLAN HAZARD (learned from a multi-minute single-core stall): a
    // post-hoc `filter(size(wins) > 0)` gets predicate-pushed below every
    // exchange with the whole expression tree inlined; filter EARLY on
    // the cheap equivalent predicate instead (a doc has shingles iff it
    // has ≥ 3 tokens).
    val wins = graft.functions.expressions.WinnowExpr.winnowNative(
      TextFns.textShingles(col(textCol), 3), windowSize)
    docs
      .filter(size(TextFns.tokens(col(textCol))) >= 3)
      .select(col(idCol), wins.as("wins"))
      .select(col(idCol),
        size(col("wins")).cast("long").as("n_fingerprints"),
        array_min(col("wins")).as("min_fingerprint"))
  }

  /** PII patterns, shared verbatim with the DuckDB oracle. Restricted to
    * RE2∩Java syntax (explicit classes, no lookarounds, no `\b`-free
    * ambiguity) like normalizeText — see that Scaladoc for why `\s` is
    * banned. Deliberately conservative/simple: e-mail, dotted-quad IPv4,
    * and two phone shapes (E.164 `+digits`, US dashed); real deployments
    * extend the list, the plumbing doesn't change.
    */
  val piiEmailRe = "[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\\.[A-Za-z0-9.-]+"
  val piiIpv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val piiPhoneRe = "\\+[0-9]{7,15}|[0-9]{3}-[0-9]{3,4}-[0-9]{4}"

  /** PII redaction — the compliance pass every training corpus needs:
    * count and mask e-mail addresses, IPv4 addresses and phone numbers.
    * Per-row narrow (three codegen'd regex passes, no shuffle); the
    * redacted text is emitted as a digest so the oracle can verify the
    * exact replacement output without hauling full bodies through the
    * compare. Replacement order (email → ip → phone) matters — a dotted
    * quad inside an already-masked token must not re-match — and is
    * pinned by the spec.
    */
  def piiRedact(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol),
      size(regexp_extract_all(t, lit(piiEmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(piiIpv4Re), lit(0))).as("n_ipv4"),
      size(regexp_extract_all(t, lit(piiPhoneRe), lit(0))).as("n_phones"),
      md5(piiRedactText(t)).as("redacted_md5"))
  }

  /** Redacted text itself (not the digest) — for pipeline composition. */
  def piiRedactText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, piiEmailRe, "<EMAIL>"),
        piiIpv4Re, "<IP>"),
      piiPhoneRe, "<PHONE>")

  /** Concat-and-chunk sequence packing — how LLM pre-training actually
    * consumes a corpus: documents are concatenated in a deterministic
    * order and cut into fixed token-budget sequences; each document is
    * assigned to the sequence containing its first token.
    *
    * Packing is per hash-bucket, NOT global: a corpus-wide ordered cumsum
    * would serialize 100 TB through one window partition. Buckets come
    * from the same md5 formula as [[hashSplit]] (layout-independent,
    * reproducible), each bucket packs independently in doc-id order, and
    * the window cumsum shuffles once on the bucket key. Emits per-sequence
    * stats (doc count, token sum) — the schedulable unit of a packing job.
    */
  def packSequences(docs: DataFrame, budgetTokens: Int, nBuckets: Int = 32,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val bucket = hashBucket(col(idCol), nBuckets).as("bucket")
    val w = Window.partitionBy("bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), size(TextFns.tokens(col(textCol))).cast("long").as("n_tokens"), bucket)
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("start_tok") / budgetTokens))
      .groupBy(col("bucket"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("seq_tokens"))
  }

  /** N-gram novelty scoring — each document's contribution of NEW
    * content: the share of its distinct word n-grams whose first corpus
    * occurrence (min doc_id) is this document. Novelty ≈ 1 marks fresh
    * material, ≈ 0 marks recombinations of earlier text — the
    * redundancy-aware ordering/selection signal that complements pairwise
    * dedup (which only fires on near-identical documents).
    *
    * Scale shape: the inverted (gram → min doc) reduction shuffles on
    * gram content — the same key class as exact dedup's digest shuffle —
    * with `min` partial-aggregated map-side; the join back is gram-keyed
    * and the final per-doc agg shuffles one row per document. Documents
    * with fewer than n tokens have no grams and emit no row.
    */
  def noveltyScores(docs: DataFrame, n: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(TextFns.textShingles(col(textCol), n))).as("gram"))
    val first = grams.groupBy(col("gram")).agg(min(col("doc_id")).as("first_doc"))
    grams.join(first, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        (floor((col("n_novel").cast("double") / col("n_grams")) * 1e6 + 0.5) / 1e6).as("novelty"))
  }

  /** Cross-document repeated-span report: the `topN` word-`n`-gram spans
    * duplicated across the most documents (by distinct-document count,
    * then total occurrences, then span text) — the memorization-risk /
    * boilerplate-hotspot table a curation run publishes next to its
    * datacard, and the triage input for [[Dedup.dedupSentences]]-style
    * removal rules.
    *
    * Scale shape: one tokenize+shingle pass (native [[graft.functions
    * .TextFns.textShingles]]), then two partial-aggregable groupBys —
    * (span, doc) occurrence counts collapse map-side before the span
    * shuffle, and the per-span rollup ships one row per distinct span per
    * map partition. The top-N is TakeOrderedAndProject, never a global
    * sort; at 100 TB the only unbounded shuffle key is the span itself
    * (zipfian — AQE skew-split, exactly the [[unigramLogProb]] posture).
    */
  def spanHotspots(docs: DataFrame, n: Int = 5, minDocs: Int = 2,
      topN: Int = 20, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextFns.textShingles(col(textCol), n)).as("span"))
      .groupBy(col("span"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_docs"), sum(col("c")).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("span"))
      .limit(topN)

  /** Corpus-level boilerplate scrub — the REWRITE form of
    * [[spanHotspots]]: every token covered by an occurrence of a hot
    * span (a word-`n`-gram appearing in ≥ `minDocs` distinct documents)
    * is removed from its document, and the document is rebuilt from the
    * surviving tokens (the RefinedWeb/CCNet line-dedup rule generalized
    * from lines to n-gram spans). Emits per document: original token
    * count, tokens scrubbed, and the digest of the rebuilt text.
    *
    * Scale shape: one tokenize+shingle pass; the hot-span table is
    * corpus-derived and potentially large, so flagging is a plain
    * shuffle join on the span key (never a broadcast — the
    * [[unigramLogProb]] vocabulary posture); per-document coverage and
    * reconstruction are then NARROW higher-order-function work over the
    * (token, flagged-start) arrays — no per-token join, no window.
    */
  def scrubHotSpans(docs: DataFrame, n: Int = 5, minDocs: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      TextFns.tokens(col(textCol)).as("toks"))
    // shingle start index i = token index i (textShingles tokenizes with
    // the same formula as tokens)
    val spans = docs.select(col(idCol).as("doc_id"),
      posexplode(TextFns.textShingles(col(textCol), n))
        .as(Seq("start", "span")))
    val hot = spans.groupBy(col("span"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("span"))
    val flagged = spans.join(hot, "span")
      .groupBy(col("doc_id"))
      .agg(collect_set(col("start")).as("starts"))
    base.join(flagged, Seq("doc_id"), "left")
      .withColumn("starts",
        coalesce(col("starts"), array().cast("array<int>")))
      .withColumn("kept", filter(col("toks"), (t, j) =>
        !exists(col("starts"), s => s <= j && j < s + lit(n))))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_scrubbed"),
        md5(array_join(col("kept"), " ").cast("binary")).as("scrub_md5"))
  }

  /** Zipf-law fit over the term-frequency distribution: least-squares
    * slope of ln(freq) on ln(rank) over the `topN` most frequent terms —
    * the datacard exponent (natural text ≈ −1; a far-off slope flags
    * synthetic/templated/spammy corpora) plus fit quality (r²). The
    * companion of [[vocabGrowth]]'s Heaps curve.
    *
    * Scale shape: one tokenize pass into the zipf-bounded term-count
    * table, TakeOrderedAndProject top-N (ties → term asc), then the
    * closed-form regression over the BOUNDED top-N frame (rank from a
    * window over N rows, moments from one groupless aggregate).
    *
    * @return one row: (n_terms, slope, intercept, r2), rounded to 6.
    */
  def zipfFit(docs: DataFrame, topN: Int = 100,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode(TextFns.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(topN)
    val ranked = counts
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("term"))))
      .select(log(col("rank").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
    // Degenerate frames (one term, or all-equal x / all-equal y) have
    // zero variance; dividing unguarded yields NaN/Infinity, where Spark
    // and DuckDB float-edge behavior can diverge — pin those cases to
    // null in BOTH engines (the oracle carries the same CASE guards).
    ranked.agg(count(lit(1)).as("n"),
        avg(col("x")).as("mx"), avg(col("y")).as("my"),
        avg(col("x") * col("y")).as("mxy"),
        avg(col("x") * col("x")).as("mxx"),
        avg(col("y") * col("y")).as("myy"))
      .select(col("n"), col("mx"), col("my"), col("mxy"),
        (col("mxx") - col("mx") * col("mx")).as("vx"),
        (col("myy") - col("my") * col("my")).as("vy"))
      .select(col("n").as("n_terms"),
        when(col("n") >= 2 && col("vx") > 0,
          (floor(((col("mxy") - col("mx") * col("my")) / col("vx")) * 1e6 + 0.5) / 1e6)).as("slope"),
        when(col("n") >= 2 && col("vx") > 0,
          (floor((col("my") - (col("mxy") - col("mx") * col("my")) /
            col("vx") * col("mx")) * 1e6 + 0.5) / 1e6)).as("intercept"),
        when(col("n") >= 2 && col("vx") > 0 && col("vy") > 0,
          (floor((pow(col("mxy") - col("mx") * col("my"), 2) /
            (col("vx") * col("vy"))) * 1e6 + 0.5) / 1e6)).as("r2"))
  }

  /** Heaps-law vocabulary growth: distinct-term first occurrences
    * bucketed into `buckets` equal doc_id ranges, with the running
    * cumulative vocabulary — the sublinear vocab-vs-corpus curve that
    * sizes tokenizer vocabularies and detects corpus drift.
    *
    * Scale shape: one (term → min doc_id) reduction (partial-agg'd,
    * term-keyed shuffle), then a `buckets`-row aggregate; the cumulative
    * window runs over those `buckets` rows only — bounded by
    * construction, never corpus-sized. The doc_id range comes from one
    * cheap max() action (min is taken as 0, matching the generated ids).
    */
  def vocabGrowth(docs: DataFrame, buckets: Int = 10,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val maxId = docs.agg(max(col(idCol))).head().getLong(0)
    val firsts = docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(TextFns.tokens(col(textCol)))).as("term"))
      .groupBy(col("term")).agg(min(col("doc_id")).as("first_doc"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    firsts
      .withColumn("bucket",
        least(floor(col("first_doc") * buckets / (maxId + 1)), lit(buckets - 1)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("new_terms"))
      .withColumn("cum_vocab", sum(col("new_terms")).over(w))
  }

  /** PMI collocation extraction: pointwise mutual information over
    * document-level token co-occurrence — pmi(a,b) = ln(N·c_ab /
    * (c_a·c_b)) with doc-frequency counts, support-filtered, top-N.
    * The classic collocation/phrase-mining statistic (and the signal
    * word2vec-era phrase detection thresholds).
    *
    * Scale shape: pair generation is a NARROW array expression over each
    * doc's sorted distinct-token list (no self-join) — fan-out bounded
    * by per-doc distinct terms squared, the shingle class of cost. The
    * two count joins key on terms (zipfian, AQE-split); the only
    * broadcast is the one-row N.
    *
    * @return (pair, c_ab, pmi) top `topN` by rounded PMI, ties → pair.
    */
  def collocations(docs: DataFrame, minSupport: Int = 10, topN: Int = 20,
      textCol: String = "text"): DataFrame = {
    val sorted = array_sort(array_distinct(TextFns.tokens(col(textCol))))
    val pairsCol = flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + lit(2), size(sorted)),
        y => concat_ws(" ", x, y))))
    val prs = docs.select(explode(pairsCol).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minSupport)
    val tok = docs
      .select(explode(array_distinct(TextFns.tokens(col(textCol)))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c_t"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    prs
      .withColumn("a", substring_index(col("pair"), " ", 1))
      .withColumn("b", substring_index(col("pair"), " ", -1))
      .join(tok.select(col("t").as("a"), col("c_t").as("c_a")), "a")
      .join(tok.select(col("t").as("b"), col("c_t").as("c_b")), "b")
      .crossJoin(broadcast(n))
      .select(col("pair"), col("c_ab"),
        (floor((log(col("n_docs") * col("c_ab") / (col("c_a") * col("c_b")))) * 1e6 + 0.5) / 1e6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("pair"))
      .limit(topN)
  }

  /** Per-document TF-IDF keyword extraction: the top `topPerDoc` terms of
    * each document by tf·ln(N/df) — the classic summarization/topic tag
    * every data card and search index wants per document.
    *
    * Scale shape: term frequencies and document frequencies are both
    * partial-aggregable groupBys; the tf⋈df join keys on the TERM and is
    * a plain shuffle join — the vocabulary is corpus-sized, so it is
    * never broadcast (the unigram-vocabulary lesson); the only broadcast
    * is the one-row N. Per-doc top-k is a rank window Spark 4 plans with
    * Partial+Final WindowGroupLimit, so each map task keeps ≤ k rows per
    * doc before the shuffle. Scores are rounded BEFORE ranking (ties →
    * term asc) so the selection is engine-independent.
    */
  def tfidfKeywords(docs: DataFrame, topPerDoc: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextFns.tokens(col(textCol))).as("term"))
    // Snapshot the (doc,term,tf) aggregate: both the df aggregate and the
    // final join consume it, and without the checkpoint each consumer
    // re-tokenizes the corpus (the BM25 perDoc-snapshot pattern).
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .materialized
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", (floor((col("tf") * log(col("n_docs") / col("df"))) * 1e6 + 0.5) / 1e6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topPerDoc)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
  }
}
