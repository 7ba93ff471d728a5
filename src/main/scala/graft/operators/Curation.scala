package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Iterate.MaterializeOps

/** End-to-end corpus curation — the canonical LLM training-data pipeline,
  * composing the north-star operators in filter-early order so each stage
  * shrinks the corpus before the costlier next stage:
  *
  *  1. quality gate: cheap per-row metrics (token count, composite
  *     quality score) — narrow, no shuffle;
  *  2. exact dedup: content-digest survivor (one digest shuffle);
  *  3. near-dup removal: minhash-LSH pairs → connected components → one
  *     survivor per cluster (band-hash shuffles over the already-shrunk
  *     corpus);
  *  4. deterministic train/eval hash split — narrow, layout-independent.
  *
  * Returns the surviving documents with their curation record (metrics,
  * digest, bucket, split). At 100 TB each stage is linear in its input
  * and the expensive pair work only ever sees quality-passing, exact-
  * deduped documents.
  */
object Curation {

  /** @param materializeStages snapshot the exact-deduped corpus before
    *        the near-dup stage (default true). The near-dup stage
    *        references it twice (pair generation + survivor anti-join);
    *        without a boundary the whole quality+exact lineage recomputes
    *        per reference. In a real 100 TB pipeline this boundary is a
    *        parquet write between stages — localCheckpoint is the
    *        in-session equivalent.
    */
  def curate(docs: DataFrame, minTokens: Int = 10, minQuality: Double = 0.5,
      n: Int = 3, k: Int = 16, bands: Int = 4, threshold: Double = 0.5,
      trainPct: Int = 90, materializeStages: Boolean = true): DataFrame = {
    val graded = qualityGate(docs, minTokens, minQuality)
    val exact = Dedup.exact(graded)
    // SPREAD cut (r20, guide §2.2): the exact-dedup groupBy's output is
    // byte-small at gate SFs, so AQE coalesces it to 1-2 partitions and
    // the checkpoint pins that width — every downstream shingle/minhash
    // stage (CPU-heavy, references this frame four times) then ran
    // near-serial. materializedSpread re-widens only when collapsed.
    val exactKept = if (materializeStages) exact.materializedSpread else exact
    // Shingle ONCE per surviving doc: the near-dup stage references the
    // shingled frame four times (banded self-join a/b + Jaccard verify
    // a/b); without this boundary each reference re-tokenizes the corpus.
    val shingled = exactKept.select(col("doc_id"),
      graft.functions.TextFns.textShingles(col("text"), n).as("shingles"))
    val shingledKept = if (materializeStages) shingled.materialized else shingled
    val nearKept = Dedup.nearDupSurvivors(exactKept, n, k, bands, threshold,
      shingled = Some(shingledKept))
    TextAnalysis.hashSplit(nearKept, trainPct = trainPct)
  }

  /** DSIR-style data SELECTION end-to-end (Xie et al.): score every corpus
    * document's target-domain importance ([[TextAnalysis.importanceWeights]]),
    * tier the corpus by weight (high / mid / low against the two
    * thresholds), deterministically resample by tier
    * ([[TextAnalysis.resampleMixture]] — high up-sampled, low dropped) and
    * hash-split the survivors. This is the score → resample → split
    * selection pipeline as one composition, the selection counterpart of
    * [[curate]]'s cleaning pipeline.
    *
    * Scale shape: the weight table is (doc_id, weight) — corpus-sized but
    * narrow — so it joins back on doc_id as a plain shuffle join (never a
    * broadcast); tiering, resampling and splitting are then per-row
    * narrow transforms. Documents with no hashed features (empty text)
    * are unscorable and drop out with the join, like DSIR itself.
    */
  def curateSelected(corpus: DataFrame, target: DataFrame,
      hiWeight: Double, loWeight: Double,
      tierWeights: Map[String, Double] = Map("high" -> 1.5, "mid" -> 1.0, "low" -> 0.0),
      dims: Int = 1024, trainPct: Int = 90): DataFrame = {
    val wts = TextAnalysis.importanceWeights(corpus, target, dims)
      .select(col("doc_id"), col("dsir_weight"))
    val tiered = corpus.join(wts, "doc_id")
      .withColumn("tier",
        when(col("dsir_weight") >= hiWeight, lit("high"))
          .when(col("dsir_weight") >= loWeight, lit("mid"))
          .otherwise(lit("low")))
    TextAnalysis.hashSplit(
      TextAnalysis.resampleMixture(tiered, tierWeights, stratumCol = "tier"),
      trainPct = trainPct)
  }

  /** Eval-set decontamination end-to-end (flag → drop → re-stat): score
    * every corpus document's n-gram overlap with the probe (benchmark)
    * set ([[TextAnalysis.contamination]]), drop documents sharing more
    * than `maxShared` distinct grams, and re-profile the corpus per
    * source — documents seen, dropped, surviving, and surviving token
    * mass. The summary is what a training-data pipeline publishes after
    * a decontamination pass (how much did each source lose to benchmark
    * leakage), the cleaning counterpart of [[curateSelected]]'s
    * selection composite.
    *
    * Scale shape: the flag stage is an inverted-index join keyed on the
    * n-gram (probe grams deduplicated; zero-overlap documents never
    * materialize a pair), the drop is a narrow left join on doc_id
    * against the corpus-sized-but-two-column flag table (plain shuffle
    * join, never broadcast), and the re-stat is one conditional partial
    * aggregate over source keys — bounded output at any corpus size.
    */
  def curateDecontaminated(corpus: DataFrame, probes: DataFrame,
      maxShared: Long = 0, n: Int = 4, textCol: String = "text",
      idCol: String = "doc_id", statCol: String = "source"): DataFrame = {
    val flags = TextAnalysis.contamination(corpus, probes, n, textCol, idCol)
    val flagged = corpus.join(flags, Seq(idCol), "left")
      .withColumn("n_shared",
        coalesce(col("n_contaminated_grams"), lit(0L)))
    val keep = col("n_shared") <= maxShared
    flagged
      .withColumn("n_toks",
        size(graft.functions.TextFns.tokens(col(textCol))).cast("long"))
      .groupBy(col(statCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!keep, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
        sum(when(keep, col("n_toks")).otherwise(0L)).as("n_tokens_kept"))
  }

  /** The narrow quality gate shared by the batch and streaming forms. */
  def qualityGate(docs: DataFrame, minTokens: Int = 10,
      minQuality: Double = 0.5): DataFrame =
    TextAnalysis.qualityMetrics(docs)
      .filter(col("n_tokens") >= minTokens && col("quality_score") >= minQuality)

  /** Deterministic seeded shard assignment — the "global shuffle" a
    * training run needs: every document lands in exactly one of
    * `nShards` shards, the assignment is a pure function of (seed, id)
    * so any worker can recompute it (no shuffle state to persist), and
    * changing the seed re-deals the corpus for the next epoch. This is
    * how 100 TB gets "shuffled": not a materialized permutation (which
    * would itself be a 100 TB sort) but a seeded hash partition that
    * readers stream shard-by-shard.
    *
    * Scale shape: narrow per-row projection — ZERO shuffles; the hash is
    * the md5-based [[TextAnalysis.hashBucket]] (oracle-replayable,
    * uniform). Writing `partitionBy(shard)` off this column gives the
    * physical layout; balance is auditable by the per-shard rollup the
    * registered query emits.
    */
  def shardAssign(docs: DataFrame, nShards: Int, seed: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    docs.withColumn("shard", TextAnalysis.hashBucket(
      concat(lit(s"$seed:"), col(idCol).cast("string")), nShards))
  }

  /** Streaming (incremental-ingest) curation: quality gate → watermarked
    * streaming exact dedup → deterministic split, over a streaming
    * DataFrame of `(ts, doc_id, text, ...)`. Every stage is
    * streaming-legal: the gate and split are narrow per-row transforms;
    * dedup keeps only 32-byte digest state within the watermark
    * (`dropDuplicatesWithinWatermark`), so state is bounded on an
    * unbounded ingest. WITHIN-window near-dup detection is streaming-
    * legal too — [[graft.streaming.NearDupStream.candidatePairs]] keys
    * MinHash state by LSH band bucket (k strings per doc per band, never
    * shingle sets) and catches bursts/re-crawls in-flight; CROSS-window
    * near-dup clustering still needs the corpus self-join and runs as
    * the periodic batch compaction over the accumulated sink
    * ([[curate]]), the standard lambda split for this workload.
    */
  def curateStream(docs: DataFrame, minTokens: Int = 10,
      minQuality: Double = 0.5, watermark: String = "1 hour",
      trainPct: Int = 90): DataFrame =
    TextAnalysis.hashSplit(
      graft.streaming.EventStreams.dedupStream(
        qualityGate(docs, minTokens, minQuality), watermark = watermark),
      trainPct = trainPct)
}
