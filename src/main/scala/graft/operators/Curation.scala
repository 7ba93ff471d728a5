package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  def curate(docs: DataFrame, minTokens: Int = 10, minQuality: Double = 0.5,
      n: Int = 3, k: Int = 16, bands: Int = 4, threshold: Double = 0.5,
      trainPct: Int = 90): DataFrame = {
    val graded = TextAnalysis.qualityMetrics(docs)
      .filter(col("n_tokens") >= minTokens && col("quality_score") >= minQuality)
    val exactKept = Dedup.exact(graded)
    val nearKept = Dedup.nearDupSurvivors(exactKept, n, k, bands, threshold)
    TextAnalysis.hashSplit(nearKept, trainPct = trainPct)
  }
}
