package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table statistics — the per-column numbers a cost-based
  * optimizer's stats catalog (or a dataset datacard) publishes: non-null
  * count, exact NDV, range, mean.
  *
  * Scale shape: ALL columns profile in ONE aggregation pass — the
  * multi-column distinct aggregate plans as a single Expand (×columns)
  * with partial aggregation, so the table is scanned once however many
  * columns are profiled; the unpivot to long form happens on the
  * one-row result. At 100 TB exact NDV is usually swapped for
  * approx_count_distinct — same plan shape, sketch partials instead of
  * exact sets (the `agg_approx_distinct` accuracy-contract pattern).
  */
object Profile {

  /** @return (column, n, ndv, min_v, max_v, avg_v) one row per profiled
    *         numeric column, ordered by column name. */
  def numericStats(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "need at least one column")
    val aggs = columns.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        countDistinct(col(c)).as(s"${c}__ndv"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        (floor(avg(col(c)) * 1e6 + 0.5) / 1e6).as(s"${c}__avg"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = columns.map { c =>
      struct(lit(c).as("column"), col(s"${c}__n").as("n"),
        col(s"${c}__ndv").as("ndv"), col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"), col(s"${c}__avg").as("avg_v"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.column").as("column"), col("r.n").as("n"),
        col("r.ndv").as("ndv"), col("r.min_v").as("min_v"),
        col("r.max_v").as("max_v"), col("r.avg_v").as("avg_v"))
      .orderBy("column")
  }

  /** Fixed-width per-group value histogram — the CBO/data-card
    * distribution summary that stays scale-safe: an exact equi-depth
    * histogram needs a global sort (or an unreplayable quantile sketch),
    * whereas equal-width needs only per-group min/max.
    *
    * Two passes: (1) per-group min/max — partial-aggregable, output
    * |groups| rows, broadcast back; (2) narrow bucket classification
    * `least(floor((x − mn)/w), nBuckets−1)` with w = (mx − mn)/nBuckets,
    * plus one partial-aggregable count. Bucket arithmetic is plain IEEE doubles
    * with fixed parenthesization, so a SQL oracle replays the exact
    * boundary decisions. Degenerate groups (mx = mn) collapse to
    * bucket 0 rather than dividing by zero.
    *
    * @return (group, bucket, lo, hi, n) — `lo`/`hi` rounded to 6.
    */
  def valueHistogram(df: DataFrame, groupCol: String, valCol: String,
      nBuckets: Int = 10): DataFrame = {
    val g = col(groupCol)
    val v = col(valCol).cast("double")
    val bounds = df.groupBy(g).agg(min(v).as("mn"), max(v).as("mx"))
    val width = (col("mx") - col("mn")) / nBuckets
    val bucket = when(col("mx") > col("mn"),
      least(floor((v - col("mn")) / width), lit(nBuckets - 1L)))
      .otherwise(lit(0L)).cast("int")
    df.join(broadcast(bounds), groupCol)
      .select(g, bucket.as("bucket"), col("mn"), col("mx"))
      .groupBy(g, col("bucket"), col("mn"), col("mx"))
      .agg(count(lit(1)).as("n"))
      .select(g, col("bucket"),
        (floor((col("mn") + col("bucket") * ((col("mx") - col("mn")) / nBuckets)) * 1e6 + 0.5) / 1e6).as("lo"),
        (floor((col("mn") + (col("bucket") + 1) * ((col("mx") - col("mn")) / nBuckets)) * 1e6 + 0.5) / 1e6).as("hi"),
        col("n"))
  }

  /** Population-stability-index drift between a reference snapshot and a
    * current one — the standard "did the feature distribution move?"
    * monitor a serving pipeline runs before trusting a model or a
    * sampling scheme. Values bucket into `nBuckets` equal-width bins on
    * the REFERENCE min/max (rows outside clamp to the edge bins, where
    * a shifted distribution piles up visibly); per bin,
    * psi_term = (p_cur − p_ref)·ln(p_cur/p_ref) with both rates floored
    * at `eps` so empty bins contribute a finite, deterministic penalty.
    * Σ psi_term is the PSI (rule of thumb: < 0.1 stable, > 0.25 shifted).
    *
    * Scale shape: one 2-row-per-side agg for bounds + totals, then one
    * narrow classification pass and one |buckets|-row agg per side,
    * full-outer-merged on the bin id — bounded frames everywhere after
    * the scans; bucket arithmetic is the [[valueHistogram]] fixed-
    * parenthesization IEEE form, replayable in SQL.
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, valCol: String,
      nBuckets: Int = 10, eps: Double = 1e-6): DataFrame = {
    val v = col(valCol).cast("double")
    val bounds = ref.agg(min(v).as("mn"), max(v).as("mx"),
      count(v).cast("double").as("n_ref_total"))
    val nCur = cur.agg(count(v).cast("double").as("n_cur_total"))
    def binned(df: DataFrame, cnt: String): DataFrame = {
      val width = (col("mx") - col("mn")) / nBuckets
      val bucket = when(col("mx") > col("mn"),
        greatest(lit(0L), least(floor((v - col("mn")) / width),
          lit(nBuckets - 1L)))).otherwise(lit(0L)).cast("int")
      // Drop nulls BEFORE bucketing: least/greatest skip null operands, so
      // a null v would land in the top bin while count(v) excludes it from
      // the totals — binned counts and totals must cover the same rows.
      df.filter(v.isNotNull)
        .crossJoin(broadcast(bounds.select(col("mn"), col("mx"))))
        .select(bucket.as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(cnt))
    }
    val merged = binned(ref, "n_ref").join(binned(cur, "n_cur"),
        Seq("bucket"), "full_outer")
    val pRef = greatest(coalesce(col("n_ref"), lit(0L)) / col("n_ref_total"),
      lit(eps))
    val pCur = greatest(coalesce(col("n_cur"), lit(0L)) / col("n_cur_total"),
      lit(eps))
    merged
      .crossJoin(broadcast(bounds.select(col("n_ref_total"))))
      .crossJoin(broadcast(nCur))
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        (floor(((pCur - pRef) * log(pCur / pRef)) * 1e6 + 0.5) / 1e6).as("psi_term"))
      .orderBy("bucket")
  }
}
