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
        round(avg(col(c)), 6).as(s"${c}__avg"))
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
}
