package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance via algebraic partial
  * aggregates — the batch half of the lambda pattern: a long-lived
  * aggregate table is kept current by merging each new batch's partial
  * state instead of recomputing over the full history. Works for any
  * aggregate expressible as a commutative monoid on (sum, count, min,
  * max); avg derives at read time (sum/count), never stored.
  *
  * Scale shape: maintaining the view costs one partial-aggregable
  * groupBy over the DELTA only — the history is touched as the
  * key-count-sized state table, not re-scanned. Merge is itself a
  * groupBy over (state ∪ delta-state), i.e. two bounded inputs.
  */
object Incremental {

  /** Per-key mergeable aggregate state: (keys…, sum_v, cnt_v, min_v,
    * max_v) over `valueCol`. */
  def aggState(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(sum(col(valueCol)).as("sum_v"),
        count(col(valueCol)).as("cnt_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Merge two state tables (e.g. the stored view and a fresh batch's
    * partials). Associative and commutative, so batches can arrive in
    * any order and partial states can themselves be merged pairwise. */
  def merge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("sum_v")).as("sum_v"),
        sum(col("cnt_v")).as("cnt_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Read-time finalization: derived averages on top of the state. */
  def finalize(state: DataFrame): DataFrame =
    state.withColumn("avg_v",
      round(col("sum_v") / col("cnt_v"), 6).as("avg_v"))
}
