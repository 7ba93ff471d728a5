package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history construction: turn an
  * append-only change log into versioned dimension rows with effective
  * ranges — the warehouse-side complement to the reference's in-place
  * catalog point-update (SURVEY §2.1 E1), which keeps only the latest
  * state (reference: data_downloader.py:40-48 rewrites the catalog row).
  */
object History {

  /** Collapse a change log into SCD2 rows: per key (ordered by `tsCol`,
    * ties broken by the unique `idCol`), consecutive repeats of `attrCol`
    * merge into one row whose validity runs from its first appearance to
    * the next CHANGE (`valid_to` null ⇒ current version).
    *
    * Scale shape: both windows (the change-detect `lag` and the range
    * `lead`) share the same key partitioning and sort order, and the
    * filter between them preserves distribution and ordering, so the log
    * shuffles and sorts exactly once; everything else is narrow. Output
    * is |versions| ≤ |log| rows, no broadcast, no self-join.
    */
  def scd2(log: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    log
      .select(col(keyCol), col(attrCol), col(tsCol), col(idCol))
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(attrCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(attrCol), col(tsCol).as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  /** Snapshot diff — reconcile two versions of a keyed table into the
    * classic change set: `added` (key only in new), `removed` (key only
    * in old), `changed` (key in both, any compared column differs).
    * Unchanged rows are dropped — at real snapshot cadence the change
    * set is a small fraction of the table, so the output, not the
    * inputs, is what downstream consumes (audit, CDC backfill, cache
    * invalidation).
    *
    * Scale shape: ONE full-outer shuffle join on the key — both sides
    * hash-partition by the same key so the join co-locates; the compare
    * is a narrow null-safe struct equality; no broadcast, no window.
    * Column comparison uses `<=>` per column so a null→value transition
    * counts as a change (plain `=!=` would return null and drop it).
    *
    * @return one row per differing key: key column, `change_type`, and
    *   each compared column as `old_<c>` / `new_<c>`.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select(col(keyCol) +:
      compareCols.map(c => col(c).as(s"old_$c")) :+ lit(true).as("_in_old"): _*)
    val n = newDf.select(col(keyCol) +:
      compareCols.map(c => col(c).as(s"new_$c")) :+ lit(true).as("_in_new"): _*)
    val same = compareCols
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduce(_ && _)
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("change_type",
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(!same, "changed"))
      .filter(col("change_type").isNotNull)
      .select(col(keyCol) +: col("change_type") +:
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
