package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational MERGE (the lakehouse `MERGE INTO`): apply a changeset of
  * whole-row upserts and deletes to a snapshot.
  *
  * The changeset is a frame with the target's columns plus a boolean
  * `deleteCol`: a key present in the changeset replaces (or, flagged,
  * deletes) the current row; an absent key survives unchanged; a
  * changeset key with no current row inserts. One changeset row per key
  * by contract (the CDC compaction step upstream of any MERGE).
  *
  * Scale shape: ONE anti-join on the key — shuffle-on-key when the
  * changeset is large, planner-broadcast when it is small (the common
  * CDC case), never forced — plus a union with the filtered changeset.
  * This is the maximally-parallel MERGE plan: no window, no global sort,
  * no per-key state. Combined with [[graft.sinks.Generations]] the
  * result commits as a new immutable generation
  * ([[graft.sinks.Generations.mergeAndCommit]]), giving object-store-safe
  * MERGE with snapshot-isolated readers — the Delta/Iceberg write path.
  */
object Merge {

  def mergeApply(current: DataFrame, changes: DataFrame, keys: Seq[String],
      deleteCol: String = "_deleted"): DataFrame = {
    require(keys.nonEmpty, "need at least one merge key")
    val survivors = current.join(changes.select(keys.map(col): _*),
      keys, "left_anti")
    survivors.unionByName(
        changes.filter(!col(deleteCol)).drop(deleteCol))
      // the using-column anti-join surfaces the merge keys FIRST; restore
      // `current`'s column order so merge output composes positionally
      // (diff requires identical schemas by position — a MERGE whose key
      // is not the leading column used to break the diff downstream)
      .select(current.columns.toSeq.map(col): _*)
  }

  /** Change data feed — the INVERSE of [[mergeApply]]: the row-level
    * changeset that turns snapshot `before` into snapshot `after`
    * (Delta's CDF / `table_changes` analog). Output = `after`'s columns
    * plus `_change_type` ∈ {insert, update_postimage, delete}: keys only
    * in `after` are inserts, keys only in `before` are deletes (payload =
    * the before-image, the row a downstream consumer must retract), keys
    * in both with any non-key column differing are updates (payload =
    * the after-image). Unchanged rows are absent. Column comparison is
    * null-safe (`<=>`), so null→value and value→null both register.
    *
    * Scale shape: ONE full-outer join shuffled on the key and a narrow
    * comparison projection — no window, no global sort, no collect;
    * comparing N columns is a codegen'd boolean chain, not a serialized
    * struct. Round-trip law (spec + oracle-gated):
    * `mergeApply(before, asChangeset(diff(before, after, k)), k) ≡ after`.
    */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String],
      changeCol: String = "_change_type",
      includePreimages: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "need at least one diff key")
    val cols = after.columns.toSeq
    require(before.columns.toSeq == cols,
      s"diff needs identical schemas, got ${before.columns.toSeq} vs $cols")
    val b = before.alias("b")
    val a = after.alias("a")
    val cond = keys.map(k => col(s"b.$k") <=> col(s"a.$k")).reduce(_ && _)
    val nonKeys = cols.filterNot(keys.contains)
    // presence flags that survive all-null payload rows: key columns are
    // non-null by merge contract, so a null join-side key means "absent"
    val bPresent = col(s"b.${keys.head}").isNotNull
    val aPresent = col(s"a.${keys.head}").isNotNull
    val changed = nonKeys.map(c => !(col(s"b.$c") <=> col(s"a.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val joined = b.join(a, cond, "full_outer")
    if (!includePreimages)
      joined.select(
        (when(!bPresent, lit("insert"))
          .when(!aPresent, lit("delete"))
          .when(changed, lit("update_postimage"))).as(changeCol) +:
        cols.map(c =>
          when(aPresent, col(s"a.$c")).otherwise(col(s"b.$c")).as(c)): _*)
        .filter(col(changeCol).isNotNull)
    else {
      // Delta CDF's 4-type form: updates emit BOTH images (the preimage
      // is what a retraction-based consumer — incremental aggregate
      // maintenance — must subtract). Emitted via one explode over a
      // per-row change array: an unchanged row's null array explodes to
      // zero rows, so the shape stays the single full-outer join + a
      // narrow generate, no second join and no union re-scan.
      def tagged(label: String, side: String) =
        struct(lit(label).as(changeCol) +:
          cols.map(c => col(s"$side.$c").as(c)): _*)
      val rows =
        when(!bPresent, array(tagged("insert", "a")))
          .when(!aPresent, array(tagged("delete", "b")))
          .when(changed, array(tagged("update_preimage", "b"),
            tagged("update_postimage", "a")))
      joined.select(explode(rows).as("_r")).select(col("_r.*"))
    }
  }

  /** A [[diff]] result re-shaped into [[mergeApply]]'s changeset form
    * (`deleteCol` boolean instead of the change-type label).
    */
  def asChangeset(changes: DataFrame, changeCol: String = "_change_type",
      deleteCol: String = "_deleted"): DataFrame =
    changes
      .withColumn(deleteCol, col(changeCol) === "delete")
      .drop(changeCol)
}
