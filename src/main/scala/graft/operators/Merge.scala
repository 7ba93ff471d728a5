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
  }
}
