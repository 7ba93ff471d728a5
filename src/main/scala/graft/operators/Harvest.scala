package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Templates

/** The harvest pipeline — the reference's flagship dataflow
  * (`data_harvester.py:21-38`, traced in SURVEY.md §3.1).
  *
  * catalog → filter(Active=1 ∧ Interval=env) → local clock per source →
  * expand `{year}..{minute}` holes in URL and Pattern → project the 5-field
  * task → (optionally) JSON-serialize for the queue.
  *
  * Entirely narrow (no shuffle): at 100 TB of catalog this is a single
  * scan+project stage; Catalyst pushes the Active/Interval predicates and
  * prunes the unused columns (3,5,6) into the CSV scan.
  */
object Harvest {

  /** Pure DataFrame form of the pipeline. `runTs` is injected (not
    * `current_timestamp()`) so runs are deterministic (SURVEY.md §7.0).
    * `legacyLastMonth` reproduces the reference's lastmonth bug for
    * fidelity testing; default is the corrected semantics.
    */
  def tasks(catalog: DataFrame, runTs: Timestamp, interval: String,
      legacyLastMonth: Boolean = false): DataFrame = {
    val localTs = Templates.localClock(lit(runTs), col("utc"))
    def expand(c: Column) = Templates.expandTemplate(c, localTs, legacyLastMonth)
    catalog
      .filter(col("active") === 1 && col("interval") === lit(interval))
      .select(
        col("id").as("ID"),
        expand(col("url")).as("URL"),
        col("type").as("TYPE"),
        expand(col("pattern")).as("PATTERN"),
        col("utc").cast("string").as("UTC"))
  }

  /** Task rows + their queue-message JSON (P2, `data_harvester.py:37`). */
  def taskMessages(catalog: DataFrame, runTs: Timestamp, interval: String): DataFrame =
    tasks(catalog, runTs, interval)
      .withColumn("task_json",
        to_json(struct(col("ID"), col("URL"), col("TYPE"), col("PATTERN"), col("UTC"))))
}
