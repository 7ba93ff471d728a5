package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date-template expansion (reference operators T1-T4, SURVEY.md §2.1).
  *
  * The reference substitutes `{year}{month}{lastmonth}{day}{hour}{minute}`
  * holes in URL/pattern strings with zero-padded parts of the source's
  * *local* clock (`data_harvester.py:32-35`). All expressed as built-in,
  * codegen'd expressions — a plan-time `regexp_replace` chain, no UDF.
  */
object Templates {

  /** Per-source local clock: run timestamp shifted by the catalog's integer
    * UTC-offset hours (`data_harvester.py:32-33`). `runTs` must be an
    * injected literal, not `current_timestamp()`, for deterministic tests.
    */
  def localClock(runTs: Column, utcOffsetHours: Column): Column =
    to_timestamp(from_unixtime(
      unix_timestamp(runTs) + utcOffsetHours.cast("long") * 3600L))

  /** The reference's buggy lastmonth: `f'0{int(month)-1}'`
    * (`data_harvester.py:34-35`) — Jan→"00", Oct→"09", Nov→"010", Dec→"011".
    * Kept verbatim for fidelity tests (SURVEY.md §7.0).
    */
  def legacyLastmonth(localTs: Column): Column =
    concat(lit("0"), (month(localTs) - 1).cast("string"))

  /** Corrected lastmonth semantics: zero-padded month of (ts - 1 month). */
  def lastmonth(localTs: Column): Column =
    date_format(add_months(localTs, -1), "MM")

  /** Expand the six template holes in `s` against `localTs`.
    * `legacyLastMonth=true` reproduces the reference bug exactly.
    */
  def expandTemplate(s: Column, localTs: Column,
      legacyLastMonth: Boolean = false): Column = {
    val lm = if (legacyLastMonth) legacyLastmonth(localTs) else lastmonth(localTs)
    val holes: Seq[(String, Column)] = Seq(
      "{year}"      -> date_format(localTs, "yyyy"),
      "{month}"     -> date_format(localTs, "MM"),
      "{lastmonth}" -> lm,
      "{day}"       -> date_format(localTs, "dd"),
      "{hour}"      -> date_format(localTs, "HH"),
      "{minute}"    -> date_format(localTs, "mm"))
    holes.foldLeft(s) { case (acc, (hole, value)) =>
      // `replace` is a literal (non-regex) substitution — stays in codegen.
      replace(acc, lit(hole), value)
    }
  }
}
