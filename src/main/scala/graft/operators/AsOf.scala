package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (extension EX7, SURVEY.md §2.3): for each left row, the
  * nearest right row on the same key — by default the most recent right
  * row with `right.time <= left.time` (backward inclusive, the DuckDB
  * `ASOF JOIN ... ON r.t <= l.t` semantic); `strict` drops the equality,
  * `forward` flips the direction to "earliest right row at-or-after"
  * (DuckDB `>=` / strict `>`).
  *
  * Implemented with the scalable union+window trick instead of a range
  * join: tag each side, union, single hash-shuffle on the key, sort by
  * (time, side) within the key, then `last(right, ignoreNulls)` over an
  * unbounded-preceding frame carries the latest right row forward to every
  * left row. Cost is one shuffle + sort of |L|+|R| rows — no quadratic
  * key-range explosion, survives 100 TB where a `BETWEEN` join would
  * cross-product hot keys. Direction/strictness are pure sort-order
  * changes: forward scans time descending, strict orders left rows ahead
  * of equal-timestamp right rows so the frame excludes them.
  */
object AsOf {

  /** @param rightCols right columns to carry (emitted as `<prefix><name>`,
    *                   null when no right row matches)
    * @param strict  exclude right rows at exactly the left timestamp
    *                (`<` / `>` instead of `<=` / `>=`)
    * @param forward match the earliest right row at-or-after (after, if
    *                strict) the left row instead of the latest at-or-before
    */
  def joinAsOf(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightCols: Seq[String], prefix: String = "asof_",
      strict: Boolean = false, forward: Boolean = false): DataFrame = {

    val leftCols = left.columns.toSeq
    val l = left.select(
      col(key).as("_k"), col(leftTime).as("_t"), lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(structType(right, rightCols)).as("_r"))
    val r = right.select(
      col(key).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
      lit(null).cast(structType(left, leftCols)).as("_l"),
      struct(rightCols.map(col): _*).as("_r"))

    // Time axis ascending for backward, descending for forward — the same
    // "carry the last right row seen" frame then yields latest-at-or-
    // before or earliest-at-or-after respectively.
    val tOrd = if (forward) col("_t").desc else col("_t").asc
    // Inclusive: right rows (side 0) sort before left rows (side 1) at
    // equal timestamps, so the frame sees them; strict: left first, so
    // equal-timestamp right rows fall outside the frame.
    val sideOrd = if (strict) col("_side").desc else col("_side").asc
    // Deterministic FINAL tiebreak when multiple right rows share
    // (key, timestamp): the greatest orderable carried tuple wins,
    // independent of direction. Unorderable carried columns (e.g.
    // MapType) are excluded from the ordering rather than failing
    // analysis; ties on the orderable subset then resolve arbitrarily.
    val tieOrd = rightCols
      .filter(c => RowOrdering.isOrderable(right.schema(c).dataType))
      .map(c => col("_r").getField(c).asc)

    val w = Window.partitionBy("_k").orderBy(Seq(tOrd, sideOrd) ++ tieOrd: _*)
      .rowsBetween(Window.unboundedPreceding, 0)

    val out: Seq[Column] =
      leftCols.map(c => col("_l").getField(c).as(c)) ++
      rightCols.map(c => col("_match").getField(c).as(prefix + c))

    l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(out: _*)
  }

  /** Nearest-neighbor as-of: for each left row, the right row minimizing
    * |right.time − left.time| on the key — sensor alignment / "closest
    * reading either side" semantics the directional forms can't express.
    * Ties between an at-or-before and an after match at equal distance
    * go to the BEFORE match (the backward candidate). Composed from the
    * backward-inclusive and strict-forward passes (strict, so an
    * equal-timestamp right row is claimed exactly once, by the backward
    * side) — two union+window shuffles, still no range join, still no
    * per-key cross product at scale.
    */
  def joinAsOfNearest(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val carried = (rightTime +: rightCols).distinct
    val withBack = joinAsOf(left, right, key, leftTime, rightTime,
      carried, prefix = "_b_")
    val both = joinAsOf(withBack, right, key, leftTime, rightTime,
      carried, prefix = "_f_", strict = true, forward = true)
    val lt = col(leftTime).cast("double")
    val bt = col(s"_b_$rightTime").cast("double")
    val ft = col(s"_f_$rightTime").cast("double")
    val useBack = ft.isNull || (bt.isNotNull && (lt - bt) <= (ft - lt))
    val out = left.columns.toSeq.map(col) ++ rightCols.map { c =>
      when(useBack, col(s"_b_$c")).otherwise(col(s"_f_$c")).as(prefix + c)
    }
    both.select(out: _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))
}
