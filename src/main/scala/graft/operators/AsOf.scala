package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (extension EX7, SURVEY.md §2.3): for each left row, the most
  * recent right row with `right.time <= left.time` on the same key.
  *
  * Implemented with the scalable union+window trick instead of a range
  * join: tag each side, union, single hash-shuffle on the key, sort by
  * (time, side) within the key, then `last(right, ignoreNulls)` over an
  * unbounded-preceding frame carries the latest right row forward to every
  * left row. Cost is one shuffle + sort of |L|+|R| rows — no quadratic
  * key-range explosion, survives 100 TB where a `BETWEEN` join would
  * cross-product hot keys.
  */
object AsOf {

  /** @param rightCols right columns to carry (emitted as `<prefix><name>`,
    *                   null when no right row is at-or-before the left row)
    */
  def joinAsOf(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightCols: Seq[String], prefix: String = "asof_"): DataFrame = {

    val leftCols = left.columns.toSeq
    val l = left.select(
      col(key).as("_k"), col(leftTime).as("_t"), lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(structType(right, rightCols)).as("_r"))
    val r = right.select(
      col(key).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
      lit(null).cast(structType(left, leftCols)).as("_l"),
      struct(rightCols.map(col): _*).as("_r"))

    // Right rows sort before left rows at equal timestamps (side 0 < 1), so
    // the join is inclusive: right.time == left.time matches. The carried
    // right struct is the FINAL tiebreak: when multiple right rows share
    // (key, timestamp), `last(_r)` deterministically carries the greatest
    // carried-column tuple regardless of partitioning/run (left rows have
    // _r null, which sorts first and never reorders across sides).
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, 0)

    val out: Seq[Column] =
      leftCols.map(c => col("_l").getField(c).as(c)) ++
      rightCols.map(c => col("_match").getField(c).as(prefix + c))

    l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(out: _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))
}
