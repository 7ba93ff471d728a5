package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the general form behind attribution
  * windows, validity-interval lookups and event/interval overlap queries.
  *
  * Scale posture (100 TB): a naive range join — equi-key only, range as a
  * post-join filter — builds the full per-key cross product first (every
  * point × every interval of that key), which is quadratic in per-key
  * activity and is exactly the plan Spark produces for
  * `ON a.k = b.k AND ts BETWEEN s AND e`. Instead, both sides are mapped
  * onto fixed time bins: an interval covers `floor(s/bin)..floor(e/bin)`
  * (a bounded explode — intervals are assumed << bin-count wide), a point
  * lives in exactly ONE bin, and the join key becomes (key, bin). The
  * per-task work is then proportional to genuinely co-located
  * (key, time-neighborhood) pairs, not per-key history. Because the point
  * has a single bin, each qualifying (point, interval) pair is produced
  * exactly once — no distinct pass needed.
  *
  * Bin width trades replication (wide intervals explode to more bins)
  * against selectivity (wide bins admit more false candidates); set it
  * near the typical interval length.
  */
object RangeJoin {

  /** Join `points` to the `intervals` rows whose (start, end] window
    * contains the point's timestamp, matching on `key` plus containment.
    *
    * @param points     rows with `key` and timestamp column `pointTime`
    * @param intervals  rows with `key`, `startCol`, `endCol` (timestamps)
    * @param binSeconds time-bin width; choose ≈ the typical interval span
    * @param strictStart containment is start < t (default) vs start <= t
    * @param inclusiveEnd containment is t <= end (default) vs t < end
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      key: String, pointTime: String, startCol: String, endCol: String,
      binSeconds: Long, strictStart: Boolean = true,
      inclusiveEnd: Boolean = true): DataFrame = {
    val bin = lit(binSeconds)
    val p = points.withColumn("_bin", floor(unix_timestamp(col(pointTime)) / bin))
    val i = intervals.withColumn("_bin",
      explode(sequence(floor(unix_timestamp(col(startCol)) / bin),
        floor(unix_timestamp(col(endCol)) / bin))))
    val lower =
      if (strictStart) col(startCol) < col(pointTime) else col(startCol) <= col(pointTime)
    val upper =
      if (inclusiveEnd) col(pointTime) <= col(endCol) else col(pointTime) < col(endCol)
    p.join(i, Seq(key, "_bin")).filter(lower && upper).drop("_bin")
  }
}
