package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (build-brief scale checklist: "salting for
  * skew"). AQE's skew-join handling covers joins; salting covers
  * aggregations over hot keys: pre-aggregate on (key, salt) so the hot
  * key's rows spread over `saltBuckets` reducers, then finalize on key.
  * The salt is derived from stable row attributes (not rand()) so re-runs
  * and speculative retries stay deterministic.
  */
object Skew {

  /** Two-phase salted aggregation: sum(valueCol) + count per key.
    * Identical results to a direct groupBy — only the shuffle profile
    * changes (hot keys fan out over saltBuckets partial groups). The
    * partial sums are DECIMAL so "identical" holds exactly: a double
    * sum regrouped over salt buckets adds in a different order and can
    * drift in its last ulps (BASELINE.md hash rule); decimal partials
    * make salted ≡ direct a law, not a rounding hope.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltFrom: String, saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(col(saltFrom)), lit(saltBuckets)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol).cast("decimal(18,4)")).as("_s"),
        count(lit(1)).as("_c"))
      .groupBy(col(key))
      .agg(sum(col("_s")).as(s"sum_$valueCol"), sum(col("_c")).as("n"))
  }
}
