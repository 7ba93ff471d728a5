package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-clustered) table layout — the co-located JOIN
  * primitive at 100 TB.
  *
  * A key-equality join between two unbucketed tables shuffles BOTH
  * sides on every run; for a fact table that participates in the same
  * join daily, that is the single largest recurring network cost in the
  * pipeline. Persisting each side hash-partitioned by the join key
  * (Spark's `bucketBy` + `sortBy` layout: file `i` of each table holds
  * exactly the keys with `hash(key) % n == i`, pre-sorted) makes every
  * subsequent join, aggregation, or window on that key EXCHANGE-FREE —
  * the sort-merge join reads co-located buckets directly, paying the
  * shuffle once at write time and never again.
  *
  * This is deliberately the session-catalog form (`saveAsTable` with an
  * explicit path → an EXTERNAL table: data under the caller's root,
  * metadata in the catalog) because bucket metadata is what lets the
  * planner trust the layout; a bare parquet directory cannot carry it.
  * [[BucketedJoinSpec]] pins the contract: the join plan of two
  * same-bucket-count tables contains NO ShuffleExchange, and a groupBy
  * on the bucket key is likewise exchange-free on the partial side.
  *
  * Scale notes: pick `buckets` so one bucket of the LARGER table fits
  * an executor's read chunk (buckets ≈ table bytes / 128 MB, rounded to
  * the co-partitioned family's common count); both join sides must use
  * the SAME count (or integer multiples with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`). Skewed keys
  * skew buckets — salt the key before bucketing or leave the hot table
  * unbucketed and let AQE skew-split the shuffle instead.
  */
object Bucketed {

  /** Persist `df` hash-clustered by `key` into `n` buckets (one sorted
    * file family per bucket) as external table `name` at `path`.
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
      key: String, n: Int): Unit =
    df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(n, key).sortBy(key).saveAsTable(name)

  /** Join two same-bucket-count tables on their bucket key, forced to
    * sort-merge (the broadcast path would mask the layout win) — reads
    * co-located buckets with no exchange on either side.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right).hint("merge"), key)

  /** Exchanges the plan would execute — 0 for a co-located join. Read
    * from `executedPlan` (exchanges are inserted by EnsureRequirements
    * at preparation; `sparkPlan` predates them and always shows zero),
    * with the same line-counting rule as [[graft.ShuffleBudget]] so the
    * number agrees with the repo's shuffle-budget audits.
    */
  def exchangeCount(df: DataFrame): Int =
    graft.ShuffleBudget.countExchanges(
      df.queryExecution.executedPlan.toString)
}
