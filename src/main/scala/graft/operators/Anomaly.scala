package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming-style anomaly detection over an event stream: each event is
  * scored against ITS OWN key's trailing time window (personal baseline),
  * the standard drift/outlier monitor for metric pipelines.
  */
object Anomaly {

  /** Rolling z-score per event: z = (x − μ_w)/σ_w over the trailing
    * `windowMicros` RANGE frame (current row included) partitioned by
    * `keyCol`; events with |z| > `zThresh` flag as anomalies. Windows
    * with fewer than 3 points or zero variance yield null z (no
    * baseline ⇒ no verdict, never a division error).
    *
    * Variance comes from explicitly parenthesized windowed sums —
    * (Σx² − (Σx)²/n)/(n−1) — NOT the engine's stddev aggregate, so a SQL
    * oracle replays the exact IEEE arithmetic (the MomentsAgg
    * convention; engines differ in their Welford/M2 internals).
    *
    * Scale shape: ONE exchange + sort on the key; all three windowed
    * sums share the same frame so Spark evaluates them in a single
    * Window operator pass. Keying by entity (user), not by a
    * low-cardinality type column, keeps partitions balanced at corpus
    * scale.
    */
  def rollingZ(events: DataFrame, windowMicros: Long = 86400000000L,
      zThresh: Double = 3.0, keyCol: String = "user_id",
      tsCol: String = "ts", valCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowMicros, 0L)
    val v = col(valCol)
    val scored = events.select(col(idCol), col(keyCol), v,
      sum(v).over(w).as("s"),
      sum(v * v).over(w).as("ss"),
      count(v).over(w).as("n"))
    val mean = col("s") / col("n")
    val variance = (col("ss") - col("s") * col("s") / col("n")) /
      (col("n") - lit(1))
    val z = when(col("n") >= 3 && variance > 0.0,
      (v - mean) / sqrt(variance))
    scored.select(col(idCol), col(keyCol),
      (floor((z) * 1e6 + 0.5) / 1e6).as("z"), (abs(z) > zThresh).as("is_anomaly"))
  }

  /** MAD-based robust outlier flags — the rank-statistics sibling of
    * [[rollingZ]]: the modified z-score 0.6745·(x − median)/MAD
    * (Iglewicz & Hoaglin 1993), per-key over the WHOLE key history
    * rather than a trailing frame. Mean/stddev baselines are themselves
    * dragged by the outliers they hunt; median/MAD have a 50% breakdown
    * point, the standard robust gate for metric and quality-score
    * distributions.
    *
    * Keys with MAD = 0 (over half the values identical) or fewer than 3
    * points yield null score — no verdict, never a division blow-up.
    * Percentiles are the exact interpolated kind (`percentile`), which
    * DuckDB's `quantile_cont` replays bit-for-bit (the agg_percentiles
    * precedent); round-6 like the z-score.
    *
    * Scale shape: two aggregations and two joins, ALL keyed by
    * `keyCol` — an entity key (user), high-cardinality by design, so
    * every exchange hash-balances and the per-key exact median sorts
    * key-local data, never a global frame. The med/MAD tables are
    * one-row-per-key aggregates joined back WITHOUT a broadcast hint:
    * they scale with the key count, so AQE must choose from runtime
    * sizes (the round-7 broadcast rule).
    */
  def madOutliers(events: DataFrame, thresh: Double = 3.5,
      keyCol: String = "user_id", valCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    val v = col(valCol)
    // The median/MAD are SNAPPED to 6 decimals BEFORE any downstream
    // arithmetic (not just on output): two engines' exact interpolated
    // percentiles can disagree by 1 ulp in the (1−f)·a + f·b evaluation,
    // and unsnapped that ulp flips 6th-decimal roundings and threshold
    // booleans wherever the interpolation lands ON a data value —
    // exactly what the sf1 probe measured (r11). Snapping makes every
    // derived quantity a pure function of identical inputs on both
    // engines; same rule the IVF quantizer uses for its centroids.
    val med = events.groupBy(col(keyCol)).agg(
      (floor((expr(s"percentile($valCol, 0.5)")) * 1e6 + 0.5) / 1e6).as("med"),
      count(v).as("n"))
    val dev = events.join(med, Seq(keyCol))
      .withColumn("adev", abs(v - col("med")))
    val mad = dev.groupBy(col(keyCol))
      .agg((floor((expr("percentile(adev, 0.5)")) * 1e6 + 0.5) / 1e6).as("mad"))
    val rz = when(col("n") >= 3 && col("mad") > 0.0,
      lit(0.6745) * (v - col("med")) / col("mad"))
    dev.join(mad, Seq(keyCol))
      .select(col(idCol), col(keyCol),
        col("med"), col("mad"),
        // floor-snap, not round(·,6): Spark's round ties on the SHORTEST
        // DECIMAL repr of the double (BigDecimal HALF_UP) while other
        // engines round the binary value, so a score landing exactly on
        // a 6th-decimal tie (measured at sf10: -0.2529375) flips the
        // last digit between engines. floor(x·1e6 + 0.5)/1e6 is pure
        // IEEE arithmetic every engine replays bit-for-bit — the same
        // engine-agnostic rule seasonalDecompose pinned in r12.
        (floor(rz * lit(1e6) + lit(0.5)) / lit(1e6)).as("robust_z"),
        (abs(rz) > thresh).as("is_outlier"))
  }

  /** Adjusted EWMA smoothing per entity — exponential decay over the
    * trailing `window` observations (event-time order, ties broken by
    * `idCol`):
    * `ewma_t = Σ_j (1−α)^j · x_{t−j} / Σ_j (1−α)^j`, j = 0..window−1.
    * The trailing-window truncation keeps the weight arithmetic exact
    * and replayable: the classic recursive form compounds float error
    * and cannot be expressed as a window aggregate, while the truncated
    * tail's weight is (1−α)^window — already <1% of the total at the
    * defaults. This is the exponential sibling of [[rollingZ]]'s flat
    * trailing mean: recent points dominate, old points age out smoothly
    * instead of falling off a cliff.
    *
    * Scale shape: ONE exchange + sort on the entity key; the trailing
    * values ride in a bounded `window`-element collect_list frame and
    * the weighted fold is a narrow indexed `transform`+`aggregate` —
    * per-row state is `window` doubles, independent of history length.
    */
  def ewma(events: DataFrame, alpha: Double = 0.3, window: Int = 8,
      keyCol: String = "user_id", tsCol: String = "ts",
      valCol: String = "value", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(window - 1), 0)
    val decay = 1.0 - alpha
    val vals = collect_list(col(valCol)).over(w) // oldest → newest
    val n = size(col("vals"))
    // weight for position i (1-based, oldest first) = (1-α)^(n-i)
    val weighted = transform(col("vals"),
      (x, i) => x * pow(lit(decay), (n - 1 - i).cast("double")))
    val wsum = aggregate(weighted, lit(0.0), (a, x) => a + x)
    val wnorm = aggregate(
      sequence(lit(0), n - 1),
      lit(0.0), (a, j) => a + pow(lit(decay), j.cast("double")))
    events.select(col(idCol), col(keyCol), col(valCol), vals.as("vals"))
      .select(col(idCol), col(keyCol), col(valCol),
        (floor((wsum / wnorm) * 1e6 + 0.5) / 1e6).as("ewma"))
  }

  /** Per-group winsorization: clip `valCol` to the group's
    * [pLow, pHigh] interpolated percentiles — the standard
    * outlier-robust normalization before feature scaling or averaging
    * (trimming deletes rows; winsorizing keeps them at the fence).
    * Emits the clipped value plus which fence (if any) fired.
    *
    * Percentiles are the exact interpolated kind (`percentile`), which
    * DuckDB's `percentile_cont` replays bit-for-bit; at corpus scale
    * swap in `approx_percentile` (documented accuracy contract) — the
    * plan shape is unchanged. The bounds frame is |groups| rows joined
    * back planner-chosen (no hint, per the broadcast ratchet); one
    * partial+final agg plus one join, no window sort.
    */
  def winsorize(events: DataFrame, pLow: Double = 0.05,
      pHigh: Double = 0.95, groupCol: String = "event_type",
      valCol: String = "value", idCol: String = "event_id"): DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow < pHigh,
      s"need 0 <= pLow < pHigh <= 1, got [$pLow, $pHigh]")
    val v = col(valCol)
    // fences snapped to 6 before use — see madOutliers: an interpolated
    // percentile landing 1 ulp off a data value would otherwise flip
    // the strict < / > fence classification between engines (measured
    // at sf1, where duplicated value multisets make that landing certain)
    val bounds = events.groupBy(col(groupCol)).agg(
      (floor((expr(s"percentile($valCol, $pLow)")) * 1e6 + 0.5) / 1e6).as("_lo"),
      (floor((expr(s"percentile($valCol, $pHigh)")) * 1e6 + 0.5) / 1e6).as("_hi"))
    events.join(bounds, groupCol)
      .select(col(idCol), col(groupCol), v,
        (floor((greatest(col("_lo"), least(col("_hi"), v))) * 1e6 + 0.5) / 1e6).as("clipped"),
        when(v < col("_lo"), lit("low"))
          .when(v > col("_hi"), lit("high"))
          .otherwise(lit("none")).as("fence"))
  }
}
