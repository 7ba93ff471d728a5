package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical time-series diagnostics over the event stream, the batch
  * companions of [[Anomaly]]'s online monitors: lagged autocorrelation
  * (is the metric self-predictive?) and seasonal baselines (is this
  * value unusual FOR THIS HOUR?). Both are the standard first look at a
  * metric before fitting anything heavier.
  */
object TimeSeries {

  /** Lag-k Pearson autocorrelation of `valCol` per series, for each
    * k in 1..`maxLag`: each event is paired with its k-back predecessor
    * in (ts, id) order via `lag`, then `corr` per (series, k).
    *
    * The lag windows for every k share ONE exchange + sort on the
    * series key (identical window spec), and the |series|·maxLag output
    * is tiny. Ordering ties on ts are broken by the unique event id so
    * the pairing is deterministic. Series with < k+2 points or zero
    * variance yield null r (corr's own guard).
    *
    * Scale shape: one shuffle on the series key, one partial+final agg
    * on (series, lag) — no self-join (the naive formulation joins the
    * table to itself per lag, k full shuffles).
    */
  def autocorr(events: DataFrame, maxLag: Int = 3,
      seriesCol: String = "event_type", tsCol: String = "ts",
      valCol: String = "value", idCol: String = "event_id"): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.partitionBy(col(seriesCol))
      .orderBy(col(tsCol), col(idCol))
    val lagged = events.select(
      col(seriesCol) +: col(valCol) +:
        (1 to maxLag).map(k => lag(col(valCol), k).over(w).as(s"_lag_$k")): _*)
    // explicit-sums Pearson r — (nΣxy − ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²))
    // — NOT the engine's corr aggregate, so a SQL oracle replays the same
    // arithmetic (the MomentsAgg convention). All maxLag lags aggregate
    // in ONE conditional-sum pass (per-lag filters become when() masks),
    // and the groupBy inherits the window's hash partitioning on the
    // series key — one exchange total, not one per lag.
    val x = col(valCol)
    val aggs = (1 to maxLag).flatMap { k =>
      val y = col(s"_lag_$k")
      val m = y.isNotNull
      Seq(count(when(m, lit(1))).as(s"n_$k"),
        sum(when(m, x)).as(s"sx_$k"), sum(when(m, y)).as(s"sy_$k"),
        sum(when(m, x * x)).as(s"sxx_$k"), sum(when(m, y * y)).as(s"syy_$k"),
        sum(when(m, x * y)).as(s"sxy_$k"))
    }
    val sums = lagged.groupBy(col(seriesCol)).agg(aggs.head, aggs.tail: _*)
    val rows = (1 to maxLag).map { k =>
      struct(lit(k).as("lag"), col(s"n_$k").as("n"),
        col(s"sx_$k").as("sx"), col(s"sy_$k").as("sy"),
        col(s"sxx_$k").as("sxx"), col(s"syy_$k").as("syy"),
        col(s"sxy_$k").as("sxy"))
    }
    val long = sums.select(col(seriesCol), explode(array(rows: _*)).as("g"))
      .select(col(seriesCol), col("g.lag").as("lag"), col("g.n").as("n"),
        col("g.sx").as("sx"), col("g.sy").as("sy"), col("g.sxx").as("sxx"),
        col("g.syy").as("syy"), col("g.sxy").as("sxy"))
    val dx = col("n") * col("sxx") - col("sx") * col("sx")
    val dy = col("n") * col("syy") - col("sy") * col("sy")
    val r = when(col("n") >= 2 && dx > 0.0 && dy > 0.0,
      (col("n") * col("sxy") - col("sx") * col("sy")) / sqrt(dx * dy))
    // a series shorter than k has no lag-k pairs at all — emit no row
    // (matching the filtered-sums formulation), not an n=0 row
    long.filter(col("n") > 0)
      .select(col(seriesCol), col("lag"),
        (floor((r) * 1e6 + 0.5) / 1e6).as("r"), col("n").as("n_pairs"))
  }

  /** Hour-of-day seasonal baseline per series, and each event scored
    * against its own (series, hour) cell: seasonal z = (x − μ_cell)/σ_cell.
    * The cell moments use the explicit (Σx² − (Σx)²/n)/(n−1) form (the
    * MomentsAgg convention) so a SQL oracle replays the exact IEEE
    * arithmetic. Cells with < 3 points or zero variance yield null z.
    *
    * Scale shape: the baseline is a partial+final hash agg to a
    * |series|·24 frame, joined back on the (series, hour) cell key —
    * bounded side, planner-chosen join (AQE broadcasts it at runtime;
    * no hint, per the broadcast ratchet).
    */
  def seasonalZ(events: DataFrame, zThresh: Double = 3.0,
      seriesCol: String = "event_type", tsCol: String = "ts",
      valCol: String = "value", idCol: String = "event_id"): DataFrame = {
    val v = col(valCol)
    val withHour = events.select(col(idCol), col(seriesCol), v,
      hour(col(tsCol)).as("hod"))
    val cells = withHour.groupBy(col(seriesCol), col("hod"))
      .agg(sum(v).as("s"), sum(v * v).as("ss"), count(v).as("n"))
    val mean = col("s") / col("n")
    val variance = (col("ss") - col("s") * col("s") / col("n")) /
      (col("n") - lit(1))
    val z = when(col("n") >= 3 && variance > 0.0,
      (v - mean) / sqrt(variance))
    withHour.join(cells, Seq(seriesCol, "hod"))
      .select(col(idCol), col(seriesCol), col("hod"),
        (floor((z) * 1e6 + 0.5) / 1e6).as("seasonal_z"), (abs(z) > zThresh).as("is_anomaly"))
  }

  /** CUSUM changepoint detection per series (Page 1954): the cumulative
    * sum of deviations from the series mean, S_i = Σ_{j≤i}(x_j − μ),
    * peaks in magnitude at the most likely single changepoint — the
    * standard "did the level shift, and where?" screen before fitting
    * segmented models. Emits one row per series: the argmax event, its
    * position, and the normalized peak |S| (divided by σ√n, the scale
    * on which the CUSUM test statistic is tabulated).
    *
    * Scale shape: ONE exchange + sort on the series key; the mean/σ
    * frame is a |series|-row agg joined back planner-chosen; the argmax
    * is a max_by over (|S|, then earliest id for ties). Deterministic:
    * the running sum folds in explicit (ts, id) order.
    */
  def cusumChangepoint(events: DataFrame,
      seriesCol: String = "event_type", tsCol: String = "ts",
      valCol: String = "value", idCol: String = "event_id"): DataFrame = {
    val v = col(valCol)
    val stats = events.groupBy(col(seriesCol))
      .agg(sum(v).as("s"), sum(v * v).as("ss"), count(v).as("n"))
      .select(col(seriesCol), (col("s") / col("n")).as("mu"),
        sqrt((col("ss") - col("s") * col("s") / col("n")) /
          (col("n") - lit(1))).as("sigma"), col("n"))
    val w = Window.partitionBy(col(seriesCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withS = events.join(stats, seriesCol)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col(seriesCol)).orderBy(col(tsCol), col(idCol))))
      .withColumn("cusum", sum(v - col("mu")).over(w))
    // |S| is rounded to 6 places BEFORE ranking so the argmax choice is
    // engine-independent (the knnEdges cosine-ranking convention);
    // ties → earliest position.
    val acs = (floor((abs(col("cusum"))) * 1e6 + 0.5) / 1e6)
    val rank = Window.partitionBy(col(seriesCol))
      .orderBy(acs.desc, col("pos").asc)
    withS.withColumn("acs", acs)
      .withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1)
      .select(col(seriesCol), col(idCol).as("cp_event_id"),
        col("pos").cast("long").as("cp_pos"),
        // zero-variance series: no scale to test against → null, never NaN
        (floor((when(col("sigma") > 0.0,
          col("acs") / (col("sigma") * sqrt(col("n"))))) * 1e4 + 0.5) / 1e4)
          .as("peak_stat"))
  }

  /** Classical additive seasonal decomposition per series at an hourly
    * grain with a daily (period-24) cycle: x = trend + seasonal + resid.
    *
    *  - trend: the textbook centered 2×24 moving average for an even
    *    period — the mean of the two off-by-one 24-bucket window sums,
    *    defined only where BOTH windows are full (edges → null);
    *  - seasonal: the mean detrended value per (series, hour-of-day)
    *    cell, CENTERED by subtracting the series' mean seasonal (so the
    *    components sum back to x up to the residual, the identification
    *    constraint);
    *  - resid: x − trend − seasonal where both exist.
    *
    * Windows are ROW-based over the OBSERVED hourly buckets (a missing
    * hour shifts neighbours in, it does not widen the window) — the
    * deterministic choice both engines replay identically; a
    * gap-sensitive deployment densifies the calendar upstream.
    *
    * Scale shape: the hourly roll-up is a partial+final hash agg keyed
    * (series, bucket) — shuffle volume is bucket count, not event count
    * — and both MA windows share its exchange via one sort on the
    * series key; the seasonal cells and their centering means are
    * |series|·24- and |series|-row frames joined back planner-chosen
    * (AQE broadcasts; no hint, per the broadcast ratchet).
    */
  def seasonalDecompose(events: DataFrame,
      seriesCol: String = "event_type", tsCol: String = "ts",
      valCol: String = "value"): DataFrame = {
    // Engine-independence pattern for every mean in the chain, learned
    // from this operator's first two cuts failing the oracle on single
    // ulps: (1) SUM in DECIMAL — exact, so summation order cannot
    // matter; (2) divide as ONE double op — both engines now hold the
    // IDENTICAL double; (3) snap to 6 decimals with floor(v·1e6+0.5)/1e6
    // rather than round() — Spark's round() rounds the SHORTEST decimal
    // representation (BigDecimal.valueOf) while DuckDB rounds the binary
    // value, and a mean that lands exactly on a 7th-decimal half (which
    // /48 and /count produce constantly from 6-decimal inputs) flips
    // between them; the floor form is pure double arithmetic, identical
    // everywhere.
    def snap6(c: org.apache.spark.sql.Column) =
      floor(c * 1e6 + 0.5) / 1e6
    val hourly = events
      .groupBy(col(seriesCol), date_trunc("hour", col(tsCol)).as("bucket"))
      .agg(sum(col(valCol).cast("decimal(24,6)")).as("sv"),
        count(lit(1)).as("nv"))
      .select(col(seriesCol), col("bucket"),
        snap6(col("sv").cast("double") / col("nv")).as("x"))
    val ord = Window.partitionBy(col(seriesCol)).orderBy(col("bucket"))
    val wA = ord.rowsBetween(-12, 11)
    val wB = ord.rowsBetween(-11, 12)
    val full = count(col("x")).over(wA) === 24 &&
      count(col("x")).over(wB) === 24
    val xd = col("x").cast("decimal(24,6)")
    val trended = hourly.withColumn("trend",
        snap6(when(full,
          (sum(xd).over(wA) + sum(xd).over(wB)).cast("double") / 48.0)))
      .withColumn("hod", hour(col("bucket")))
    // x and trend are 6-decimal values; their difference in decimal is
    // exact, so the cell sums below are order-independent too
    val det = (xd - col("trend").cast("decimal(24,6)"))
    val cells = trended.filter(col("trend").isNotNull)
      .groupBy(col(seriesCol), col("hod"))
      .agg(snap6(sum(det).cast("double") / count(det)).as("s_raw"))
    val centers = cells.groupBy(col(seriesCol))
      .agg(snap6(sum(col("s_raw").cast("decimal(24,6)")).cast("double") /
        count(col("s_raw"))).as("s_mean"))
    val seasonal = cells.join(centers, seriesCol)
      .select(col(seriesCol), col("hod"),
        (col("s_raw") - col("s_mean")).as("seasonal"))
    trended.join(seasonal, Seq(seriesCol, "hod"), "left")
      .select(col(seriesCol), col("bucket"), col("x"), col("trend"),
        snap6(col("seasonal")).as("seasonal"),
        snap6(col("x") - col("trend") - col("seasonal")).as("resid"))
  }
}
