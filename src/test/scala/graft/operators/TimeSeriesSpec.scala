package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("autocorr: alternating series is perfectly anti-correlated at lag 1, correlated at lag 2") {
    val vals = (1 to 20).map(i => if (i % 2 == 0) 1.0 else -1.0)
    val events = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, ts(10, i), "a", v)
    }.toDF("event_id", "ts", "event_type", "value")
    val rows = TimeSeries.autocorr(events, maxLag = 2)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(math.abs(rows(1) - (-1.0)) < 1e-9)
    assert(math.abs(rows(2) - 1.0) < 1e-9)
  }

  test("autocorr: constant series has zero variance and yields null r, not NaN") {
    val events = (1 to 10).map(i => (i.toLong, ts(10, i), "a", 5.0))
      .toDF("event_id", "ts", "event_type", "value")
    val rows = TimeSeries.autocorr(events, maxLag = 1).collect()
    assert(rows.length === 1)
    assert(rows.head.isNullAt(2))
    assert(rows.head.getLong(3) === 9L) // pairs still counted
  }

  test("autocorr pairs stay within a series; n_pairs = n - k per series") {
    val a = (1 to 8).map(i => (i.toLong, ts(10, i), "a", i.toDouble))
    val b = (11 to 14).map(i => (i.toLong, ts(10, i), "b", (i % 3).toDouble))
    val rows = TimeSeries.autocorr((a ++ b).toDF("event_id", "ts", "event_type", "value"),
        maxLag = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(rows(("a", 1)) === 7L)
    assert(rows(("a", 2)) === 6L)
    assert(rows(("b", 1)) === 3L)
    assert(rows(("b", 2)) === 2L)
    // monotone series: r = 1 at every lag
    val ra = TimeSeries.autocorr(a.toDF("event_id", "ts", "event_type", "value"), 1)
      .collect().head.getDouble(2)
    assert(math.abs(ra - 1.0) < 1e-9)
  }

  test("seasonalZ scores an event against its own (type, hour) cell only") {
    // hour 10 baseline ~100 with jitter; hour 11 baseline ~5; a 120 at
    // hour 11 is anomalous even though it would be normal at hour 10
    val h10 = (1 to 6).map(i => (i.toLong, ts(10, i), "a", 100.0 + (i % 3)))
    val h11 = (11 to 16).map(i => (i.toLong, ts(11, i - 10), "a", 5.0 + (i % 2)))
    val odd = Seq((99L, ts(11, 30), "a", 120.0))
    val out = TimeSeries.seasonalZ(
        (h10 ++ h11 ++ odd).toDF("event_id", "ts", "event_type", "value"),
        zThresh = 2.0)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(99L).getBoolean(4), "120 at hour 11 must flag")
    assert(out(99L).getInt(2) === 11)
    // a 101 at hour 10 is in-baseline
    assert(!out(1L).getBoolean(4))
  }

  test("seasonalZ: tiny or zero-variance cells yield null z") {
    val events = Seq(
      (1L, ts(9, 1), "a", 7.0), (2L, ts(9, 2), "a", 7.0),
      (3L, ts(9, 3), "a", 7.0), // zero variance, n=3
      (4L, ts(8, 1), "a", 1.0), (5L, ts(8, 2), "a", 2.0) // n=2 < 3
    ).toDF("event_id", "ts", "event_type", "value")
    val out = TimeSeries.seasonalZ(events).collect()
    assert(out.forall(_.isNullAt(3)))
    // no baseline ⇒ no verdict (null, matching rollingZ/madOutliers)
    assert(out.forall(_.isNullAt(4)))
  }

  test("cusumChangepoint finds the level-shift point") {
    // 10 values at 0 then 10 at 10: |cusum| peaks exactly at the last
    // pre-shift observation (position 10)
    val vals = Seq.fill(10)(0.0) ++ Seq.fill(10)(10.0)
    val events = vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, ts(10, i), "a", v)
    }.toDF("event_id", "ts", "event_type", "value")
    val r = TimeSeries.cusumChangepoint(events).collect().head
    assert(r.getLong(1) === 10L) // cp_event_id
    assert(r.getLong(2) === 10L) // cp_pos
    assert(r.getDouble(3) > 1.0) // a strong shift scores high
  }

  test("cusumChangepoint: flat series scores ~0 and ties break earliest") {
    val events = (1 to 8).map(i => (i.toLong, ts(10, i), "a", 3.0))
      .toDF("event_id", "ts", "event_type", "value")
    val r = TimeSeries.cusumChangepoint(events).collect().head
    // all cusums are exactly 0 → first position wins; sigma=0 → stat null
    assert(r.getLong(2) === 1L)
    assert(r.isNullAt(3))
  }

  test("olsFit recovers an exact line and guards degenerate groups") {
    // y = 3x + 2 exactly → slope 3, intercept 2, r2 = 1
    val pts = (1 to 10).map(i => ("a", i, 3 * i + 2)) ++
      Seq(("b", 5, 7)) ++ // n=1: no line
      Seq(("c", 4, 1), ("c", 4, 9)) // zero x-variance: no line
    val got = Learn.olsFit(pts.toDF("g", "x", "y"),
        org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y"), "g")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getDouble(1) === 3.0)
    assert(got("a").getDouble(2) === 2.0)
    assert(got("a").getDouble(3) === 1.0)
    assert(got("b").isNullAt(1) && got("c").isNullAt(1))
  }

  test("winsorize clips to the group fences and labels which fence fired") {
    // group a: values 1..100 → p05 fence ≈ 5.95, p95 ≈ 95.05
    val a = (1 to 100).map(i => (i.toLong, "a", i.toDouble))
    val out = Anomaly.winsorize(a.toDF("event_id", "event_type", "value"),
        pLow = 0.05, pHigh = 0.95)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(3), r.getString(4))).toMap
    assert(out(1L)._2 === "low")
    assert(out(1L)._1 > 1.0) // clipped up to the fence
    assert(out(100L)._2 === "high")
    assert(out(100L)._1 < 100.0)
    assert(out(50L) === ((50.0, "none")))
    // every clipped value within fences
    assert(out.values.forall { case (c, _) => c >= out(1L)._1 && c <= out(100L)._1 })
  }

  test("winsorize fences are per-group") {
    val a = (1 to 20).map(i => (i.toLong, "a", i.toDouble))
    val b = (21 to 40).map(i => (i.toLong, "b", 1000.0 + i))
    val out = Anomaly.winsorize((a ++ b).toDF("event_id", "event_type", "value"))
      .collect()
    // no b value is dragged toward a's range
    assert(out.filter(_.getString(1) == "b").forall(_.getDouble(3) > 1000.0))
  }
}
