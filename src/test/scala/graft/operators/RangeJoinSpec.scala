package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixture = {
    import spark.implicits._
    val points = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // == interval start (strict → out)
      (2L, 10L, ts("2024-01-01 10:30:00")), // inside
      (3L, 10L, ts("2024-01-01 11:00:00")), // == interval end (inclusive → in)
      (4L, 10L, ts("2024-01-01 11:00:01")), // just past end
      (5L, 99L, ts("2024-01-01 10:30:00")), // wrong key
      (6L, 10L, ts("2024-01-03 00:00:00"))  // inside the multi-bin interval
    ).toDF("point_id", "user_id", "ts")
    val intervals = Seq(
      (100L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      // 2-day interval: spans many hourly bins, exercises the explode side
      (200L, 10L, ts("2024-01-02 00:00:00"), ts("2024-01-04 00:00:00"))
    ).toDF("iv_id", "user_id", "w_start", "w_end")
    (points, intervals)
  }

  test("point-in-interval matches strict-start/inclusive-end containment per key") {
    val (points, intervals) = fixture
    val got = RangeJoin.pointInInterval(points, intervals,
        key = "user_id", pointTime = "ts", startCol = "w_start", endCol = "w_end",
        binSeconds = 3600L)
      .select("point_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((2L, 100L), (3L, 100L), (6L, 200L)))
  }

  test("each qualifying pair appears exactly once despite bin replication") {
    val (points, intervals) = fixture
    // Tiny bins: the 2-day interval replicates to ~200 bins of 1000 s, but
    // point 6 still pairs with it exactly once (a point has ONE bin).
    val rows = RangeJoin.pointInInterval(points, intervals,
        key = "user_id", pointTime = "ts", startCol = "w_start", endCol = "w_end",
        binSeconds = 1000L)
      .select("point_id", "iv_id").collect()
    assert(rows.length === rows.distinct.length)
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((2L, 100L), (3L, 100L), (6L, 200L)))
  }

  test("inclusive-start / exclusive-end variant flips both boundaries") {
    val (points, intervals) = fixture
    val got = RangeJoin.pointInInterval(points, intervals,
        key = "user_id", pointTime = "ts", startCol = "w_start", endCol = "w_end",
        binSeconds = 3600L, strictStart = false, inclusiveEnd = false)
      .select("point_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 100L), (2L, 100L), (6L, 200L)))
  }
}
