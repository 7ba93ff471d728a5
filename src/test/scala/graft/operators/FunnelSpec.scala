package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("funnel enforces step order with first-touch semantics") {
    val events = Seq(
      // user 1 converts fully in order
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // user 2's click precedes their view → click step not converted
      (2L, ts(1), "click"), (2L, ts(2), "view"),
      // user 3 skips click → purchase cannot count
      (3L, ts(1), "view"), (3L, ts(2), "purchase"),
      // user 4 never enters the funnel
      (4L, ts(1), "error")
    ).toDF("user_id", "ts", "event_type")
    val r = Funnel.funnelCounts(events, Seq("view", "click", "purchase")).head()
    assert(r.getAs[Long]("n_users") == 4L)
    assert(r.getAs[Long]("step_view") == 3L)
    assert(r.getAs[Long]("step_click") == 1L)
    assert(r.getAs[Long]("step_purchase") == 1L)
    assert(r.getAs[Double]("conv_click") == 0.333333)
    assert(r.getAs[Double]("conv_purchase") == 1.0)
  }

  test("same-timestamp events satisfy the at-or-after ordering") {
    val events = Seq(
      (1L, ts(1), "view"), (1L, ts(1), "click")
    ).toDF("user_id", "ts", "event_type")
    val r = Funnel.funnelCounts(events, Seq("view", "click")).head()
    assert(r.getAs[Long]("step_click") == 1L)
  }

  private def day(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 09:00:00")

  test("cohort retention divides by the cohort's own offset-0 size") {
    // Weeks: Mon 2024-01-01, 01-08, 01-15. Users 1,2 start week 0;
    // user 3 starts week 1. User 1 returns weeks 1 and 2; user 2 never.
    val events = Seq(
      (1L, day(2)), (1L, day(9)), (1L, day(16)),
      (2L, day(3)),
      (3L, day(10))
    ).map { case (u, t) => (u, t, "view") }.toDF("user_id", "ts", "event_type")
    val rows = Funnel.cohortRetention(events)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(rows == Set(
      ("2024-01-01", 0, 2L, 1.0), ("2024-01-01", 1, 1L, 0.5),
      ("2024-01-01", 2, 1L, 0.5), ("2024-01-08", 0, 1L, 1.0)))
  }

  test("transitions are row-normalized with deterministic ordering") {
    val events = Seq(
      // user 1: view → click → view;  user 2: view → click
      (10L, 1L, ts(1), "view"), (11L, 1L, ts(2), "click"),
      (12L, 1L, ts(3), "view"),
      (20L, 2L, ts(1), "view"), (21L, 2L, ts(1), "click") // tie → event_id
    ).toDF("event_id", "user_id", "ts", "event_type")
    val m = Funnel.transitions(events).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(m(("view", "click")) == (2L, 1.0))
    assert(m(("click", "view")) == (1L, 1.0))
    assert(m.size == 2)
  }
}
