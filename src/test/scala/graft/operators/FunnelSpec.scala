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
}
