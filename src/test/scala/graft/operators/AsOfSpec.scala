package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before each left row") {
    import spark.implicits._
    val clicks = Seq(
      (101L, 1L, ts("2024-01-01 10:00:00")),
      (102L, 1L, ts("2024-01-01 12:00:00")),
      (103L, 2L, ts("2024-01-01 09:00:00")),
      (104L, 3L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (201L, 1L, ts("2024-01-01 09:30:00")),
      (202L, 1L, ts("2024-01-01 11:00:00")),
      (203L, 2L, ts("2024-01-01 09:00:00")),  // equal ts → inclusive match
      (204L, 2L, ts("2024-01-01 10:00:00"))   // after the click → ignored
    ).toDF("event_id", "user_id", "ts")

    val got = AsOf.joinAsOf(clicks, purchases, "user_id", "ts", "ts",
        Seq("event_id"), prefix = "p_")
      .select("event_id", "p_event_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got === Map(101L -> 201L, 102L -> 202L, 103L -> 203L, 104L -> -1L))
  }

  private def fixture = {
    import spark.implicits._
    val clicks = Seq(
      (101L, 1L, ts("2024-01-01 10:00:00")),
      (103L, 2L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (201L, 1L, ts("2024-01-01 09:30:00")),
      (202L, 1L, ts("2024-01-01 11:00:00")),
      (203L, 2L, ts("2024-01-01 09:00:00")),
      (204L, 2L, ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "ts")
    (clicks, purchases)
  }

  private def run(strict: Boolean, forward: Boolean): Map[Long, Long] = {
    val (clicks, purchases) = fixture
    AsOf.joinAsOf(clicks, purchases, "user_id", "ts", "ts",
        Seq("event_id"), prefix = "p_", strict = strict, forward = forward)
      .select("event_id", "p_event_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
  }

  test("strict as-of excludes right rows at exactly the left timestamp") {
    // user 2's only at-or-before purchase (203) is at the click instant →
    // strict finds nothing; user 1 unaffected
    assert(run(strict = true, forward = false) === Map(101L -> 201L, 103L -> -1L))
  }

  test("forward as-of picks the earliest right row at or after each left row") {
    assert(run(strict = false, forward = true) === Map(101L -> 202L, 103L -> 203L))
  }

  test("strict forward as-of skips the equal-timestamp right row") {
    assert(run(strict = true, forward = true) === Map(101L -> 202L, 103L -> 204L))
  }

  test("unorderable carried columns (MapType) no longer fail analysis") {
    import org.apache.spark.sql.functions._
    val (clicks, purchases) = fixture
    val withMap = purchases.withColumn("props", map(lit("k"), col("event_id")))
    val got = AsOf.joinAsOf(clicks, withMap, "user_id", "ts", "ts",
        Seq("event_id", "props"), prefix = "p_")
      .select("event_id", "p_event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(101L -> 201L, 103L -> 203L))
  }

  test("nearest as-of picks the closer side; equal distance goes to the before match") {
    import spark.implicits._
    val clicks = Seq(
      (101L, 1L, ts("2024-01-01 10:00:00")), // before at -30m, after at +10m → after
      (102L, 2L, ts("2024-01-01 10:00:00")), // before at -10m, after at +10m → tie → before
      (103L, 3L, ts("2024-01-01 10:00:00")), // only an after match
      (104L, 4L, ts("2024-01-01 10:00:00")), // only a before match
      (105L, 5L, ts("2024-01-01 10:00:00"))  // no match at all
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (201L, 1L, ts("2024-01-01 09:30:00")),
      (202L, 1L, ts("2024-01-01 10:10:00")),
      (203L, 2L, ts("2024-01-01 09:50:00")),
      (204L, 2L, ts("2024-01-01 10:10:00")),
      (205L, 3L, ts("2024-01-01 11:00:00")),
      (206L, 4L, ts("2024-01-01 08:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = AsOf.joinAsOfNearest(clicks, purchases, "user_id", "ts", "ts",
        Seq("event_id"), prefix = "p_")
      .select("event_id", "p_event_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got === Map(101L -> 202L, 102L -> 203L, 103L -> 205L,
      104L -> 206L, 105L -> -1L))
  }

  test("nearest as-of claims an equal-timestamp right row once, via the backward side") {
    import spark.implicits._
    val clicks = Seq((101L, 1L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (201L, 1L, ts("2024-01-01 10:00:00")), // exact-ts match, Δ = 0
      (202L, 1L, ts("2024-01-01 10:00:01"))
    ).toDF("event_id", "user_id", "ts")
    val got = AsOf.joinAsOfNearest(clicks, purchases, "user_id", "ts", "ts",
        Seq("event_id"), prefix = "p_")
      .select("event_id", "p_event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(101L -> 201L))
  }
}
