package graft.operators

import java.sql.Date

import graft.SparkSpec

class HistorySpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("scd2 collapses consecutive repeats and ranges versions") {
    val log = Seq(
      // key 1: O, O, F, O  →  versions O[1..3), F[3..4), O[4..)
      (1L, "O", d("2024-01-01"), 10L),
      (1L, "O", d("2024-01-02"), 11L),
      (1L, "F", d("2024-01-03"), 12L),
      (1L, "O", d("2024-01-04"), 13L),
      // key 2: single version, current from first sight
      (2L, "P", d("2024-02-01"), 20L)
    ).toDF("k", "status", "ts", "id")
    val rows = History.scd2(log, "k", "status", "ts", "id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString, Option(r.getDate(3)).map(_.toString),
        r.getBoolean(4))).toSet
    assert(rows == Set(
      (1L, "O", "2024-01-01", Some("2024-01-03"), false),
      (1L, "F", "2024-01-03", Some("2024-01-04"), false),
      (1L, "O", "2024-01-04", None, true),
      (2L, "P", "2024-02-01", None, true)))
  }

  test("same-date changes order by the unique id tiebreak") {
    val log = Seq(
      (1L, "A", d("2024-01-01"), 2L),
      (1L, "B", d("2024-01-01"), 1L) // earlier id ⇒ B precedes A
    ).toDF("k", "status", "ts", "id")
    val cur = History.scd2(log, "k", "status", "ts", "id")
      .filter("is_current").head()
    assert(cur.getString(1) == "A")
  }

  test("the log shuffles exactly once for both windows") {
    val log = Seq((1L, "A", d("2024-01-01"), 1L)).toDF("k", "status", "ts", "id")
    val plan = History.scd2(log, "k", "status", "ts", "id")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("snapshotDiff: added/removed/changed, null transitions, unchanged dropped") {
    import spark.implicits._
    val old = Seq(
      (1L, Some("A"), 10.0),  // unchanged -> absent from output
      (2L, Some("A"), 10.0),  // value change
      (3L, Some("A"), 10.0),  // removed
      (5L, None: Option[String], 10.0) // null -> "B": a CHANGE, not a null-compare drop
    ).toDF("k", "status", "v")
    val neu = Seq(
      (1L, Some("A"), 10.0),
      (2L, Some("A"), 11.0),
      (4L, Some("A"), 10.0),  // added
      (5L, Some("B"), 10.0)
    ).toDF("k", "status", "v")
    val got = History.snapshotDiff(old, neu, "k", Seq("status", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "changed"))
  }
}
