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
}
