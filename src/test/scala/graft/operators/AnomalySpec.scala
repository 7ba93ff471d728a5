package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("rolling z flags a spike against the user's trailing baseline") {
    val base = (1 to 10).map(i => (i.toLong, 1L, ts(i), 100.0))
    val spike = Seq((11L, 1L, ts(11), 500.0))
    // slight jitter so the baseline has nonzero variance
    val jitter = Seq((3L, 1L, ts(3), 101.0), (7L, 1L, ts(7), 99.0))
    val events = (base.filterNot(e => Seq(3L, 7L).contains(e._1)) ++
      jitter ++ spike).toDF("event_id", "user_id", "ts", "value")
    val rows = Anomaly.rollingZ(events, zThresh = 3.0)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(2)), Option(r.get(3)))).toMap
    val (z11, flag11) = rows(11L)
    assert(flag11.contains(true), s"spike should flag: z=$z11")
    assert(z11.exists(_.asInstanceOf[Double] > 3.0))
    // early events: window of 1-2 points → null z, null verdict
    assert(rows(1L)._1.isEmpty && rows(1L)._2.isEmpty)
    assert(rows(2L)._1.isEmpty)
  }

  test("zero-variance window yields null z, not NaN or an error") {
    val events = (1 to 5).map(i => (i.toLong, 1L, ts(i), 42.0))
      .toDF("event_id", "user_id", "ts", "value")
    val rows = Anomaly.rollingZ(events).collect()
    assert(rows.forall(_.isNullAt(2)))
  }

  test("baselines are per-user: another user's spike does not leak") {
    val u1 = (1 to 6).map(i => (i.toLong, 1L, ts(i), if (i % 2 == 0) 10.0 else 11.0))
    val u2 = Seq((100L, 2L, ts(6), 10000.0))
    val events = (u1 ++ u2).toDF("event_id", "user_id", "ts", "value")
    val rows = Anomaly.rollingZ(events).collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    // user 2's single event has no baseline ⇒ null, and user 1's later
    // events are unaffected by the co-temporal u2 spike
    assert(rows(100L).isEmpty)
    assert(rows(6L).exists(z => math.abs(z.asInstanceOf[Double]) < 3.0))
  }

  // madOutliers: u1 = (1,2,3,4,100) → med 3, adev (2,1,0,1,97) → MAD 1;
  // rz(100) = 0.6745·97 = 65.4265 (outlier), rz(1) = −1.349 (not).
  // u2 = (7,7,7,7,50) → MAD 0 (majority identical) → null verdicts.
  // u3 = (1,9) → n < 3 → null verdicts.
  test("madOutliers: modified z-score, MAD=0 and tiny keys yield null") {
    val events = (
      Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex.map { case (v, i) => (i.toLong, 1L, ts(i + 1), v) } ++
      Seq(7.0, 7.0, 7.0, 7.0, 50.0).zipWithIndex.map { case (v, i) => (10L + i, 2L, ts(i + 1), v) } ++
      Seq(1.0, 9.0).zipWithIndex.map { case (v, i) => (20L + i, 3L, ts(i + 1), v) }
    ).toDF("event_id", "user_id", "ts", "value")
    val rows = Anomaly.madOutliers(events).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(4)), Option(r.get(5))))).toMap
    assert(rows(4L) === ((Some(65.4265), Some(true))))   // the u1 spike
    assert(rows(0L) === ((Some(-1.349), Some(false))))
    assert((10L to 14L).forall(id => rows(id)._1.isEmpty)) // MAD = 0
    assert(rows(20L)._1.isEmpty && rows(21L)._1.isEmpty)   // n < 3
  }

  // α=0.3: ewma([10]) = 10; ewma([10,20]) = (10·0.7 + 20)/(1.7)
  // = 15.882353; ewma([10,20,30]) = (4.9 + 14 + 30)/2.19 = 22.328767 —
  // pulled toward the recent value (flat mean would be 20).
  test("ewma weights recent observations and truncates at the window") {
    val events = (1 to 10).map(i => (i.toLong, 1L, ts(i), i * 10.0))
      .toDF("event_id", "user_id", "ts", "value")
    val rows = Anomaly.ewma(events, alpha = 0.3, window = 8).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows(1L) === 10.0)
    assert(rows(2L) === 15.882353)
    assert(rows(3L) === 22.328767)
    // row 10's frame is values 30..100 (window 8): same weights as row
    // 9's frame shifted by +10 ⇒ exactly +10 higher
    assert(math.abs(rows(10L) - rows(9L) - 10.0) < 1e-6)
  }
}
