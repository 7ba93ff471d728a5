package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.Generations

/** [[StreamingIvm]] — event-time windowed aggregates maintained in a
  * Generations table: watermark-drop of late rows, exactly-once under
  * batch replay, and the maintained state ≡ fresh aggregate of the
  * admitted rows (the law the driver gate pins at the
  * `mv_stream_hourly_revenue` shape).
  */
class StreamingIvmSpec extends SparkSpec {
  import spark.implicits._

  private def mkDir(name: String): String =
    Files.createTempDirectory("graft-sivm").resolve(name).toString

  private def ts(h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  private def ev(rows: (Long, Timestamp, String, Double)*) =
    rows.toDF("event_id", "ts", "event_type", "value")

  private def state(mv: String): Map[(Timestamp, String), (Long, Double)] =
    Generations.read(spark, mv).get
      .select(col("bucket"), col("event_type"), col("n"),
        col("sum_value").cast("double"))
      .as[(Timestamp, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("late rows within lateness reopen their bucket; older ones drop") {
    val log = mkDir("log"); val mv = mkDir("mv")
    // batch 0: hours 10 and 12 → high-mark 12:30
    StreamingIvm.ingestBatch(spark, ev(
      (1, ts(10), "click", 1.0), (2, ts(12, 30), "click", 2.0)),
      0L, log, mv)
    assert(StreamingIvm.highMark(spark, log)
      .contains(Timestamp.valueOf("2026-01-01 12:30:00").getTime * 1000))
    // batch 1: one row at 11:00 (within 12:30−2h=10:30 → admitted into
    // the closed hour-11 bucket), one at 09:00 (older → DROPPED), one
    // at 13:00 advancing the mark
    StreamingIvm.ingestBatch(spark, ev(
      (3, ts(11), "click", 4.0), (4, ts(9), "click", 100.0),
      (5, ts(13), "buy", 8.0)),
      1L, log, mv)
    assert(state(mv) === Map(
      (ts(10), "click") -> ((1L, 1.0)),
      (ts(11), "click") -> ((1L, 4.0)), // late row landed in its bucket
      (ts(12), "click") -> ((1L, 2.0)),
      (ts(13), "buy") -> ((1L, 8.0))), "9:00 row must be dropped")
    assert(StreamingIvm.highMark(spark, log)
      .contains(Timestamp.valueOf("2026-01-01 13:00:00").getTime * 1000))
  }

  test("a replayed micro-batch is a no-op: exactly-once end to end") {
    val log = mkDir("log"); val mv = mkDir("mv")
    assert(StreamingIvm.ingestBatch(spark,
      ev((1, ts(10), "click", 1.0)), 0L, log, mv).nonEmpty)
    val before = state(mv)
    // the same batch id again (a foreachBatch redelivery after a crash
    // between the sink commit and the checkpoint write)
    assert(StreamingIvm.ingestBatch(spark,
      ev((1, ts(10), "click", 1.0)), 0L, log, mv).isEmpty)
    assert(state(mv) === before, "replay must not double-count")
  }

  test("REAL STREAM: foreachBatch pipeline converges across late data") {
    val log = mkDir("log"); val mv = mkDir("mv")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val q = StreamingIvm.start(
      input.toDF().toDF("event_id", "ts", "event_type", "value"),
      log, mv, mkDir("ckpt"))
    try {
      input.addData((1L, ts(10), "click", 1.0), (2L, ts(12), "click", 2.0))
      q.processAllAvailable()
      input.addData((3L, ts(11), "click", 4.0), // late, admitted
        (4L, ts(8), "click", 50.0)) // too late, dropped
      q.processAllAvailable()
      input.addData((5L, ts(12), "buy", 8.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(state(mv) === Map(
      (ts(10), "click") -> ((1L, 1.0)),
      (ts(11), "click") -> ((1L, 4.0)),
      (ts(12), "click") -> ((1L, 2.0)),
      (ts(12), "buy") -> ((1L, 8.0))))
  }
}
