package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Curation

/** Streaming curation: quality gate + watermarked exact dedup + split as
  * one incremental pipeline (the ingest half of the lambda split; the
  * near-dup pass stays batch — see Curation.curateStream).
  */
class CurationStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming curation gates quality, dedups across micro-batches, splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val goodText = "the quick brown fox jumps over the lazy dog again and again for fun"
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")

    val q = Curation.curateStream(docs, minTokens = 10, minQuality = 0.5)
      .select("doc_id", "split")
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append).start()

    input.addData((ts("2024-01-01 10:00:00"), 1L, goodText))
    q.processAllAvailable()
    // batch 2: a low-quality doc (too few tokens) and an exact duplicate
    // of doc 1 — both must be dropped; one fresh good doc survives
    input.addData(
      (ts("2024-01-01 10:10:00"), 2L, "too short"),
      (ts("2024-01-01 10:11:00"), 3L, goodText),
      (ts("2024-01-01 10:12:00"), 4L, goodText + " with a different ending entirely"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("curated").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet === Set(1L, 4L),
      s"quality-failing doc 2 and duplicate doc 3 must be dropped: $rows")
    assert(rows.values.forall(s => s == "train" || s == "eval"))
  }
}
