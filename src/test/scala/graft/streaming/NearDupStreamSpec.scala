package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFns

/** Batch-equivalence proof for the streaming near-dup detector: the
  * streamed candidate pairs (fed across several micro-batches so band
  * state genuinely carries over) must equal the batch LSH answer under
  * the same signature-estimator verification, oriented first-seen-wins.
  */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  // (doc_id, tsSec, text): 1/2 identical (certain dup), 3 a near-variant
  // of 1, 4/5 unrelated, 6 identical to 4 but arriving much later (still
  // inside the window), 7 a repeat of 1 in the LAST batch — cross-batch
  // state must catch it.
  private val fixture: Seq[(Long, Long, String)] = Seq(
    (1L, 1000L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, 2000L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, 3000L, "the quick brown fox jumps over the lazy dog again and once"),
    (4L, 4000L, "completely different content about spark catalyst planning"),
    (5L, 5000L, "yet another unrelated document mentioning parquet row groups"),
    (6L, 6000L, "completely different content about spark catalyst planning"),
    (7L, 7000L, "the quick brown fox jumps over the lazy dog again and again"))

  private val N = 3; private val K = 16; private val BANDS = 4
  private val THRESH = 0.5

  test("streamed near-dup pairs equal the batch LSH answer across micro-batches") {
    implicit val sqlCtx = spark.sqlContext

    // batch analog: band-bucket candidates verified by the same
    // signature estimator, oriented (later, earlier) by (ts, id)
    import graft.functions.expressions.LshBandsExpr
    val base = fixture.toDF("doc_id", "tsSec", "text")
      .select(col("doc_id"), col("tsSec"),
        TextFns.textShingles(col("text"), N).as("sh"))
      .select(col("doc_id"), col("tsSec"),
        TextFns.minhashSignature(col("sh"), K).as("sig"),
        LshBandsExpr.lshBandsNative(col("sh"), K, BANDS).as("bands"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2),
        r.getSeq[String](3)))
    val windowSec = 7200L
    val expected = (for {
      a <- base; b <- base
      if a._2 < b._2 || (a._2 == b._2 && a._1 < b._1)
      if b._2 - a._2 <= windowSec // trailing-window reach
      if a._4.zipWithIndex.exists { case (h, i) => b._4(i) == h }
      sim = a._3.zip(b._3).count { case (x, y) => x == y }.toDouble / K
      if sim >= THRESH
    } yield (b._1, a._1)).toSet

    val input = MemoryStream[(Long, Long, String)]
    val q = NearDupStream.candidatePairs(
        input.toDF().toDF("doc_id", "tsSec", "text")
          .select(col("doc_id"),
            timestamp_seconds(col("tsSec")).as("ts"), col("text")),
        N, K, BANDS, THRESH,
        watermark = "10 minutes", windowMicros = 7200L * 1000000L)
      .writeStream.format("memory").queryName("nddup")
      .outputMode("append").start()
    fixture.grouped(2).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    q.stop()

    val got = spark.sql("SELECT doc_id, dup_of, sig_sim FROM nddup").collect()
    val gotPairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotPairs === expected,
      s"stream pairs != batch analog (expected $expected, got $gotPairs)")
    // orientation: dup_of is always the earlier doc
    got.foreach(r => assert(r.getLong(1) < r.getLong(0)))
    // sanity on the fixture itself: the certain dups surfaced, the
    // unrelated docs did not
    assert(expected.contains((2L, 1L)) && expected.contains((7L, 1L)))
    assert(!expected.exists { case (a, b) =>
      Set(a, b) == Set(4L, 5L) })
    // estimator value: identical docs have identical signatures
    got.filter(r => Set(r.getLong(0)) == Set(2L)).foreach { r =>
      assert(r.getDouble(2) === 1.0)
    }
  }

  test("expired state: a doc past the trailing window stops matching") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    // window of 10 s: doc 11 at t=1, doc 12 (same text) at t=100 — the
    // bucket's entry for 11 is evicted before 12 arrives
    val q = NearDupStream.candidatePairs(
        input.toDF().toDF("doc_id", "tsSec", "text")
          .select(col("doc_id"),
            timestamp_seconds(col("tsSec")).as("ts"), col("text")),
        N, K, BANDS, THRESH,
        watermark = "0 seconds", windowMicros = 10L * 1000000L)
      .writeStream.format("memory").queryName("ndexp")
      .outputMode("append").start()
    input.addData(Seq((11L, 1L, "some repeated content for the eviction test")))
    q.processAllAvailable()
    input.addData(Seq((12L, 100L, "some repeated content for the eviction test")))
    q.processAllAvailable()
    q.stop()
    assert(spark.sql("SELECT * FROM ndexp").count() === 0,
      "evicted entry must not match across the window")
  }
}
