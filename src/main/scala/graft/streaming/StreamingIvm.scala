package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sinks.{Generations, Pointers}

/** Event-time streaming IVM — the EX5 × IVM composition: a Structured
  * Streaming source drives a MAINTAINED windowed aggregate that lives in
  * a [[Generations]] table (queryable, time-travelable, exactly-once)
  * instead of the state store.
  *
  * Per micro-batch, inside `foreachBatch`:
  *
  *  1. WATERMARK-DROP — rows older than `high-mark − lateness` are
  *     dropped. The high-mark (max admitted event time) is a committed
  *     O(1) [[Pointers]] value under the log table, NOT Spark streaming
  *     state: a restart replays the batch against the same committed
  *     mark, so admission is deterministic across crash/replay, and a
  *     batch-mode backfill (the oracle-gated `mv_stream_hourly_revenue`
  *     shape) runs the SAME code with no streaming runtime at all.
  *  2. APPEND — the admitted rows, bucketed to their event-time window
  *     start, append to a Generations LOG table under `batch=<id>`: the
  *     replay witness makes a re-delivered micro-batch a no-op append
  *     (exactly-once ingestion, `Generations.appendCommitted`).
  *  3. MAINTAIN — [[ChangeFeed.maintainAggOnceLog]] advances the view by
  *     the committed window delta only; its `=cdcv=<version>` watermark
  *     + expectedBase CAS give exactly-once view maintenance even under
  *     concurrent or replayed ticks.
  *
  * Scale shape (100 TB/day posture): per-tick work is delta-bounded
  * (batch filter + delta groupBy + key-join on the view, all shuffling
  * on the view key); the watermark read/update is one tiny pointer; the
  * log is foldable by `Generations.maintain` without disturbing the
  * view's watermark; lateness bounds how far back a bucket can reopen,
  * so view churn stays bounded exactly like a state-store watermark —
  * but the state itself is a queryable table, not executor memory.
  */
object StreamingIvm {

  private val WmPointer = "event_watermark"

  /** Committed event-time high-mark of the log (micros), if any. */
  def highMark(spark: SparkSession, logTable: String): Option[Long] = {
    val dir = new Path(logTable, "_stream")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Pointers.read(fs, dir, WmPointer).map(_.trim.toLong)
  }

  /** One micro-batch of the maintained windowed aggregate: watermark-
    * drop → idempotent log append → exactly-once view advance. Returns
    * the view commit (None when everything was already applied — e.g. a
    * foreachBatch replay).
    *
    * `batch` needs `tsCol` (TIMESTAMP) + `keyCols` + `sumCol`; the view
    * holds (`bucket`, keyCols…, `sum_value`, `n`) with `sum_value`
    * maintained decimal-exact (retraction-safe at any magnitude — the
    * mv_cdc convention; cast at emission, not in state).
    */
  def ingestBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      logTable: String, mvTable: String,
      tsCol: String = "ts", keyCols: Seq[String] = Seq("event_type"),
      sumCol: String = "value", bucketWidth: String = "1 hour",
      lateness: String = "2 hours",
      slide: Option[String] = None): Option[Generations.Commit] = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(lateness))
    require(iv.months == 0, s"lateness must be fixed-length: '$lateness'")
    val latenessMicros = iv.days * 86400000000L + iv.microseconds
    val mark = highMark(spark, logTable)
    val admitted = mark match {
      case Some(w) =>
        batch.filter(unix_micros(col(tsCol)) >= w - latenessMicros)
      case None => batch // first data: everything is on time
    }
    // SLIDING windows generalize for free: window(ts, w, slide) in a
    // projection explodes each row into its w/slide covering windows
    // (Catalyst's TimeWindowing Expand), so the log simply carries one
    // row per (event, covering bucket) and the maintenance below is
    // unchanged — overlap is a data-shape concern, not a new operator.
    val win = slide match {
      case Some(s) => window(col(tsCol), bucketWidth, s)
      case None => window(col(tsCol), bucketWidth)
    }
    val bucketed = admitted.select(
      win.getField("start").as("bucket") +:
        (keyCols.map(col) :+
          col(sumCol).cast("decimal(18,4)").as("_v") :+
          col(tsCol).as("_ts")): _*)
    val appended = Generations.appendCommitted(spark, bucketed.drop("_ts"),
      logTable, s"batch=$batchId")
    if (appended.nonEmpty) {
      // advance the committed high-mark from the ADMITTED rows (never
      // from dropped ones). Monotonic max ∘ max is idempotent, so a
      // crash between append and pointer update just re-writes the same
      // value on replay.
      val mx = bucketed.agg(max(unix_micros(col("_ts")))).head()
      if (!mx.isNullAt(0)) {
        val dir = new Path(logTable, "_stream")
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val next = math.max(mark.getOrElse(Long.MinValue), mx.getLong(0))
        Pointers.replace(fs, dir, WmPointer, next.toString)
      }
    }
    ChangeFeed.maintainAggOnceLog(spark, logTable, mvTable,
      "bucket" +: keyCols, Map("sum_value" -> "_v"), "n") { log =>
      log.groupBy(("bucket" +: keyCols).map(col): _*)
        .agg(sum(col("_v")).as("sum_value"), count(lit(1)).as("n"))
    }
  }

  /** The streaming entry: `readStream` source → `foreachBatch` →
    * [[ingestBatch]]. Checkpointed micro-batch ids + the `batch=<id>`
    * replay witness give end-to-end exactly-once into the view.
    */
  def start(events: DataFrame, logTable: String, mvTable: String,
      checkpoint: String,
      tsCol: String = "ts", keyCols: Seq[String] = Seq("event_type"),
      sumCol: String = "value", bucketWidth: String = "1 hour",
      lateness: String = "2 hours"): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        ingestBatch(batch.sparkSession, batch.toDF(), id, logTable, mvTable,
          tsCol, keyCols, sumCol, bucketWidth, lateness)
        ()
      }
      .start()
}
