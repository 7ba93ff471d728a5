package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Task

/** Structured Streaming operators over event streams (EX5 streaming forms
  * + the online E4 retry ledger).
  *
  * Watermarks bound state: late rows beyond the watermark are dropped and
  * window state is evicted — the property that keeps these aggregations
  * running indefinitely at 100 TB/day ingest.
  */
object EventStreams {

  /** Tumbling event-time counts with late-data handling. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup (EX3 online form): keep the FIRST occurrence
    * of each content digest; duplicates arriving within the watermark
    * horizon are dropped, and digest state older than the watermark is
    * evicted — bounded state, the property that lets this run forever on
    * a 100 TB/day ingest where an unwatermarked `dropDuplicates` would
    * grow state without bound. Only the 32-byte digest is kept in state,
    * never the document body.
    */
  def dedupStream(docs: DataFrame, tsCol: String = "ts",
      textCol: String = "text", watermark: String = "1 hour"): DataFrame =
    docs.withColumn("content_md5", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_md5")

  /** Session windows (gap-based) per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Stream-stream join: each click joined to the same user's purchases
    * within `horizon` BEFORE the click (time-range condition). Watermarks
    * on both sides bound the join state — without them Spark would buffer
    * both streams forever.
    */
  def clickPurchaseJoin(events: DataFrame, horizon: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") <= col("click_ts") &&
        col("purchase_ts") >= col("click_ts") - expr(s"INTERVAL $horizon"))
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Online E4 retry ledger via mapGroupsWithState: tracks per-task
    * delivery attempts across micro-batches; emits (task, attempts,
    * dead) rows, `dead=true` once attempts reach `maxAttempts` —
    * the stateful-streaming form of the redrive policy
    * (`cloudformation/lambda.cfn.yaml:28-36`).
    */
  case class AttemptState(attempts: Int)
  case class AttemptUpdate(ID: String, attempts: Int, dead: Boolean)

  def attemptLedger(failures: Dataset[Task], maxAttempts: Int = 5)
      : Dataset[AttemptUpdate] = {
    val spark = failures.sparkSession
    import spark.implicits._
    failures
      .groupByKey(_.ID)
      .mapGroupsWithState[AttemptState, AttemptUpdate](
        GroupStateTimeout.NoTimeout) {
        (id: String, rows: Iterator[Task], state: GroupState[AttemptState]) =>
          val prior = state.getOption.map(_.attempts).getOrElse(0)
          val now = prior + rows.size
          state.update(AttemptState(now))
          AttemptUpdate(id, now, now >= maxAttempts)
      }
  }
}
