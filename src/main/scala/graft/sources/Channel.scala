package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable task-queue channel — the enqueue/dequeue surface of the
  * reference's SQS handoff (K1/K2), abstracted so transports swap
  * without touching the pipeline. Two implementations ship:
  * [[DirectoryChannel]] (plain JSON-lines directory) and
  * [[OffsetLogChannel]] (partitioned offset log with Kafka's exact
  * consumption model — key-hash partitions, per-partition offsets,
  * consumer-group commits). A production Kafka deployment drops in
  * `spark.readStream.format("kafka")` + topic/bootstrap config and
  * `to_json`/`from_json` over the same task schema with no change to
  * [[graft.streaming.DownloadPipeline]] — no Kafka dependency is needed
  * until then, and the OffsetLogChannel pins the semantics it must have.
  *
  * Contract: `enqueue` appends task rows durably; `dequeue` returns up
  * to `max` pending tasks (≤ 0 = everything) without consuming them —
  * acknowledgement is the caller's commit point (Structured Streaming
  * checkpoint, or the batch handler's move-to-done/); `dequeueStream`
  * is the streaming form with a per-trigger cap (the poll-cap analog).
  */
trait TaskChannel extends Serializable {
  def enqueue(tasks: DataFrame): Unit
  def dequeue(spark: SparkSession, max: Int = 5): DataFrame
  def dequeueStream(spark: SparkSession, maxPerTrigger: Int = 5): DataFrame
}

/** The directory-backed [[TaskChannel]]: JSON-lines files under
  * `queueDir`, delegating to [[Queue]] (whose semantics the streaming
  * specs pin down).
  */
case class DirectoryChannel(queueDir: String) extends TaskChannel {
  override def enqueue(tasks: DataFrame): Unit = Queue.enqueue(tasks, queueDir)
  override def dequeue(spark: SparkSession, max: Int = 5): DataFrame =
    Queue.dequeue(spark, queueDir, max)
  override def dequeueStream(spark: SparkSession, maxPerTrigger: Int = 5): DataFrame =
    Queue.dequeueStream(spark, queueDir, maxPerTrigger)
}
