package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Directory-backed task queue (reference K1/K2: SQS,
  * `data_harvester.py:38` → `data_downloader.py:210-216`).
  *
  * The queue is a directory of JSON-lines files: enqueue = append-write,
  * dequeue = read (+ `limit` for the reference's ≤5-per-poll cap), ack =
  * Structured Streaming checkpoint (streaming) or moving files to `done/`
  * (batch). A durable directory is Spark's native equivalent of the
  * reference's SQS handoff (SURVEY.md §3.2).
  */
object Queue {

  /** Enqueue task rows: one JSON object per line, append mode. */
  def enqueue(tasks: DataFrame, queueDir: String): Unit = {
    val cols = Seq("ID", "URL", "TYPE", "PATTERN", "UTC")
    tasks
      .withColumn("attempts", coalesce(
        tasks.columns.find(_ == "attempts").map(col)
          .getOrElse(lit(null).cast("int")), lit(0)))
      .select((cols.map(col) :+ col("attempts")): _*)
      .write.mode("append").json(queueDir)
  }

  /** Batch dequeue with the reference's poll cap (≤5/invocation,
    * `data_downloader.py:210-213`); `max <= 0` reads everything.
    */
  def dequeue(spark: SparkSession, queueDir: String, max: Int = 5): DataFrame = {
    val df = spark.read.schema(Schemas.task).json(queueDir)
    if (max > 0) df.limit(max) else df
  }

  /** Streaming dequeue: file source over the queue directory;
    * `maxFilesPerTrigger` bounds each micro-batch like the poll cap.
    */
  def dequeueStream(spark: SparkSession, queueDir: String,
      maxFilesPerTrigger: Int = 5): DataFrame =
    spark.readStream
      .schema(Schemas.task)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(queueDir)
}
