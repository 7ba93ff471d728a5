package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Kafka-backed [[TaskChannel]] — the production transport whose exact
  * consumption model [[OffsetLogChannel]] pins (key-hash partitions,
  * per-partition offsets, consumer-group commits, at-least-once).
  *
  * COMPILE-CHECKED, DEPLOY-TIME DEPENDENCY. This class uses only the
  * string-resolved data-source API (`format("kafka")` + options), which
  * compiles against spark-sql alone: Spark looks the provider up at
  * RUNTIME via `DataSource.lookupDataSource`. The sandbox this library
  * is built in has no `spark-sql-kafka-0-10` jar and zero network
  * egress (PLANS.md round-10), so the provider is genuinely absent
  * here: constructing the channel works everywhere, but the first
  * enqueue/dequeue without the connector on the classpath fails with
  * Spark's standard "Failed to find data source: kafka" analysis error
  * (KafkaSpec asserts exactly that failure mode, so the gap is a pinned
  * contract rather than a surprise). Deployments add the connector jar
  * matching their Spark version (`spark-sql-kafka-0-10_2.13`) — no code
  * change, same [[TaskChannel]] surface the pipeline already runs
  * against through [[DirectoryChannel]]/[[OffsetLogChannel]].
  *
  * Semantics mapping (all pinned by ChannelSpec against the offset-log
  * twin):
  *  - enqueue → `df.write.format("kafka")`: task rows serialize to the
  *    harvester's message JSON (`to_json` over the task schema) in
  *    `value`; `key` = task ID, so a partition preserves per-source
  *    order exactly like [[OffsetLog]]'s key-hash routing.
  *  - dequeue (batch) → `read.format("kafka")` over
  *    `startingOffsets=earliest`; the poll cap is a `limit`. PINNED
  *    SEMANTIC DIVERGENCE: this is a NON-CONSUMING PEEK, not a claim.
  *    Spark's batch Kafka source tracks no consumed offset (no group
  *    commit, no checkpoint), so every batch dequeue re-reads the topic
  *    from earliest and the `limit` keeps an engine-chosen subset —
  *    repeated batch dequeues redeliver head rows, unlike
  *    [[DirectoryChannel]]/[[OffsetLogChannel]] whose batch dequeue
  *    claims. Use [[dequeueStream]] (checkpointed, exactly the channel
  *    ack model) for consuming reads; batch dequeue is for inspection
  *    and tests. (Offset-tracked batch consumption would need the
  *    connector present to resolve end offsets — unverifiable in this
  *    sandbox, so the peek contract is pinned rather than half-built.)
  *  - dequeueStream → `readStream.format("kafka")` with
  *    `maxOffsetsPerTrigger` as the per-trigger cap; the CONSUMER GROUP
  *    COMMIT is the Structured Streaming checkpoint (Spark's Kafka
  *    source tracks offsets itself — the group.id is for quota/ACLs,
  *    not progress), which is exactly the ack model the pipeline
  *    already uses (E3: checkpoint-as-commit-point).
  *  - malformed values: parsed with the same corrupt-record pattern as
  *    every other task read path — dropped from the task stream, never
  *    phantom null tasks.
  */
case class KafkaChannel(bootstrapServers: String, topic: String)
    extends TaskChannel {

  private def taskCols = Schemas.task.fieldNames.toSeq.map(col)

  /** The value-bytes → task-rows decode shared by both read paths. */
  private def decode(kafkaRows: DataFrame): DataFrame =
    kafkaRows
      .select(col("value").cast("string").as("value"))
      .filter(length(col("value")) > 0)
      .select(from_json(col("value"), Schemas.taskWithCorrupt,
        Map("columnNameOfCorruptRecord" -> Schemas.taskCorruptCol)).as("r"))
      .select(col("r.*"))
      .filter(col(Schemas.taskCorruptCol).isNull)
      .select(taskCols: _*)

  override def enqueue(tasks: DataFrame): Unit =
    tasks
      // same attempts-default rule as Queue.enqueue: harvest output has
      // no attempts column yet, redeliveries carry one
      .withColumn("attempts", coalesce(
        tasks.columns.find(_ == "attempts").map(col)
          .getOrElse(lit(null).cast("int")), lit(0)))
      .select(col("ID").cast("string").as("key"),
        to_json(struct(Schemas.task.fieldNames.toSeq.map(col): _*)).as("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()

  /** Non-consuming peek — see the class doc's pinned divergence; use
    * [[dequeueStream]] for consuming (claim-semantics) reads.
    */
  override def dequeue(spark: SparkSession, max: Int = 5): DataFrame = {
    val df = decode(spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load())
    if (max > 0) df.limit(max) else df
  }

  override def dequeueStream(spark: SparkSession,
      maxPerTrigger: Int = 5): DataFrame =
    decode(spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxPerTrigger.toLong)
      .load())
}
