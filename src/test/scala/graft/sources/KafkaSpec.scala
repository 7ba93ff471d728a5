package graft.sources

import graft.SparkSpec

/** [[KafkaChannel]] is a compile-checked, deploy-time-dependency
  * transport: the sandbox has no `spark-sql-kafka-0-10` jar and no
  * network egress, so these tests pin the DOCUMENTED failure mode (the
  * provider lookup, not some later surprise) and the parts that are
  * provider-independent. The consumption-model semantics themselves are
  * pinned by ChannelSpec/OffsetLog — a deployment that adds the
  * connector jar changes nothing but the classpath.
  */
class KafkaSpec extends SparkSpec {
  import spark.implicits._

  private val chan = KafkaChannel("broker-1:9092,broker-2:9092", "graft-tasks")

  test("constructing the channel needs no Kafka classes on the classpath") {
    // the TaskChannel surface is fully formed pre-provider-lookup
    assert(chan.bootstrapServers.startsWith("broker-1"))
    assert(chan.topic === "graft-tasks")
    val asChannel: TaskChannel = chan
    assert(asChannel.isInstanceOf[Serializable])
  }

  test("without the connector jar, use fails at provider lookup — documented") {
    val tasks = Seq(("s-1", "file:///x", "DIRECT", "p", "0", 0))
      .toDF("ID", "URL", "TYPE", "PATTERN", "UTC", "attempts")
    val e1 = intercept[Exception] { chan.enqueue(tasks) }
    assert(e1.getMessage.toLowerCase.contains("kafka"),
      s"expected the kafka data-source lookup failure, got: ${e1.getMessage}")
    val e2 = intercept[Exception] { chan.dequeue(spark).count() }
    assert(e2.getMessage.toLowerCase.contains("kafka"))
    // the failure is DATA_SOURCE_NOT_FOUND (classpath), not a connection
    // attempt — zero-egress sandboxes never reach a broker
    assert(e1.getMessage.toLowerCase.contains("failed to find")
      || e1.getMessage.contains("DATA_SOURCE_NOT_FOUND"))
  }
}
