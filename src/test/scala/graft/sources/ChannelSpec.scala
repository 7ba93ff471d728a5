package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** TaskChannel contract over the directory implementation: the pipeline
  * sees only the trait, so a Kafka drop-in inherits these semantics.
  */
class ChannelSpec extends SparkSpec {
  import spark.implicits._

  private def tasks(n: Int) =
    (1 to n).map(i => (s"s-$i", s"file:///t$i", "DIRECT", s"p$i.bin", "0", 0))
      .toDF("ID", "URL", "TYPE", "PATTERN", "UTC", "attempts")

  test("enqueue/dequeue round-trips tasks with the <=5 poll cap") {
    val dir = Files.createTempDirectory("graft-chan").toString
    val ch: TaskChannel = DirectoryChannel(s"$dir/q")
    ch.enqueue(tasks(7))
    assert(ch.dequeue(spark).count() === 5) // reference poll cap default
    assert(ch.dequeue(spark, max = 0).count() === 7)
    val ids = ch.dequeue(spark, max = 0).select("ID")
      .collect().map(_.getString(0)).toSet
    assert(ids === (1 to 7).map(i => s"s-$i").toSet)
  }

  test("dequeueStream drains the channel through the streaming source") {
    val dir = Files.createTempDirectory("graft-chan-s").toString
    val ch: TaskChannel = DirectoryChannel(s"$dir/q")
    ch.enqueue(tasks(3))
    val out = s"$dir/out"
    ch.dequeueStream(spark).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", s"$dir/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    assert(spark.read.parquet(out).count() === 3)
  }
}
