package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.EventStreams

/** Runnable demo of the streaming event-time operators over the driver's
  * events table: replays `events.parquet` as a file stream (one batch),
  * runs the watermarked tumbling + session aggregations, prints summaries.
  * Usage: `runMain graft.StreamDemo [sfDir]`.
  */
object StreamDemo {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // replay the batch table as a stream (schema from the batch read,
    // ts normalization identical to Tables.load)
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // FileStreamSource needs a directory: stream the sf dir with a glob
    val events = Tables.normalizeTs(spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir))

    val tq = EventStreams.tumblingCounts(events, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    tq.awaitTermination()

    val sq = EventStreams.sessionCounts(events, "30 minutes", "2 hours")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()

    // Append mode emits only watermark-finalized windows; a single
    // AvailableNow replay finalizes all but the last ~watermark of data.
    val t = spark.table("tumbling")
    val s = spark.table("sessions")
    println(s"tumbling windows emitted: ${t.count()}")
    t.orderBy(desc("n")).show(5, truncate = false)
    println(s"sessions emitted: ${s.count()}")
    s.groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions")).show(5)
    // Changelog tailer: a Generations table's change feed drained into a
    // downstream sink table, the sink's own tag as the cursor (one
    // commit = state + offset, exactly-once). Kill the loop anywhere
    // and rerun: no loss, no double-apply — ChangeFeedSpec proves it.
    val work = java.nio.file.Files.createTempDirectory("graft-tail")
    val srcT = s"$work/facts"; val sinkT = s"$work/facts_changes"
    import spark.implicits._
    import graft.sinks.Generations
    import graft.streaming.ChangeFeed
    Generations.writeAndCommit(spark,
      Seq((1L, 5L), (2L, 7L)).toDF("k", "v"), srcT)
    ChangeFeed.tailOnce(spark, srcT, Seq("k"), sinkT)
    Generations.writeAndCommit(spark,
      Seq((1L, 6L), (3L, 1L)).toDF("k", "v"), srcT) // update + delete + insert
    ChangeFeed.tailOnce(spark, srcT, Seq("k"), sinkT)
    println("== changelog sink after two tailer ticks ==")
    Generations.readLog(spark, sinkT).get
      .orderBy("k", "_change_type").show(truncate = false)
    println("consumed through source v" +
      Generations.lastAppendId(spark, sinkT, "cdc").get)
    spark.stop()
  }
}
