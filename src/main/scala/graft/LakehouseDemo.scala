package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.{Compact, Generations}
import graft.sources.OffsetLogChannel
import graft.streaming.TxnSink

/** Runnable end-to-end demo of the lakehouse/transport tier added on top
  * of the reference dataflow: tasks flow through the Kafka-model offset
  * log (consumer-group commits, lag, retention), results land through
  * the exactly-once foreachBatch sink into a generation log table, and
  * the table then exercises the full pointer-file lifecycle — squash,
  * MERGE INTO, time travel, generational compaction — with every commit
  * object-store-safe (no directory renames anywhere).
  * Usage: `runMain graft.LakehouseDemo [workDir]`.
  */
object LakehouseDemo {

  def main(args: Array[String]): Unit = {
    val work = Paths.get(args.headOption.getOrElse(
      Files.createTempDirectory("graft-lakehouse").toString))
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 1. Kafka-model transport: enqueue two task batches, consume with a
    //    group, commit, show lag + retention pruning.
    val chan = OffsetLogChannel(s"$work/queue", nPartitions = 2, group = "demo")
    def batch(from: Int, n: Int) =
      (from until from + n).map(i =>
        (s"s-$i", s"file:///artifact/$i", "DIRECT", s"a$i.bin", "0", 0))
        .toDF("ID", "URL", "TYPE", "PATTERN", "UTC", "attempts")
    chan.enqueue(batch(1, 4))
    chan.enqueue(batch(10, 3))
    println("== offset-log lag before consuming ==")
    chan.lag(spark).show()
    val polled = chan.dequeueWithOffsets(spark, max = 0)
    println(s"consumed ${polled.count()} tasks; committing")
    chan.commit(polled)
    chan.lag(spark).show()
    println(s"retention pruned ${chan.pruneConsumed(Seq("demo"))} segments")

    // 2. Exactly-once sink: stream micro-batches into a generation log
    //    table; a replayed batchId is a durable no-op.
    val table = s"$work/events_table"
    val in = work.resolve("in"); Files.createDirectories(in)
    Files.writeString(in.resolve("a.json"),
      "{\"k\":1,\"v\":\"alpha\"}\n{\"k\":2,\"v\":\"beta\"}\n")
    def drain(): Unit = spark.readStream.schema("k INT, v STRING")
      .json(in.toString).writeStream
      .option("checkpointLocation", s"$work/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch(TxnSink.parquetLog(table)).start().awaitTermination()
    drain()
    TxnSink.parquetLog(table)(Seq((1, "alpha"), (2, "beta")).toDF("k", "v"), 0L)
    println(s"== log table after drain + simulated batch-0 replay " +
      s"(no dupes) == rows=${Generations.readLog(spark, table).get.count()}")
    Files.writeString(in.resolve("b.json"), "{\"k\":3,\"v\":\"gamma\"}\n")
    drain()

    // 3. Lifecycle: squash the log, MERGE a CDC changeset, time-travel,
    //    then read the change feed BACK out of the commit history.
    val squashed = Generations.squash(spark, table).get
    println(s"squashed at v${squashed.version} (${squashed.rows} rows)")
    val changes = Seq((2, "BETA", false), (3, "", true), (4, "delta", false))
      .toDF("k", "v", "_deleted")
    val merged = Generations.mergeAndCommit(spark, table, changes, Seq("k"))
    println(s"== merged v${merged.version} ==")
    Generations.read(spark, table).get.orderBy("k").show()
    println(s"== time travel back to v${squashed.version} ==")
    Generations.readAt(spark, table, squashed.version).get.orderBy("k").show()
    println(s"== change feed v${squashed.version} -> v${merged.version} " +
      "(Merge.diff over the two committed snapshots) ==")
    Generations.changesBetween(spark, table, squashed.version, merged.version,
      Seq("k")).get.orderBy("k").show()
    val (b, a) = Compact.compactGenerations(spark, table)
    println(s"compaction: $b files -> $a; commits now: " +
      Generations.commits(spark, table).map(c => s"v${c.version}[${c.tag}]")
        .mkString(", "))

    // 4. Catalog-consistent maintained view: each source delta and its
    //    incrementally-maintained aggregate advance in ONE root commit —
    //    a catalog reader can never observe the source ahead of the view.
    val root = s"$work/catalog"
    val aggOf: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.groupBy("grp").agg(
        sum(col("v")).as("sum_v"), count(lit(1)).as("n"),
        max(col("v")).as("max_v"))
    def step(rows: (Long, Long, Long, Boolean)*): Unit =
      graft.streaming.ChangeFeed.transactMaintainAgg(spark, root,
        "facts", Seq("k"),
        rows.toDF("k", "grp", "v", "_deleted")
          .withColumn("v", col("v").cast("decimal(18,4)")),
        "facts_agg", Seq("grp"), Map("sum_v" -> "v"), "n",
        maxCols = Map("max_v" -> "v"))(aggOf)
    step((1, 10, 9, false), (2, 10, 5, false), (3, 20, 1, false))
    step((1, 10, 9, true), (4, 20, 7, false)) // retracts grp 10's max
    println("== catalog-consistent maintained view (max re-aggregated " +
      "from the dirty group only) ==")
    graft.sinks.Catalog.readTable(spark, root, "facts_agg").get
      .orderBy("grp").show()
    println("roots: " + graft.sinks.Catalog.roots(spark, root)
      .map(rc => s"v${rc.version}{${rc.tables.keys.toSeq.sorted.mkString(",")}}")
      .mkString(", "))

    // 5. Multi-table IVM: an aggregate OVER A JOIN maintained from both
    //    inputs' change feeds (signed delta join), exactly-once under
    //    the version-pair watermark riding the view's own commit — and
    //    a COUNT DISTINCT view via its retraction-maintained support.
    val ordersT = s"$work/orders"; val custT = s"$work/cust"
    val joinMv = s"$work/rev_by_grp"; val support = s"$work/cust_support"
    def ordRows(rows: (Long, Long, Long)*) =
      rows.toDF("ok", "ck", "v").withColumn("v", col("v").cast("decimal(18,4)"))
    Generations.writeAndCommit(spark, ordRows((100, 1, 5), (101, 2, 7)), ordersT)
    Generations.writeAndCommit(spark,
      Seq((1L, 10L), (2L, 20L)).toDF("ck", "grp"), custT)
    def maintainJoin() = graft.streaming.ChangeFeed.maintainJoinAggOnce(
      spark, ordersT, Seq("ok"), custT, Seq("ck"), Seq("ck"),
      joinMv, Seq("grp"), Map("sum_v" -> "v"), "n") { (o, c) =>
        o.join(c, "ck").groupBy("grp")
          .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))
      }
    maintainJoin()
    // the DIMENSION moves: ck=2 changes group — its revenue must follow
    Generations.writeAndCommit(spark,
      Seq((1L, 10L), (2L, 30L)).toDF("ck", "grp"), custT)
    maintainJoin()
    println("== maintained agg-over-join after a dimension key-move " +
      s"(watermark ${graft.streaming.ChangeFeed.appliedVersions2(spark, joinMv)}) ==")
    Generations.read(spark, joinMv).get.orderBy("grp").show()
    graft.streaming.ChangeFeed.maintainDistinctOnce(spark, ordersT,
      Seq("ok"), support, Seq("ck"), Seq("v"))
    println("== distinct order values per customer (support-table view) ==")
    graft.streaming.ChangeFeed.distinctView(spark, support, Seq("ck")).get
      .orderBy("ck").show()
    spark.stop()
  }
}
