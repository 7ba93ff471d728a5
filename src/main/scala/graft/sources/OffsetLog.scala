package graft.sources

import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.model.Schemas

/** Partitioned offset-log [[TaskChannel]] — the Kafka-semantics transport
  * (reference K1/K2: SQS, `data_harvester.py:38`,
  * `data_downloader.py:210-216`), built on files so it runs with zero
  * broker dependencies while keeping the exact consumption model a real
  * Kafka deployment would have. The mapping is 1:1: channel partition =
  * topic partition, segment file = record batch, [[commit]] = consumer
  * group offset commit — swapping in `spark.readStream.format("kafka")`
  * changes only this class.
  *
  * Model:
  *  - `nPartitions` partitions; a task's partition is `hash(ID) mod n`,
  *    so one source's tasks stay totally ordered (Kafka key semantics).
  *  - Each partition is an append-only sequence of immutable segment
  *    files `p<k>/seg-<startOffset>-<count>.jsonl`; records carry their
  *    explicit `_partition` and contiguous per-partition `_offset`.
  *  - Consumer groups own committed next-offsets (`_groups/<g>/p<k>`,
  *    one tiny single-object file each — atomic on object stores too).
  *    [[dequeue]] returns records at/after the group's offsets WITHOUT
  *    consuming; [[commit]] is the explicit ack. A crash between the two
  *    redelivers — at-least-once, the reference's SQS model.
  *
  * Scale posture: enqueue is one Spark job (repartition by channel
  * partition + partitioned write) regardless of batch size; dequeue
  * prunes whole segments below the committed offset from the LISTING
  * (never opens them) and reads the rest as a distributed JSON scan. The
  * only driver-side state is O(nPartitions) high-water marks and offset
  * files. Single producer per channel by contract (brokers serialize
  * appends; here the harvester is the one producer).
  */
case class OffsetLogChannel(dir: String, nPartitions: Int = 4,
    group: String = "main") extends TaskChannel {
  require(nPartitions >= 1, "need at least one partition")

  import OffsetLogChannel._

  private def partDir(k: Int): JPath = Paths.get(dir, s"p$k")
  private def groupDir: JPath = Paths.get(dir, "_groups", group)

  /** Per-partition high-water mark (next offset to assign) from the
    * segment listing alone — names carry (start, count).
    */
  private def hwm(k: Int): Long = segments(partDir(k))
    .map { case (_, start, count) => start + count }
    .foldLeft(0L)(math.max)

  /** The group's committed next-offset for partition k (0 = from start). */
  private def committed(k: Int): Long = {
    val f = groupDir.resolve(s"p$k")
    if (Files.exists(f)) new String(Files.readAllBytes(f), "UTF-8").trim.toLong
    else 0L
  }

  override def enqueue(tasks: DataFrame): Unit = {
    val spark = tasks.sparkSession
    val cols = Seq("ID", "URL", "TYPE", "PATTERN", "UTC")
    val normalized = tasks
      .withColumn("attempts", coalesce(
        tasks.columns.find(_ == "attempts").map(col)
          .getOrElse(lit(null).cast("int")), lit(0)))
      .select((cols.map(col) :+ col("attempts")): _*)
      .withColumn("_partition",
        pmod(xxhash64(col("ID")), lit(nPartitions.toLong)).cast("int"))
    val bases = typedLit((0 until nPartitions).map(k => k -> hwm(k)).toMap)
    val w = Window.partitionBy("_partition")
      .orderBy("ID", "URL", "PATTERN")
    val withOffsets = normalized
      .withColumn("_offset",
        element_at(bases, col("_partition")) + row_number().over(w) - 1)
      // partitionBy drops its column from the data files; clone it so the
      // records themselves stay self-describing
      .withColumn("_pdir", col("_partition"))
    // Single producer by contract, so any surviving staging dir is a
    // dead producer's debris — clean it so crashes can't accumulate
    // garbage. A crash mid-publish leaves SOME partitions' segments
    // visible (a partial batch): the producer's retry then re-enqueues
    // the whole batch under fresh offsets — duplicate tasks, which is
    // the at-least-once contract (Kafka without idempotent-producer);
    // the D1 dup guard downstream is what absorbs redelivery.
    listFiles(Paths.get(dir))
      .filter(_.getFileName.toString.startsWith(".staging-"))
      .foreach(rmTree)
    val staging = Paths.get(dir,
      s".staging-${java.util.UUID.randomUUID.toString.take(8)}")
    withOffsets.repartition(nPartitions, col("_pdir"))
      .write.partitionBy("_pdir").json(staging.toString)
    // publish: one single-file rename per partition (atomic-equivalent on
    // object stores; the segment is invisible until complete)
    (0 until nPartitions).foreach { k =>
      val stagedDir = staging.resolve(s"_pdir=$k")
      if (Files.isDirectory(stagedDir)) {
        val parts = listFiles(stagedDir).filter(_.getFileName.toString
          .startsWith("part-"))
        require(parts.size <= 1, s"one staged file per partition, got $parts")
        parts.foreach { f =>
          val rows = countJsonLines(f)
          if (rows > 0) {
            Files.createDirectories(partDir(k))
            val seg = partDir(k).resolve(f"seg-${hwm(k)}%016d-$rows%d.jsonl")
            Files.move(f, seg, StandardCopyOption.ATOMIC_MOVE)
          }
        }
      }
    }
    rmTree(staging)
  }

  /** Records the group has not committed past, with their offsets —
    * ordered (partition, offset), capped at `max` (≤ 0 = everything).
    * Does NOT consume: re-polling without [[commit]] redelivers.
    */
  def dequeueWithOffsets(spark: SparkSession, max: Int = 5): DataFrame = {
    val pending = (0 until nPartitions).flatMap { k =>
      val next = committed(k)
      segments(partDir(k)).collect {
        case (f, start, count) if start + count > next => f.toString
      }
    }
    val empty = spark.createDataFrame(
      new java.util.ArrayList[Row](), recordSchema)
    if (pending.isEmpty) return empty
    val nexts = typedLit((0 until nPartitions).map(k => k -> committed(k)).toMap)
    // corrupt segment lines (torn/bit-rotted files) are excluded, same
    // as Queue.dequeue: never surface phantom null records
    val df = Queue.parseTaskLines(spark.read.text(pending: _*), readSchema)
      .filter(col(Schemas.taskCorruptCol).isNull)
      .select(recordSchema.fieldNames.toSeq.map(col): _*)
      .filter(col("_offset") >= element_at(nexts, col("_partition")))
      .orderBy("_partition", "_offset")
    if (max > 0) df.limit(max) else df
  }

  override def dequeue(spark: SparkSession, max: Int = 5): DataFrame =
    dequeueWithOffsets(spark, max).select(
      Schemas.task.fieldNames.map(col).toSeq: _*)

  /** Ack: advance the group's offsets past every record of `consumed`
    * (a [[dequeueWithOffsets]] frame). Single-object write per partition.
    */
  def commit(consumed: DataFrame): Unit = {
    val tops = consumed.groupBy(col("_partition"))
      .agg(max(col("_offset")).as("top"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1) + 1))
    Files.createDirectories(groupDir)
    tops.foreach { case (k, next) =>
      if (next > committed(k)) {
        val tmp = groupDir.resolve(s".p$k.tmp")
        Files.write(tmp, s"$next\n".getBytes("UTF-8"))
        Files.move(tmp, groupDir.resolve(s"p$k"),
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      }
    }
  }

  /** Consumer lag, the Kafka monitoring primitive: per partition, the
    * high-water mark, this group's committed next-offset, and their
    * difference (records enqueued but not yet acked). Listing-only —
    * no segment is opened.
    */
  def lag(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until nPartitions).map { k =>
      val h = hwm(k); val c = committed(k)
      (k, h, c, h - c)
    }.toDF("partition", "hwm", "committed", "lag")
  }

  /** Retention maintenance: delete segments every group in `groups` has
    * committed past (segment end ≤ each group's next-offset). Deletion
    * only — idempotent, and offsets are never renumbered, so in-flight
    * consumers are unaffected. The remaining log is bounded by the
    * slowest group's lag, exactly Kafka's min-committed retention. The
    * newest segment of a partition is never pruned even when fully
    * consumed: its name is the listing-derived high-water mark, and
    * deleting it would reset offset assignment onto already-committed
    * ranges (records silently invisible to every caught-up group).
    * Groups default to every group that has ever committed (discovered
    * from `_groups/`) — a consumer that exists but has NOT yet made its
    * first commit is invisible to discovery (exactly Kafka's situation
    * before a group's first offset commit) and must be passed
    * explicitly, or it will see only post-prune records.
    * @return number of segment files deleted
    */
  def pruneConsumed(groupsArg: Seq[String] = Seq.empty): Int = {
    val groups =
      if (groupsArg.nonEmpty) groupsArg
      else OffsetLogChannel.listFiles(Paths.get(dir, "_groups"))
        .filter(Files.isDirectory(_)).map(_.getFileName.toString)
    require(groups.nonEmpty,
      "no committed groups discovered and none given — nothing to retain for")
    (0 until nPartitions).map { k =>
      val minNext = groups.map { g =>
        val f = Paths.get(dir, "_groups", g, s"p$k")
        if (Files.exists(f))
          new String(Files.readAllBytes(f), "UTF-8").trim.toLong
        else 0L
      }.min
      val segs = segments(partDir(k))
      val consumed = segs.takeWhile {
        case (_, start, count) => start + count <= minNext
      }
      val drop = // keep the hwm witness
        if (consumed.size == segs.size) consumed.dropRight(1) else consumed
      drop.foreach { case (f, _, _) => Files.deleteIfExists(f) }
      drop.size
    }.sum
  }

  /** Streaming consumption: file source over the segment files; the
    * Structured Streaming checkpoint is the group offset (exactly the
    * Kafka-source arrangement). `maxFilesPerTrigger` bounds a micro-batch
    * in segments, the poll-cap analog.
    */
  override def dequeueStream(spark: SparkSession,
      maxPerTrigger: Int = 5): DataFrame = {
    (0 until nPartitions).foreach(k => Files.createDirectories(partDir(k)))
    Queue.parseTaskLines(
      spark.readStream
        .option("maxFilesPerTrigger", maxPerTrigger)
        .option("pathGlobFilter", "seg-*.jsonl")
        .text(Paths.get(dir, "p*").toString),
      readSchema)
      .filter(col(Schemas.taskCorruptCol).isNull)
      .select(Schemas.task.fieldNames.map(col).toSeq: _*)
  }
}

object OffsetLogChannel {

  /** Task schema + the log record's transport fields. */
  val recordSchema: StructType = StructType(Schemas.task.fields ++ Seq(
    StructField("_partition", IntegerType),
    StructField("_offset", LongType)))

  /** [[recordSchema]] + the corrupt-record capture column (read-side). */
  private val readSchema: StructType = StructType(recordSchema.fields :+
    StructField(Schemas.taskCorruptCol, org.apache.spark.sql.types.StringType))

  private val SegName = """seg-(\d{16})-(\d+)\.jsonl""".r

  /** (file, startOffset, count) per segment, offset-ordered. */
  private def segments(p: JPath): Seq[(JPath, Long, Long)] =
    listFiles(p).flatMap { f =>
      f.getFileName.toString match {
        case SegName(start, count) => Some((f, start.toLong, count.toLong))
        case _                     => None
      }
    }.sortBy(_._2)

  private def listFiles(p: JPath): Seq[JPath] =
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toSeq
      } finally s.close()
    }

  private def countJsonLines(f: JPath): Long = {
    val s = Files.lines(f)
    try s.filter(l => !l.isBlank).count() finally s.close()
  }

  private def rmTree(p: JPath): Unit = if (Files.exists(p)) {
    val s = Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      s.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
    } finally s.close()
  }
}
