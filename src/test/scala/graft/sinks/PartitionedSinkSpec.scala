package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** L4 (SURVEY.md §2.1): date-partitioned table layout + partition pruning —
  * the Spark-native form of the reference's described Athena partition
  * registration (`wiki.md:139-141`). Verifies the property that matters at
  * 100 TB: a date-filtered read plans PartitionFilters against the
  * directory layout and never touches other partitions' files.
  */
class PartitionedSinkSpec extends SparkSpec {

  test("date-partitioned write prunes non-matching partitions on read") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-l4").resolve("events_by_date").toString
    val rows = Seq(
      ("2024-01-01 10:00:00", "click", 1.0),
      ("2024-01-01 11:00:00", "view", 2.0),
      ("2024-01-02 09:00:00", "click", 3.0),
      ("2024-01-03 09:00:00", "purchase", 4.0))
      .toDF("ts_s", "event_type", "value")
      .select(to_timestamp(col("ts_s")).as("ts"), col("event_type"), col("value"))
      .withColumn("event_date", to_date(col("ts")))

    rows.coalesce(1).write.partitionBy("event_date").parquet(out)

    // three event_date=... directories on disk
    val dirs = Files.list(java.nio.file.Paths.get(out))
    val partDirs =
      try {
        import scala.jdk.CollectionConverters._
        dirs.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("event_date=")).toList
      } finally dirs.close()
    assert(partDirs.sorted === List(
      "event_date=2024-01-01", "event_date=2024-01-02", "event_date=2024-01-03"))

    val pruned = spark.read.parquet(out)
      .filter(col("event_date") === lit("2024-01-01"))

    // the partition predicate becomes a PartitionFilter (directory-level
    // pruning), not a PushedFilter (row-group-level)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.replaceAll("#\\d+", "").contains("(event_date = 2024-01-01)"), plan)

    // only the matching partition's single file is read (scan metric,
    // measured on the executed plan — 3 files exist on disk)
    val exec = pruned.queryExecution.executedPlan
    assert(exec.executeCollect().length === 2)
    val scan = exec.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.metrics("numFiles").value === 1, scan.metrics("numFiles"))
  }
}
