package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Data-layout row-group skipping: sorting within files by the dominant
  * filter column lets parquet min/max statistics prune row groups, so a
  * selective scan READS less — the layout-side half of predicate
  * pushdown, and at 100 TB the difference between touching 1% and 100%
  * of a table. Evidence: the same filter over the same rows emits fewer
  * rows from the scan node (post-rowgroup-skip, pre-Spark-filter) when
  * the file is sorted.
  */
class LayoutSkippingSpec extends SparkSpec {

  test("sortWithinPartitions on the filter column prunes parquet row groups") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-layout")
    val rows = (0 until 200000).map(i => (i.toLong, i % 1000, s"payload-$i"))
      .toDF("k", "bucket", "payload")
    // small row groups so a single file has many prunable units
    val sortedOut = base.resolve("sorted").toString
    val shuffledOut = base.resolve("shuffled").toString
    rows.orderBy(col("k")).coalesce(1)
      .write.option("parquet.block.size", 64 * 1024).parquet(sortedOut)
    rows.orderBy(col("bucket"), col("k")).coalesce(1) // k-order destroyed
      .write.option("parquet.block.size", 64 * 1024).parquet(shuffledOut)

    def scannedRows(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("k").between(1000, 1999))
      assert(df.count() === 1000)
      val scan = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head
      df.collect()
      scan.metrics("numOutputRows").value
    }

    val sorted = scannedRows(sortedOut)
    val shuffled = scannedRows(shuffledOut)
    assert(sorted < shuffled / 4,
      s"sorted layout should skip most row groups: sorted=$sorted shuffled=$shuffled")
  }
}
