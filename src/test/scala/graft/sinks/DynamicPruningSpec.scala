package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dynamic partition pruning (DPP) evidence — the join-time analog of the
  * static pruning in PartitionedSinkSpec: when a partitioned fact table is
  * joined to a FILTERED dimension, the partition predicate is not known
  * until runtime, and Catalyst injects a DynamicPruningExpression that
  * evaluates the dim side first and prunes the fact scan to the matching
  * partition directories. At 100 TB this is the difference between
  * scanning the whole fact table and scanning the two partitions the dim
  * filter actually selects — free, but ONLY if the fact layout is
  * partitioned on the join key and the join stays an equi-join.
  */
class DynamicPruningSpec extends SparkSpec {

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.QueryStageExec

  /** Collect file scans, descending into AQE query stages (leaf nodes
    * whose materialized plan hangs off `.plan`, invisible to collect).
    */
  private def fileScans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect {
      case s: FileSourceScanExec => Seq(s)
      case q: QueryStageExec => fileScans(q.plan)
    }.flatten

  test("filtered dim join prunes fact partitions at runtime (DPP)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-dpp").resolve("fact").toString

    // fact: 10 partitions on part_id, several rows each
    (0 until 1000).map(i => (i % 10, i.toLong, i * 1.5))
      .toDF("part_id", "k", "v")
      .coalesce(1).write.partitionBy("part_id").parquet(out)

    // dim: selective filter admits exactly 2 of the 10 part_ids. Written
    // to parquet so the filter survives as a real Filter-over-scan — a
    // pre-filtered LocalRelation constant-folds and DPP sees no
    // selective predicate to exploit.
    val dimOut = Files.createTempDirectory("graft-dpp").resolve("dim").toString
    Seq((0, "keep"), (7, "keep"), (3, "drop"), (5, "drop"))
      .toDF("d_part", "tag").coalesce(1).write.parquet(dimOut)

    val joined = spark.read.parquet(out)
      .join(spark.read.parquet(dimOut).filter(col("tag") === "keep"),
        col("part_id") === col("d_part"))

    // the optimized plan carries the injected runtime partition predicate
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dynamicpruning"), optimized)

    val rows = joined.collect()
    assert(rows.length === 200) // 2 of 10 partitions x 100 rows

    // executed fact scan read only the 2 matching partition directories
    val exec = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val factScan = fileScans(exec)
      .filter(_.output.exists(_.name == "k")).head
    assert(factScan.partitionFilters.map(_.toString)
      .exists(_.toLowerCase.contains("dynamicpruning")),
      factScan.partitionFilters.mkString("; "))
    assert(factScan.metrics("numPartitions").value === 2,
      factScan.metrics("numPartitions"))
  }

  test("control: unfiltered dim join reads every fact partition") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-dpp-ctl").resolve("fact").toString
    (0 until 100).map(i => (i % 5, i.toLong)).toDF("part_id", "k")
      .coalesce(1).write.partitionBy("part_id").parquet(out)
    val dim = (0 until 5).map(i => (i, s"d$i")).toDF("d_part", "tag")

    val joined = spark.read.parquet(out)
      .join(dim, col("part_id") === col("d_part"))
    assert(joined.collect().length === 100)
    val exec = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val factScan = fileScans(exec)
      .filter(_.output.exists(_.name == "k")).head
    assert(factScan.metrics("numPartitions").value === 5,
      factScan.metrics("numPartitions"))
  }
}
