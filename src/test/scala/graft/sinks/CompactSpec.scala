package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Small-file compaction: many tiny part files → few target-sized ones,
  * same rows, pruning layout preserved for partitioned tables.
  */
class CompactSpec extends SparkSpec {

  test("compactParquet merges many small files, preserving rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact").resolve("t").toString
    (1 to 1000).toDF("n").repartition(32).write.parquet(dir)

    val (before, after) = Compact.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(before === 32)
    assert(after === 1, s"expected 1 file after compaction, got $after")
    val back = spark.read.parquet(dir)
    assert(back.count() === 1000)
    assert(back.agg(sum(col("n"))).head().getLong(0) === 500500L)
  }

  test("compactParquet is a no-op when already at target") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact2").resolve("t").toString
    (1 to 10).toDF("n").coalesce(1).write.parquet(dir)
    assert(Compact.compactParquet(spark, dir) === ((1, 1)))
  }

  test("compactPartitioned compacts per partition, keeping the pruning layout") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact3").resolve("t").toString
    (1 to 400).map(i => (i, s"g${i % 2}")).toDF("n", "g")
      .repartition(8).write.partitionBy("g").parquet(dir)

    val results = Compact.compactPartitioned(spark, dir, targetBytes = 1L << 30)
    assert(results.map(_._1).sorted === Seq("g=g0", "g=g1"))
    assert(results.forall(_._3 === 1), results.mkString(", "))
    val back = spark.read.parquet(dir)
    assert(back.count() === 400)
    // pruning still works over the compacted layout
    val pruned = back.filter(col("g") === "g0")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(pruned.count() === 200)
  }
}
