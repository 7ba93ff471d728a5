package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime Bloom-filter join pruning (`InjectRuntimeFilter`) — the
  * 100 TB shuffle-join safety net: when a fact table shuffle-joins a
  * selectively-filtered side, Catalyst builds a Bloom filter from the
  * small side's join keys and applies a `might_contain` probe to
  * the fact side BEFORE its exchange, so non-matching fact rows never
  * shuffle. This spec proves the engine-level mechanism fires on our
  * join shape (parquet scans, equi-join, selective dim filter) and that
  * results are unchanged — plan evidence in the LayoutSkippingSpec
  * tradition, with thresholds lowered only because the test file is
  * tiny (at real scale the 10 GiB default does the gating).
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects might_contain on the fact side") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rtf").toString
    (0L until 20000L).map(i => (i % 200, i)).toDF("k", "payload")
      .write.mode("overwrite").parquet(s"$dir/fact")
    (0L until 200L).map(i => (i, if (i < 5) "hot" else "cold"))
      .toDF("k", "tag").write.mode("overwrite").parquet(s"$dir/dim")

    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // the test files are KBs; at scale the defaults (10 GiB scan
      // floor, 10 MiB creation ceiling) gate injection correctly
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"tag" === "hot")
      val joined = fact.join(dim, "k")

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"), optimized)
      // the runtime filter is a pre-shuffle reduction, not a semantics
      // change: 5 hot keys × 100 fact rows each
      assert(joined.count() === 500L)
    }

    // control: with the feature off the predicate is absent
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"tag" === "hot")
      val plan = fact.join(dim, "k").queryExecution.optimizedPlan.toString
      assert(!plan.contains("might_contain"), plan)
    }
  }
}
