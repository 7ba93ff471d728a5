package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Evidence for the repo's skew posture: `Skew.scala` salts AGGREGATIONS
  * and documents that AQE's skew-join handling covers JOINS — this spec
  * proves that claim mechanically instead of by prose, by driving a
  * deliberately skewed shuffle join and asserting the AQE-final plan
  * actually split the hot partition (the `isSkew` marker on the
  * sort-merge join's shuffle reads). If a future config or upgrade
  * silently disabled skew handling, this fails and the 100 TB skew story
  * with it.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot partition of a skewed shuffle join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      // thresholds scaled down so a local-size hot key counts as skewed
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // forbid broadcast so the join must shuffle (the skewed shape)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // hot key 7: ~100k rows with a fat payload; everything else uniform
      val left = spark.range(110000).select(
        when(col("id") < 100000, lit(7L)).otherwise(col("id") % 64).as("k"),
        concat(lit("x" * 64), col("id")).as("payload"))
      val right = spark.range(64).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("name"))
      val joined = left.join(right, "k")
      // execute THIS QueryExecution (count() would build a separate one
      // whose adaptive plan never runs) so AQE finalizes the plan we read
      assert(joined.collect().length === 110000)

      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("SortMergeJoin") ||
        finalPlan.contains("ShuffledHashJoin"),
        s"expected a shuffle join, got:\n$finalPlan")
      assert(finalPlan.contains("isSkew=true") ||
        finalPlan.contains("skewed=") || finalPlan.contains("skew=true"),
        s"AQE did not mark/split the skewed partition:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }
}
