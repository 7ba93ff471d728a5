package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join evidence (build-brief scale checklist: "skewed keys →
  * salting or AQE skew-join"): with a hot key dominating one shuffle
  * partition, adaptive execution splits that partition into multiple
  * tasks — the runtime complement to Skew.saltedSumCount's static
  * salting for aggregations.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "4KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 0: 50k rows with 100-char payloads (hot); keys 1-200: 10 rows each
      val hot = spark.range(50000).select(lit(0L).as("k"),
        concat_ws("", Seq.fill(10)(lit("padpadpadp")): _*).as("payload"))
      val rest = spark.range(2000).select((col("id") % 200 + 1).as("k"),
        lit("small").as("payload"))
      val left = hot.unionByName(rest)
      val dim = spark.range(201).select(col("id").as("k"), col("id").as("v"))

      val joined = left.join(dim, "k")
      // collect() drives THIS Dataset's queryExecution (count() would plan
      // a separate aggregate and leave this adaptive plan unexecuted)
      assert(joined.collect().length === 52000)

      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
