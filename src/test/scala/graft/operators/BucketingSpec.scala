package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing for co-located joins (build-brief scale checklist): two
  * tables bucketed on the join key join WITHOUT a shuffle exchange —
  * the physical plan proof that pre-partitioned layout removes the
  * dominant cost of repeated large joins at 100 TB.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle") {
    // warehouse dir is a static conf — set once in SparkSpec's builder
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    val o = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side (bucket co-location);
      // only the post-join aggregation exchanges
      val joinSection = plan.substring(0, plan.indexOf("Scan"))
      assert(plan.contains("SortMergeJoin"), plan)
      val shufflesBeforeAgg = "Exchange hashpartitioning\\((l|o)_orderkey".r
        .findAllIn(plan).length
      assert(shufflesBeforeAgg === 0,
        s"bucketed join must not re-shuffle on the join key:\n$plan")
      assert(joined.collect().map(_.getLong(1)).sum === 6000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
