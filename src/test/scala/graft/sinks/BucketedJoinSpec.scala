package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The co-located-join contract: same-bucket-count tables join and
  * aggregate on the bucket key with NO ShuffleExchange anywhere in the
  * plan, and the layout never changes values.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def uniq(p: String) =
    s"${p}_${java.util.UUID.randomUUID.toString.take(8).replace("-", "")}"

  test("bucketed join on the bucket key plans zero exchanges") {
    val root = Files.createTempDirectory("graft-bucket").toString
    val facts = spark.range(10000).select(
      (col("id") % 700).as("k"), (col("id") * 3 % 97).as("qty"))
    val dims = spark.range(700).select(
      col("id").as("k"), concat(lit("g"), col("id") % 5).as("grp"))
    val (tf, td) = (uniq("bspec_fact"), uniq("bspec_dim"))
    Bucketed.writeBucketed(facts, tf, s"$root/f", "k", 8)
    Bucketed.writeBucketed(dims, td, s"$root/d", "k", 8)
    val joined = Bucketed.colocatedJoin(spark, tf, td, "k")
    assert(Bucketed.exchangeCount(joined) === 0,
      s"co-located join must not exchange:\n${joined.queryExecution.executedPlan}")
    // values identical to the plain (shuffling) join
    val plain = facts.join(dims, "k")
    assert(joined.agg(sum("qty"), count(lit(1))).as[(Long, Long)].head() ===
      plain.agg(sum("qty"), count(lit(1))).as[(Long, Long)].head())
    // the unbucketed form of the SAME join does exchange — the layout,
    // not the data size, is what removed it
    val unbucketed = facts.join(dims.hint("merge"), "k")
    assert(Bucketed.exchangeCount(unbucketed) > 0)
  }

  test("groupBy on the bucket key is exchange-free") {
    val root = Files.createTempDirectory("graft-bucket").toString
    val t = uniq("bspec_agg")
    Bucketed.writeBucketed(
      spark.range(5000).select((col("id") % 300).as("k"),
        col("id").as("v")), t, s"$root/a", "k", 4)
    val agg = spark.table(t).groupBy("k").agg(sum("v").as("sv"))
    assert(Bucketed.exchangeCount(agg) === 0,
      s"bucket-key aggregation must not exchange:\n${agg.queryExecution.executedPlan}")
    assert(agg.agg(sum("sv")).as[Long].head() === (0L until 5000).sum)
  }

  test("mismatched bucket counts fall back to a correct shuffled join") {
    val root = Files.createTempDirectory("graft-bucket").toString
    val (ta, tb) = (uniq("bspec_a"), uniq("bspec_b"))
    Bucketed.writeBucketed(
      spark.range(1000).select((col("id") % 50).as("k")), ta, s"$root/a", "k", 8)
    Bucketed.writeBucketed(
      spark.range(50).select(col("id").as("k"), (col("id") * 2).as("w")),
      tb, s"$root/b", "k", 5)
    val joined = Bucketed.colocatedJoin(spark, ta, tb, "k")
    assert(joined.count() === 1000L)
  }
}
