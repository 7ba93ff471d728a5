package graft.operators

import graft.SparkSpec

class ShardSpec extends SparkSpec {
  import spark.implicits._

  test("shardAssign is deterministic, total, and seed-sensitive") {
    val docs = (1L to 500L).toDF("doc_id")
    val a = Curation.shardAssign(docs, nShards = 8, seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a2 = Curation.shardAssign(docs, nShards = 8, seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === a2) // pure function of (seed, id)
    assert(a.values.forall(s => s >= 0 && s < 8))
    val b = Curation.shardAssign(docs, nShards = 8, seed = 43L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a new seed re-deals a substantial fraction (expected 7/8)
    val moved = a.count { case (id, s) => b(id) != s }
    assert(moved > 250, s"only $moved of 500 moved")
  }

  test("shards are roughly balanced under the md5 hash") {
    val docs = (1L to 2000L).toDF("doc_id")
    val counts = Curation.shardAssign(docs, nShards = 16, seed = 7L)
      .groupBy("shard").count().collect().map(_.getLong(1))
    assert(counts.length === 16)
    // 2000/16 = 125 expected; allow generous ±40% band
    assert(counts.forall(c => c > 75 && c < 175), counts.mkString(","))
  }

  test("the assignment plan is a narrow projection - no shuffle") {
    val docs = (1L to 10L).toDF("doc_id")
    val plan = Curation.shardAssign(docs, 4, 1L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
