package graft.sinks

import java.nio.file.Files

import graft.SparkSpec

/** [[Generations.maintain]]'s contract: one policy-driven call per table
  * keeps a mixed append/merge workload's commit listing bounded, never
  * loses net content, and never breaks replay idempotence — the
  * operations story for the whole lakehouse tier (squash + compact +
  * optimize + gc behind a single scheduled entry point).
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): String =
    Files.createTempDirectory("graft-maint").resolve("t").toString

  test("maintain alone bounds a mixed append/merge workload") {
    val t = mkTable()
    // fragmentationRatio high: this test isolates the span-fold path
    // (the fragmentation path is covered below)
    val policy = Generations.MaintenancePolicy(
      squashAfterCommits = 4, keep = 2, fragmentationRatio = 1e9)
    var expected = Map.empty[Long, Long]
    for (i <- 1 to 20) {
      if (i % 5 == 0) {
        // MERGE tick: upsert one key (schema carries the delete flag)
        val ch = Seq((i.toLong % 7, i.toLong * 100, false))
          .toDF("k", "v", "_deleted")
        Generations.mergeAndCommit(spark, t, ch, Seq("k"))
        expected += (i.toLong % 7) -> (i.toLong * 100)
      } else {
        Generations.appendCommitted(spark,
          Seq((i.toLong + 100, i.toLong)).toDF("k", "v"), t, s"batch=$i")
        expected += (i.toLong + 100) -> i.toLong
      }
      Generations.maintain(spark, t, policy)
      val n = Generations.commits(spark, t).size
      assert(n <= policy.squashAfterCommits + 2,
        s"commit listing must stay bounded by maintain alone; $n at step $i")
    }
    // net content is exactly the workload's effect
    val got = Generations.readLog(spark, t).get
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
    // replay idempotence survives every fold+gc maintain performed
    assert(Generations.appendCommitted(spark,
      Seq((102L, 2L)).toDF("k", "v"), t, "batch=2").isEmpty,
      "an old batch replay must stay a no-op across maintenance")
  }

  test("maintain width-compacts on fragmentation, declines otherwise") {
    val t = mkTable()
    // every tiny append lands as its own file; ratio 2.0 (the default)
    // triggers once live files exceed 2× the 1-part target width
    val policy = Generations.MaintenancePolicy(
      squashAfterCommits = 100, fragmentationRatio = 2.0)
    for (i <- 1 to 3) {
      Generations.appendCommitted(spark,
        Seq((i.toLong, i.toLong)).toDF("k", "v").coalesce(1), t, s"batch=$i")
    }
    val r = Generations.maintain(spark, t, policy)
    assert(r.compacted && !r.folded,
      s"3 tiny files over a 1-file target must width-compact: $r")
    // immediately after: content at width, nothing further to do
    Generations.appendCommitted(spark,
      Seq((9L, 9L)).toDF("k", "v").coalesce(1), t, "batch=9")
    val r2 = Generations.maintain(spark, t, policy)
    assert(!r2.compacted && !r2.folded,
      s"one small delta over a width-sized snapshot must NOT rewrite: $r2")
    assert(Generations.readLog(spark, t).get.count() === 4)
  }

  test("maintain folds Z-clustered when clusterBy is configured") {
    val t = mkTable()
    val policy = Generations.MaintenancePolicy(
      squashAfterCommits = 2, clusterBy = Seq("k"),
      fragmentationRatio = 1e9)
    for (i <- 1 to 4) {
      Generations.appendCommitted(spark,
        Seq((i.toLong * 3 % 11, i.toLong)).toDF("k", "v"), t, s"batch=$i")
    }
    val r = Generations.maintain(spark, t, policy)
    assert(r.folded, s"span 4 > 2 must fold: $r")
    val head = Generations.latest(spark, t).get
    assert(Generations.isSnapshotCommit(head),
      "the optimize fold must be a snapshot-kind commit")
    assert(Generations.readLog(spark, t).get.count() === 4)
  }

  test("maintain on a never-committed table is a harmless no-op") {
    val t = mkTable()
    val r = Generations.maintain(spark, t)
    assert(!r.folded && !r.compacted && r.commitsAfter === 0)
  }
}
