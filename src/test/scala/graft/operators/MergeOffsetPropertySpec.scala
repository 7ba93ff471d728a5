package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.sources.OffsetLogChannel

/** Seeded-random property tests (GlobsSpec style: independent
  * plain-Scala models) for the MERGE operator and the offset-log
  * transport's conservation laws.
  */
class MergeOffsetPropertySpec extends SparkSpec {

  private val rnd = new Random(20260814)

  test("mergeApply matches the map model and is idempotent on random CDC") {
    import spark.implicits._
    for (round <- 1 to 12) {
      val curKeys = (1 to 30).filter(_ => rnd.nextBoolean())
      val cur = curKeys.map(k => (k, s"v$k-$round"))
      // changeset: key-unique mix of updates (existing), inserts (new),
      // deletes (existing or phantom — deleting an absent key is a no-op)
      val chgKeys = rnd.shuffle((1 to 40).toList).take(12)
      val chg = chgKeys.map { k =>
        val del = rnd.nextInt(3) == 0
        (k, s"c$k-$round", del)
      }
      val model = {
        val m = scala.collection.mutable.Map(cur.map { case (k, v) => k -> v }: _*)
        chg.foreach { case (k, v, del) => if (del) m.remove(k) else m(k) = v }
        m.toMap
      }
      val curDf = cur.toDF("k", "v")
      val chgDf = chg.toDF("k", "v", "_deleted")
      val once = Merge.mergeApply(curDf, chgDf, Seq("k"))
      val got = once.as[(Int, String)].collect().toMap
      assert(got === model, s"round $round: merge diverged from map model")
      assert(got.size === once.count(), s"round $round: duplicate keys")
      // idempotence: re-applying the same changeset changes nothing
      val twice = Merge.mergeApply(once, chgDf, Seq("k"))
        .as[(Int, String)].collect().toMap
      assert(twice === model, s"round $round: merge not idempotent")
    }
  }

  test("offset log conserves records, partitions by key, orders by batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-olog-prop")
    val ch = OffsetLogChannel(s"$dir/q", nPartitions = 3, group = "prop")
    val ids = (1 to 10).map(i => s"src-$i")
    var enqueued = List.empty[(String, Int)] // (ID, batch index)
    for (batch <- 0 until 4) {
      val rows = ids.filter(_ => rnd.nextBoolean())
        .map(id => (id, s"file:///$id/$batch", "DIRECT", s"$id-$batch.bin",
          "0", 0))
      if (rows.nonEmpty) {
        ch.enqueue(rows.toDF("ID", "URL", "TYPE", "PATTERN", "UTC", "attempts"))
        enqueued :::= rows.map(r => (r._1, batch)).toList
      }
    }
    val recs = ch.dequeueWithOffsets(spark, max = 0)
      .select(col("ID"), col("PATTERN"), col("_partition"), col("_offset"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    // conservation: nothing lost, nothing duplicated
    assert(recs.length === enqueued.length)
    assert(recs.map(r => (r._1, r._2)).toSet ===
      enqueued.map { case (id, b) => (id, s"$id-$b.bin") }.toSet)
    // key partitioning: every record of an ID in one partition
    recs.groupBy(_._1).values.foreach(rs => assert(rs.map(_._3).toSet.size === 1))
    // contiguous per-partition offsets
    recs.groupBy(_._3).values.foreach { rs =>
      assert(rs.map(_._4).sorted.toList === (0L until rs.length).toList)
    }
    // per-key enqueue order preserved: within an ID, the batch index
    // (parsed off PATTERN) must be increasing in offset order
    recs.groupBy(_._1).values.foreach { rs =>
      val batches = rs.sortBy(_._4)
        .map(_._2.split("-").last.stripSuffix(".bin").toInt)
      assert(batches.toList === batches.sorted.toList,
        s"batch order broken within a key: ${rs.toList}")
    }
  }

  test("diff matches the map model and round-trips through mergeApply") {
    import spark.implicits._
    for (round <- 1 to 12) {
      // random before/after snapshots over overlapping keyspaces; null
      // payloads included so the null-safe compare is exercised
      def snap(): Map[Int, Option[String]] =
        (1 to 30).filter(_ => rnd.nextBoolean())
          .map(k => k -> (if (rnd.nextInt(5) == 0) None
                          else Some(s"v$k-${rnd.nextInt(3)}")))
          .toMap
      val before = snap()
      val after = snap()
      val bDf = before.toSeq.map { case (k, v) => (k, v.orNull) }.toDF("k", "v")
      val aDf = after.toSeq.map { case (k, v) => (k, v.orNull) }.toDF("k", "v")

      val model = {
        val ins = (after.keySet -- before.keySet).map(k => (k, "insert", after(k)))
        val del = (before.keySet -- after.keySet).map(k => (k, "delete", before(k)))
        val upd = (before.keySet & after.keySet)
          .filter(k => before(k) != after(k))
          .map(k => (k, "update_postimage", after(k)))
        (ins ++ del ++ upd).map { case (k, t, v) => (k, t, v.orNull) }
      }
      val got = Merge.diff(bDf, aDf, Seq("k"))
        .select(col("k"), col("_change_type"), col("v"))
        .as[(Int, String, String)].collect().toSet
      assert(got === model.toSet, s"round $round: diff diverged from model")

      // round-trip law: mergeApply(before, asChangeset(diff)) == after
      val replayed = Merge.mergeApply(bDf,
          Merge.asChangeset(Merge.diff(bDf, aDf, Seq("k"))), Seq("k"))
        .as[(Int, String)].collect()
        .map { case (k, v) => k -> Option(v) }.toMap
      assert(replayed === after, s"round $round: round trip diverged")

      // diff of identical snapshots is empty
      assert(Merge.diff(aDf, aDf, Seq("k")).count() === 0L, s"round $round")
    }
  }

  test("Generations.changesBetween feeds time-travel CDC") {
    import spark.implicits._
    import graft.sinks.Generations
    val t = java.nio.file.Files.createTempDirectory("graft-cdc")
      .resolve("t").toString
    val c1 = Generations.writeAndCommit(spark,
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), t)
    val c2 = Generations.mergeAndCommit(spark, t,
      Seq((2, "B", false), (3, "c", true), (4, "d", false))
        .toDF("k", "v", "_deleted"), Seq("k"))
    val feed = Generations.changesBetween(spark, t, c1.version, c2.version,
        Seq("k")).get
      .select(col("_change_type"), col("k"), col("v"))
      .as[(String, Int, String)].collect().toSet
    assert(feed === Set(
      ("update_postimage", 2, "B"), // 2: b → B
      ("delete", 3, "c"),           // 3 removed; payload = before-image
      ("insert", 4, "d")))          // 4 new
    // a GC'd or unknown version yields None, not garbage
    assert(Generations.changesBetween(spark, t, 99L, c2.version,
      Seq("k")).isEmpty)
  }
}
