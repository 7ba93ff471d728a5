package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Incremental, Merge}
import graft.sinks.Generations

/** [[ChangeFeed]]'s contracts: generic polling is deliver-first
  * at-least-once with a persisted cursor; aggregate-view maintenance is
  * exactly-once by construction (applied version rides in the view's
  * own commit), and the maintained view equals a fresh recompute after
  * ANY interleaving of source commits, replays, and GC.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def mkDir(name: String): String =
    Files.createTempDirectory("graft-cf").resolve(name).toString

  private def src(rows: (Long, Long, Long)*): DataFrame =
    rows.toDF("k", "grp", "v")
      .withColumn("v", col("v").cast("decimal(18,4)"))

  private val aggOf: DataFrame => DataFrame =
    df => df.groupBy("grp")
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))

  private def maintain(table: String, mv: String) =
    ChangeFeed.maintainAggOnce(spark, table, Seq("k"), mv, Seq("grp"),
      Map("sum_v" -> "v"), "n")(aggOf)

  private def mvState(mv: String): Map[Long, (BigDecimal, Long)] =
    Generations.read(spark, mv).get
      .select(col("grp"), col("sum_v").cast("decimal(18,4)"), col("n"))
      .as[(Long, BigDecimal, Long)].collect()
      .map { case (g, s, n) => g -> (s, n) }.toMap

  private def recomputed(table: String): Map[Long, (BigDecimal, Long)] =
    aggOf(Generations.read(spark, table).get)
      .select(col("grp"), col("sum_v").cast("decimal(18,4)"), col("n"))
      .as[(Long, BigDecimal, Long)].collect()
      .map { case (g, s, n) => g -> (s, n) }.toMap

  test("maintainAggOnce: bootstrap, increment, delete-retraction, no-op") {
    val t = mkDir("t"); val mv = mkDir("mv")
    // nothing committed yet: no-op
    assert(maintain(t, mv).isEmpty)

    Generations.writeAndCommit(spark, src((1, 10, 5), (2, 10, 7), (3, 20, 1)), t)
    val c1 = maintain(t, mv)
    assert(c1.nonEmpty && c1.get.tag === "=cdcv=1")
    assert(mvState(mv) === recomputed(t))

    // already current: no second commit
    assert(maintain(t, mv).isEmpty)

    // a MERGE tick: update k=2 (v 7→9), delete k=3, insert k=4 in grp 20
    Generations.writeAndCommit(spark,
      src((1, 10, 5), (2, 10, 9), (4, 20, 2)), t)
    val c2 = maintain(t, mv)
    assert(c2.nonEmpty && c2.get.tag === "=cdcv=2")
    assert(mvState(mv) === recomputed(t))
    assert(mvState(mv)(10L) === ((BigDecimal(14), 2L)))
  }

  test("a group retracted to zero leaves the view") {
    val t = mkDir("t"); val mv = mkDir("mv")
    Generations.writeAndCommit(spark, src((1, 10, 5), (2, 20, 7)), t)
    maintain(t, mv)
    Generations.writeAndCommit(spark, src((1, 10, 5)), t)
    maintain(t, mv)
    assert(mvState(mv) === Map(10L -> ((BigDecimal(5), 1L))))
  }

  test("exactly-once under maintainer races: loser aborts, state stays right") {
    val t = mkDir("t"); val mv = mkDir("mv")
    Generations.writeAndCommit(spark, src((1, 10, 5)), t)
    maintain(t, mv)
    Generations.writeAndCommit(spark, src((1, 10, 5), (2, 10, 6)), t)
    val gate = new java.util.concurrent.CyclicBarrier(2)
    // run two maintainers truly concurrently; at most one may commit
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Boolean]]()
    val threads = (0 until 2).map { _ =>
      new Thread(() => {
        gate.await()
        try results.add(Right(maintain(t, mv).nonEmpty))
        catch { case e: Generations.CommitConflictException =>
          results.add(Left(e)) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val rs = results.toArray.toSeq
    val committed = rs.count { case Right(true) => true; case _ => false }
    assert(committed <= 1, s"at most one maintainer may commit: $rs")
    // a loser may have aborted (CAS conflict) — after a redo the view is
    // current and correct regardless
    maintain(t, mv)
    assert(mvState(mv) === recomputed(t))
    assert(ChangeFeed.appliedVersion(spark, mv) === 2L)
  }

  test("GC past the applied version falls back to recompute, still exact") {
    val t = mkDir("t"); val mv = mkDir("mv")
    Generations.writeAndCommit(spark, src((1, 10, 5)), t)
    maintain(t, mv)
    Generations.writeAndCommit(spark, src((1, 10, 5), (2, 20, 7)), t)
    Generations.writeAndCommit(spark, src((2, 20, 8)), t)
    // collect v1 (the applied-from generation): feed reach is gone
    Generations.gc(spark, t, keep = 1, orphanGraceMs = 0L)
    assert(Generations.readAt(spark, t, 1L).isEmpty, "v1 must be GC'd")
    val c = maintain(t, mv)
    assert(c.nonEmpty && c.get.tag === "=cdcv=3")
    assert(mvState(mv) === recomputed(t))
  }

  test("appliedVersion survives a squash of the view table") {
    val t = mkDir("t"); val mv = mkDir("mv")
    Generations.writeAndCommit(spark, src((1, 10, 5)), t)
    maintain(t, mv)
    Generations.writeAndCommit(spark, src((1, 10, 6)), t)
    maintain(t, mv)
    assert(ChangeFeed.appliedVersion(spark, mv) === 2L)
    Generations.squash(spark, mv)
    Generations.gc(spark, mv, keep = 1, orphanGraceMs = 0L)
    assert(ChangeFeed.appliedVersion(spark, mv) === 2L,
      "the cdcv watermark must ride the squash's carried witness")
    // and maintenance keeps working incrementally afterwards
    Generations.writeAndCommit(spark, src((1, 10, 6), (9, 90, 1)), t)
    assert(maintain(t, mv).nonEmpty)
    assert(mvState(mv) === recomputed(t))
  }

  test("pollOnce is deliver-first: a throwing consumer gets redelivered") {
    val t = mkDir("t")
    val cur = mkDir("cursor") + "/c"
    Generations.writeAndCommit(spark, src((1, 10, 5), (2, 20, 7)), t)
    // consumer crash: cursor must NOT advance
    intercept[RuntimeException] {
      ChangeFeed.pollOnce(spark, t, Seq("k"), cur) { _ =>
        throw new RuntimeException("consumer died mid-apply")
      }
    }
    assert(ChangeFeed.cursor(spark, cur) === 0L)
    // redelivery: first poll delivers the whole snapshot as inserts
    var seen = Seq.empty[(String, Long)]
    val w = ChangeFeed.pollOnce(spark, t, Seq("k"), cur) { d =>
      seen = d.changes.get.select(col("_change_type"), col("k"))
        .as[(String, Long)].collect().toSeq.sorted
    }
    assert(w === Some((0L, 1L)))
    assert(seen === Seq(("insert", 1L), ("insert", 2L)))
    assert(ChangeFeed.cursor(spark, cur) === 1L)
    // nothing new: no delivery
    assert(ChangeFeed.pollOnce(spark, t, Seq("k"), cur)(_ => fail()).isEmpty)
    // an update tick delivers the 4-type feed
    Generations.writeAndCommit(spark, src((1, 10, 6), (2, 20, 7)), t)
    var types = Seq.empty[(String, Long)]
    ChangeFeed.pollOnce(spark, t, Seq("k"), cur) { d =>
      types = d.changes.get.select(col("_change_type"), col("k"))
        .as[(String, Long)].collect().toSeq.sorted
    }
    assert(types === Seq(("update_postimage", 1L), ("update_preimage", 1L)))
  }

  test("first delivery is pinned at the version the cursor records") {
    val t = mkDir("t")
    val cur = mkDir("cursor") + "/c"
    Generations.writeAndCommit(spark, src((1, 10, 5)), t)
    // a commit lands WHILE the first delivery is being consumed — it must
    // not leak into the from=0 insert set (that set is pinned at the head
    // the cursor will record), and the next poll must deliver exactly it
    var firstKeys = Set.empty[Long]
    val w = ChangeFeed.pollOnce(spark, t, Seq("k"), cur) { d =>
      Generations.writeAndCommit(spark, src((1, 10, 5), (2, 20, 9)), t)
      firstKeys = d.changes.get.select(col("k")).as[Long].collect().toSet
    }
    assert(w === Some((0L, 1L)))
    assert(firstKeys === Set(1L),
      "first delivery must be the snapshot AT the recorded head, not fresher")
    var second = Seq.empty[(String, Long)]
    ChangeFeed.pollOnce(spark, t, Seq("k"), cur) { d =>
      second = d.changes.get.select(col("_change_type"), col("k"))
        .as[(String, Long)].collect().toSeq.sorted
    }
    assert(second === Seq(("insert", 2L)),
      "the concurrent commit arrives exactly once, as the next window")
  }

  test("pollOnce surfaces a GC gap instead of silently skipping") {
    val t = mkDir("t")
    val cur = mkDir("cursor") + "/c"
    Generations.writeAndCommit(spark, src((1, 10, 5)), t)
    ChangeFeed.pollOnce(spark, t, Seq("k"), cur)(_ => ())
    Generations.writeAndCommit(spark, src((1, 10, 6)), t)
    Generations.writeAndCommit(spark, src((1, 10, 7)), t)
    Generations.gc(spark, t, keep = 1, orphanGraceMs = 0L)
    var gap: Option[ChangeFeed.Delivery] = None
    val w = ChangeFeed.pollOnce(spark, t, Seq("k"), cur) { d => gap = Some(d) }
    assert(w === Some((1L, 3L)))
    assert(gap.get.changes.isEmpty, "GC'd from-version must surface as a gap")
    assert(ChangeFeed.cursor(spark, cur) === 3L,
      "the gap is crossed exactly once")
  }
}
