package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.sources.{FeedOffsets, TaskChannel, XmlFeed}

/** Turnkey incremental feed consumption: one poll of an XML artifact
  * feed into a [[TaskChannel]] — the scheduled-harvester analog for
  * feed-announced sources (the reference's harvester is clock-driven,
  * `data_harvester.py:21`; real market-data publishers announce files
  * via sitemap/RSS, so the feed side needs the same turnkey loop).
  *
  * Ordering is ENQUEUE FIRST, advance the persisted mark AFTER: a crash
  * between the two re-delivers the batch on the next poll (at-least-once
  * — absorbed by the D1 name-level dup guard downstream, the same
  * contract as null-lastmod entries), and never silently loses it. The
  * reverse order would open a lose-forever window, which the module
  * contract forbids.
  *
  * Each poll is one tiny feed scan + one channel append; schedule it
  * like any harvester tick (cron, Trigger.AvailableNow loop). All
  * state is the one [[FeedOffsets]] mark file per feed.
  */
object FeedPoller {

  /** Poll once; returns the number of tasks enqueued.
    *
    * The enqueue-before-advance ordering comes from [[FeedOffsets.poll]]
    * itself (since r12 the callback form is the only form, so the safe
    * ordering is structural, not a caller convention). The feed path is
    * scanned per action (count, enqueue, advance — it is deliberately
    * never cached): the poll assumes the snapshot is stable for its
    * duration. Polling a file a publisher rewrites IN PLACE mid-poll can
    * skew the mark vs the enqueued set — fetch such feeds to a local
    * snapshot first (the fetch kernels do exactly this).
    */
  def pollOnce(spark: SparkSession, feedPath: String, offsetsDir: String,
      feedId: String, channel: TaskChannel): Long = {
    var n = 0L
    FeedOffsets.poll(spark, feedPath, offsetsDir, feedId) { fresh =>
      n = fresh.count()
      if (n > 0) channel.enqueue(XmlFeed.toTasks(fresh, feedId))
    }
    n
  }
}
