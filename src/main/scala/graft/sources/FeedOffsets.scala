package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Turnkey persistence for [[XmlFeed]]'s incremental-consumption
  * watermark — the one-file pointer form of [[graft.sinks.Generations]]'s
  * commit protocol, sized for a value that is a single line per feed.
  *
  * What is stored per feed: the max `lastmod` enqueued so far (the
  * watermark) PLUS the artifact names already enqueued AT that lastmod.
  * The name set makes the consumption exact where [[XmlFeed.newSince]]'s
  * inclusive boundary is merely safe: sitemap lastmod is date-granular,
  * so entries dated exactly at the watermark are undecidable by date
  * alone — remembering their names (bounded by one feed date's entries,
  * not feed history) lets a re-poll of an unchanged feed enqueue
  * NOTHING, while a same-day addition is still picked up.
  *
  * Durability: one tiny file per feed under `<dir>/<feedId>`, written
  * via temp + same-directory single-object rename — atomic on a real
  * filesystem and atomic-equivalent on object stores (same argument as
  * `Generations`' pointer publish). Readers see the old or the new mark,
  * never a torn one.
  */
object FeedOffsets {

  /** `watermark` = max lastmod enqueued; `seenAtWatermark` = names of
    * entries already enqueued whose lastmod == watermark.
    */
  final case class FeedMark(watermark: String, seenAtWatermark: Set[String])

  private def markPath(dir: String, feedId: String): Path = {
    require(feedId.matches("[A-Za-z0-9._-]+"), s"unsafe feed id: '$feedId'")
    new Path(dir, feedId)
  }

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The persisted mark for `feedId`, or None before the first commit. */
  def read(spark: SparkSession, dir: String, feedId: String): Option[FeedMark] = {
    val p = markPath(dir, feedId)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    lines.headOption.map { wm =>
      FeedMark(wm, lines.drop(1).filter(_.nonEmpty).toSet)
    }
  }

  /** Persist `mark` (atomic single-object replace; last writer wins —
    * one poller per feed is the natural deployment). The replace is
    * delete + rename because a same-name rename fails on local
    * filesystems: a reader in the tiny delete→rename window sees NO
    * mark and re-polls the whole feed — at-least-once, absorbed by the
    * D1 dup guard, never silent loss (on an object store the equivalent
    * overwrite PUT has no such window at all).
    */
  def write(spark: SparkSession, dir: String, feedId: String,
      mark: FeedMark): Unit = {
    val p = markPath(dir, feedId)
    val fs = fsOf(spark, p)
    fs.mkdirs(p.getParent)
    val tmp = new Path(p.getParent,
      s".${p.getName}.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    val body = (mark.watermark +: mark.seenAtWatermark.toSeq.sorted)
      .mkString("\n") + "\n"
    val out = fs.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(s"could not publish feed mark $p")
    }
  }

  /** The exact incremental filter: entries strictly after the watermark,
    * entries AT the watermark not yet enqueued (by name), and entries
    * with no lastmod at all (undecidable — always delivered, absorbed by
    * the downstream D1 dup guard). With `mark = None` everything is new.
    * Re-polling an unchanged feed against its own [[advance]]d mark
    * returns only the no-lastmod rows — dated history re-enqueues
    * nothing.
    */
  def newEntries(feed: DataFrame, mark: Option[FeedMark]): DataFrame =
    mark match {
      case None => feed
      case Some(FeedMark(wm, seen)) =>
        val seenCol =
          if (seen.isEmpty) lit(false)
          else XmlFeed.entryName(col("loc")).isInCollection(seen)
        feed.filter(col("lastmod").isNull ||
          col("lastmod") > lit(wm) ||
          (col("lastmod") === lit(wm) && !seenCol))
    }

  /** The mark AFTER enqueuing `delivered` (rows of [[XmlFeed.read]]'s
    * shape): watermark = max dated lastmod across the old mark and the
    * delivered rows; seen set = names at that lastmod (carried over when
    * the watermark doesn't move, rebuilt when it does). The collect is
    * bounded by ONE feed date's entry names — never feed history.
    */
  def advance(delivered: DataFrame, prev: Option[FeedMark]): Option[FeedMark] = {
    val dated = delivered.filter(col("lastmod").isNotNull)
    val maxRow = dated.agg(max(col("lastmod"))).collect()(0)
    val deliveredMax = if (maxRow.isNullAt(0)) None else Some(maxRow.getString(0))
    val wm = (deliveredMax.toSeq ++ prev.map(_.watermark).toSeq)
      .sorted.lastOption.getOrElse(return prev)
    val atWm = dated.filter(col("lastmod") === lit(wm))
      .select(XmlFeed.entryName(col("loc")).as("n"))
      .collect().map(_.getString(0)).toSet
    val carried = prev.filter(_.watermark == wm).map(_.seenAtWatermark)
      .getOrElse(Set.empty)
    Some(FeedMark(wm, carried ++ atWm))
  }

  /** One turnkey poll with the SAFE ordering built in: read the
    * persisted mark, filter the feed to new entries, hand them to
    * `enqueue`, and only AFTER it returns advance + persist the mark.
    * Any caller-side failure — an exception inside `enqueue` or a crash
    * anywhere in its window — leaves the mark untouched, so the next
    * poll re-delivers the same entries (at-least-once, absorbed by the
    * D1 name-level dup guard downstream). The reverse ordering would
    * silently lose that poll's dated entries forever, which the module
    * contract forbids; that unsafe convenience form was removed in r12.
    *
    * The feed snapshot is deliberately NOT cached: it is tiny
    * (re-scanning per action is noise), and pinning it in the
    * CacheManager would serve a later poll of the same path STALE
    * content. The poll assumes the snapshot is stable for its duration
    * — fetch feeds a publisher rewrites in place to a local snapshot
    * first.
    *
    * @return the new entries delivered to `enqueue` (the mark is already
    *         advanced past them when this returns)
    */
  def poll(spark: SparkSession, feedPath: String, dir: String,
      feedId: String)(enqueue: DataFrame => Unit): DataFrame = {
    val mark = read(spark, dir, feedId)
    val fresh = newEntries(XmlFeed.read(spark, feedPath), mark)
    enqueue(fresh)
    advance(fresh, mark).foreach(write(spark, dir, feedId, _))
    fresh
  }
}
