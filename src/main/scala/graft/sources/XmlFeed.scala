package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Urls

/** XML artifact-feed source — the XML sibling of the reference's HTML
  * anchor extraction (X2, `data_downloader.py:96-100`): real market-data
  * publishers announce new files through sitemap/RSS-shaped XML feeds at
  * least as often as through HTML indexes, so a complete ingestion
  * surface needs both. Built on Spark 4's NATIVE XML data source
  * (`format("xml")` + `rowTag` — the spark-xml package was merged into
  * Spark core), so parsing is distributed, schema-declared, and entity
  * decoding (`&amp;` → `&`) is the parser's, not a regex's.
  *
  * Scale shape: the XML source is a plain FileFormat — a directory of
  * feed snapshots scans in parallel with per-file splits, the explicit
  * schema skips inference's extra pass, and everything downstream of
  * [[tasks]] is narrow per-row projection.
  */
object XmlFeed {

  /** The committed sitemap fixture `xml_feed_tasks` and its oracle both
    * read (the oracle re-derives from the raw text, so both sides must
    * name the same file). Env-overridable so a checkout at another path
    * stays runnable.
    */
  val fixturePath: String =
    sys.env.getOrElse("SPARK_GRAFT_FIXTURES_DIR", "/root/repo/fixtures") +
      "/sitemap.xml"

  /** Read a sitemap-shaped feed: one row per `<url>` element with string
    * (loc, lastmod). Explicit schema — inference would type lastmod as a
    * date and cost a second pass.
    */
  def read(spark: SparkSession, path: String = fixturePath): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "url")
      .schema("loc STRING, lastmod STRING")
      .load(path)

  /** The artifact name of a feed entry (X4 basename) — the identity the
    * D1 dup guard and [[FeedOffsets]]' seen-set both key on.
    */
  def entryName(loc: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Urls.basename(loc)

  /** Feed entries → (url, name, lastmod) download candidates: the same
    * projection the HTML-anchor path feeds the router (X4 basename).
    */
  def tasks(feed: DataFrame): DataFrame =
    feed
      .filter(col("loc").isNotNull && length(col("loc")) > 0)
      .select(col("loc").as("url"), Urls.basename(col("loc")).as("name"),
        col("lastmod"))

  /** Incremental consumption: only entries whose `lastmod` is at or
    * after the given high-water mark (ISO dates compare lexically). The
    * caller persists the max lastmod it enqueued (one tiny value per
    * feed — [[FeedOffsets]] is the turnkey form) and passes it on the
    * next poll: the feed analog of the queue's committed offset.
    *
    * The boundary is INCLUSIVE (`>=`), deliberately: sitemap lastmod is
    * typically date-granular, so a feed that adds a second entry later
    * the same day carries a lastmod EQUAL to the persisted watermark — a
    * strict `>` would skip it silently forever. Entries at the boundary
    * re-deliver on every poll until the watermark date elapses; the D1
    * name-level dup guard downstream absorbs the redelivery, exactly as
    * it does for NO-lastmod entries, which are always returned (an
    * unannotated entry can't be proven already-seen). At-least-once,
    * never silent loss. For exact re-poll-enqueues-nothing semantics,
    * use [[FeedOffsets.newEntries]], which additionally remembers the
    * names already seen AT the watermark date.
    */
  def newSince(feed: DataFrame, lastmodWatermark: String): DataFrame =
    feed.filter(col("lastmod").isNull ||
      col("lastmod") >= lit(lastmodWatermark))

  /** Feed candidates → queue-ready task rows (the harvester's message
    * shape, `Schemas.task`): the feed becomes a first-class harvest
    * source — enqueue the result on any [[TaskChannel]] and the download
    * pipeline fetches, dedup-guards, and sinks the artifacts exactly as
    * it does catalog-driven work. DIRECT strategy: the feed names
    * concrete artifact URLs, so no anchor/listing extraction step
    * remains; PATTERN carries the artifact name the sink will use.
    */
  def toTasks(feed: DataFrame, sourceId: String): DataFrame =
    tasks(feed).select(
      concat_ws("-", lit(sourceId), col("name")).as("ID"),
      col("url").as("URL"),
      lit("DIRECT").as("TYPE"),
      col("name").as("PATTERN"),
      lit("0").as("UTC"),
      lit(0).as("attempts"))
}
