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

  val fixturePath = "/root/repo/fixtures/sitemap.xml"

  /** Read a sitemap-shaped feed: one row per `<url>` element with string
    * (loc, lastmod). Explicit schema — inference would type lastmod as a
    * date and cost a second pass.
    */
  def read(spark: SparkSession, path: String = fixturePath): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "url")
      .schema("loc STRING, lastmod STRING")
      .load(path)

  /** Feed entries → (url, name, lastmod) download candidates: the same
    * projection the HTML-anchor path feeds the router (X4 basename).
    */
  def tasks(feed: DataFrame): DataFrame =
    feed
      .filter(col("loc").isNotNull && length(col("loc")) > 0)
      .select(col("loc").as("url"), Urls.basename(col("loc")).as("name"),
        col("lastmod"))

  /** Incremental consumption: only entries whose `lastmod` is strictly
    * after the given high-water mark (ISO dates compare lexically). The
    * caller persists the max lastmod it enqueued (one tiny value per
    * feed — a [[Generations]] pointer or a channel-offset-style file)
    * and passes it on the next poll, so re-reading a growing feed
    * re-enqueues nothing: the feed analog of the queue's committed
    * offset. Entries carrying NO lastmod are always returned — an
    * unannotated entry can't be proven already-seen, and the D1
    * name-level dup guard downstream absorbs the re-delivery
    * (at-least-once, never silent loss).
    */
  def newSince(feed: DataFrame, lastmodWatermark: String): DataFrame =
    feed.filter(col("lastmod").isNull ||
      col("lastmod") > lit(lastmodWatermark))

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
