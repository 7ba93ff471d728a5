package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Fixtures
import graft.functions.{Extract, Globs, Urls}
import graft.operators.{ErrorPath, Harvest, Router}
import graft.sources.Catalog

/** Driver-contract registrations for the reference-surface operators
  * (SURVEY.md §2.1): harvest pipeline S1/F1/T1-T4/P1/P2, extraction
  * X2-X4/X6-X7, glob F3, router R1, error path E1/E2/E4. Each query has a
  * DuckDB oracle built from the SAME literal fixtures (graft.Fixtures).
  */
object ReferenceQueries extends QueryPack {

  private def ts(s: String) = Timestamp.valueOf(s)

  /** The DuckDB replace-chain equivalent of Templates.expandTemplate. */
  private def expandSql(c: String, lastmonthSql: String): String =
    s"""replace(replace(replace(replace(replace(replace($c,
       | '{year}', strftime(local_ts, '%Y')),
       | '{month}', strftime(local_ts, '%m')),
       | '{lastmonth}', $lastmonthSql),
       | '{day}', strftime(local_ts, '%d')),
       | '{hour}', strftime(local_ts, '%H')),
       | '{minute}', strftime(local_ts, '%M'))""".stripMargin

  private val correctedLastmonthSql =
    "strftime(local_ts - INTERVAL 1 MONTH, '%m')"
  // The reference's f'0{int(month)-1}' bug, verbatim (data_harvester.py:34).
  private val legacyLastmonthSql =
    "'0' || CAST(month(local_ts) - 1 AS VARCHAR)"

  private def harvestOracle(runTs: String, interval: String, lastmonthSql: String): String =
    s"""WITH cat AS (SELECT * FROM ${Fixtures.catalogSql}),
       |t AS (
       |  SELECT *, TIMESTAMP '$runTs' + to_hours(utc) AS local_ts
       |  FROM cat WHERE active = 1 AND "interval" = '$interval')
       |SELECT id AS "ID", ${expandSql("url", lastmonthSql)} AS "URL",
       |  "type" AS "TYPE", ${expandSql("pattern", lastmonthSql)} AS "PATTERN",
       |  CAST(utc AS VARCHAR) AS "UTC"
       |FROM t ORDER BY "ID"""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship: full harvest pipeline at a pinned run timestamp.
    "harvest_tasks" -> ((s, _) =>
      Harvest.tasks(Catalog.read(s), ts(Fixtures.runTs), "hourly").orderBy("ID")),

    // Monthly interval in January: corrected lastmonth (12) vs...
    "harvest_monthly" -> ((s, _) =>
      Harvest.tasks(Catalog.read(s), ts(Fixtures.runTsJan), "monthly").orderBy("ID")),

    // ...the reference's legacy bug ("00") — fidelity variant.
    "harvest_monthly_legacy" -> ((s, _) =>
      Harvest.tasks(Catalog.read(s), ts(Fixtures.runTsJan), "monthly",
        legacyLastMonth = true).orderBy("ID")),

    // P2: queue-message JSON serialization.
    "harvest_task_json" -> ((s, _) =>
      Harvest.taskMessages(Catalog.read(s), ts(Fixtures.runTs), "hourly")
        .select(col("ID"), col("task_json")).orderBy("ID")),

    // R1: 5-way dispatch + unknown-type error flag over all active sources.
    "route_strategies" -> ((s, _) => {
      val tasks = Catalog.read(s).filter(col("active") === 1)
        .select(col("id").as("ID"), col("type").as("TYPE"))
      Router.route(tasks)
        .select(col("ID"), col("TYPE"), col("strategy"), col("overwrite"), col("is_error"))
        .orderBy("ID")
    }),

    // E1: catalog point-update — flip active:=2 for failed ids.
    "catalog_flag_broken" -> ((s, _) =>
      ErrorPath.flagBroken(Catalog.read(s), Seq("src-003", "src-008"))
        .select(col("id"), col("active")).orderBy("id")),

    // E2: sanitized, well-formed alert payloads for unknown-type errors.
    "error_alerts" -> ((s, _) => {
      val tasks = Catalog.read(s).filter(col("active") === 1)
        .select(col("id").as("ID"), col("url").as("URL"), col("type").as("TYPE"))
      ErrorPath.alertJson(Router.errors(Router.route(tasks))).orderBy("ID")
    }),

    // X2-X4 + F2: anchor extraction, URL resolution, basename, non-empty.
    "html_links" -> ((s, _) => {
      val page = s.range(1).select(
        lit(Fixtures.htmlBase).as("base"), lit(Fixtures.htmlPage).as("html"))
      page.select(col("base"), explode(Extract.anchorHrefs(col("html"))).as("href"))
        .select(graft.functions.expressions.UrlResolveExpr.urlResolveNative(col("base"), col("href")).as("file_url"))
        .withColumn("file_name", Urls.basename(col("file_url")))
        .filter(length(col("file_name")) > 0)
        .orderBy("file_url")
    }),

    // X6/X7 + F3: FTP listing scan, last-token filename, glob filter.
    // XML sibling of the X2 anchor path: a sitemap-shaped artifact feed
    // parsed by Spark 4's NATIVE XML source (rowTag, declared schema,
    // real entity decoding), projected to download candidates. The
    // oracle re-derives the same rows from the raw fixture text.
    "xml_feed_tasks" -> ((s, _) =>
      graft.sources.XmlFeed.tasks(graft.sources.XmlFeed.read(s))
        .orderBy("url")),

    "ftp_listing_glob" -> ((s, _) => {
      val listing = s.range(1).select(lit(Fixtures.ftpListing).as("listing"))
      listing.select(explode(Extract.listingNames(col("listing"))).as("file_name"))
        .filter(col("file_name").rlike(Globs.globToRegex(Fixtures.ftpGlob)))
        .withColumn("file_url", graft.functions.expressions.UrlResolveExpr.urlResolveNative(lit(Fixtures.ftpBase), col("file_name")))
        .orderBy("file_name")
    }),

    // E4: retry/dead-letter split of a synthetic attempts ledger derived
    // from events (attempts = event_id % 7) — dead-lettered tasks.
    "dlq_dead_letters" -> ((s, dir) => {
      val tasks = graft.Tables.read(s, s"$dir/events.parquet")
        .select(col("event_id"), (col("event_id") % 7).cast("int").as("attempts"))
      ErrorPath.splitRetryable(tasks, maxAttempts = 5)._2.orderBy("event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "harvest_tasks" -> harvestOracle(Fixtures.runTs, "hourly", correctedLastmonthSql),
    "harvest_monthly" -> harvestOracle(Fixtures.runTsJan, "monthly", correctedLastmonthSql),
    "harvest_monthly_legacy" -> harvestOracle(Fixtures.runTsJan, "monthly", legacyLastmonthSql),

    "harvest_task_json" ->
      s"""WITH t AS (${harvestOracle(Fixtures.runTs, "hourly", correctedLastmonthSql)})
         |SELECT "ID", to_json(struct_pack("ID" := "ID", "URL" := "URL",
         |  "TYPE" := "TYPE", "PATTERN" := "PATTERN", "UTC" := "UTC")) AS task_json
         |FROM t ORDER BY "ID"""".stripMargin,

    "route_strategies" ->
      s"""SELECT id AS "ID", "type" AS "TYPE",
         |  CASE "type" WHEN 'LINKS' THEN 'LINK' WHEN 'LINKS_OVERWRITE' THEN 'LINKS_OVER'
         |    WHEN 'DIRECT' THEN 'LINKS_DIRECT' WHEN 'DIRECT_FTP' THEN 'FTP_FILE'
         |    WHEN 'FTP_FILES' THEN 'FTP_FILES' END AS strategy,
         |  "type" = 'LINKS_OVERWRITE' AS overwrite,
         |  CASE "type" WHEN 'LINKS' THEN false WHEN 'LINKS_OVERWRITE' THEN false
         |    WHEN 'DIRECT' THEN false WHEN 'DIRECT_FTP' THEN false
         |    WHEN 'FTP_FILES' THEN false ELSE true END AS is_error
         |FROM ${Fixtures.catalogSql} WHERE active = 1 ORDER BY "ID"""".stripMargin,

    "catalog_flag_broken" ->
      s"""SELECT id, CASE WHEN id IN ('src-003','src-008') THEN 2 ELSE active END AS active
         |FROM ${Fixtures.catalogSql} ORDER BY id""".stripMargin,

    "error_alerts" ->
      s"""WITH e AS (
         |  SELECT id AS "ID", url AS "URL",
         |    replace('Unknown source type: ' || "type", '"', '''') AS "REASON",
         |    '${ErrorPath.alertMessage}' AS "MESSAGE"
         |  FROM ${Fixtures.catalogSql}
         |  WHERE active = 1 AND "type" NOT IN
         |    ('LINKS','LINKS_OVERWRITE','DIRECT','DIRECT_FTP','FTP_FILES'))
         |SELECT *, to_json(struct_pack("ID" := "ID", "URL" := "URL",
         |  "REASON" := "REASON", "MESSAGE" := "MESSAGE")) AS alert_json
         |FROM e ORDER BY "ID"""".stripMargin,

    "html_links" ->
      s"""WITH page AS (SELECT ${Fixtures.sqlLit(Fixtures.htmlBase)} AS base,
         |  ${Fixtures.sqlLit(Fixtures.htmlPage)} AS html),
         |hrefs AS (
         |  SELECT base, unnest(list_concat(list_concat(
         |    regexp_extract_all(html, '(?is)<a[ \\t\\n\\x0B\\f\\r](?:[^>]*[ \\t\\n\\x0B\\f\\r])?href[ \\t\\n\\x0B\\f\\r]*=[ \\t\\n\\x0B\\f\\r]*"([^"]*)"', 1),
         |    regexp_extract_all(html, '(?is)<a[ \\t\\n\\x0B\\f\\r](?:[^>]*[ \\t\\n\\x0B\\f\\r])?href[ \\t\\n\\x0B\\f\\r]*=[ \\t\\n\\x0B\\f\\r]*''([^'']*)''', 1)),
         |    regexp_extract_all(html, '(?is)<a[ \\t\\n\\x0B\\f\\r](?:[^>]*[ \\t\\n\\x0B\\f\\r])?href[ \\t\\n\\x0B\\f\\r]*=[ \\t\\n\\x0B\\f\\r]*([^"'' \\t\\n\\x0B\\f\\r>][^ \\t\\n\\x0B\\f\\r>]*)', 1))) AS href
         |  FROM page),
         |resolved AS (
         |  SELECT CASE
         |    WHEN href LIKE '%://%' THEN href
         |    WHEN href LIKE '/%' THEN 'http://host.example' || href
         |    ELSE base || href END AS file_url
         |  FROM hrefs)
         |SELECT file_url, string_split(file_url, '/')[-1] AS file_name
         |FROM resolved WHERE length(string_split(file_url, '/')[-1]) > 0
         |ORDER BY file_url""".stripMargin,

    "xml_feed_tasks" ->
      s"""WITH blocks AS (
         |  SELECT unnest(regexp_extract_all(content, '(?s)<url>(.*?)</url>', 1)) AS blk
         |  FROM read_text('${graft.sources.XmlFeed.fixturePath}')),
         |e AS (SELECT
         |  replace(regexp_extract(blk, '<loc>([^<]*)</loc>', 1), '&amp;', '&') AS url,
         |  regexp_extract(blk, '<lastmod>([^<]*)</lastmod>', 1) AS lastmod
         |  FROM blocks)
         |SELECT url, list_extract(string_split(url, '/'), -1) AS name, lastmod
         |FROM e WHERE url IS NOT NULL AND len(url) > 0
         |ORDER BY url""".stripMargin,

    "ftp_listing_glob" ->
      s"""WITH listing AS (SELECT ${Fixtures.ftpListingSql} AS listing),
         |lines AS (
         |  SELECT unnest(string_split(listing, chr(13) || chr(10))) AS line FROM listing),
         |names AS (
         |  SELECT string_split_regex(trim(line), '\\s+')[-1] AS file_name
         |  FROM lines WHERE length(line) > 0)
         |SELECT file_name, ${Fixtures.sqlLit(Fixtures.ftpBase)} || file_name AS file_url
         |FROM names
         |WHERE length(file_name) > 0
         |  AND regexp_matches(file_name, '${Globs.globToRegex(Fixtures.ftpGlob)}')
         |ORDER BY file_name""".stripMargin,

    "dlq_dead_letters" ->
      s"""SELECT event_id, CAST(event_id % 7 AS INTEGER) AS attempts
         |FROM events WHERE event_id % 7 >= 5 ORDER BY event_id""".stripMargin
  )
}
