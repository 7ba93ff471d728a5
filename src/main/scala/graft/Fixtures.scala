package graft

/** Shared literal fixtures (FIXTURES.md §§1,4,5) used by BOTH the Spark
  * queries and the generated DuckDB oracle SQL, so the two sides can never
  * diverge. The catalog CSV lives at `fixtures/sources.csv` and is read by
  * both engines from disk.
  */
object Fixtures {

  val catalogCsv = "/root/repo/fixtures/sources.csv"

  /** Injected deterministic run timestamp (UTC) — SURVEY.md §7.0 T1. */
  val runTs = "2026-08-12 09:30:00"

  /** A January run to expose the reference's lastmonth bug (T3). */
  val runTsJan = "2026-01-15 02:05:00"

  val htmlBase = "http://host.example/reports/2026/08/"

  val htmlPage: String =
    """<html><body>
      |<a href="prices_20260812.csv">daily</a>
      |<a href="/abs/path/vol_20260812.zip">volume</a>
      |<a href="http://other.example/x/rates.json">rates</a>
      |<a href="subdir/">dir-link, empty basename, skipped</a>
      |<a href=raw_20260812.txt>unquoted href, valid HTML</a>
      |<a data-href=tracker.js href="pixel_20260812.gif">attr containing 'href' must not match</a>
      |<a>no href</a>
      |</body></html>""".stripMargin

  val ftpBase = "ftp://ftp.example/pub/"

  val ftpListingLines: Seq[String] = Seq(
    "-rw-r--r--   1 ftp  ftp   102400 Aug 11 23:59 data_20260811.zip",
    "-rw-r--r--   1 ftp  ftp   102400 Aug 12 04:00 data_20260812.zip",
    "-rw-r--r--   1 ftp  ftp      512 Aug 12 04:00 readme.txt",
    "drwxr-xr-x   2 ftp  ftp     4096 Aug 01 00:00 archive")

  /** Raw listing text as fetched: CRLF rows with a trailing empty line
    * (`data_downloader.py:152-153`).
    */
  val ftpListing: String = ftpListingLines.mkString("", "\r\n", "\r\n")

  val ftpGlob = "data_*.zip"

  /** DuckDB-side literal for a string, escaping single quotes. */
  def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB-side expression reproducing [[ftpListing]] without raw control
    * chars in the SQL text (CR/LF via chr()).
    */
  def ftpListingSql: String =
    ftpListingLines.map(sqlLit).mkString("", " || chr(13) || chr(10) || ", " || chr(13) || chr(10)")

  /** DuckDB `read_csv` over the same catalog file + schema Spark reads. */
  def catalogSql: String =
    s"""read_csv('$catalogCsv', header=true, columns={
       |'id':'VARCHAR','url':'VARCHAR','interval':'VARCHAR','col3':'VARCHAR',
       |'active':'INTEGER','col5':'VARCHAR','col6':'VARCHAR','type':'VARCHAR',
       |'pattern':'VARCHAR','utc':'INTEGER'})""".stripMargin
}
