package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Semi-structured text extraction (reference X2/X6/X7, SURVEY.md §2.1).
  *
  * The reference parses HTML with BeautifulSoup (`data_downloader.py:84-92`)
  * and FTP listings with string splits (`data_downloader.py:152-155`). Both
  * become Generator-style built-ins: `regexp_extract_all` + `explode` —
  * fully codegen'd, 1:N without a UDTF.
  */
object Extract {

  /** All `href` values of `<a>` anchors in an HTML string, grouped by
    * quoting style (double, single, unquoted), document order within each
    * group. Unquoted values (`<a href=file.csv>`, valid HTML that
    * BeautifulSoup accepts — `data_downloader.py:84-92`) run to the first
    * whitespace or `>`. Anchors without href are naturally absent
    * (BeautifulSoup's `f.get('href')` yields None → urljoin would throw;
    * reference behavior is "skip via empty basename" for directory links
    * and error for None — we simply don't emit them).
    */
  def anchorHrefs(html: Column): Column = {
    // Whitespace is an EXPLICIT class, never \s (Java's \s includes \x0B,
    // RE2's — DuckDB's — does not; see TextAnalysis.normalizeText), and
    // `href` must directly follow a whitespace (either the one after
    // `<a` or the end of the optional earlier-attributes run) so
    // attribute names merely CONTAINING it (data-href=...) never match —
    // BeautifulSoup matches the attribute name exactly.
    val ws = " \\t\\n\\x0B\\f\\r"
    val pre = s"(?is)<a[$ws](?:[^>]*[$ws])?href[$ws]*=[$ws]*"
    val dq = regexp_extract_all(html, lit(pre + "\"([^\"]*)\""), lit(1))
    val sq = regexp_extract_all(html, lit(pre + "'([^']*)'"), lit(1))
    val uq = regexp_extract_all(html,
      lit(pre + s"([^\"'$ws>][^$ws>]*)"), lit(1))
    concat(dq, sq, uq)
  }

  /** FTP listing → file names: split on CRLF, drop empty lines, take the
    * last whitespace-separated token (`data_downloader.py:152-154`).
    * Documented limitation kept: names containing spaces break (SURVEY X7).
    */
  def listingNames(listing: Column): Column =
    filter(
      transform(
        filter(split(listing, "\r\n"), l => length(l) > 0),
        l => element_at(split(trim(l), "\\s+"), -1)),
      n => length(n) > 0)
}
