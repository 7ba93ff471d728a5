package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL operators (reference X3/X4, SURVEY.md §2.1/§4.3).
  *
  * `urlResolve` mirrors Python's `urllib.parse.urljoin`
  * (`data_downloader.py:92,163`) via `java.net.URI.resolve` — the one true
  * semantic gap vs. Spark built-ins, shipped as a deterministic null-safe
  * Scala UDF (SURVEY.md §4.3).
  */
object Urls {

  /** RFC-3986-style resolution of `rel` against `base`. Deterministic and
    * pure — safe for Catalyst to reorder/duplicate. Returns null on null
    * input, and the raw `rel` if either side is unparseable (urljoin-ish
    * permissiveness).
    */
  def resolve(base: String, rel: String): String = {
    if (base == null || rel == null) return null
    if (rel.isEmpty) return base
    try {
      val b = new java.net.URI(base)
      // java.net.URI.resolve deviates from RFC 3986 when base has an
      // authority but empty path (e.g. "http://h" + "x"): merge should be
      // "/x". Normalize the base first.
      val nb =
        if (b.getAuthority != null && (b.getPath == null || b.getPath.isEmpty))
          new java.net.URI(b.getScheme, b.getAuthority, "/", b.getQuery, b.getFragment)
        else b
      nb.resolve(rel).toString
    } catch {
      case _: Exception =>
        try new java.net.URI(rel).toString catch { case _: Exception => rel }
    }
  }

  /** Column form of [[resolve]]. */
  val urlResolve: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((base: String, rel: String) => resolve(base, rel))

  /** Basename: last `/` segment of a URL (`data_downloader.py:93`). Empty
    * string for directory links — callers filter those (F2).
    */
  def basename(url: Column): Column = element_at(split(url, "/"), -1)

  /** URL canonicalization for dedup keys — the normalization a web-corpus
    * pipeline applies before URL-level dedup, where the same resource
    * hides behind case/port/fragment/param-order variants. Rules (the
    * conservative, safe subset of RFC 3986 §6):
    * lowercase scheme + host; drop `:80`/`:443` default ports; drop the
    * fragment; sort query parameters bytewise; empty path → `/`.
    *
    * Built ENTIRELY from codegen'd string expressions (regexp_extract /
    * split / array_sort — no UDF), with RE2-compatible patterns (explicit
    * classes, no lookarounds) so a DuckDB oracle replays every rule —
    * the Templates/TextFns cross-engine convention.
    */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // Authority may carry `userinfo@`; the host starts after the LAST `@`
    // (`[^@]*$` = @-free tail). Userinfo never identifies the resource, so
    // it is dropped from the dedup key.
    val hostPortNoUser = regexp_extract(hostPort, "([^@]*)$", 1)
    val host = lower(regexp_extract(hostPortNoUser, "^([^:]*)", 1))
    val port = regexp_extract(hostPortNoUser, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    // `?` is legal inside an RFC 3986 fragment — strip the fragment BEFORE
    // looking for the query so `#f?x=1` doesn't fabricate one.
    val preFrag = regexp_extract(url, "^([^#]*)", 1)
    val query = regexp_extract(preFrag, "\\?(.*)$", 1)
    val sortedQuery = array_join(array_sort(split(query, "&")), "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      when(path === "", lit("/")).otherwise(path),
      when(query === "", lit("")).otherwise(concat(lit("?"), sortedQuery)))
  }
}
