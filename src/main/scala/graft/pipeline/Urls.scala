package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-style dedup — the normalization a
  * web-corpus pipeline applies before URL-level deduplication, where
  * the same page is fetched as `HTTPS://WWW.Site.COM:443/p?b=2&a=1`,
  * `https://site.com/p?a=1&b=2#frag`, `...&utm_source=feed`, etc.
  *
  * Rules (the common CDX/crawl-dedup subset):
  *  - scheme and host lowercased;
  *  - leading `www.` stripped from the host;
  *  - default ports dropped (`:443` for https, `:80` for http);
  *  - fragment dropped;
  *  - tracking parameters (`utm_*`) dropped;
  *  - remaining query parameters sorted;
  *  - empty path becomes `/`.
  *
  * Pure column composition (regexp extracts + array sort/filter) — no
  * UDF, and every step has a DuckDB equivalent so the operator is
  * oracle-checkable end to end.
  */
object Urls {

  /** Lowercased host with `www.` and the scheme's default port
    * stripped. */
  def canonicalHost(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    val noWww = regexp_replace(hostport, "^www\\.", "")
    when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .otherwise(noWww)
  }

  /** Canonical form of the full URL per the rules above; null-safe in
    * that a string with no `scheme://` yields an empty-host canonical
    * (callers treat those as non-URLs upstream). */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val path0 = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => !(p.rlike("^utm_") || p === ""))
    val sortedQ = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), canonicalHost(url), path,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
  }
}
