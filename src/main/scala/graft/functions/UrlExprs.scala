package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl curation — the normalization a 100 TB
  * web corpus runs before URL-level dedup, frontier seen-filters, and
  * per-site aggregation. The reference has no crawl surface (it ingests
  * CSV/Excel exports, `etl/order_info_etl.py:173-180`); this is the
  * training-data-pipeline extension family.
  *
  * Everything is pure `Column` expressions over native functions
  * (`regexp_extract`/`regexp_replace`/`split`/`filter`/`array_sort`),
  * so the whole normalization is one narrow scan — no UDF, no shuffle
  * — and a downstream `groupBy(canonical)` is the only exchange, keyed
  * on the already-small canonical string. At 1000 executors this is
  * exactly the shape you want: the messy→canonical map is embarrassingly
  * parallel and the dedup shuffle carries one short string per row.
  *
  * Canonical form (the common-crawl-style contract):
  *  - fragment stripped (`#...` never reaches the server);
  *  - scheme and host lowercased; a leading `www.` dropped;
  *  - default ports stripped (`:80` for http, `:443` for https);
  *    any other explicit port is kept;
  *  - runs of `/` in the path collapsed to one; a single trailing `/`
  *    stripped (the root path stays `/`); an absent path becomes `/`;
  *  - query parameters: empties and tracking params (`utm_*`, `gclid`,
  *    `fbclid`, `msclkid`) dropped, the rest sorted byte-wise so
  *    `?b=2&a=1` and `?a=1&b=2` collide; an empty residue drops the `?`.
  *
  * NULL in → NULL out (expressions propagate). Non-URL garbage (no
  * `scheme://`) yields NULL rather than a fabricated canonical.
  */
object UrlExprs {

  /** Query parameters that never change content — the drop list. */
  private val TrackingParam = "^(utm_[^=]*|gclid|fbclid|msclkid)(=.*)?$"

  def canonicalizeUrl(url: Column): Column = {
    // fragment off first: everything downstream parses the defragmented form
    val defrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(defrag, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    val authority = lower(regexp_extract(defrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)", 1))
    val hostRaw = regexp_replace(authority, ":[0-9]+$", "")
    val host = regexp_replace(hostRaw, "^www\\.", "")
    val port = regexp_extract(authority, ":([0-9]+)$", 1)
    val portPart = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val pathRaw = regexp_extract(defrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)", 1)
    val collapsed = regexp_replace(pathRaw, "/{2,}", "/")
    val path = when(collapsed === "" || collapsed === "/", lit("/"))
      .otherwise(regexp_replace(collapsed, "/$", ""))
    val query = regexp_extract(defrag, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParam))
    val qstr = array_join(array_sort(params), "&")
    val qPart = when(qstr === "", lit("")).otherwise(concat(lit("?"), qstr))
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, qPart))
  }

  /** The canonical URL's host — for per-site grouping and policy joins. */
  def canonicalHost(url: Column): Column = {
    val authority = lower(regexp_extract(
      regexp_replace(url, "#.*$", ""),
      "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)", 1))
    val noPort = regexp_replace(authority, ":[0-9]+$", "")
    when(noPort === "", lit(null).cast("string"))
      .otherwise(regexp_replace(noPort, "^www\\.", ""))
  }

  /** The canonical URL's path (collapsed, de-trailing-slashed, `/` for
    * root) — the robots-style policy match key. */
  def canonicalPath(url: Column): Column = {
    val defrag = regexp_replace(url, "#.*$", "")
    val pathRaw = regexp_extract(defrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)", 1)
    val collapsed = regexp_replace(pathRaw, "/{2,}", "/")
    when(collapsed === "" || collapsed === "/", lit("/"))
      .otherwise(regexp_replace(collapsed, "/$", ""))
  }
}
