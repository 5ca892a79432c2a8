package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sitemap parsing for crawl discovery — the third leg of the crawl
  * front door ([[UrlExprs]] canonicalization, robots policy in
  * [[RobotsTxtExpr]]/CrawlPolicy, and now the sitemaps robots points
  * at). Follows the sitemaps.org protocol (public spec): a payload is
  * either a `<urlset>` of `<url><loc>…</loc><lastmod>…</lastmod></url>`
  * entries or a `<sitemapindex>` of child `<sitemap><loc>…</loc>`
  * references.
  *
  * Parsing is the [[TextExprs.htmlToText]] discipline: pure codegen'd
  * regexp chains over the payload — no XML parser, no UDF, one narrow
  * scan over what is at 100 TB a many-million-row sitemap corpus.
  * Handled: optional namespace prefixes (`<sm:loc>`), attribute soup
  * on any element, the five predefined XML entities in loc values
  * (`&amp;` decoded LAST — single-decode), surrounding whitespace.
  * Declined honestly (null/empty, never a guess): CDATA-wrapped locs,
  * doctype tricks, and any lastmod SEMANTICS — lastmod is returned as
  * the raw trimmed string (W3C datetime parsing belongs to the
  * timestamp machinery, [[StrictTs]]'s territory, where the formats
  * are explicit). */
object SitemapExprs {

  private def tag(name: String): String =
    s"<(?:[A-Za-z0-9_-]+:)?$name(?:\\s[^>]*)?>"
  private def closeTag(name: String): String =
    s"</(?:[A-Za-z0-9_-]+:)?$name\\s*>"

  /** 'urlset' | 'sitemapindex' | NULL for anything else. A payload
    * containing BOTH markers classifies as urlset (fixed precedence —
    * the spec forbids mixing, and a page-entry sitemap is the safer
    * reading for a frontier: URLs get fetched, child indexes get
    * re-crawled anyway). */
  def sitemapKind(xml: Column): Column =
    when(xml.rlike("(?is)" + tag("urlset")), lit("urlset"))
      .when(xml.rlike("(?is)" + tag("sitemapindex")), lit("sitemapindex"))
      .otherwise(lit(null).cast("string"))

  private def decodeEntities(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(c,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&amp;", "&")

  private def locOf(entry: Column): Column = {
    val raw = regexp_extract(entry,
      "(?is)" + tag("loc") + "(.*?)" + closeTag("loc"), 1)
    val t = trim(decodeEntities(raw))
    // CDATA and empty locs decline to NULL (filtered by callers)
    when(t === "" || t.contains("<![CDATA["), lit(null).cast("string"))
      .otherwise(t)
  }

  /** `<urlset>` entries as array<struct<loc, lastmod>> — loc
    * entity-decoded and trimmed, lastmod the raw trimmed string or
    * NULL when absent. Entries without a usable loc are dropped;
    * non-urlset payloads (including sitemapindex) give the empty
    * array. */
  def sitemapEntries(xml: Column): Column = {
    val inUrlset = when(sitemapKind(xml) === "urlset", xml).otherwise(lit(""))
    val entries = regexp_extract_all(inUrlset,
      lit("(?is)" + tag("url") + "(.*?)" + closeTag("url")), lit(1))
    filter(
      transform(entries, e => {
        val lm = trim(regexp_extract(e,
          "(?is)" + tag("lastmod") + "(.*?)" + closeTag("lastmod"), 1))
        struct(locOf(e).as("loc"),
          when(lm === "", lit(null).cast("string")).otherwise(lm)
            .as("lastmod"))
      }),
      e => e.getField("loc").isNotNull)
  }

  /** `<sitemapindex>` child sitemap locations as array<string>
    * (entity-decoded, trimmed); empty array for non-index payloads. */
  def childSitemaps(xml: Column): Column = {
    val inIndex = when(sitemapKind(xml) === "sitemapindex", xml)
      .otherwise(lit(""))
    val entries = regexp_extract_all(inIndex,
      lit("(?is)" + tag("sitemap") + "(.*?)" + closeTag("sitemap")), lit(1))
    filter(transform(entries, locOf(_)), l => l.isNotNull)
  }
}
