package graft

import graft.functions.SitemapExprs
import org.apache.spark.sql.functions._

/** Sitemap parse envelope: entry extraction, prefixes/attributes,
  * entity decode, and the decline matrix (CDATA, truncation, garbage). */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  private def entries(xml: String): Seq[(String, Option[String])] =
    Seq(Tuple1(xml)).toDF("x")
      .select(explode(SitemapExprs.sitemapEntries(col("x"))).as("e"))
      .select(col("e.loc"), col("e.lastmod"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getString(1)))).toSeq

  private def kind(xml: String): Option[String] = {
    val r = Seq(Tuple1(xml)).toDF("x")
      .select(SitemapExprs.sitemapKind(col("x"))).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  private def children(xml: String): Seq[String] =
    Seq(Tuple1(xml)).toDF("x")
      .select(explode(SitemapExprs.childSitemaps(col("x"))).as("c"))
      .as[String].collect().toSeq

  test("urlset: multiple entries, lastmod optional, entities decode " +
    "once, whitespace trims, prefixes and attributes tolerated") {
    val xml = """<?xml version="1.0"?>
      <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        <url><loc>https://a.example.com/?x=1&amp;y=2</loc>
          <lastmod>2026-02-11</lastmod></url>
        <url><sm:loc attr="z"> https://b.example.com/p </sm:loc></url>
        <URL><LOC>https://c.example.com/&amp;amp;</LOC></URL>
      </urlset>"""
    assert(kind(xml).contains("urlset"))
    assert(entries(xml) == Seq(
      ("https://a.example.com/?x=1&y=2", Some("2026-02-11")),
      ("https://b.example.com/p", None),
      ("https://c.example.com/&amp;", None))) // single decode, not fixpoint
    assert(children(xml).isEmpty)
  }

  test("sitemapindex: children extract; page entries empty; a payload " +
    "with both markers reads as urlset (fixed precedence)") {
    val idx = """<sitemapindex>
      <sitemap><loc>https://h.example.com/s1.xml</loc>
        <lastmod>2026-01-01</lastmod></sitemap>
      <sitemap><loc>https://h.example.com/s2.xml</loc></sitemap>
    </sitemapindex>"""
    assert(kind(idx).contains("sitemapindex"))
    assert(children(idx) ==
      Seq("https://h.example.com/s1.xml", "https://h.example.com/s2.xml"))
    assert(entries(idx).isEmpty)
    val both = "<urlset><url><loc>https://x/</loc></url></urlset>" +
      "<sitemapindex><sitemap><loc>https://y/</loc></sitemap></sitemapindex>"
    assert(kind(both).contains("urlset"))
    assert(entries(both) == Seq(("https://x/", None)))
  }

  test("declines: CDATA loc drops, empty/whitespace loc drops, " +
    "truncated entry drops, garbage payload is kind-NULL and empty") {
    val xml = """<urlset>
      <url><loc><![CDATA[https://cd.example.com/]]></loc></url>
      <url><loc>   </loc></url>
      <url><loc>https://ok.example.com/</loc></url>
      <url><loc>https://cut.example.com/"""
    assert(entries(xml) == Seq(("https://ok.example.com/", None)))
    assert(kind("just text, no sitemap").isEmpty)
    assert(entries("just text").isEmpty && children("just text").isEmpty)
    // null payload: no throw, no entries (kind NULL, empty arrays)
    val nullRow = Seq(Tuple1(null.asInstanceOf[String])).toDF("x")
      .select(SitemapExprs.sitemapKind(col("x")),
        SitemapExprs.sitemapEntries(col("x")),
        SitemapExprs.childSitemaps(col("x"))).collect()(0)
    assert(nullRow.isNullAt(0))
    assert(nullRow.getSeq[Any](1).isEmpty && nullRow.getSeq[Any](2).isEmpty)
  }

  test("urlset-like names do not confuse the tag matcher " +
    "(<urlset> is not <url>, </urlset> is not </url>)") {
    val xml = "<urlset><url><loc>https://one.example.com/</loc></url></urlset>"
    assert(entries(xml) == Seq(("https://one.example.com/", None)))
  }
}
