package graft.operators

import graft.functions.UrlExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robots-style crawl-policy filtering — which URLs a curation pipeline
  * may keep, decided by per-host path-prefix rules with robots.txt
  * longest-match semantics. The reference has no crawl surface; this is
  * the training-data-pipeline extension family (curating a 100 TB crawl
  * starts by honoring the crawl policy it was fetched under).
  *
  * Semantics (the de-facto robots standard):
  *  - a rule is (host, prefix, allow); a rule matches a URL when the
  *    URL's canonical host equals the rule's host and its canonical
  *    path starts with the prefix;
  *  - among matching rules the LONGEST prefix wins; on a length tie,
  *    allow beats disallow;
  *  - no matching rule ⇒ allowed (robots is opt-out).
  *
  * Scale shape: the rule table is policy config — thousands of rows,
  * never corpus-sized — so it is explicitly `broadcast` and the whole
  * decision is one broadcast left join + one partial-aggregated
  * `groupBy(id)` argmax over the handful of matched rules per URL. The
  * corpus side never shuffles its text; only (id, host, path) flows
  * through the argmax, and the verdict joins back onto the corpus by id.
  * A hot host (half the crawl from one domain) skews nothing: the
  * broadcast join is map-side and the argmax key is the URL id, not the
  * host. */
object CrawlPolicy {

  /** Annotate `docs` with the policy verdict.
    *
    * @param docs  corpus frame carrying `idCol` and `urlCol` (raw or
    *              canonical URLs — host/path are re-derived canonically)
    * @param rules (host, prefix, allow) policy frame; small, broadcast
    * @return docs' columns + `allowed` (boolean, never NULL) +
    *         `matched_prefix` (the winning rule's prefix, NULL when no
    *         rule matched) */
  def applyPolicy(docs: DataFrame, idCol: String, urlCol: String,
                  rules: DataFrame): DataFrame = {
    val withKeys = docs.withColumn("__host", UrlExprs.canonicalHost(col(urlCol)))
      .withColumn("__path", UrlExprs.canonicalPath(col(urlCol)))
    val r = broadcast(rules.select(col("host").as("__host"),
      col("prefix").as("__prefix"), col("allow").as("__allow")))
    // longest-prefix-wins, allow beats disallow on ties: max over a
    // (len, allowBit, prefix) struct picks exactly that rule
    val matched = withKeys
      .join(r, Seq("__host"), "left")
      .where(col("__prefix").isNull || col("__path").startsWith(col("__prefix")))
      .groupBy(col(idCol))
      .agg(max(when(col("__prefix").isNotNull,
        struct(length(col("__prefix")).as("len"),
          col("__allow").cast("int").as("allow_bit"),
          col("__prefix").as("prefix")))).as("__win"))
    docs.join(matched, Seq(idCol), "left")
      .withColumn("allowed",
        coalesce(col("__win.allow_bit") === 1, lit(true)))
      .withColumn("matched_prefix", col("__win.prefix"))
      .drop("__win")
  }
}
