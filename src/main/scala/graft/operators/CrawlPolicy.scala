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
    // rule ids assigned by a window over the tiny rule table (single
    // partition is fine — rules are policy config, never corpus-sized);
    // the id recovers the winning PREFIX after the argmax
    val ruleW = org.apache.spark.sql.expressions.Window
      .orderBy(col("__host"), col("__prefix"), col("__allow"))
    // rule hosts normalize like URL hosts (lowercase, www. stripped) so
    // a rule authored as "WWW.A.com" still matches — the join key is
    // canonical on BOTH sides, not just the URL side
    val rulesIdx = rules.select(
        regexp_replace(lower(trim(col("host"))), "^www\\.", "").as("__host"),
        col("prefix").as("__prefix"), col("allow").as("__allow"))
      .withColumn("__rid", row_number().over(ruleW).cast("long"))
    // longest-prefix-wins, allow beats disallow on ties. The winning
    // rule is an argmax over (prefix length, allow); packing that order
    // into ONE long — length<<40 | allow<<39 | ruleId — keeps the
    // aggregation buffer fixed-width, so the argmax is a true
    // HashAggregate with map-side partial combine. A struct (or string)
    // max would fall back to SortAggregate: sort-the-world at corpus
    // scale for a 3-field comparison. Length caps at 2^23 chars (far
    // past any URL path); equal-(length,allow) ties break by max rule
    // id — deterministic, and verdict-identical since allow already
    // ranks above.
    val packed = shiftleft(length(col("__prefix")).cast("long"), 40)
      .bitwiseOR(shiftleft(col("__allow").cast("long"), 39))
      .bitwiseOR(col("__rid"))
    val matched = withKeys
      .join(broadcast(rulesIdx), Seq("__host"), "left")
      .where(col("__prefix").isNull || col("__path").startsWith(col("__prefix")))
      .groupBy(col(idCol))
      .agg(max(when(col("__prefix").isNotNull, packed)).as("__win"))
    val ridMask = (1L << 39) - 1
    docs.join(matched, Seq(idCol), "left")
      .withColumn("allowed", coalesce(
        shiftright(col("__win"), 39).bitwiseAND(lit(1L)) === 1, lit(true)))
      .join(broadcast(rulesIdx.select(col("__rid"),
          col("__prefix").as("matched_prefix"))),
        col("__win").bitwiseAND(lit(ridMask)) === col("__rid"), "left")
      .drop("__win", "__rid")
  }
}
