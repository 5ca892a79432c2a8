package graft.streaming

import graft.functions.UrlExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming crawl-frontier discovery: the seen-filter a crawler runs
  * on its URL stream — canonicalize each incoming URL (the full
  * [[UrlExprs]] normalization: percent-escapes, IDN fold, tracking
  * params, the works — inside the stream's scan), keep the FIRST
  * arrival of each canonical form via streaming dedup state, and track
  * per-host frontier size. Four messy variants of one page cost one
  * frontier slot, which is the whole reason the canonicalizer runs
  * before the seen-filter and not after fetch.
  *
  * State: `dropDuplicates` keyed on the canonical string — bounded by
  * DISTINCT canonicals, not arrivals. For an unbounded 24/7 frontier,
  * swap in `dropDuplicatesWithinWatermark` keyed the same way (eviction
  * by arrival-time watermark — new URLs for a page older than the
  * horizon re-enter, the standard recrawl compromise); the AvailableNow
  * gate below exercises the unevicted path, which is also the nightly
  * batch-drain shape. */
object UrlFrontier {

  /** (host, n_frontier): distinct canonical URLs seen per canonical
    * host, over a STREAMING `urls` frame. Compose with `writeStream`
    * in complete mode. */
  def frontierPerHost(urls: DataFrame, urlCol: String): DataFrame =
    urls
      .select(UrlExprs.canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .where(col("canonical_url").isNotNull)
      .dropDuplicates("canonical_url")
      // host re-extracts from the CANONICAL form (already lowercased,
      // de-ported, IDN-folded) — one canonicalization pass per row, not
      // two, and the extract is a single anchored regex
      .groupBy(regexp_extract(col("canonical_url"),
        "^[a-z][a-z0-9+.\\-]*://([^/:?#]*)", 1).as("host"))
      .agg(count(lit(1)).as("n_frontier"))

  /** The 24/7 frontier: seen-state EVICTED by an arrival-time watermark
    * (`dropDuplicatesWithinWatermark` on the canonical string) instead
    * of growing with DISTINCT canonicals forever. `tsCol` is the URL's
    * arrival/discovery time; `horizon` (e.g. "30 days") is the recrawl
    * compromise — a canonical re-arriving INSIDE the horizon of its
    * stored arrival is still a duplicate, one re-arriving after its
    * state was evicted re-enters the frontier (counted again: the page
    * is due for a recrawl). State is bounded by canonicals seen within
    * one horizon, which is what makes the stream runnable forever.
    *
    * Exactly [[frontierPerHost]] otherwise: canonicalize in-stream,
    * count per canonical host. Eviction timing is the engine's
    * watermark contract — state drops when the event-time watermark
    * passes `arrival + horizon`, so late re-deliveries BETWEEN the
    * horizon and the actual eviction may still dedup (the standard
    * within-watermark guarantee: never a duplicate inside the horizon,
    * best-effort dedup beyond it). */
  def frontierPerHostWindowed(urls: DataFrame, urlCol: String,
                              tsCol: String, horizon: String): DataFrame =
    urls
      .select(col(tsCol).cast("timestamp").as("__arrival"),
        UrlExprs.canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .where(col("canonical_url").isNotNull)
      .withWatermark("__arrival", horizon)
      .dropDuplicatesWithinWatermark("canonical_url")
      .groupBy(regexp_extract(col("canonical_url"),
        "^[a-z][a-z0-9+.\\-]*://([^/:?#]*)", 1).as("host"))
      .agg(count(lit(1)).as("n_frontier"))
}
