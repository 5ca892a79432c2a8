package graft.operators

import graft.functions.{StableId63, TextExprs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a training-data pipeline needs beyond
  * dedup/similarity: reproducible sampling, sequence packing, PII
  * redaction, vocabulary building. All are narrow or single-shuffle
  * declarative plans — no UDFs, no driver-side state.
  */
object TrainingData {

  /** Deterministic sampling: keep a row iff its md5-derived 63-bit id key
    * lands under `permille` of 1000. Engine-portable (any system that can
    * md5 reproduces the exact subset), uniform per id, and NARROW — a
    * filter in the scan, no RNG state, no shuffle, stable across re-runs
    * and cluster sizes. The train/holdout split you can re-derive two
    * years later. */
  def deterministicSample(df: DataFrame, idCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"permille out of range: $permille")
    df.where(pmod(StableId63.stableId63(col(idCol).cast("string")), lit(1000))
      < lit(permille))
  }

  /** Stratified deterministic sampling: a per-stratum rate (permille) on
    * top of the same md5-derived key — the "rebalance the language mix"
    * primitive (downsample the dominant language, keep the rest). Same
    * guarantees as [[deterministicSample]]: narrow, engine-portable,
    * subset-monotonic per stratum, no RNG state. Strata missing from
    * `rates` fall back to `defaultPermille`. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Int], defaultPermille: Int): DataFrame = {
    (rates.values.toSeq :+ defaultPermille).foreach(p =>
      require(p >= 0 && p <= 1000, s"permille out of range: $p"))
    val rate = rates.foldLeft(lit(defaultPermille)) { case (acc, (k, p)) =>
      when(col(stratumCol) === k, lit(p)).otherwise(acc)
    }
    df.where(pmod(StableId63.stableId63(col(idCol).cast("string")), lit(1000)) < rate)
  }

  /** Greedy sequence packing: documents ordered by `idCol` within a shard
    * are laid head-to-tail and cut into `budget`-token bins —
    * bin = floor(exclusive-running-token-sum / budget), the streaming
    * first-fit used to build fixed-length training batches.
    *
    * The running sum is a window per shard, so the shard column is the
    * parallelism unit at scale (date, source, language, hash-bucket of
    * id): one shuffle on the shard key, sequential scan within. A single
    * global pack would serialize through one task — deliberately not
    * offered. */
  def packSequences(docs: DataFrame, shardCol: String, idCol: String,
                    textCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(shardCol), col(idCol),
        TextExprs.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("bin",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / budget))
  }

  /** Email-looking spans → `<EMAIL>`, digit runs → `<NUM>`. The character
    * classes are the RE2-safe subset, so the same pattern byte-for-byte
    * runs on Java regex and RE2-family engines (the oracle's). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val NumberPattern = "[0-9]+"

  /** PII scrub: redacted text plus per-row match counts (the audit trail a
    * compliance pass needs). Narrow, codegen'd regexp — no UDF. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = df
    .withColumn("n_emails", regexp_count(col(textCol), lit(EmailPattern)))
    .withColumn("__no_email",
      regexp_replace(col(textCol), EmailPattern, "<EMAIL>"))
    .withColumn("n_numbers", regexp_count(col("__no_email"), lit(NumberPattern)))
    .withColumn("redacted",
      regexp_replace(col("__no_email"), NumberPattern, "<NUM>"))
    .drop("__no_email")

  /** Gopher-style repetition signal: the fraction of a document's word
    * n-grams that are repeats (1 - distinct/total). Highly repetitive
    * machine-generated or boilerplate text scores near 1 and gets
    * filtered before training. Shingles are hashed to ints before the
    * counts (identical collisions cross-engine, 8-byte shuffle keys);
    * total and distinct counts run as two lean aggregates — fusing them
    * into one groupBy would plan countDistinct as an Expand (every
    * posting duplicated, see q48). Docs shorter than n tokens drop out
    * (no n-grams to judge). */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 2): DataFrame = {
    val sh = docs.select(col(idCol).as("doc"),
      explode(graft.functions.ShingleHash32.shingleHash32(col(textCol), n)).as("hv"))
    val tot = sh.groupBy(col("doc")).agg(count(lit(1)).as("n_ngrams"))
    val dis = sh.distinct().groupBy(col("doc")).agg(count(lit(1)).as("n_distinct"))
    tot.join(dis, Seq("doc"))
      .select(col("doc"), col("n_ngrams"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_ngrams"), 6)
          .as("rep_ratio"))
  }

  /** Frequency vocabulary: top-`k` lowercased whitespace tokens by global
    * count (ties → lexicographic). Classic two-phase aggregate: partial
    * counts map-side, one shuffle on token, TakeOrdered for the top-k —
    * the 100 TB shape for "build the tokenizer's seed vocab". */
  def vocabulary(docs: DataFrame, textCol: String, k: Int): DataFrame = docs
    .select(explode(TextExprs.tokens(lower(col(textCol)))).as("token"))
    .where(col("token") =!= "")
    .groupBy(col("token")).agg(count(lit(1)).as("n"))
    .orderBy(col("n").desc, col("token"))
    .limit(k)
}
