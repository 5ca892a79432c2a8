package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode script profiling — the signal under language-ID and
  * mixed-script spam detection: per document, how many code points
  * fall in each major script block, which script dominates, and how
  * dominant it is. A crawl curator routes by it (CJK to the CJK
  * pipeline), filters by it (a "Latin" page that is 40% Cyrillic
  * look-alikes is a homoglyph-spoofing smell), and audits lang-id
  * disagreements with it (complementing [[graft.functions.LangIdNative]],
  * which is n-gram-statistical where this is codepoint-structural).
  *
  * Exactness protocol: counts come from per-block character-class
  * regexp counts (explicit BMP ranges, identical byte-for-byte in
  * both engines — no engine-specific \p{Script} names); the dominant
  * script is an integer-packed argmax `count·16 + (15 − idx)` under
  * `greatest`, so ties break deterministically toward the EARLIER
  * script in the fixed list; `fraction` = max_count / n_scripted is
  * the only float. Docs with no scripted characters get dominant
  * 'none', fraction 0.0.
  *
  * Scale shape (100 TB): ONE narrow scan, zero shuffles, zero joins —
  * per-row regex kernels with every count STAGED as a named
  * projection (the q154 HOF lesson: the packed argmax, the total, and
  * the decode all reference each count; inlining the regexp_count
  * trees would re-run every regex per reference). */
object ScriptProfile {

  /** Fixed script list: (name, single-char class). Order is the tie
    * break. All ranges BMP — supplementary-plane scripts land in
    * "other" (total − scripted), a documented decline. */
  val Scripts: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\x{00C0}-\\x{024F}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "greek" -> "[\\x{0370}-\\x{03FF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "hebrew" -> "[\\x{0590}-\\x{05FF}]",
    "devanagari" -> "[\\x{0900}-\\x{097F}]",
    "cjk" -> "[\\x{4E00}-\\x{9FFF}]",
    "hangul" -> "[\\x{AC00}-\\x{D7AF}]",
    "kana" -> "[\\x{3040}-\\x{30FF}]")

  /** Mixed-script tokens per document — the HOMOGLYPH-SPOOFING smell
    * [[profile]]'s doc-level histogram can't see: "pаypal" with a
    * Cyrillic а profiles as 83% Latin overall, but the token itself
    * straddles two scripts, which near-never happens in honest text
    * (IDN homograph literature: Gabrilovich & Gontmakher, CACM 2002 —
    * public). A token is mixed when its characters match ≥ 2 of the
    * script classes.
    *
    * Scale shape: ONE scan; tokens explode (the repo split protocol),
    * each token's per-script presence bits are STAGED once, and the
    * per-doc roll-up is a map-side-combined HashAggregate — the
    * exchange carries per-doc partial counts, never tokens.
    *
    * @return (doc, n_tokens, n_mixed, mixed_ratio) — every doc kept
    *         (token-less docs count 0 with ratio 0.0). */
  def mixedScriptTokens(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc"),
      explode_outer(split(trim(lower(col(textCol))), "\\s+")).as("tok"))
    val flags = tok.select(col("doc") +: col("tok") +:
      Scripts.map { case (n, re) =>
        when(col("tok").isNotNull &&
          regexp_count(col("tok"), lit(re)) > 0, 1L).otherwise(0L)
          .as(s"__$n")
      }: _*)
    val nScripts = Scripts.map { case (n, _) => col(s"__$n") }
      .reduce(_ + _)
    flags
      .select(col("doc"),
        when(col("tok").isNotNull && col("tok") =!= "", 1L)
          .otherwise(0L).as("__isTok"),
        when(nScripts >= 2L, 1L).otherwise(0L).as("__isMixed"))
      .groupBy(col("doc"))
      .agg(sum(col("__isTok")).as("n_tokens"),
        sum(col("__isMixed")).as("n_mixed"))
      .withColumn("mixed_ratio",
        when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(col("n_mixed").cast("double") /
            col("n_tokens").cast("double")))
  }

  /** (doc, <one count column per script>, n_scripted, dominant,
    * fraction). */
  def profile(docs: DataFrame, idCol: String, textCol: String)
  : DataFrame = {
    val names = Scripts.map(_._1)
    val counted = docs.select(
      (col(idCol).as("doc") +: Scripts.map { case (n, re) =>
        regexp_count(col(textCol), lit(re)).cast("long").as(n)
      }): _*)
    val total = names.map(col).reduce(_ + _)
    // packed argmax: count*16 + (15 - idx) — greatest picks the max
    // count, ties the earliest script
    val packs = names.zipWithIndex.map { case (n, i) =>
      col(n) * 16L + lit(15L - i)
    }
    val staged = counted
      .withColumn("n_scripted", total)
      .withColumn("__g", greatest(packs: _*))
    val idx = lit(15L) - (col("__g") % 16L)
    val dominant = names.zipWithIndex.foldLeft(lit("none")) {
      case (acc, (n, i)) => when(col("n_scripted") > 0L &&
        idx === i.toLong, n).otherwise(acc)
    }
    staged
      .withColumn("dominant", dominant)
      .withColumn("fraction",
        when(col("n_scripted") === 0L, lit(0.0))
          .otherwise(expr("__g DIV 16").cast("double") /
            col("n_scripted").cast("double")))
      .drop("__g")
  }
}
