package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the change-data report between two dumps of
  * the same corpus (monthly crawl snapshots, dataset releases): which
  * documents were ADDED, REMOVED, CHANGED, or are UNCHANGED, by id and
  * content fingerprint. Every incremental operator in this repo
  * ([[TextSearch.appendCorpusStats]], [[IvfIndex.appendToIndex]],
  * [[Upsert]]) contracts on "delta documents are NEW" — this is the
  * operator that AUDITS that contract before an append, and the
  * rebuild trigger when it fails (changed/removed > 0 ⇒ rebuild, not
  * append).
  *
  * Scale shape (100 TB): content is hashed to a 128-bit md5 AT THE
  * SCAN, so the full-outer id join ships (id, 32-hex-char) rows — the
  * text/payload column never shuffles. One id-keyed exchange per side,
  * one hash aggregate for the summary. */
object SnapshotDiff {

  /** Per-id classification. Output: (id, status, old_fp, new_fp) where
    * status ∈ {'added', 'removed', 'changed', 'unchanged'} and the
    * absent side's fingerprint is NULL. Ids must be unique per
    * snapshot (corpus key contract — duplicate ids would cross-join in
    * the full-outer match; run exact dedup first). NULL content hashes
    * to NULL and compares via null-safe equality, so (null → null) is
    * unchanged and (null → text) is changed. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
           contentCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("id"),
      md5(col(contentCol).cast("binary")).as("old_fp"),
      lit(true).as("__in_old"))
    val n = newSnap.select(col(idCol).as("id"),
      md5(col(contentCol).cast("binary")).as("new_fp"),
      lit(true).as("__in_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(col("old_fp") <=> col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** One-row summary: (n_added, n_removed, n_changed, n_unchanged,
    * append_safe) — `append_safe` is the [[diff]] contract check
    * (true iff the new snapshot only grows: zero removed, zero
    * changed). */
  def summary(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
              contentCol: String): DataFrame = {
    def n(s: String): Column =
      sum(when(col("status") === s, 1L).otherwise(0L)).as(s"n_$s")
    diff(oldSnap, newSnap, idCol, contentCol)
      .agg(n("added"), n("removed"), n("changed"), n("unchanged"))
      .select(col("n_added"), col("n_removed"), col("n_changed"),
        col("n_unchanged"),
        (col("n_removed") === 0 && col("n_changed") === 0)
          .as("append_safe"))
  }
}
