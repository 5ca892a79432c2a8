package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Key-skew diagnosis — the measurement that decides WHEN to reach for
  * [[SkewJoin.saltedJoin]], AQE skew splitting, or an isolate-and-union
  * plan. Before shuffling 100 TB on a key, you want the answer to "how
  * hot is the hottest key, and how many keys carry the mass?" as a
  * table, not a guess: a shuffle partition inherits its heaviest key
  * whole, so `max(cnt)/avg(cnt)` IS the straggler multiplier a plain
  * hash exchange on this key would produce.
  *
  * Output: the top `topN` heaviest keys, one row each, with the
  * corpus-level context repeated on every row (total rows, distinct
  * keys, mean rows/key) so the frame is self-contained:
  * (key, cnt, share, skew, n_rows, n_keys) where
  * share = cnt/n_rows and skew = cnt/(n_rows/n_keys), both rounded at
  * 6 — exact-integer inputs, one IEEE division each, engine-portable.
  *
  * Scale shape: ONE map-side-combined count aggregate (≤ |keys| rows
  * out), a second tiny aggregate over it for the totals (broadcast
  * back as a 1-row cross join), and a TakeOrderedAndProject for the
  * top-N — no full sort, no window, nothing driver-sized. Null keys
  * count as a key (they're the classic hot key — that's the point of
  * the report); the null group renders as the literal string "∅" so
  * the report never silently merges it with an empty string. */
object SkewReport {

  def keySkew(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN >= 1 && topN <= 100000,
      s"keySkew: topN must be in [1, 100000]: $topN")
    // snapshot the per-key counts: totals and the top-N both read them,
    // and without the checkpoint the RAW input would be scanned (and
    // aggregated) twice — at 100 TB that is two full passes for one
    val counts = df
      .select(coalesce(col(keyCol).cast("string"), lit("∅")).as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val totals = counts.agg(
      sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("cnt"),
        round(col("cnt").cast(DoubleType) / col("n_rows").cast(DoubleType), 6)
          .as("share"),
        round(col("cnt").cast(DoubleType) * col("n_keys").cast(DoubleType) /
          col("n_rows").cast(DoubleType), 6).as("skew"),
        col("n_rows"), col("n_keys"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topN)
  }
}
