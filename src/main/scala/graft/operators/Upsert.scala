package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert building blocks — the reference's T-SQL `NOT EXISTS` insert /
  * `INNER JOIN ... UPDATE` pair re-expressed over immutable DataFrames
  * (SURVEY.md §2.3 J1/J2; /root/reference/etl/order_info_etl.py:409-455).
  *
  * Scale notes: the dim side of these joins is small by construction
  * (platforms, products, dates), so the anti/left joins broadcast; the
  * incoming batch never shuffles on its own key.
  */
object Upsert {

  /** J1: anti-join insert — rows of `incoming` whose `keys` are unseen in
    * `dim`, appended. `SELECT ... WHERE NOT EXISTS (...)` == left_anti. */
  def antiJoinInsert(dim: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val newRows = incoming
      .select(dim.columns.map(col): _*)
      .join(broadcast(dim.select(keys.map(col): _*)), keys, "left_anti")
      .dropDuplicates(keys)
    dim.unionByName(newRows)
  }

  /** J2: coalesce-update — enrich `dim` from `updates`: for each key match,
    * fill NULL attribute values from the update side (reference backfills
    * customer state/postal and product names via COALESCE).
    * `preferUpdate=false` keeps existing non-NULL values (reference
    * semantics: `COALESCE(dim.x, upd.x)` / guarded `WHERE dim.x IS NULL`).
    */
  def coalesceUpdate(dim: DataFrame, updates: DataFrame, keys: Seq[String],
                     attrs: Seq[String], preferUpdate: Boolean = false): DataFrame = {
    val upd = updates
      .select((keys ++ attrs).map(col): _*)
      .dropDuplicates(keys)
      .select(keys.map(col) ++ attrs.map(a => col(a).as(s"__upd_$a")): _*)
    val joined = dim.join(broadcast(upd), keys, "left")
    val merged = attrs.foldLeft(joined) { (df, a) =>
      val c = if (preferUpdate) coalesce(col(s"__upd_$a"), col(a))
              else coalesce(col(a), col(s"__upd_$a"))
      df.withColumn(a, c)
    }
    merged.select(dim.columns.map(col): _*)
  }

  /** J2 variant: row-guarded overwrite — where `guard` holds on the dim row
    * (e.g. "state IS NULL OR postal IS NULL"), overwrite ALL `attrs` from
    * the update side (matching the reference's UPDATE ... SET both columns
    * under one WHERE, /root/reference/etl/order_info_etl.py:442-455 — note
    * it can overwrite a non-null column with NULL; faithful by design). */
  def guardedOverwrite(dim: DataFrame, updates: DataFrame, keys: Seq[String],
                       attrs: Seq[String], guard: DataFrame => Column): DataFrame = {
    val upd = updates
      .select((keys ++ attrs).map(col): _*)
      .dropDuplicates(keys)
      .select(keys.map(col) ++ attrs.map(a => col(a).as(s"__upd_$a"))
        :+ lit(true).as("__upd_matched"): _*)
    // materialize the guard BEFORE mutating attrs: it must observe the
    // pre-update row (and a withColumn would invalidate its attribute refs)
    val joined = dim.join(broadcast(upd), keys, "left")
      .withColumn("__guard", guard(dim) && coalesce(col("__upd_matched"), lit(false)))
    val merged = attrs.foldLeft(joined) { (df, a) =>
      df.withColumn(a, when(col("__guard"), col(s"__upd_$a")).otherwise(col(a)))
    }
    merged.select(dim.columns.map(col): _*)
  }

  /** Idempotent fact append: only batch rows whose business grain is
    * unseen in the existing fact are added — fixes the reference's
    * fact-duplication on re-run (its staging truncate-reload makes dim
    * upserts idempotent but the fact INSERT..SELECT is not).
    *
    * Both sides are fact-sized, so this is a shuffled (sort-merge) anti
    * join on the grain — NOT broadcast. At warehouse scale, restrict
    * `existing` to the partitions the batch can touch (date range) before
    * calling, and the anti join prunes to the affected partitions. */
  def idempotentFactAppend(existing: DataFrame, batch: DataFrame,
                           grain: Seq[String]): DataFrame =
    existing.unionByName(
      batch.join(existing.select(grain.map(col): _*).dropDuplicates(grain),
        grain, "left_anti"))

  /** IDENTITY-style surrogate keys for newly inserted rows: contiguous ids
    * `startAfter+1 ...` in the explicit business-key ordering, assigned
    * deterministically (unlike monotonically_increasing_id), matching how
    * the reference's tests must compare on business keys anyway
    * (SURVEY.md §7.4).
    *
    * The batch is snapshotted (`localCheckpoint`) first: key assignment
    * needs more than one pass over it, and each extra action would
    * otherwise re-run the upstream cleaning pipeline (measured ~2×
    * slowdown of the whole ETL without it).
    *
    * Batches up to `smallBatchRows` (the common dim case) take a
    * single-partition window over the SNAPSHOT — a bounded frame, the
    * documented tiny-frame exception. Larger batches take the
    * distributed formulation with NO single-task sort: range-repartition
    * on the ordering (partition i's keys all precede partition j's for
    * i<j), per-partition `row_number`, then per-partition counts
    * collected (bounded driver state — one long per partition, never
    * data) and turned into broadcast start offsets. Both paths produce
    * IDENTICAL ids when the ordering is unique (UpsertSpec asserts
    * parity); ties order arbitrarily in either. */
  def withSurrogateKeys(newRows: DataFrame, idCol: String, orderBy: Seq[Column],
                        startAfter: Long, smallBatchRows: Long = 1L << 20): DataFrame = {
    import newRows.sparkSession.implicits._
    val outCols = newRows.columns.filterNot(_ == idCol).map(col) :+ col(idCol)
    val snap = newRows.localCheckpoint()
    if (snap.count() <= smallBatchRows)
      return snap.withColumn(idCol,
        row_number().over(Window.orderBy(orderBy: _*)).cast("long") + startAfter)
        .select(outCols: _*)
    val parts = snap.repartitionByRange(orderBy: _*)
      .withColumn("__pid", spark_partition_id())
    var acc = 0L
    val offsets = parts.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      .map { case (pid, n) => val o = acc; acc += n; (pid, o) }
    parts
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(orderBy: _*)))
      .join(broadcast(offsets.toSeq.toDF("__pid", "__offset")), Seq("__pid"))
      .withColumn(idCol, col("__offset") + col("__rn").cast("long") + startAfter)
      .select(outCols: _*)
  }
}
