package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the single right row
  * with the greatest `rightTs <= leftTs` in the same key group (left
  * outer — unmatched left rows keep NULL payloads). The standard
  * point-in-time lookup of event/feature pipelines ("the last quote at or
  * before the trade", "the most recent purchase before this click").
  *
  * Scale design — this is NOT a range join. Both sides are tagged and
  * unioned, then a single `last(..., ignoreNulls)` running window over
  * (keys, ts) carries the most recent right payload forward onto left
  * rows:
  *  - exactly ONE shuffle, on the join keys (both sides co-partitioned by
  *    the same exchange), then one sort per partition;
  *  - per-task state while scanning = one payload struct, independent of
  *    how many right rows precede a left row — where the naive
  *    `l JOIN r ON l.k = r.k AND r.ts <= l.ts` + max-per-group plan
  *    materializes every (left, earlier-right) pair (quadratic per key);
  *  - payload travels as ONE struct so all attached columns come from the
  *    SAME matched right row (per-column last() would mix rows when a
  *    payload attribute is legitimately NULL).
  *
  * Determinism: if several right rows share (keys, rightTs), the window
  * order among them is unspecified — pre-aggregate the right side to one
  * row per (keys, ts) (as the provided queries do) when that matters.
  */
object AsOfJoin {

  /** @param payload right-side columns to attach (prefixed `asof_`).
    * Right must contain `keys ++ rightTs ++ payload`; left keeps all its
    * columns. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame = {
    val passCols = left.columns.toSeq
      .filterNot(c => keys.contains(c) || c == leftTs)
    require(!left.columns.exists(_.startsWith("__")),
      "left frame uses reserved __ column names")
    require(!right.columns.exists(_.startsWith("__")),
      "right frame uses reserved __ column names")
    // fail fast on output-name collisions: a duplicate column name only
    // blows up on a later by-name selection, far from the cause
    val outNames = (rightTs +: payload).map(p => s"asof_$p")
    val clashes = outNames.filter(left.columns.contains)
    require(clashes.isEmpty,
      s"left frame already has column(s) ${clashes.mkString(", ")} — " +
        "rename them or the right-side columns they would shadow")

    // Right rows become (keys, ts, __side=0, payload struct, NULL pass-through
    // cols); left rows become (keys, ts, __side=1, NULL payload, their cols).
    val pStruct = struct((rightTs +: payload).map(col): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"), pStruct.as("__p")) ++
        passCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rTagged.schema("__p").dataType).as("__p")) ++
        passCols.map(col): _*)

    // Ordering (ts, side) puts a right row at ts == left ts BEFORE the left
    // row, so ties match (the ASOF `l.ts >= r.ts` contract).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rTagged.unionByName(lTagged)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val out: Seq[Column] =
      keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++ passCols.map(col) ++
        Seq(col("__m").getField(rightTs).as(s"asof_$rightTs")) ++
        payload.map(p => col("__m").getField(p).as(s"asof_$p"))
    carried.select(out: _*)
  }
}
